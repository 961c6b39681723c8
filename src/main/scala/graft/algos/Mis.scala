package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Luby's maximal-independent-set algorithm (Luby 1986), the third member
  * of the fixed-random-priority family next to [[Coloring]] (Jones–
  * Plassmann is "Luby + mex"; Louvain's singleton seeding uses the same
  * contest): each round, every still-active vertex whose priority beats
  * all of its still-active neighbors' joins the MIS, then it AND its
  * neighbors leave the active set. O(log n) rounds expected; the result
  * is independent (two winners are never adjacent — one would out-rank
  * the other) and maximal (a vertex only leaves the active set when it
  * or a neighbor is selected).
  *
  * Determinism is the Coloring contract: priority = (Lehmer hash << 32 |
  * id), unique and engine-portable, fixed across rounds, so the selected
  * set and each member's selection round are bit-identical across
  * engines and partitionings — the DuckDB oracle replays the loop as
  * unrolled CTEs, rounds past the fixpoint idempotent (empty winner
  * frontier, unchanged active set).
  *
  * Scale shape per round: one edges ⋈ active join for the neighborhood
  * priority max (map-side combinable), one frontier-sized neighbor
  * expansion for the removal set, anti-join shrink — and unlike
  * coloring, each round removes winners PLUS their whole neighborhoods,
  * so the active set collapses geometrically even on hub-heavy graphs
  * (a hub leaves the moment any neighbor wins; it never waits out its
  * degree the way JP's random-priority contest makes it wait).
  *
  * Output: (id, mis_round) for MIS members only, mis_round ≥ 1.
  */
object Mis {

  def luby(edges: DataFrame, maxRounds: Int = 64,
      seed: Long = 42L): DataFrame = run(edges, maxRounds, seed)._1

  /** Variant returning the round count too (probes, specs). */
  def run(edges: DataFrame, maxRounds: Int = 64,
      seed: Long = 42L): (DataFrame, Int) = {
    val und = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pri = (GraphOps.lehmerHash(col("id"), lit(0L), seed) *
      4294967296L + (col("id") % 4294967296L)).as("pri")
    var active = graft.core.Dataflow.checkpointRebased(
      und.select(col("src").as("id")).distinct().select(col("id"), pri))
    var mis: DataFrame = null // (id, mis_round)
    var round = 0
    while (!active.isEmpty) {
      require(round < maxRounds, s"luby: not done after $maxRounds rounds")
      round += 1
      val nbrMax = und
        .join(active.select(col("id").as("dst"), col("pri").as("np")),
          Seq("dst"))
        .groupBy(col("src").as("id")).agg(max(col("np")).as("maxnp"))
      val winners = active.join(nbrMax, Seq("id"), "left")
        .filter(col("maxnp").isNull || col("pri") > col("maxnp"))
        .select(col("id"))
      val newly = winners.select(col("id"),
        lit(round.toLong).as("mis_round"))
      mis = graft.core.Dataflow.checkpointRebased(
        if (mis == null) newly else mis.unionByName(newly))
      val removed = winners
        .unionAll(und
          .join(winners.select(col("id").as("src")), Seq("src"))
          .select(col("dst").as("id")))
        .distinct()
      active = graft.core.Dataflow.checkpointRebased(
        active.join(removed, Seq("id"), "left_anti"))
    }
    und.unpersist(false)
    val out =
      if (mis == null)
        active.select(col("id"), lit(0L).as("mis_round")).limit(0)
      else mis
    (out, round)
  }
}
