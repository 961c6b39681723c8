package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Jones–Plassmann greedy graph coloring (Jones & Plassmann 1993): each
  * round, every uncolored vertex whose FIXED random priority beats all of
  * its uncolored neighbors' takes the smallest color unused by its
  * already-colored neighbors. Independent winners per round (a priority
  * local maximum has no winning neighbor), so the coloring is proper by
  * construction and uses ≤ Δ+1 colors; expected O(log n / log log n)
  * rounds on bounded-degree graphs.
  *
  * Determinized the Louvain-MIS way: priority = (Lehmer hash << 32 | id)
  * — unique, engine-portable, FIXED across rounds (JP uses one random
  * permutation, unlike Louvain's per-round re-salt). The mex is computed
  * on the collected colored-neighbor color set (bounded by degree), so
  * every step is exact integer arithmetic and the full coloring is
  * bit-identical across engines and partitionings.
  *
  * Scale shape per round: one edges⋈uncolored join for the neighborhood
  * priority max, one edges⋈colored join for the used-color sets (both
  * map-side combinable aggregates), frontier-sized anti-joins — the
  * PageRank-superstep family. State is stats-rebased per round
  * (Dataflow.checkpointRebased).
  *
  * [[jonesPlassmannLdf]] is the largest-degree-first variant (Hasenplaugh
  * et al., SPAA'14 "Ordering heuristics for parallel graph coloring"): the
  * round count of random-priority JP on hub-heavy power-law graphs scales
  * with the hub degree spread (a hub wins its contest only after nearly
  * every neighbor is colored — measured 12.4 K edges/s at 22 M edges,
  * BENCH.md). LDF priority = (degree, hash, id) lexicographic, encoded as
  * one exact decimal(38,0) ≤ 2^98 so the winner max/compare stays a plain
  * numeric aggregate in both engines (the long would overflow): hubs color
  * in the first rounds and the million-vertex low-degree classes — whose
  * neighbors are mostly those hubs — finish right behind them. Same
  * properness/≤Δ+1 guarantees, same determinism (the hash and id break
  * within-degree ties, unique because id is).
  */
object Coloring {

  def jonesPlassmann(edges: DataFrame, maxRounds: Int = 64,
      seed: Long = 42L): DataFrame =
    run(edges, maxRounds, seed, largestFirst = false)._1

  def jonesPlassmannLdf(edges: DataFrame, maxRounds: Int = 64,
      seed: Long = 42L): DataFrame =
    run(edges, maxRounds, seed, largestFirst = true)._1

  /** Variant returning the round count too (probes, specs). */
  def run(edges: DataFrame, maxRounds: Int, seed: Long,
      largestFirst: Boolean): (DataFrame, Int) = {
    val und = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hashPri = GraphOps.lehmerHash(col("id"), lit(0L), seed) *
      4294967296L + (col("id") % 4294967296L)
    val dec = "decimal(38,0)"
    val init =
      if (largestFirst) und.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .select(col("id"),
          (col("deg").cast(dec) *
            lit(new java.math.BigDecimal("9223372036854775808")) +
            hashPri.cast(dec)).as("pri"))
      else und.select(col("src").as("id")).distinct()
        .select(col("id"), hashPri.as("pri"))
    var uncol = graft.core.Dataflow.checkpointRebased(init)
    var colored: DataFrame = null // (id, color)
    var round = 0
    while (!uncol.isEmpty) {
      require(round < maxRounds,
        s"jonesPlassmann: not done after $maxRounds rounds")
      val nbrMax = und
        .join(uncol.select(col("id").as("dst"), col("pri").as("np")),
          Seq("dst"))
        .groupBy(col("src").as("id")).agg(max(col("np")).as("maxnp"))
      val winners = uncol.join(nbrMax, Seq("id"), "left")
        .filter(col("maxnp").isNull || col("pri") > col("maxnp"))
        .select(col("id"))
      val used =
        if (colored == null) winners.select(col("id"),
          lit(null).cast("array<bigint>").as("used")).limit(0)
        else und
          .join(colored.select(col("id").as("dstc"), col("color")),
            und("dst") === col("dstc"))
          .join(winners.select(col("id").as("src")), Seq("src"))
          .groupBy(col("src").as("id"))
          .agg(collect_set(col("color")).as("used"))
      // mex: the smallest value in 0..|used| missing from used — exact,
      // tiny per-vertex arrays (bounded by degree), identical in DuckDB
      val emptyU = expr("CAST(array() AS ARRAY<BIGINT>)")
      val newly = winners.join(used, Seq("id"), "left")
        .select(col("id"), coalesce(
          array_min(filter(
            sequence(lit(0L),
              size(coalesce(col("used"), emptyU)).cast("long")),
            x => !array_contains(coalesce(col("used"), emptyU), x))),
          lit(0L)).as("color"))
      colored = graft.core.Dataflow.checkpointRebased(
        if (colored == null) newly else colored.unionByName(newly))
      uncol = graft.core.Dataflow.checkpointRebased(
        uncol.join(newly.select("id"), Seq("id"), "left_anti"))
      round += 1
    }
    und.unpersist(false)
    val out =
      if (colored == null)
        uncol.select(col("id"), lit(0L).as("color")).limit(0)
      else colored
    (out, round)
  }
}
