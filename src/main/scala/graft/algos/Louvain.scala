package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous local-moving modularity optimization —
  * the distributed form of Louvain's phase 1 (Blondel et al. 2008,
  * arXiv:0803.0476). Classic Louvain moves vertices one at a time; a
  * distributed engine moves them in parallel rounds, which can oscillate
  * (two neighbors swapping communities forever), so rounds alternate by
  * vertex-id parity — only half the vertices may move per round, a standard
  * determinization (e.g. Spark-Louvain implementations and the synchronous
  * variant analyzed in the literature) that also makes the result
  * partitioning- and engine-independent.
  *
  * All gain comparisons are EXACT 64-bit integer arithmetic: moving v into
  * community c is better than into c' iff
  * `2m·w(v,c) − k_v·Σ_tot(c\v)  >  2m·w(v,c') − k_v·Σ_tot(c'\v)` — the
  * γ=1 modularity gain with the constant positive factor 2m multiplied
  * through. Unit/integer edge weights keep every term a long (at 176 M
  * edges the largest product is ~2m·k_max ≈ 7e8·1e6 ≪ 2^63), so there is
  * no float tie to break differently on another engine — the grid-Lloyd
  * design principle applied to modularity.
  *
  * Scale shape per round: ONE corpus-sized equi-join (undirected edges ⋈
  * community labels on dst, the PageRank-superstep shape) + a map-side
  * combinable groupBy(v, community); community totals are a
  * community-count-sized aggregate and the 2m scalar rides as a broadcast
  * 1-row frame. Convergence is delta-iterated with a per-round moved-count
  * read (the same bounded driver gate every iterative algo here uses).
  */
object Louvain {

  /** Local-moving fixpoint. `edges`: undirected (src, dst, w) with each
    * edge once, no self-loops, integer weights. Returns (id, community)
    * with each community relabeled to its minimum member id (label-choice
    * independent, like the CC convention). Fails loudly on a round budget
    * overrun rather than returning a half-converged partition.
    *
    * `minMoved` > 0 relaxes the fixpoint to "stop once a round moves ≤
    * minMoved vertices" — the standard sequential-Louvain practice of
    * cutting the geometric improvement tail (set it to ~0.1% of |V| at
    * scale); the default 0 is the exact fixpoint the planted oracle pins.
    */
  def localMoving(edges: DataFrame, maxRounds: Int = 40,
      minMoved: Long = 0L): DataFrame = {
    val und = edges
      .select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("src").as("id"))
      .agg(sum(col("w")).as("k"))
    val m2 = deg.agg(sum(col("k")).as("m2")) // = 2m, broadcast 1-row

    var comm = deg.select(col("id"), col("id").as("c"), col("k"))
      .localCheckpoint(true)
    var round = 0
    var moved = Long.MaxValue
    // moved == 0 is the fixpoint: a winner exists whenever any vertex
    // strictly gains (the globally max-priority gainer always wins its
    // neighborhood), so a zero-move round means no strict gainer remains
    while (moved > minMoved) {
      require(round < maxRounds,
        s"louvain: no fixpoint after $maxRounds rounds")
      val totals = comm.groupBy(col("c")).agg(sum(col("k")).as("s"))
      // weight from every vertex to each adjacent community (+ its own
      // community as a 0-weight candidate so "stay" is always scored)
      val nbrW = und
        .join(comm.select(col("id").as("dst"), col("c").as("cv")), Seq("dst"))
        .groupBy(col("src").as("id"), col("cv"))
        .agg(sum(col("w")).as("wvc"))
        .unionAll(comm.select(col("id"), col("c").as("cv"),
          lit(0L).as("wvc")))
        .groupBy(col("id"), col("cv")).agg(sum(col("wvc")).as("wvc"))
      val scored = nbrW
        .join(comm.select(col("id"), col("c"), col("k")), Seq("id"))
        .join(totals.withColumnRenamed("c", "cv"), Seq("cv"))
        .crossJoin(broadcast(m2))
        .select(col("id"), col("c"), col("cv"),
          (col("m2") * col("wvc") - col("k") *
            (col("s") - when(col("cv") === col("c"), col("k"))
              .otherwise(lit(0L)))).as("score"))
      val stay = scored.filter(col("cv") === col("c"))
        .select(col("id"), col("score").as("stay_score"))
      val best = scored.filter(col("cv") =!= col("c"))
        .groupBy(col("id"))
        .agg(max(struct(col("score"), (-col("cv")).as("negcv"))).as("b"))
        .select(col("id"), (-col("b.negcv")).as("nc"),
          col("b.score").as("bscore"))
      // strict improvement only (ties stay put), then Luby/MIS move
      // scheduling: a gainer moves only if its round-salted priority beats
      // every ADJACENT gainer's — no two neighbors move together, so the
      // synchronous herding that splits a clique into two flip-flopping
      // halves cannot form. Priority = (Lehmer hash << 32 | id): unique,
      // engine-portable, re-salted each round so every gainer eventually
      // wins its neighborhood.
      val want = best.join(stay, Seq("id"))
        .filter(col("bscore") > col("stay_score"))
        .select(col("id"), col("nc"),
          (GraphOps.lehmerHash(col("id"), lit(round), 77L) * 4294967296L +
            (col("id") % 4294967296L)).as("pri"))
      val nbrPri = und
        .join(want.select(col("id").as("dst"), col("pri").as("np")),
          Seq("dst"))
        .groupBy(col("src").as("id")).agg(max(col("np")).as("maxnp"))
      val winners = want.join(nbrPri, Seq("id"), "left")
        .filter(col("maxnp").isNull || col("pri") > col("maxnp"))
        .select(col("id"), col("nc"))
      val next = comm.join(winners, Seq("id"), "left")
        .select(col("id"), coalesce(col("nc"), col("c")).as("c"), col("k"),
          col("nc").isNotNull.as("moved"))
        .localCheckpoint(true)
      moved = next.filter(col("moved")).count()
      comm = next.select(col("id"), col("c"), col("k"))
      round += 1
      if (sys.env.contains("GRAFT_LOUVAIN_TRACE")) {
        // sample moves only when tiny — never a corpus-sized collect
        val mv = if (moved > 0 && moved <= 64)
          next.filter(col("moved")).select("id", "c").collect()
            .map(r => s"${r.getLong(0)}->${r.getLong(1)}").sorted.take(12)
        else Array.empty[String]
        System.err.println(
          s"[louvain] round=$round moved=$moved ${mv.mkString(" ")}")
      }
    }
    und.unpersist(false)
    val minLabel = comm.groupBy(col("c")).agg(min(col("id")).as("community"))
    comm.join(minLabel, Seq("c")).select(col("id"), col("community"))
  }
}
