package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Dataflow, LinkGraph}

/** Strongly-connected components via iterative forward-coloring + backward
  * confirmation — the same Salihoglu-Widom "coloring" scheme the reference
  * implements (/root/reference/example_apps/stronglyconnectedcomponents.cpp:
  * 146-407: forward min/max color spread, backward confirm, peel, repeat),
  * expressed as nested BSP fixpoints:
  *
  *   while vertices remain:
  *     0. trim: vertices with no live in-edges or no live out-edges are
  *        singleton SCCs — peel them without any coloring (the "Trim" step
  *        of hybrid SCC algorithms, e.g. Slota et al.'s Multistep; removes
  *        the acyclic periphery — for provenance DAGs that is most of the
  *        graph — in cheap degree-filter rounds)
  *     1. forward fixpoint: color(v) = max id that reaches v (incl. self) —
  *        delta-iterated: only vertices whose color changed last round emit
  *        (the reference's own scheduler is selective,
  *        stronglyconnectedcomponents.cpp:146-407), with convergence checked
  *        every [[CheckEvery]] rounds
  *     2. roots: color(v) == v
  *     3. backward fixpoint within each color class from its root — the
  *        confirmed set is one SCC (labeled by its root id)
  *     4. peel confirmed vertices and their edges, repeat
  *
  * **Adversarial shapes and the driver finish.** A descending chain of SCCs
  * (ids decreasing along edges) defeats every BSP coloring scheme: the
  * global max colors the whole chain, so each peel confirms exactly one SCC
  * (O(#SCCs) peels), and the forward fixpoint itself needs O(diameter)
  * rounds. The standard hybrid answer (Multistep) is to finish small
  * remainders sequentially: once the live graph fits under
  * `driverFinishBelow` rows (vertices + edges), collect it and run
  * iterative Tarjan on the driver — a 2 M-row remainder is ~32 MB and
  * finishes in seconds, turning the chain worst case from O(#SCCs)
  * distributed peels into a bounded driver step. On a real cluster the
  * threshold is sized to driver memory; 0 disables the finish (pure
  * distributed peeling, used by the oracle gate so the BSP path stays
  * exercised).
  *
  * SCC labels are the max vertex id of each SCC — a canonical labeling,
  * exact-match testable against a Tarjan oracle (and identical between the
  * distributed and driver-finish paths).
  *
  * @param maxRounds peel-round budget (fail-loud)
  * @param driverFinishBelow collect-and-Tarjan threshold on remaining
  *   vertices+edges; 0 disables
  * @param maxInnerRounds budget for each forward/backward/trim fixpoint —
  *   a high-diameter graph spins O(V) inner rounds accumulating checkpoints
  *   with no loud failure otherwise (ADVICE r3); exceeded → exception
  *   naming the knob
  */
object SCC {

  /** Convergence-check cadence of the forward phase: between checks the loop
    * trusts the frontier, so quiescence costs at most CheckEvery-1 extra
    * empty-frontier rounds (no E-row join work) while every round in the
    * long pre-convergence stretch saves one blocking driver action.
    */
  private val CheckEvery = 2

  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50,
      driverFinishBelow: Long = 2000000L,
      maxInnerRounds: Int = 2000): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    var liveEdges = edges.select("src", "dst").distinct().localCheckpoint(true)
    var live = LinkGraph.vertices(edges).localCheckpoint(true)
    var result: DataFrame = null
    var remaining = live.count()
    var liveEdgeCnt = liveEdges.count()
    var round = 0

    def addResult(df: DataFrame): Unit = {
      result = if (result == null) df else result.unionAll(df)
      result = result.localCheckpoint(true)
    }
    def innerBudgetCheck(r: Int, phase: String): Unit =
      if (r >= maxInnerRounds) throw new IllegalStateException(
        s"SCC $phase fixpoint exceeded maxInnerRounds=$maxInnerRounds " +
          s"(high-diameter graph? raise maxInnerRounds or driverFinishBelow)")

    while (remaining > 0 && round < maxRounds) {
      // --- driver finish ------------------------------------------------
      if (driverFinishBelow > 0 && remaining + liveEdgeCnt <= driverFinishBelow) {
        addResult(tarjanFinish(spark, live, liveEdges, parts))
        remaining = 0
      } else {

      // --- 0. trim (delta-iterated) -------------------------------------
      // Peel the acyclic fringe as singleton SCCs — but NEVER recompute
      // degrees from the full edge set per round (round 4: the naive
      // hasIn/hasOut-distinct trim cost two full-E shuffles per round and
      // DOUBLED total SCC time at 176 M edges, 882 → 1684 s). Instead:
      // degrees once (two E-shuffles total), then each round decrements
      // only the neighbors of the just-peeled frontier — the same
      // changed-only pattern as CC/k-cores. A provenance DAG still drains
      // completely here in diameter rounds; each round's join work is
      // frontier-sized against the static partitioned edge views.
      // A long pure path would spin (one vertex per round) —
      // innerBudgetCheck fails loudly, and the driver finish above absorbs
      // any path that fits the threshold first.
      val tSrc = liveEdges.repartition(parts, col("src"))
        .sortWithinPartitions("src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val tDst = liveEdges.repartition(parts, col("dst"))
        .sortWithinPartitions("dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val inDeg = tDst.groupBy(col("dst").as("id"))
        .agg(count(lit(1)).as("in"))
      val outDeg = tSrc.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("out"))
      // deg state: hash-partitioned on id, updated with frontier messages.
      // Per-round state is checkpointRebased, not plain localCheckpoint:
      // dIn/dOut are aggregates over frontier×edges INNER joins (size
      // estimate = product of children) and nextDeg left-joins deg with
      // both, so an inherited estimate compounds ~3× in bit-length per trim
      // round — a deep acyclic fringe (the long-path shapes trim exists
      // for) would hit the BigInteger-stats meltdown Dataflow documents.
      var deg = Dataflow.checkpointRebased(
        live.join(inDeg, Seq("id"), "left")
          .join(outDeg, Seq("id"), "left")
          .select(col("id"), coalesce(col("in"), lit(0L)).as("in"),
            coalesce(col("out"), lit(0L)).as("out"))
          .repartition(parts, col("id")))
      var frontier0 = Dataflow.checkpointRebased(
        deg.filter(col("in") === 0 || col("out") === 0).select("id"))
      var peeledTotal = 0L
      var trimRound = 0
      var frontierCnt = frontier0.count()
      while (frontierCnt > 0) {
        innerBudgetCheck(trimRound, "trim")
        addResult(frontier0.select(col("id"), col("id").as("scc")))
        peeledTotal += frontierCnt
        // each peeled vertex kills its incident edges: decrement the other
        // endpoint's opposing degree (edges with both endpoints peeled
        // decrement a vertex that is already dead — harmless, it never
        // re-enters the frontier because dead rows are dropped below)
        val dIn = frontier0.join(tSrc, frontier0("id") === tSrc("src"))
          .groupBy(col("dst").as("id")).agg(count(lit(1)).as("din"))
        val dOut = frontier0.join(tDst, frontier0("id") === tDst("dst"))
          .groupBy(col("src").as("id")).agg(count(lit(1)).as("dout"))
        val nextDeg = deg
          .join(frontier0.select(col("id").as("pid")), deg("id") === col("pid"),
            "left_anti") // drop peeled rows: they are labeled already
          .join(dIn, Seq("id"), "left")
          .join(dOut, Seq("id"), "left")
          .select(col("id"), (col("in") - coalesce(col("din"), lit(0L))).as("in"),
            (col("out") - coalesce(col("dout"), lit(0L))).as("out"))
        val nextDegCp = Dataflow.checkpointRebased(nextDeg)
        frontier0 = Dataflow.checkpointRebased(
          nextDegCp.filter(col("in") === 0 || col("out") === 0).select("id"))
        deg = nextDegCp
        frontierCnt = frontier0.count()
        trimRound += 1
      }
      if (peeledTotal > 0) {
        live = deg.select("id").localCheckpoint(true)
        remaining -= peeledTotal
        liveEdges = liveEdges
          .join(live.select(col("id").as("ls")),
            liveEdges("src") === col("ls"), "left_semi")
          .join(live.select(col("id").as("ld")),
            liveEdges("dst") === col("ld"), "left_semi")
          .localCheckpoint(true)
        liveEdgeCnt = liveEdges.count()
      }
      tSrc.unpersist(false); tDst.unpersist(false)
      // trim can drop the remainder under the driver-finish threshold
      if (driverFinishBelow > 0 && remaining > 0 &&
          remaining + liveEdgeCnt <= driverFinishBelow) {
        addResult(tarjanFinish(spark, live, liveEdges, parts))
        remaining = 0
      }
      if (remaining > 0) {
      // Static per-peel edge views, partitioned + sorted ONCE per direction
      // (PageRank's static-side pattern): every inner-round join below then
      // reuses the edge partitioning and shuffles only frontier-sized data,
      // instead of re-exchanging the full E-row side each round.
      val eSrc = liveEdges.repartition(parts, col("src"))
        .sortWithinPartitions("src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val eDst = liveEdges.repartition(parts, col("dst"))
        .sortWithinPartitions("dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      eSrc.count(); eDst.count()

      // --- 1. forward max-color fixpoint -------------------------------
      // Delta iteration (VERDICT r2 item 3): only vertices whose color
      // changed last round emit messages — the same changed-only frontier
      // CC uses — and the convergence check runs every CheckEvery rounds
      // instead of every round, cutting driver round-trips. Extra rounds
      // after quiescence are joins over an EMPTY frontier (near-free).
      var colors = live.select(col("id"), col("id").as("color"))
        .repartition(parts, col("id"))
        .localCheckpoint(true)
      var fwdFrontier = colors // round 0: every vertex "just changed"
      var fwdRound = 0
      var fwdDone = false
      while (!fwdDone) {
        innerBudgetCheck(fwdRound, "forward")
        val msgs = fwdFrontier.join(eSrc, fwdFrontier("id") === eSrc("src"))
          .groupBy(col("dst")).agg(max(col("color")).as("mcolor"))
        val next = colors.join(msgs, colors("id") === msgs("dst"), "left")
          .select(colors("id"),
            greatest(col("color"), coalesce(col("mcolor"), col("color")))
              .as("color"),
            (coalesce(col("mcolor"), col("color")) > col("color"))
              .as("chg"))
          .localCheckpoint(true) // the one materializing action per round
        fwdFrontier = next.filter(col("chg")).select("id", "color")
        colors = next.select("id", "color")
        fwdRound += 1
        if (fwdRound % CheckEvery == 0)
          fwdDone =
            next.agg(sum(when(col("chg"), 1L).otherwise(0L)))
              .head().getLong(0) == 0L
      }

      // --- 2+3. backward confirmation within color classes --------------
      // Same delta-iterated state-update shape as the forward phase: the
      // confirmation state (id, color, scc) stays hash-partitioned on id
      // across rounds (zero state re-exchange), only the frontier's
      // predecessor candidates shuffle, and the "already confirmed" check is
      // the scc column itself — no V-row visited-set anti-join per round.
      var bstate = colors.select(col("id"), col("color"),
        when(col("color") === col("id"), col("id")).as("scc"))
        .localCheckpoint(true)
      var frontier = bstate.filter(col("scc").isNotNull)
        .select(col("id"), col("scc"))
      var bRound = 0
      var bDone = false
      while (!bDone) {
        innerBudgetCheck(bRound, "backward")
        // predecessor candidates of the newly-confirmed frontier
        val cand = frontier.join(eDst, frontier("id") === eDst("dst"))
          .select(col("src").as("cid"), col("scc").as("cscc"))
          .distinct()
        // a predecessor joins the SCC iff its forward color equals the scc
        // root; at most one cand row can satisfy color === cscc per vertex
        val nxt = bstate.join(cand,
          bstate("id") === col("cid") && bstate("color") === col("cscc"),
          "left")
          .select(bstate("id"), bstate("color"),
            coalesce(bstate("scc"), col("cscc")).as("scc"),
            (bstate("scc").isNull && col("cscc").isNotNull).as("chg"))
          .localCheckpoint(true)
        frontier = nxt.filter(col("chg")).select(col("id"), col("scc"))
        bstate = nxt.select("id", "color", "scc")
        bRound += 1
        if (bRound % CheckEvery == 0)
          bDone = nxt.agg(sum(when(col("chg"), 1L).otherwise(0L)))
            .head().getLong(0) == 0L
      }
      val inScc = bstate.filter(col("scc").isNotNull).select("id", "scc")
        .localCheckpoint(true)
      eSrc.unpersist(false); eDst.unpersist(false)

      addResult(inScc)

      // --- 4. peel ------------------------------------------------------
      live = live.join(inScc.select(col("id").as("did")),
        live("id") === col("did"), "left_anti").localCheckpoint(true)
      liveEdges = liveEdges
        .join(live.select(col("id").as("ls")), liveEdges("src") === col("ls"),
          "left_semi")
        .join(live.select(col("id").as("ld")), liveEdges("dst") === col("ld"),
          "left_semi")
        .localCheckpoint(true)
      remaining = live.count()
      liveEdgeCnt = liveEdges.count()
      } // if remaining > 0 (post-trim)
      } // else (no driver finish this round)
      round += 1
    }
    // A graph can need up to one round per SCC in the worst case (descending
    // chain); silently returning a partial labeling would be wrong (ADVICE
    // r1) — fail loudly instead.
    if (remaining > 0)
      throw new IllegalStateException(
        s"SCC peeling did not finish within $maxRounds rounds " +
          s"($remaining vertices unlabeled); raise maxRounds")
    if (result == null)
      live.select(col("id"), col("id").as("scc"))
    else result.select("id", "scc")
  }

  /** Collect the (small, thresholded) remaining live graph and label it with
    * iterative Tarjan on the driver — the sequential finish of hybrid SCC
    * (caller guarantees vertices+edges <= driverFinishBelow). Labels match
    * the distributed path: max member id per SCC.
    */
  private def tarjanFinish(spark: SparkSession, live: DataFrame,
      liveEdges: DataFrame, parts: Int): DataFrame = {
    val ids = live.select("id").collect().map(_.getLong(0)).sorted
    val n = ids.length
    val idx = new scala.collection.mutable.LongMap[Int](n * 2)
    var i = 0
    while (i < n) { idx(ids(i)) = i; i += 1 }
    val rawEdges = liveEdges.select("src", "dst").collect()
    val m = rawEdges.length
    val esrc = new Array[Int](m)
    val edst = new Array[Int](m)
    i = 0
    while (i < m) {
      esrc(i) = idx(rawEdges(i).getLong(0))
      edst(i) = idx(rawEdges(i).getLong(1))
      i += 1
    }
    val label = tarjanMaxLabels(ids, esrc, edst)
    val rows = Array.tabulate(n)(j => (ids(j), label(j)))
    val sc = spark.sparkContext
    import spark.implicits._
    sc.parallelize(rows.toIndexedSeq, math.max(1, parts / 4)).toDF("id", "scc")
  }

  /** Iterative Tarjan over an index-compressed graph (explicit DFS + SCC
    * stacks, no recursion — safe at millions of vertices). Returns the max
    * ORIGINAL id of each vertex's SCC.
    */
  private[algos] def tarjanMaxLabels(ids: Array[Long], src: Array[Int],
      dst: Array[Int]): Array[Long] = {
    val n = ids.length
    val m = src.length
    // CSR adjacency
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < m) { off(src(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) { adj(fill(src(i))) = dst(i); fill(src(i)) += 1; i += 1 }

    val UNVISITED = -1
    val index = Array.fill(n)(UNVISITED)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val sccStack = new Array[Int](n); var sp = 0
    val workV = new Array[Int](n); val workE = new Array[Int](n); var wp = 0
    val label = new Array[Long](n)
    var counter = 0

    def push(v: Int): Unit = {
      workV(wp) = v; workE(wp) = off(v); wp += 1
      index(v) = counter; low(v) = counter; counter += 1
      sccStack(sp) = v; sp += 1; onStack(v) = true
    }

    var start = 0
    while (start < n) {
      if (index(start) == UNVISITED) {
        push(start)
        while (wp > 0) {
          val v = workV(wp - 1)
          if (workE(wp - 1) < off(v + 1)) {
            val w = adj(workE(wp - 1)); workE(wp - 1) += 1
            if (index(w) == UNVISITED) push(w)
            else if (onStack(w) && index(w) < low(v)) low(v) = index(w)
          } else {
            wp -= 1
            if (wp > 0) {
              val p = workV(wp - 1)
              if (low(v) < low(p)) low(p) = low(v)
            }
            if (low(v) == index(v)) {
              var boundary = sp - 1
              while (sccStack(boundary) != v) boundary -= 1
              var maxId = Long.MinValue
              var j = boundary
              while (j < sp) {
                if (ids(sccStack(j)) > maxId) maxId = ids(sccStack(j)); j += 1
              }
              j = boundary
              while (j < sp) {
                label(sccStack(j)) = maxId; onStack(sccStack(j)) = false
                j += 1
              }
              sp = boundary
            }
          }
        }
      }
      start += 1
    }
    label
  }
}
