package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid, TPAMI 2011) — the
  * compression leg of the IVF family [[KMeans.ivfSearch]] already covers
  * the pruning leg of: split the d-dim embedding into `m` subspaces of
  * d/m dims, train an independent `ks`-centroid codebook per subspace
  * (grid-exact Lloyd, the [[KMeans]] discipline), store each vector as m
  * small codes, and answer queries by asymmetric distance computation
  * (ADC): per query, one m×ks table of exact subspace distances, then
  * every stored vector scores as the sum of m table lookups. At scale
  * the scan reads m bytes per vector instead of d floats — the classic
  * 32× memory/bandwidth compression — and the whole scan stays a
  * broadcast-join + sum aggregate, no N×N anything.
  *
  * Everything inherits the integer-grid exactness: subvectors are
  * quantized longs, codebook training is the same assign/floorDiv-update
  * loop as [[KMeans.lloyd]] (run JOINTLY over all m subspaces in one
  * dataflow — `sub` rides every key), distances are exact integer sums,
  * ties break toward the smaller cid/vec_id. The DuckDB oracle replays
  * training, encoding, and ADC bit for bit.
  *
  * Training cost shape: the assignment stream is N·m·ks narrow rows
  * (vec_id, sub, cid, d2) against a BROADCAST m·ks-row codebook —
  * map-side-combinable min(struct(d2, cid)), one shuffle of N·m rows per
  * iteration; the update shuffles m·ks·(d/m) = ks·d rows. ADC scoring
  * joins the m·ks-row distance-table broadcast to the code table and
  * sums m rows per (query, vector) — the scan IS the top-k candidate
  * stream, which is the point of PQ (compressed exhaustive, no recall
  * cliff from pruning; compose with IVF cells when N demands it).
  */
object Pq {

  /** A pre-quantized long-array column cut into m slices: a (pos, slice)
    * generator column — select it with `.as(Seq("sub", "sqv"))`. Shared by
    * the raw-vector and residual-vector subspace streams.
    */
  private def slices(vec: Column, m: Int): Column = {
    val dm = (size(vec) / m).cast("int")
    posexplode(transform(sequence(lit(0), lit(m - 1)),
      s => slice(vec, s * dm + 1, dm)))
  }

  /** Quantized subvectors (vec_id, sub, sqv): the d-dim grid vector cut
    * into m arrays of d/m longs.
    */
  def subvectors(emb: DataFrame, scale: Int, m: Int): DataFrame =
    emb.select(col("vec_id"),
      slices(KMeans.quantize(col("embedding"), scale), m).as(Seq("sub", "sqv")))

  /** Per-subspace seed codebooks: cid 0..ks-1 = the ks lowest vec_ids'
    * subvectors (the [[KMeans.seedCentroids]] convention, per sub).
    */
  def seedCodebooks(sv: DataFrame, ks: Int): DataFrame = {
    val seeds = sv.select(col("vec_id")).distinct()
      .orderBy("vec_id").limit(ks)
      .select(col("vec_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("vec_id")) - 1).as("cid"))
    sv.join(broadcast(seeds), "vec_id")
      .select(col("sub"), col("cid"), col("sqv").as("scv"))
  }

  /** Nearest codebook entry per (vector, subspace): (vec_id, sub, cid,
    * d2), ties toward the smaller cid.
    *
    * Round 6 (guide step 4; the KMeans.assignTo precedent): previously a
    * broadcast join materializing N·m·ks rows through the interpreted
    * (CodegenFallback) `KMeans.dist2` fold + a min(struct) aggregate; now
    * a primitive-array partition scan over the broadcast codebooks —
    * zero extra rows, unboxed long arithmetic. Exact-integer d2 with the
    * identical (x−y)² left-to-right summation (Long wrap included) and an
    * ascending-cid scan keeping the first minimum = the min(struct(d2,
    * cid)) tie-break, so codes are identical by construction. Subspaces
    * with no codebook entries emit nothing, like the inner join.
    */
  def assign(sv: DataFrame, cb: DataFrame): DataFrame = {
    val spark = sv.sparkSession
    import spark.implicits._
    val cbRows = cb.select(col("sub"), col("cid"), col("scv"))
      .as[(Int, Int, Array[Long])].collect()
    val maxSub = if (cbRows.isEmpty) -1 else cbRows.iterator.map(_._1).max
    val bySub: Array[Array[(Int, Array[Long])]] =
      Array.tabulate(maxSub + 1) { s =>
        cbRows.filter(_._1 == s).sortBy(_._2).map(t => (t._2, t._3))
      }
    val bc = spark.sparkContext.broadcast(bySub)
    sv.select(col("vec_id"), col("sub"), col("sqv"))
      .as[(Long, Int, Array[Long])]
      .mapPartitions { it =>
        val cbs = bc.value
        it.flatMap { case (id, sub, v) =>
          val entries =
            if (sub >= 0 && sub < cbs.length) cbs(sub)
            else Array.empty[(Int, Array[Long])]
          if (entries.isEmpty) Iterator.empty
          else {
            var bestD = 0L
            var bestC = 0
            var first = true
            var i = 0
            while (i < entries.length) {
              val w = entries(i)._2
              var d = 0L
              var j = 0
              while (j < v.length) { val x = v(j) - w(j); d += x * x; j += 1 }
              if (first || d < bestD) {
                bestD = d; bestC = entries(i)._1; first = false
              }
              i += 1
            }
            Iterator.single((id, sub, bestC, bestD))
          }
        }
      }.toDF("vec_id", "sub", "cid", "d2")
  }

  /** One joint Lloyd step over all m codebooks: assign, then exact
    * per-coordinate floorDiv means per (sub, cid, spos). Empty entries
    * drop (the [[KMeans.lloydStep]] convention).
    */
  def step(sv: DataFrame, cb: DataFrame): DataFrame =
    assign(sv, cb)
      .join(sv, Seq("vec_id", "sub"))
      .select(col("sub"), col("cid"),
        posexplode(col("sqv")).as(Seq("spos", "v")))
      .groupBy("sub", "cid", "spos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .withColumn("v",
        ((col("s") - pmod(col("s"), col("n"))) / col("n")).cast("long"))
      .groupBy("sub", "cid")
      .agg(transform(sort_array(collect_list(struct(col("spos"), col("v")))),
        s => s.getField("v")).as("scv"))

  /** Train `iters` joint Lloyd iterations; returns (sub, cid, scv). */
  def trainCodebooks(sv: DataFrame, ks: Int, iters: Int): DataFrame = {
    var cb = seedCodebooks(sv, ks).localCheckpoint(true)
    for (_ <- 1 to iters) cb = step(sv, cb).localCheckpoint(true)
    cb
  }

  /** PQ codes (vec_id, sub, code) under trained codebooks. */
  def encode(sv: DataFrame, cb: DataFrame): DataFrame =
    assign(sv, cb).select(col("vec_id"), col("sub"), col("cid").as("code"))

  /** ADC top-k: every query scores every encoded vector as
    * Σ_sub d2(query subvector, codebook[code]) — exact integer sums over
    * the broadcast per-query distance tables. Output (query_id, rank,
    * vec_id, adist2), rank 1..k by (adist2, vec_id).
    */
  def adcTopK(emb: DataFrame, queries: DataFrame, scale: Int, m: Int,
      ks: Int, iters: Int, k: Int): DataFrame = {
    val sv = subvectors(emb, scale, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = trainCodebooks(sv, ks, iters)
    val codes = encode(sv, cb)
    val qsv = subvectors(queries.select(col("vec_id"), col("embedding")),
      scale, m)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sqv").as("qsv"))
    // per-query subspace distance table: |Q|·m·ks rows, broadcastable
    val table = qsv.join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        KMeans.dist2(col("qsv"), col("scv")).as("pd2"))
    val scored = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist2"), col("vec_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("adist2"))
    sv.unpersist(false)
    out
  }

  /** EXACT grid-L2 top-k per query over the quantized corpus —
    * (query_id, vec_id), rank by (d2, vec_id), self-matches included
    * (mirroring the ADC scans, which score the query's own row too).
    * Shared baseline of [[adcRecall]] and [[ivfAdcRecall]] (ADVICE r5:
    * the two previously duplicated this scaffolding verbatim).
    *
    * Round 6: a primitive partition scan with an exact per-partition
    * top-k heap per query replaces the N·|Q| crossJoin through the
    * interpreted dist2 fold; integer d2 with the identical summation
    * order, heap order = the window's own (d2 ASC, vec_id ASC), global
    * top-k ⊆ union of partition top-ks ⇒ identical rows.
    */
  private def gridExactTopK(qv: DataFrame, qq: DataFrame, k: Int): DataFrame = {
    val spark = qv.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Long])] =
      qq.as[(Long, Array[Long])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qArr)
    val pruned = qv.as[(Long, Array[Long])]
      .mapPartitions { it =>
        val qs = bc.value
        if (qs.isEmpty) Iterator.empty
        else {
          // heap root = current WORST kept candidate (larger d2, then
          // larger vec_id) under the final window's total order
          val worstOnTop: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
            def compare(a: (Long, Long), b: (Long, Long)): Int = {
              val c = java.lang.Long.compare(a._1, b._1)
              if (c != 0) c else java.lang.Long.compare(a._2, b._2)
            }
          }
          val heaps = Array.fill(qs.length)(
            new scala.collection.mutable.PriorityQueue[(Long, Long)]()(worstOnTop))
          it.foreach { case (id, v) =>
            var i = 0
            while (i < qs.length) {
              val w = qs(i)._2
              var d = 0L
              var j = 0
              while (j < v.length) { val x = v(j) - w(j); d += x * x; j += 1 }
              val h = heaps(i)
              if (h.size < k) h.enqueue((d, id))
              else if (worstOnTop.compare((d, id), h.head) < 0) {
                h.dequeue(); h.enqueue((d, id))
              }
              i += 1
            }
          }
          qs.iterator.zipWithIndex.flatMap { case ((qid, _), i) =>
            heaps(i).iterator.map { case (d, id) => (qid, id, d) }
          }
        }
      }.toDF("query_id", "vec_id", "d2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("vec_id"))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
  }

  /** Recall@k of the ADC ranking against the EXACT grid-L2 top-k on the
    * full vectors: (query_id, hits) with hits = |ADC top-k ∩ exact
    * top-k| ∈ 0..k — the driver-visible pruning-quality gate the
    * LSH/IVF paths already have.
    */
  def adcRecall(emb: DataFrame, queries: DataFrame, scale: Int, m: Int,
      ks: Int, iters: Int, k: Int): DataFrame = {
    val approx = adcTopK(emb, queries, scale, m, ks, iters, k)
    val qv = emb.select(col("vec_id"),
      KMeans.quantize(col("embedding"), scale).as("qv"))
    val qq = queries.select(col("vec_id").as("query_id"),
      KMeans.quantize(col("embedding"), scale).as("qqv"))
    val exact = gridExactTopK(qv, qq, k)
    qq.select("query_id")
      .join(approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("h")),
        Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("h"), lit(0L)).as("hits"))
  }

  /** IVF-ADC (Jégou et al. TPAMI'11 §V, the FAISS `IVFADC` recipe): the
    * composition of the ANN family's pruning leg ([[KMeans.ivfSearch]]'s
    * trained coarse cells) with its compression leg (PQ codes) — the
    * standard billion-scale shape, where neither alone survives: flat IVF
    * still reads d floats per probed vector, exhaustive PQ still reads
    * every vector. Coarse cells come from grid-exact Lloyd; PQ codebooks
    * are trained on the RESIDUALS qv − centroid(cell) (exact integer
    * subtraction on the grid, so the entire chain stays bit-reproducible
    * and the DuckDB oracle replays it); a query probes its `nprobe`
    * nearest cells and scores ONLY their members, each against the
    * per-(query, probed-cell) residual distance table — the residual
    * depends on which cell is probed, which is why the table carries
    * `cell` (the classic IVFADC detail).
    *
    * Scale shape: centroids (C rows), codebooks (m·ks rows), and the
    * per-query tables (|Q|·nprobe·m·ks rows) are all broadcasts; the
    * corpus-sized streams are the one-off training/encode passes (N·m
    * narrow rows) and the probed scan of N·nprobe/C members × m code
    * lookups — m bytes read per candidate instead of d floats.
    * Output (query_id, rank, vec_id, adist2), rank 1..k by
    * (adist2, vec_id); queries score themselves like [[adcTopK]].
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int, cellIters: Int, m: Int, ks: Int, pqIters: Int,
      nprobe: Int, scale: Int = 1000): DataFrame = {
    val q = corpus.select(col("vec_id"),
        KMeans.quantize(col("embedding"), scale).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = KMeans.centroidsOf(q, cells, cellIters) // (cid, cv) broadcast
    // residual stream: every vector shifted by its own cell's centroid
    val res = KMeans.assignTo(q, cents)
      .select(col("vec_id"), col("qv"), col("cid").as("cell"))
      .join(broadcast(cents.select(col("cid").as("cell"), col("cv"))), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("qv"), col("cv"), (x, y) => x - y).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sv = res.select(col("vec_id"), slices(col("rv"), m).as(Seq("sub", "sqv")))
    val cb = trainCodebooks(sv, ks, pqIters)
    val codes = encode(sv, cb)
      .join(res.select(col("vec_id"), col("cell")), "vec_id")
    // query side: probe the nprobe nearest cells, residual PER PROBED CELL
    val qs = queries.select(col("vec_id").as("query_id"),
      KMeans.quantize(col("embedding"), scale).as("quv"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("cell"))
    val probes = qs.crossJoin(broadcast(cents))
      .select(col("query_id"), col("quv"), col("cid").as("cell"), col("cv"),
        KMeans.dist2(col("quv"), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= nprobe)
    val qsv = probes.select(col("query_id"), col("cell"),
      slices(zip_with(col("quv"), col("cv"), (x, y) => x - y), m)
        .as(Seq("sub", "qsv")))
    val table = qsv.join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("cell"), col("sub"),
        col("cid").as("code"), KMeans.dist2(col("qsv"), col("scv")).as("pd2"))
    val scored = codes.join(broadcast(table), Seq("cell", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist2"), col("vec_id"))
    val out = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("adist2"))
      .localCheckpoint(true) // eager before the caches drop ([[KMeans.lloyd]])
    res.unpersist(false)
    q.unpersist(false)
    out
  }

  /** Recall@k of [[ivfAdcTopK]] against the exact grid-L2 top-k — the
    * quality gate every approximate path here carries (LSH, trained IVF,
    * exhaustive PQ); this one compounds cell-pruning loss with code-
    * quantization loss, so it is the honest number for the composed path.
    */
  def ivfAdcRecall(emb: DataFrame, queries: DataFrame, k: Int,
      cells: Int, cellIters: Int, m: Int, ks: Int, pqIters: Int,
      nprobe: Int, scale: Int = 1000): DataFrame = {
    val approx = ivfAdcTopK(emb, queries, k, cells, cellIters, m, ks,
      pqIters, nprobe, scale)
    val qv = emb.select(col("vec_id"),
      KMeans.quantize(col("embedding"), scale).as("qv"))
    val qq = queries.select(col("vec_id").as("query_id"),
      KMeans.quantize(col("embedding"), scale).as("qqv"))
    val exact = gridExactTopK(qv, qq, k)
    qq.select("query_id")
      .join(approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("h")),
        Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("h"), lit(0L)).as("hits"))
  }
}
