package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a signed-random-
  * projection (SRP) LSH-bucketed variant as the scale path. Dot products are
  * `zip_with`/`aggregate` column expressions (codegen'd, no UDFs).
  *
  * Scale notes: brute force is a broadcast of the (small) query set against
  * the corpus — linear scan, embarrassingly parallel, the right baseline up
  * to ~10^9 vectors × few queries. The SRP variant buckets the corpus once
  * (16-bit signature → 65k buckets) and probes only matching buckets
  * (optionally Hamming-1 neighbors), turning per-query cost from O(N) into
  * O(N / 2^bits × probes) at recall governed by the bit count.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a column expression over two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Deterministic ±1 hyperplanes: `bits` planes × `dim` components, keyed
    * by a namespace tag. Component sign = top bit of md5("srp:tag:b:d") —
    * uniform, decorrelated, and recomputable by the DuckDB oracle
    * (substr(md5(...),1,1) IN ('8'..'f')).
    */
  def hyperplanes(bits: Int, dim: Int, tag: String): Array[Array[Double]] = {
    Array.tabulate(bits, dim) { (b, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"srp:$tag:$b:$d".getBytes("UTF-8"))
      if ((hx(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** SRP-LSH bucket id per vector: bit i = [dot(v, plane_i) > 0]. */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Exact cosine top-k of each query vector against the corpus.
    * (query_id, vec_id, cos_q6, rank) — ties broken by vec_id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val sims = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("cos_q6"), col("rank"))
  }

  /** Multi-table SRP-LSH approximate top-k: `tables` independent hash
    * tables of `bits` hyperplanes each; candidates = vectors sharing any
    * table bucket with the query, exact-reranked by cosine. Recall/cost is
    * tuned by (bits, tables): fewer bits or more tables → higher recall,
    * more candidates (this is the IVF-style "probe a few cells" scale path:
    * per-query cost O(tables × N / 2^bits) instead of O(N)).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 6, tables: Int = 12,
      dim: Int = 64): DataFrame = {
    val planeSets = (0 until tables)
      .map(t => hyperplanes(bits, dim, t.toString))
    def bucketed(df: DataFrame, idCol: String, vecCol: String) =
      df.select(col(idCol), col(vecCol),
        explode(array(planeSets.zipWithIndex.map { case (p, t) =>
          struct(lit(t).as("t"), srpBucket(col(vecCol), p).as("b"))
        }: _*)).as("tb"))
        .select(col(idCol), col("tb.t").as("t"), col("tb.b").as("b"))
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val cand = bucketed(c, "vec_id", "cv")
      .join(bucketed(q, "query_id", "qv"), Seq("t", "b"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
      .join(c, "vec_id").join(q, "query_id")
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("cos_q6"), col("rank"))
  }

  /** IVF-flat approximate top-k — the inverted-file scale path: coarse
    * cells are a deterministic corpus sample (every `centEvery`-th vec_id,
    * playing the role of trained coarse centroids — k-means training would
    * not be cross-engine reproducible, and for top-k probing only cell
    * GEOMETRY matters, not centroid optimality); every vector is assigned
    * to its nearest cell by L2, a query probes the `nprobe` nearest cells
    * and exactly reranks only their members.
    *
    * Scale shape: the centroid table is a FIXED-size broadcast (cell count
    * does not grow with N in a real deployment), so assignment is one
    * broadcast-join + map-side-combinable `min_by` per vector — O(N·C) work,
    * zero N×C shuffle rows; per-query probe cost is O(C + N·nprobe/C)
    * instead of O(N).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centEvery: Int = 50, nprobe: Int = 3): DataFrame = {
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val cents = corpus.filter(col("vec_id") % centEvery === 0)
      .select(col("vec_id").as("cent_id"),
        col("embedding").cast("array<double>").as("w"))
      .withColumn("wn2",
        aggregate(col("w"), lit(0.0), (acc, v) => acc + v * v))
    // argmin_cell ||v − w||² = argmin_cell (||w||² − 2·v·w); ties (exact
    // duplicate centroids) break toward the smaller cent_id, mirroring the
    // oracle's ORDER BY (d2, cent_id)
    def d2(vec: Column): Column = col("wn2") - lit(2.0) * dot(vec, col("w"))
    val assign = c.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"), d2(col("cv")).as("d2"))
      .groupBy("vec_id")
      .agg(min_by(col("cent_id"), struct(col("d2"), col("cent_id")))
        .as("cell"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val wp = Window.partitionBy("query_id").orderBy(col("d2"), col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id"), d2(col("qv")).as("d2"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val cand = probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
    val rer = cand.join(c, "vec_id").join(q, "query_id")
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    rer.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        floor(col("cos") * 1e6 + 0.5).cast("long").as("cos_q6"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, found via shared
    * SRP bucket (+ Hamming-1) then exact verification. (vec_a < vec_b.)
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      bits: Int = 12, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(bits, dim, "nd")
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("n", l2norm(col("v")))
      .withColumn("bucket0", srpBucket(col("v"), planes))
    // index each vector under its own bucket and all Hamming-1 buckets of
    // the *lower*-id side only (so each near pair meets at least once)
    val probed = c.select(col("vec_id"), col("v"), col("n"),
      explode(array(
        (col("bucket0") +: (0 until bits).map(i =>
          col("bucket0").bitwiseXOR(lit(1L << i)))): _*)).as("bucket"))
    val l = probed.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("n").as("na"), col("bucket"))
    val r = c.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("n").as("nb"), col("bucket0").as("bucket"))
    l.join(r, "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("vec_a", "vec_b")
      .agg(floor(max(col("cos")) * 1e6 + 0.5).cast("long").as("cos_q6"))
  }
}
