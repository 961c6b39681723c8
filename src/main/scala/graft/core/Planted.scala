package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted-structure graphs for hard-oracle verification of the
  * algorithms whose outputs SQL cannot recompute independently (SCC, MSF).
  * Both generators are pure column expressions over `spark.range` — fully
  * distributed, no driver state, same rows at any parallelism — and are
  * persisted as parquet fixtures so the DuckDB oracle reads identical bytes.
  *
  * The *expected result* of each graph is known by construction and is
  * expressible in plain arithmetic SQL, so the oracle verifies the real
  * algorithm run (if Boruvka/coloring were wrong, the hash compare fails).
  */
object Planted {

  /** SCC test graph: clusters of strongly-connected vertices (directed cycle
    * + chord) joined by an intra-block DAG whose order is *permuted* relative
    * to vertex ids (so the coloring algorithm needs several peel rounds —
    * with id-ordered DAG edges every SCC would be a root in round 1).
    *
    * Layout: cluster c occupies ids [c*8, c*8 + sz(c)) with sz(c) = 1+(c%7)
    * (sizes 1..7, singletons included). DAG edges within blocks of 4
    * clusters follow the permutation k -> (3k) mod 4.
    *
    * Expected SCC label (max member id, the coloring root):
    *   scc(id) = (id/8)*8 + ((id/8) % 7)
    */
  def sccGraph(spark: SparkSession, nClusters: Int = 240): DataFrame = {
    require(nClusters % 4 == 0)
    val c = col("id")
    val sz = (c % 7) + 1
    val base = c * 8
    val clusters = spark.range(0, nClusters, 1, 8)
    val cycle = clusters.filter(sz >= 2)
      .select(base.as("b"), sz.as("s"),
        explode(sequence(lit(0L), sz - 1)).as("j"))
      .select((col("b") + col("j")).as("src"),
        (col("b") + (col("j") + 1) % col("s")).as("dst"))
    val chord = clusters.filter(sz >= 4)
      .select(base.as("src"), (base + 2).as("dst"))
    val dag = spark.range(0, nClusters / 4, 1, 8).select(col("id").as("bk"))
      .select(col("bk"), explode(sequence(lit(0L), lit(2L))).as("k"))
      .select((col("bk") * 4 + (col("k") * 3) % 4).as("sc"),
        (col("bk") * 4 + (col("k") * 3 + 3) % 4).as("dc"))
      .select((col("sc") * 8 + col("sc") % 7).as("src"), // max vertex of sc
        (col("dc") * 8).as("dst"))
    cycle.unionAll(chord).unionAll(dag)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), lit(1.0).as("weight"))
  }

  /** MSF test graph: a spanning tree with distinct weights < 1 plus random
    * extra edges with distinct weights >= 2. Every non-tree edge is the
    * strict maximum of its cycle, so the unique minimum spanning forest is
    * exactly the planted tree — the oracle is `WHERE weight < 1`.
    */
  def msfGraph(spark: SparkSession, n: Long = 4000L,
      extras: Long = 12000L): DataFrame = {
    val tree = spark.range(1, n, 1, 8).select(
      col("id").as("src"),
      (col("id") - 1 -
        pmod(xxhash64(lit("t"), col("id")), least(col("id"), lit(50L))))
        .as("dst"),
      (lit(1e-4) + col("id").cast("double") * 1e-7).as("weight"))
    val extra = spark.range(0, extras, 1, 8).select(
      pmod(xxhash64(lit("u"), col("id")), lit(n)).as("src"),
      pmod(xxhash64(lit("v"), col("id")), lit(n)).as("dst"),
      (lit(2.0) + col("id").cast("double") * 1e-6).as("weight"))
      .filter(col("src") =!= col("dst"))
    tree.unionAll(extra)
  }

  /** Planted co-EM bipartite graph (mirrors the NP×context shape of
    * /root/reference/toolkits/text_analysis/coem.cpp): two disjoint topic
    * blocks, each with 50 noun phrases (ids 0..49 / 50..99), 25 contexts
    * (100..124 / 125..149) and a per-block hub context (124 / 149) touching
    * every block NP, so any seed reaches the whole block in ≤ 4 rounds.
    * One bridge context (150) co-occurs with both seed NPs — weight 3 to
    * NP 0, weight 1 to NP 50, so block A's label wins it outright.
    * Co-occurrence weights 1 + (np % 3); edges are emitted symmetrized
    * (co-occurrence is undirected, coem.cpp walks both edge directions).
    *
    * Expected hard label with seeds {0→1, 50→2}:
    *   label(id) = 1 for id < 50, 100 ≤ id < 125, id = 150; else 2.
    */
  def coemGraph(spark: SparkSession): DataFrame = {
    val np = spark.range(0, 100, 1, 8)
    val block = (col("id") / 50).cast("long")        // 0 or 1
    val w = (col("id") % 3 + 1).cast("double")
    // each NP hits two block contexts (cycle position + successor) + hub
    val c1 = lit(100) + block * 25 + col("id") % 25
    val c2 = lit(100) + block * 25 + (col("id") + 1) % 25
    val hub = lit(124) + block * 25
    val fwd = np.select(col("id").as("src"), c1.as("dst"), w.as("weight"))
      .unionAll(np.select(col("id").as("src"), c2.as("dst"), w.as("weight")))
      .unionAll(np.select(col("id").as("src"), hub.as("dst"),
        lit(1.0).as("weight")))
      .unionAll(spark.range(1).select(lit(0L).as("src"), lit(150L).as("dst"),
        lit(3.0).as("weight")))
      .unionAll(spark.range(1).select(lit(50L).as("src"), lit(150L).as("dst"),
        lit(1.0).as("weight")))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst"),
      col("weight")))
  }

  /** Planted linearly-separable click design for AdPredictor: 200 samples,
    * y = +1 for id < 100 else −1; class features 0..9 (positive-only) and
    * 10..19 (negative-only), two per sample, plus one of 5 noise features
    * (20..24) appearing in mirror-symmetric positive/negative pairs so its
    * aggregate weight update cancels exactly. Expected prediction after any
    * number of BSP sweeps ≥ 1: sign(Σμ) = y for every sample.
    */
  def clickDesign(spark: SparkSession): (DataFrame, DataFrame) = {
    val s = spark.range(0, 200, 1, 8)
    val samples = s.select(col("id").as("sample"),
      when(col("id") < 100, 1).otherwise(-1).as("y"))
    val cls = when(col("id") < 100, lit(0L)).otherwise(lit(10L))
    val edges = s.select(col("id").as("sample"),
        (cls + col("id") % 10).as("feature"))
      .unionAll(s.select(col("id").as("sample"),
        (cls + (col("id") + 3) % 10).as("feature")))
      .unionAll(s.select(col("id").as("sample"),
        (lit(20L) + col("id") % 5).as("feature")))
    (samples, edges)
  }

  /** Planted non-additive block ratings for SVD++: 40 users × 40 items in
    * 2×2 groups with means [[4,2],[2,4]] — the interaction term defeats a
    * bias-only fit, so recovery requires the factor (and implicit-factor)
    * machinery. Expected per-block mean prediction = the planted mean.
    */
  def blockRatings(spark: SparkSession): DataFrame =
    spark.range(0, 1600, 1, 8).select(
      (col("id") / 40).cast("long").as("user"),
      (col("id") % 40).as("item"))
      .select(col("user"), col("item"),
        when((col("user") / 20).cast("long") ===
            (col("item") / 20).cast("long"), 4.0d)
          .otherwise(2.0d).as("rating"))

  /** Planted TEMPORAL block ratings for timeSVD++ verification: the static
    * block means of [[blockRatings]] (4 within-group, 2 across) plus a
    * user-group-ANTISYMMETRIC time drift — group-0 users rate −1 at bucket
    * 0 and +1 at bucket 1, group-1 users the opposite. The drift's global
    * mean is ZERO at every bucket, so a time bias alone cannot fit it (and
    * a static model's best MAE on the drift part is exactly 1): recovering
    * the per-(user-group, item-group, bucket) means requires the user×time
    * interaction terms. Every (user, item) pair is rated at BOTH buckets.
    * Output: (user, item, t, rating), ratings ∈ {1, 3, 5}.
    */
  def temporalRatings(spark: SparkSession): DataFrame =
    spark.range(0, 3200, 1, 8).select(
      ((col("id") / 2) / 40).cast("long").as("user"),
      ((col("id") / 2) % 40).cast("long").as("item"),
      (col("id") % 2).cast("long").as("t"))
      .select(col("user"), col("item"), col("t"),
        (when((col("user") / 20).cast("long") ===
            (col("item") / 20).cast("long"), lit(4.0)).otherwise(lit(2.0))
          + when(col("user") < 20,
              col("t").cast("double") * 2.0 - 1.0)
            .otherwise(lit(1.0) - col("t").cast("double") * 2.0))
          .as("rating"))

  /** Planted low-rank matrix for SVD verification: `nBlocks` rank-1 blocks
    * with disjoint row AND column supports, so the full matrix's singular
    * values are exactly the per-block Frobenius norms
    * (block g = w_g·u·vᵀ ⇒ σ_g = ‖w_g·u·vᵀ‖_F = w_g‖u‖‖v‖) — an oracle can
    * recompute every σ with SUM(value²) per block, no linear algebra.
    * Block scalars w_g = nBlocks − g keep the spectrum well-separated.
    *
    * Output: (i, j, value) sparse entries; block g covers rows
    * [g·rows, (g+1)·rows) and cols [g·cols, (g+1)·cols).
    */
  def lowRankMatrix(spark: SparkSession, nBlocks: Int = 8, rows: Int = 50,
      cols: Int = 20): DataFrame = {
    val rc = (rows * cols).toLong
    spark.range(0, nBlocks * rc, 1, 8)
      .select((col("id") / rc).cast("long").as("g"),
        ((col("id") % rc) / cols).cast("long").as("ri"),
        (col("id") % cols).as("cj"))
      .select(
        (col("g") * rows + col("ri")).as("i"),
        (col("g") * cols + col("cj")).as("j"),
        ((lit(nBlocks) - col("g")).cast("double") *
          (lit(1.0) + (col("g") * rows + col("ri")) % 3) *
          (lit(1.0) + (col("g") * cols + col("cj")) % 2)).as("value"))
  }

  /** Deterministic factor tables for the rating.cpp serving test, LONG
    * format (side 'u'|'v', id, pos, val) so the DuckDB oracle can take the
    * factor dot product as a plain equi-join + SUM. Every value is a DYADIC
    * rational (denominators 4 and 8), so dot products are computed exactly
    * in IEEE double — identical across engines and summation orders, and
    * the q6 quantization in the gate query can never straddle a rounding
    * boundary. `nUsers`×`nItems` with rank `d`; the "already rated"
    * exclusion set is arithmetic — (user·3 + item) % 7 == 0 — recomputed
    * identically by both engines rather than persisted.
    */
  def cfFactors(spark: SparkSession, nUsers: Int = 60, nItems: Int = 200,
      d: Int = 6): DataFrame = {
    def side(tag: String, n: Int, formula: org.apache.spark.sql.Column) =
      spark.range(0, n.toLong * d, 1, 4)
        .select((col("id") / d).cast("long").as("id"),
          (col("id") % d).cast("int").as("pos"))
        .select(lit(tag).as("side"), col("id"), col("pos"),
          formula.as("val"))
    side("u", nUsers,
      (((col("id") * 7 + col("pos") * 13) % 19 - 9)).cast("double") / 4.0d)
      .unionAll(side("v", nItems,
        (((col("id") * 5 + col("pos") * 11) % 17 - 8)).cast("double") / 8.0d))
  }

  /** Long→wide reshape of one [[cfFactors]] side: (id, features[d]) — the
    * ONE decoding of the fixture layout, shared by the `cf_rating_topk`
    * gate query and CfSpec so the two can't silently diverge.
    */
  def cfFactorsWide(f: DataFrame, tag: String): DataFrame =
    f.filter(col("side") === tag)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("val"))))
        .as("ps"))
      .select(col("id"), transform(col("ps"), p => p("val")).as("features"))

  /** Ring of cliques — modularity clustering's textbook planted partition
    * (Fortunato 2010 §C): `nCliques` cliques of size `s` (clique g owns ids
    * [g·s, (g+1)·s)), closed into a ring by single edges from each clique's
    * max vertex to the next clique's min. Local-moving modularity recovers
    * exactly the cliques, so the expected community of vertex v is the
    * closed form (v / s) · s (its clique's min member). Unit weight edges,
    * each undirected edge emitted once.
    */
  def ringOfCliques(spark: SparkSession, nCliques: Int = 24,
      s: Int = 5): DataFrame = {
    val cliqueEdges = spark.range(0, nCliques.toLong, 1, 8)
      .select(col("id").as("g"),
        explode(sequence(lit(0L), lit(s - 1L))).as("i"))
      .select(col("g"), col("i"),
        explode(sequence(lit(0L), lit(s - 1L))).as("j"))
      .filter(col("i") < col("j"))
      .select((col("g") * s + col("i")).as("src"),
        (col("g") * s + col("j")).as("dst"))
    val ringEdges = spark.range(0, nCliques.toLong, 1, 8)
      .select((col("id") * s + (s - 1)).as("src"),
        (((col("id") + 1) % nCliques) * s).as("dst"))
    cliqueEdges.unionAll(ringEdges)
      .select(col("src"), col("dst"), lit(1L).as("w"))
  }

  /** Hierarchical planted partition for multi-level Louvain: `2·nPairs`
    * cliques of size `s` in a ring, where cliques 2i and 2i+1 are tied by
    * ONE bridge of weight `wBridge` and consecutive pairs by one unit
    * ring edge. Sizing (defaults s=6, wBridge=3, nPairs=12, γ=1,
    * integer-exact): a single bridge endpoint moving across gains
    * 2m(wBridge − (s−1)) − k² < 0, so LEVEL 1 recovers exactly the cliques
    * ((v/s)·s); contracted, a whole clique (k = s(s−1)+wBridge+1 = 34,
    * 2m = 816) gains 816·3 − 34² > 0 into its bridge partner but
    * 816·1 − 34² < 0 into its ring neighbor, so LEVEL 2 merges exactly
    * the pairs; merged pairs (k = 68) gain 816 − 68² < 0, so level 3 is
    * the fixpoint. Expected final community: (v / 2s) · 2s.
    */
  def pairedCliques(spark: SparkSession, nPairs: Int = 12, s: Int = 6,
      wBridge: Long = 3L): DataFrame = {
    val nCliques = 2 * nPairs
    val cliqueEdges = spark.range(0, nCliques.toLong, 1, 8)
      .select(col("id").as("g"),
        explode(sequence(lit(0L), lit(s - 1L))).as("i"))
      .select(col("g"), col("i"),
        explode(sequence(lit(0L), lit(s - 1L))).as("j"))
      .filter(col("i") < col("j"))
      .select((col("g") * s + col("i")).as("src"),
        (col("g") * s + col("j")).as("dst"), lit(1L).as("w"))
    // pair bridge: min member of clique 2i — min member of clique 2i+1
    val bridges = spark.range(0, nPairs.toLong, 1, 8)
      .select((col("id") * 2 * s).as("src"),
        ((col("id") * 2 + 1) * s).as("dst"), lit(wBridge).as("w"))
    // ring: second member of clique 2i+1 — second member of clique 2i+2
    val ringEdges = spark.range(0, nPairs.toLong, 1, 8)
      .select(((col("id") * 2 + 1) * s + 1).as("src"),
        ((((col("id") + 1) % nPairs) * 2 * s) + 1).as("dst"),
        lit(1L).as("w"))
    cliqueEdges.unionAll(bridges).unionAll(ringEdges)
  }

  /** Two-domain document corpus for the trainable quality/domain
    * classifier: doc i has label +1 (even i) or −1 (odd i) and `nSlots`
    * whitespace tokens — 70% drawn from a 50-word shared vocabulary
    * (`c0..c49`), 30% from a 20-word label-specific vocabulary
    * (`p0..p19` for +1, `n0..n19` for −1). Token choices come from the
    * Lehmer hash of (doc, slot), so generation is a pure column
    * expression over `spark.range` — distributed, partitioning-
    * independent — and the persisted fixture is byte-identical for the
    * DuckDB oracle. The domains are linearly separable in bag-of-words
    * space by construction (the p/n vocabularies are disjoint), so a
    * sound classifier must reach ~perfect held-out accuracy.
    */
  def twoDomainDocs(spark: SparkSession, nDocs: Int = 600,
      nSlots: Int = 40): DataFrame = {
    import graft.algos.GraphOps.lehmerHash
    spark.range(0, nDocs.toLong, 1, 8)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, 1L).otherwise(-1L).as("label"))
      .select(col("doc_id"), col("label"),
        concat_ws(" ", transform(sequence(lit(0L), lit(nSlots - 1L)), { j =>
          val r = lehmerHash(col("doc_id"), j, 7L)
          when(r % 10 < 7, concat(lit("c"), (r % 50).cast("string")))
            .otherwise(concat(
              when(col("label") > 0, lit("p")).otherwise(lit("n")),
              (r % 20).cast("string")))
        })).as("text"))
  }
}
