package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{LinkGraph, Tables}
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.text.{Decontaminate, Dedup, TextOps, TextStats}
import graft.vectors.Similarity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears here as a named
  * query over the sf-dir parquet tables, paired (where ANSI-SQL can express
  * it) with a DuckDB oracle in [[oracleSql]]. Graph queries run over the
  * canonical derived link graph ([[graft.core.LinkGraph]]) so the oracle can
  * derive the identical edge table in SQL.
  */
object SparkEntry {

  private val E = LinkGraph.edgesSql

  /** Shared oracle CTE: 3 unrolled min-dist BFS closures from the id%599
    * landmark set over the undirected view (b3 = (seed, id, dist) for every
    * vertex within 3 hops of a landmark) — feeds `neighborhood_function`
    * and `harmonic_centrality`.
    */
  private val LandmarkBfsCte: String = {
    val rounds = (1 to 3).map { k =>
      s"""b$k AS MATERIALIZED (
         |  SELECT seed, id, MIN(dist) AS dist FROM (
         |    SELECT seed, id, dist FROM b${k - 1}
         |    UNION ALL
         |    SELECT p.seed, u.dst AS id, p.dist + 1 AS dist
         |    FROM und u JOIN b${k - 1} p ON p.id = u.src)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |$E
       |),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
       |verts AS MATERIALIZED (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |b0 AS MATERIALIZED (
       |  SELECT id AS seed, id, 0 AS dist FROM verts WHERE id % 599 = 0),
       |$rounds""".stripMargin
  }

  /** Fixed iteration counts for the oracle-checkable unrolled variants. */
  val PrIters  = 20
  val CcIters  = 20 // must exceed the undirected graph diameter (tested)
  val LpaIters = 5
  val HitsIters = 8
  /** PPR seed set: three customers (present at every SF ≥ 0.001). */
  val PprSeeds = Seq(LinkGraph.CUST + 1L, LinkGraph.CUST + 2L,
    LinkGraph.CUST + 3L)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Top-20 PageRank vertices of the derived link graph" — the exact query
    * /root/reference/example_apps/pagerank.cpp:180-184 answers.
    */
  def entry(spark: SparkSession): DataFrame = {
    val edges = LinkGraph.edges(spark, "/root/testdata/sf0.001")
    PageRank.run(spark, edges, tol = 1e-6, maxIters = 100)
      .state.select(col("id"), col("rank"))
      .orderBy(desc("rank"), asc("id")).limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / aggregations over the raw tables -------------------------
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "topk_orders" -> ((s, dir) => {
      // top-k sink — reference get_top_vertices (toplist.hpp:71-159)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    }),

    // ---- link-graph derivation + degrees ----------------------------------
    "graph_edges" -> ((s, dir) =>
      LinkGraph.edges(s, dir).orderBy(col("src"), col("dst"))),
    "graph_degrees" -> ((s, dir) =>
      LinkGraph.degrees(LinkGraph.edges(s, dir)).orderBy(col("id"))),

    // ---- PageRank ----------------------------------------------------------
    "pagerank_iters" -> ((s, dir) => {
      // rank quantized to 1e-5 via floor(x*1e5+0.5): identical IEEE double
      // ops in Spark and DuckDB (decimal-rounding semantics differ between
      // the engines on half-boundary values).
      PageRank.fixedIterations(s, LinkGraph.edges(s, dir), PrIters)
        .select(col("id"),
          floor(col("rank") * 1e5 + 0.5).cast("long").as("rank_q5"))
        .orderBy(col("id"))
    }),
    "pagerank_converged" -> ((s, dir) => {
      // to 1e-6 convergence; the DuckDB oracle replicates the stopping rule
      // itself with a recursive CTE (PageRank.convergedOracleSql), so the
      // iteration count needn't be known in advance
      PageRank.run(s, LinkGraph.edges(s, dir), tol = 1e-6, maxIters = 200)
        .state.select(col("id"),
          floor(col("rank") * 1e8 + 0.5).cast("long").as("rank_q8"))
        .orderBy(col("id"))
    }),
    "ktruss" -> ((s, dir) => {
      // 4-truss (every edge in >= 2 triangles of the subgraph) via the
      // DECREMENTAL peel (count support once, subtract removed edges'
      // triangles per round — measured faster than the full recount at
      // 22 M edges, BENCH.md round-5): identical fixpoint to the recount
      // plan (MoreAlgosSpec pins equality; the unrolled oracle pins both)
      graft.algos.Truss.kTrussDecremental(s, LinkGraph.edges(s, dir), k = 4,
          maxRounds = 25)
        .orderBy(col("u"), col("v"))
    }),
    "hits" -> ((s, dir) => {
      // Kleinberg hubs/authorities, 8 iterations, L2-normalized each step;
      // unit-scale scores quantized at 1e-6 (float-sum noise ~1e-15)
      graft.algos.Hits.run(s, LinkGraph.edges(s, dir), HitsIters)
        .select(col("id"),
          floor(col("hub") * 1e6 + 0.5).cast("long").as("hub_q6"),
          floor(col("auth") * 1e6 + 0.5).cast("long").as("auth_q6"))
        .orderBy(col("id"))
    }),
    "pagerank_personalized" -> ((s, dir) => {
      // random-walk-with-restart proximity to a 3-customer seed set; ranks
      // are ≤ 0.15-scale (total mass ≤ 1), so q8 keeps the small-proximity
      // tail distinguishable while staying far above float-sum noise
      PageRank.personalizedFixed(s, LinkGraph.edges(s, dir), PprSeeds, PrIters)
        .select(col("id"),
          floor(col("rank") * 1e8 + 0.5).cast("long").as("rank_q8"))
        .orderBy(col("id"))
    }),
    "pagerank_top20" -> ((s, dir) => {
      PageRank.fixedIterations(s, LinkGraph.edges(s, dir), PrIters)
        .select(col("id"),
          floor(col("rank") * 1e5 + 0.5).cast("long").as("rank_q5"))
        .orderBy(desc("rank_q5"), asc("id")).limit(20)
    }),

    // ---- connected components ---------------------------------------------
    "connected_components" -> ((s, dir) => {
      ConnectedComponents.components(s, LinkGraph.edges(s, dir))
        .orderBy(col("id"))
    }),
    "component_sizes" -> ((s, dir) => {
      ConnectedComponents.componentSizes(
        ConnectedComponents.components(s, LinkGraph.edges(s, dir)))
    }),

    // ---- label propagation -------------------------------------------------
    "label_propagation" -> ((s, dir) => {
      LabelPropagation.run(s, LinkGraph.edges(s, dir), iters = LpaIters)
        .state.select(col("id"), col("label")).orderBy(col("id"))
    }),

    // ---- triangles ----------------------------------------------------------
    "triangle_total" -> ((s, dir) =>
      TriangleCount.total(s, LinkGraph.edges(s, dir))),
    "triangle_per_vertex" -> ((s, dir) =>
      TriangleCount.perVertex(s, LinkGraph.edges(s, dir)).orderBy(col("id"))),
    "graph_clustering" -> ((s, dir) =>
      // local clustering coefficient as an exact-integer q6 ratio —
      // triangles over wedges per vertex, degree<2 scoring 0
      TriangleCount.clusteringCoefficient(s, LinkGraph.edges(s, dir))
        .orderBy(col("id"))),

    // ---- further graph apps -------------------------------------------------
    "degree_distribution" -> ((s, dir) =>
      graft.algos.GraphOps.degreeDistribution(LinkGraph.edges(s, dir))),
    "msf" -> ((s, _) => {
      // planted-tree fixture: distinct tree weights < 1, extras >= 2, so the
      // unique MSF is known by construction and the run is hard-verifiable
      // (the link-graph MSF stays covered by MsfGraphOpsSpec's Kruskal oracle)
      val e = Fixtures.persist(s, "planted_msf",
        graft.core.Planted.msfGraph(s))
      graft.algos.MinimumSpanningForest.run(s, e).orderBy(col("u"), col("v"))
    }),
    "scc" -> ((s, _) => {
      // planted strongly-connected clusters + permuted intra-block DAG: the
      // expected labeling is arithmetic, the coloring algorithm needs real
      // multi-round peeling (random-graph coverage stays in SccSpec/Tarjan).
      // driverFinishBelow = 0: this gate row must exercise the DISTRIBUTED
      // trim/color/confirm path, not the small-remainder Tarjan finish
      val e = Fixtures.persist(s, "planted_scc",
        graft.core.Planted.sccGraph(s))
      graft.algos.SCC.run(s, e, maxRounds = 50, driverFinishBelow = 0L)
        .orderBy(col("id"))
    }),
    "scc_hybrid" -> ((s, _) => {
      // same planted fixture through the DEFAULT hybrid path (the fixture
      // sits under the driver-finish threshold, so this row proves the
      // collect-and-Tarjan finish produces the identical canonical labeling)
      val e = Fixtures.persist(s, "planted_scc",
        graft.core.Planted.sccGraph(s))
      graft.algos.SCC.run(s, e, maxRounds = 50).orderBy(col("id"))
    }),
    "random_walks" -> ((s, dir) => {
      val e = LinkGraph.edges(s, dir)
      graft.algos.RandomWalks.visitCounts(s, e,
        e.select(col("src").as("id")).distinct().orderBy(col("id")).limit(50),
        walksPerSource = 10, steps = 4).orderBy(col("id"))
    }),
    "sssp" -> ((s, dir) => {
      // weighted shortest paths from customer 1. The directed type graph is
      // a DAG (cust→order→part→supp→nation→region, longest chain 5 hops),
      // so 8 oracle rounds cover any SF structurally
      graft.algos.GraphOps.sssp(s, LinkGraph.edges(s, dir),
          LinkGraph.CUST + 1L)
        .select(col("id"),
          floor(col("dist") * 1e6 + 0.5).cast("long").as("dist_q6"))
        .orderBy(col("id"))
    }),
    "node2vec_walks" -> ((s, dir) => {
      // second-order biased walk corpus (p=4, q=2: α return ¼, common 1,
      // explore ½) — skip-gram training input, every hop integer-exact
      val e = LinkGraph.edges(s, dir)
      graft.algos.RandomWalks.node2vecWalks(s, e,
        e.select(col("src").as("id")).distinct().orderBy(col("id")).limit(30),
        walksPerSource = 5, steps = 4, p = 4, q = 2)
        .orderBy(col("walk_id"), col("step"))
    }),
    "graph_ppmi" -> ((s, dir) => {
      // NetMF embedding front half: co-occurrence + PPMI marginals over
      // the same node2vec corpus as `node2vec_walks`, window 2 — exact
      // integers end to end (the SVD back half is property-tested)
      val e = LinkGraph.edges(s, dir)
      val corpus = graft.algos.RandomWalks.node2vecWalks(s, e,
        e.select(col("src").as("id")).distinct().orderBy(col("id")).limit(30),
        walksPerSource = 5, steps = 4, p = 4, q = 2)
      graft.algos.GraphEmbed.ppmiParts(
        graft.algos.GraphEmbed.cooccurrence(corpus, window = 2))
        .orderBy(col("u"), col("v"))
    }),
    "neighborhood_function" -> ((s, dir) => {
      // exact landmark-BFS ball sizes; the HyperBall scale path over the
      // same graph is equivalence/accuracy-tested in NeighborhoodSpec
      val e = LinkGraph.edges(s, dir)
      graft.algos.Neighborhood.landmarkBalls(s, e,
        LinkGraph.vertices(e).filter(col("id") % 599 === 0), maxT = 3)
        .orderBy(col("seed"), col("t"))
    }),
    "harmonic_centrality" -> ((s, dir) => {
      // bounded-radius harmonic centrality of the landmarks, ×lcm(1..3)=6
      // so every value is integer-exact in both engines
      val e = LinkGraph.edges(s, dir)
      val balls = graft.algos.Neighborhood.landmarkBalls(s, e,
        LinkGraph.vertices(e).filter(col("id") % 599 === 0), maxT = 3)
      graft.algos.Neighborhood.harmonicExactX(balls, maxT = 3)
        .orderBy(col("seed"))
    }),
    "betweenness_centrality" -> ((s, dir) => {
      // distance-bounded Brandes betweenness from the landmark set —
      // integer q6 dependency accumulation (one floor per DAG edge term)
      val e = LinkGraph.edges(s, dir)
      graft.algos.Betweenness.bounded(s, e,
        LinkGraph.vertices(e).filter(col("id") % 599 === 0), maxT = 3)
        .orderBy(col("id"))
    }),
    "graph_neighbor_sample" -> ((s, dir) => {
      // GraphSAGE-style fan-out sampling from the landmark seed set
      val e = LinkGraph.edges(s, dir)
      graft.algos.Sampling.neighborSample(s, e,
        LinkGraph.vertices(e).filter(col("id") % 599 === 0), Seq(3, 2))
        .orderBy(col("hop"), col("src"), col("dst"))
    }),
    "graph_negative_sample" -> ((s, dir) =>
      graft.algos.Sampling.negativeSample(s, LinkGraph.edges(s, dir), k = 3)
        .orderBy(col("src"), col("neg_rank"))),
    "kcores" -> ((s, dir) =>
      graft.algos.KCores.coreness(s, LinkGraph.edges(s, dir))
        .orderBy(col("id"))),
    "bond_percolation" -> ((s, dir) =>
      graft.algos.GraphOps.bondPercolation(s, LinkGraph.edges(s, dir), 0.5)
        .orderBy(col("id"))),
    "khop_subgraph" -> ((s, dir) => {
      import s.implicits._
      graft.algos.GraphOps.kHopSubgraph(s, LinkGraph.edges(s, dir),
        Seq(LinkGraph.CUST + 1L).toDF("id"), hops = 3)
        .orderBy(col("src"), col("dst"))
    }),
    "seeded_label_propagation" -> ((s, dir) => {
      import s.implicits._
      graft.algos.GraphOps.seededLabelPropagation(s, LinkGraph.edges(s, dir),
        Seq((LinkGraph.CUST + 1L, 100L), (LinkGraph.CUST + 2L, 200L))
          .toDF("id", "label"), iters = 8)
        .select(col("id"), col("label"),
          floor(col("p") * 1e6 + 0.5).cast("long").as("p_q6"))
        .orderBy(col("id"))
    }),

    // ---- lakehouse derivation (north_rule input; generated + persisted to
    // a parquet fixture so the DuckDB oracle re-derives from the same bytes) -
    "lakehouse_edges" -> ((s, _) => {
      val files = Fixtures.persist(s, "lakehouse_files_20k",
        graft.derive.CodeLakehouse.table(s, 20000L))
      val (e, _) = graft.derive.EdgeDerive.derive(files)
      e.orderBy(col("src"), col("dst"))
    }),
    "lakehouse_manifest" -> ((s, _) =>
      graft.derive.CodeLakehouse.manifest(
        Fixtures.persist(s, "lakehouse_files_5k",
          graft.derive.CodeLakehouse.table(s, 5000L)))
        .orderBy(col("repo"), col("path"))),
    // StarCoder/The-Stack per-file quality filter over the code lakehouse
    "code_file_stats" -> ((s, _) =>
      graft.derive.CodeFilters.fileStats(
        Fixtures.persist(s, "lakehouse_files_5k",
          graft.derive.CodeLakehouse.table(s, 5000L)))
        .orderBy(col("repo"), col("path"))),
    // CCNet-style cross-corpus boilerplate-line dedup over source files
    "code_line_dedup" -> ((s, _) =>
      graft.derive.CodeFilters.lineDedup(
        Fixtures.persist(s, "lakehouse_files_20k",
          graft.derive.CodeLakehouse.table(s, 20000L)), minDf = 3L)
        .orderBy(col("file"))),
    // fork detection: repo pairs sharing identical file contents
    "lakehouse_fork_detect" -> ((s, _) => {
      val forked = Fixtures.persist(s, "lakehouse_forked_20k", {
        val base = graft.derive.CodeLakehouse.table(s, 20000L)
        base.unionByName(graft.derive.CodeFilters.plantForks(base,
          Seq("repo-0010", "repo-0025", "repo-0040", "repo-0060",
            "repo-0080"), keepQ4 = 8000, seed = 7L))
      })
      graft.derive.CodeFilters.forkPairs(forked)
        .orderBy(col("repo_a"), col("repo_b"))
    }),

    // ---- collaborative filtering (itemcf.cpp flagship) ----------------------
    "cf_item_similarity" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val inter = orders
        .select(col("o_custkey").as("user"), col("o_orderkey").as("ok"))
        .join(li.select(col("l_orderkey").as("ok"),
          col("l_partkey").as("item")), "ok")
        .select("user", "item").distinct()
      val sims = graft.cf.ItemCF.pairSimilarities(inter, minIntersection = 2)
      // rank by Jaccard: a single IEEE division of identical ints in both
      // engines (bit-stable ordering, unlike the pow-based asym cosine)
      graft.cf.ItemCF.topKSimilar(sims, "jaccard", 5)
        .select(col("item"), col("other"),
          floor(col("sim") * 1e6 + 0.5).cast("long").as("sim_q6"), col("rank"))
        .orderBy(col("item"), col("rank"))
    }),

    // ---- spectral / factor / classification toolkit apps --------------------
    "svd_topk" -> ((s, _) => {
      // planted disjoint rank-1 blocks: every singular value is a per-block
      // Frobenius norm the oracle recomputes as sqrt(SUM(value^2)) — the
      // Lanczos run is verified against exact arithmetic
      val m = Fixtures.persist(s, "planted_lowrank",
        graft.core.Planted.lowRankMatrix(s))
      graft.cf.Spectral.svdTopK(m, k = 5, nCols = 160)
        .select(col("rank"),
          floor(col("sigma") * 1e4 + 0.5).cast("long").as("sigma_q4"))
        .orderBy("rank")
    }),
    "svdpp_blocks" -> ((s, _) => {
      // planted non-additive block means [[4,2],[2,4]]: a bias-only fit
      // flattens to 3 everywhere, so integer-rounded block means equal the
      // plant only if the factor/implicit machinery actually learned the
      // interaction (MlSpec asserts the tighter 0.35 margin)
      val ratings = Fixtures.persist(s, "planted_ratings",
        graft.core.Planted.blockRatings(s))
      val model = graft.cf.SvdPlusPlus.train(ratings, rank = 2, iters = 40,
        lr = 0.2, reg = 0.005)
      graft.cf.SvdPlusPlus.predict(model, ratings.select("user", "item"),
        ratings)
        .select((col("user") / 20).cast("long").as("ug"),
          (col("item") / 20).cast("long").as("ig"), col("pred"))
        .groupBy("ug", "ig")
        .agg(floor(avg("pred") + 0.5).cast("long").as("mean_pred"))
        .orderBy("ug", "ig")
    }),
    "louvain_communities" -> ((s, _) => {
      // modularity local moving (Louvain phase 1, MIS-scheduled) on the
      // planted ring of cliques — the textbook modularity partition whose
      // expected communities are closed-form: community(v) = (v/5)*5
      val edges = Fixtures.persist(s, "planted_ring_cliques",
        graft.core.Planted.ringOfCliques(s, nCliques = 24, s = 5))
      graft.algos.Louvain.localMoving(edges).orderBy(col("id"))
    }),
    "graph_coloring" -> ((s, _) => {
      // Jones-Plassmann greedy coloring on the planted ring of cliques —
      // fixed Lehmer priorities, mex over colored neighbors; the oracle
      // replays every round (extra unrolled rounds are idempotent)
      val edges = Fixtures.persist(s, "planted_ring_cliques",
        graft.core.Planted.ringOfCliques(s, nCliques = 24, s = 5))
      graft.algos.Coloring.jonesPlassmann(edges).orderBy(col("id"))
    }),
    "graph_coloring_ldf" -> ((s, _) => {
      // largest-degree-first JP (the hub-round-blowup mitigation): decimal
      // (degree, hash, id) priorities, same winner/mex loop — the oracle
      // replays it with HUGEINT priorities
      val edges = Fixtures.persist(s, "planted_ring_cliques",
        graft.core.Planted.ringOfCliques(s, nCliques = 24, s = 5))
      graft.algos.Coloring.jonesPlassmannLdf(edges).orderBy(col("id"))
    }),
    "doc_nb_classifier" -> ((s, _) => {
      // trainable domain/quality classifier (the CCNet/fastText pipeline
      // role): NB log-odds over hashed bag-of-words, trained on the 80%
      // split of the planted two-domain corpus, scored over ALL docs —
      // the oracle retrains and rescores the identical closed form
      val docs = Fixtures.persist(s, "planted_two_domain_docs",
        graft.core.Planted.twoDomainDocs(s))
      val feats = graft.text.Classifier.hashedCounts(docs, 4096)
      val trainLabels = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("label").as("y"))
      val (w, b) = graft.text.Classifier.trainNb(feats, trainLabels, 4096)
      graft.text.Classifier.classify(feats, w, b)
        .join(docs.select(col("doc_id"), col("label").as("y")), "doc_id")
        .select(col("doc_id"), col("y"),
          when(col("doc_id") % 5 =!= 0, 1L).otherwise(0L).as("train"),
          col("margin"), col("pred"))
        .orderBy(col("doc_id"))
    }),
    "graph_mis" -> ((s, _) => {
      // Luby's maximal independent set on the planted ring of cliques —
      // same fixed Lehmer priorities as graph_coloring; winners plus their
      // neighborhoods retire each round, oracle replays the loop unrolled
      val edges = Fixtures.persist(s, "planted_ring_cliques",
        graft.core.Planted.ringOfCliques(s, nCliques = 24, s = 5))
      graft.algos.Mis.luby(edges).orderBy(col("id"))
    }),
    "graph_link_prediction" -> ((s, dir) => {
      // top-200 predicted links of the derived graph by resource-allocation
      // score: wedge enumeration at apexes of degree <= 64 (the hub cap —
      // supplier/nation hubs carry near-zero RA/AA weight by definition),
      // >= 2 shared neighbors, exact integer q6 scores
      graft.algos.LinkPrediction
        .scores(LinkGraph.edges(s, dir), maxApexDegree = 64L, minCn = 2L)
        .orderBy(desc("ra_q6"), col("u"), col("v")).limit(200)
    }),
    "louvain_multilevel" -> ((s, _) => {
      // full multi-level Louvain (local moving + contraction) on the
      // planted paired-cliques hierarchy: level 1 recovers the cliques,
      // level 2 merges each bridge-tied pair, level 3 is the fixpoint —
      // closed-form final community (v/12)*12 (see Planted.pairedCliques
      // for the exact integer gain ledger at every level)
      val edges = Fixtures.persist(s, "planted_paired_cliques",
        graft.core.Planted.pairedCliques(s, nPairs = 12, s = 6,
          wBridge = 3L))
      graft.algos.Louvain.louvain(edges).orderBy(col("id"))
    }),
    "graph_modularity" -> ((s, _) => {
      // Newman Q of the multi-level Louvain partition on the planted
      // hierarchy — the oracle recomputes Q from the fixture's closed-form
      // final communities ((v/12)*12)
      val edges = Fixtures.persist(s, "planted_paired_cliques",
        graft.core.Planted.pairedCliques(s, nPairs = 12, s = 6,
          wBridge = 3L))
      graft.algos.Louvain.modularity(edges,
        graft.algos.Louvain.louvain(edges))
    }),
    "graph_assortativity" -> ((s, dir) =>
      // Newman 2002 degree assortativity of the link graph: exact integer
      // moments, one identically-IEEE final ratio
      graft.algos.GraphOps.degreeAssortativity(LinkGraph.edges(s, dir))),
    "timesvdpp_drift" -> ((s, _) => {
      // planted antisymmetric temporal drift (Planted.temporalRatings):
      // group-0 users rate −1/+1 at buckets 0/1, group-1 the opposite — the
      // drift's mean is zero at every bucket, so neither a time bias nor
      // any static model can fit it; integer-rounded per-(ug, ig, t) means
      // equal the plant only if the user×time machinery learned the shift
      // (MlSpec asserts the tighter MAE margin vs the static floor of 1)
      val ratings = Fixtures.persist(s, "planted_temporal",
        graft.core.Planted.temporalRatings(s))
      val model = graft.cf.TimeSvdPlusPlus.train(ratings, rank = 2,
        iters = 40, lr = 0.2, reg = 0.005)
      graft.cf.TimeSvdPlusPlus.predict(model,
        ratings.select("user", "item", "t"), ratings)
        .select((col("user") / 20).cast("long").as("ug"),
          (col("item") / 20).cast("long").as("ig"), col("t"), col("pred"))
        .groupBy("ug", "ig", "t")
        .agg(floor(avg("pred") + 0.5).cast("long").as("mean_pred"))
        .orderBy("ug", "ig", "t")
    }),
    "adpredictor" -> ((s, _) => {
      // planted separable clicks: expected predict == y for every sample
      // (class features dominate; noise features cancel by mirror symmetry)
      val samples = Fixtures.persist(s, "planted_clicks",
        graft.core.Planted.clickDesign(s)._1)
      val edges = graft.core.Planted.clickDesign(s)._2
      val model = graft.classify.AdPredictor.train(samples, edges, sweeps = 3)
      samples.join(graft.classify.AdPredictor.predict(model, edges), "sample")
        .select(col("sample"), col("y"), col("predict")).orderBy("sample")
    }),
    "cf_baseline" -> ((s, dir) => {
      // baseline.cpp's three mean predictors (GLOBAL/USER/ITEM_MEAN) over
      // (suppkey, partkey, quantity) ratings; the [5,30] clamp is live
      // (quantities span 1..50) so the truncation branch is exercised too
      val r = Tables(s, dir, "lineitem").select(
        col("l_suppkey").as("user"), col("l_partkey").as("item"),
        col("l_quantity").as("rating"))
      graft.cf.Eval.baselineRmse(r, minval = 5.0, maxval = 30.0)
        .select(col("algo"),
          floor(col("rmse") * 1e6 + 0.5).cast("long").as("rmse_q6"))
        .orderBy("algo")
    }),
    "cf_ap_at_k" -> ((s, dir) => {
      // metric_eval.cpp AP@K: per-order line-number ranking ("predictions")
      // scored against the quantity-descending ranking of the same lines
      // ("actual") — same item universe, differing prefixes, so AP@3 is a
      // real distribution over (0,1], and the exact-integer scoring path
      // makes every value a single division of identical ints in DuckDB
      val li = Tables(s, dir, "lineitem")
      // l_linenumber alone is NOT unique per order in this testdata —
      // (linenumber, partkey, suppkey) is; a full tie-break chain keeps
      // both engines' row_number deterministic and identical
      val wP = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val wA = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc, col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
      val pred = li.select(col("l_orderkey").as("user"),
        col("l_partkey").as("item"), row_number().over(wP).as("rank"))
      val act = li.select(col("l_orderkey").as("user"),
        col("l_partkey").as("item"), row_number().over(wA).as("pos"))
      graft.cf.Eval.apAtK(pred, act, k = 3)
        .select(col("user").as("orderkey"),
          floor(col("ap") * 1e6 + 0.5).cast("long").as("ap_q6"))
        .orderBy("orderkey")
    }),
    "cf_rating_topk" -> ((s, _) => {
      // rating.cpp serving: top-5 unrated items per user from planted
      // dyadic factor tables (dot products exact in IEEE double, so the
      // ranking is bit-deterministic in both engines); the [-4,4] clamp is
      // live (raw dots span beyond it) so clamp-tie ordering by item id is
      // exercised too
      val f = Fixtures.persist(s, "planted_cf_factors",
        graft.core.Planted.cfFactors(s))
      def fac(tag: String) = graft.core.Planted.cfFactorsWide(f, tag)
      val model = graft.cf.Factorize.Model(fac("u"), fac("v"))
      val rated = fac("u").select(col("id").as("user"))
        .crossJoin(fac("v").select(col("id").as("item")))
        .filter((col("user") * 3 + col("item")) % 7 === 0)
      graft.cf.Factorize.recommendTopK(model, rated, k = 5,
          minval = -4.0, maxval = 4.0)
        .select(col("user"), col("rank"), col("item"),
          floor(col("prediction") * 1e6 + 0.5).cast("long").as("pred_q6"))
        .orderBy("user", "rank")
    }),
    "coem" -> ((s, _) => {
      // co-EM (text_analysis/coem.cpp) = seeded LP over the NP×context
      // bipartite graph; planted two-topic blocks make every hard label
      // arithmetic (block membership), incl. the weight-dominated bridge
      import s.implicits._
      val e = Fixtures.persist(s, "planted_coem",
        graft.core.Planted.coemGraph(s))
      graft.algos.GraphOps.seededLabelPropagation(s, e,
        Seq((0L, 1L), (50L, 2L)).toDF("id", "label"), iters = 6)
        .select(col("id"), col("label")).orderBy("id")
    }),

    // ---- PROV-JSON (CamFlow) ingest -----------------------------------------
    "prov_json_edges" -> ((s, _) => {
      val docs = Fixtures.persist(s, "prov_json_docs",
        graft.sources.ProvJsonReader.synthesize(s, 3))
      graft.sources.ProvJsonReader.typedEdges(s, docs, "prov")
        .orderBy(col("src"), col("dst"), col("edge_type"))
    }),

    // ---- dedup / text analysis over documents ------------------------------
    "doc_exact_dedup" -> ((s, dir) =>
      Dedup.exact(Tables(s, dir, "documents")).orderBy(col("text_md5"))),
    "doc_shuffle_shards" -> ((s, dir) =>
      // deterministic global shuffle into 8 numbered shards — the oracle
      // replays the Lehmer key + per-shard rank exactly in integer space
      graft.text.Export.shuffleShards(Tables(s, dir, "documents")
          .select("doc_id"), "doc_id", numShards = 8)
        .orderBy("shard", "pos")),
    "doc_holdout_split" -> ((s, dir) =>
      // dyadic fractions (0.75/0.125/0.125) keep the cumulative cuts exact
      // in IEEE double, so the interval compare is bit-identical in DuckDB
      graft.text.Export.holdoutSplit(Tables(s, dir, "documents")
          .select("doc_id"), "doc_id",
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .orderBy("doc_id")),
    "doc_mixture_sample" -> ((s, dir) =>
      // mixture resampling: up-weight src0/src2, down-weight src1/src3
      // (dyadic weights so frac(w) compares exactly), others dropped
      graft.text.Export.sampleByWeights(Tables(s, dir, "documents"),
          "doc_id", "source", Map("src0" -> 2.5, "src1" -> 0.5,
            "src2" -> 3.0, "src3" -> 0.25))
        .orderBy("doc_id", "copy")),
    "doc_export_pipeline" -> ((s, dir) => {
      // END-TO-END export: quality gate → exact-dedup keep → benchmark
      // decontamination → train holdout → mixture resample → deterministic
      // shuffle into shards. Each stage is the SAME component its
      // standalone gate query verifies; the oracle re-runs the whole chain
      // in SQL, proving the stages compose with no hidden coupling. The
      // mixture's (doc, copy) pairs get a combined id uid = doc_id·4 +
      // copy (copy < 4 by the weight cap) so repetitions shuffle
      // independently, as the Export scaladoc prescribes.
      val docs = Tables(s, dir, "documents")
      val good = TextStats.quality(docs)
        .filter(col("quality_q6") >= 700000).select("doc_id")
      val kept = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") / 50).cast("long").as("bench_id"),
          concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("text"))
      val dirty = Decontaminate.flag(docs, bench, n = 3, minHits = 3)
        .select("doc_id").distinct()
      val clean = docs.select("doc_id", "source")
        .join(good, "doc_id").join(kept, "doc_id")
        .join(dirty, Seq("doc_id"), "left_anti")
      // holdoutSplit carries source through — no join back onto clean
      // (which would execute the quality/dedup/decontaminate chain twice)
      val train = graft.text.Export.holdoutSplit(clean, "doc_id",
          Seq("train" -> 0.875, "heldout" -> 0.125))
        .filter(col("split") === "train").drop("split")
      val mixed = graft.text.Export.sampleByWeights(train, "doc_id", "source",
        Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.5, "src3" -> 0.25,
          "src4" -> 1.0, "src5" -> 2.5, "src6" -> 0.75, "src7" -> 1.0,
          "src8" -> 0.5, "src9" -> 1.25))
      val withUid = mixed.select(
        (col("doc_id") * 4 + col("copy")).as("uid"),
        col("doc_id"), col("source"), col("copy"))
      // shuffleShards carries the payload columns through, so NO self-join
      // (which would re-execute the whole upstream chain twice)
      graft.text.Export.shuffleShards(withUid, "uid", 4)
        .select(col("doc_id"), col("source"), col("copy"),
          col("shard"), col("pos"))
        .orderBy("shard", "pos")
    }),
    "doc_pack_sequences" -> ((s, dir) => {
      // GPT-style packing of the shuffled token stream into 512-token
      // training sequences across 8 shards (capacity dyadic so the one
      // float division is exact in both engines)
      val toks = TextStats.tokenCounts(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"))
      graft.text.Export.packSequences(toks, "doc_id", "n_tokens",
          capacity = 512, numShards = 8)
        .orderBy(col("shard"), col("seq"), col("off_in_seq"))
    }),
    "doc_token_counts" -> ((s, dir) =>
      TextStats.tokenCounts(Tables(s, dir, "documents")).orderBy(col("doc_id"))),
    "doc_quality" -> ((s, dir) =>
      TextStats.quality(Tables(s, dir, "documents")).orderBy(col("doc_id"))),
    "doc_repetition" -> ((s, dir) =>
      TextStats.repetition(Tables(s, dir, "documents")).orderBy(col("doc_id"))),
    "doc_lm_perplexity" -> ((s, dir) =>
      // CCNet-style corpus-trained bigram-LM NLL scoring; per-term q6
      // quantization before the integer sum keeps it order-free
      TextStats.lmPerplexity(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    "bpe_merges" -> ((s, dir) =>
      // 12 BPE merges learned on the corpus word-frequency table; the
      // whole train loop is vocabulary-sized after one corpus groupBy
      graft.text.Bpe.train(Tables(s, dir, "documents"), numMerges = 12)._1
        .orderBy(col("rank"))),
    "doc_bpe_tokens" -> ((s, dir) => {
      // tokenize the corpus with its own learned 12-merge symbolization
      val docs = Tables(s, dir, "documents")
      graft.text.Bpe.tokenize(docs,
        graft.text.Bpe.train(docs, numMerges = 12)._2)
        .orderBy(col("doc_id"))
    }),
    "doc_dsir_sample" -> ((s, dir) =>
      // DSIR data selection (Xie et al. 2023): target = the English slice,
      // raw = the whole corpus; hashed unigram+bigram models over 512
      // buckets, Gumbel top-100 — integer q6 scores end to end
      graft.text.Dsir.resample(Tables(s, dir, "documents"),
        col("lang") === "en", buckets = 512, k = 100)),
    "doc_fingerprint" -> ((s, dir) =>
      TextStats.fingerprints(Tables(s, dir, "documents")).orderBy(col("doc_id"))),
    "doc_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), n = 3,
        threshold = 0.8).orderBy(col("doc_a"), col("doc_b"))),
    "doc_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashDedup(Tables(s, dir, "documents"), n = 3, threshold = 0.8)
        .orderBy(col("doc_a"), col("doc_b"))),
    "doc_substring_dedup" -> ((s, dir) => {
      // passage-level dedup (Lee et al. 2022 shape): plant a 10-token
      // passage mid-corpus (every 10th doc) and detect the repeated spans —
      // planted occurrences AND the corpus's natural exact-dup windows.
      // 6-token windows, touching/overlapping windows merged per document.
      val docs = Tables(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" license header alpha beta gamma delta " +
            "epsilon zeta eta theta"))).otherwise(col("text")).as("text"))
      Dedup.substringSpans(planted, windowTokens = 6)
        .orderBy("doc_id", "span_start")
    }),
    "doc_simhash_pairs" -> ((s, dir) =>
      // maxDist = 3: the largest distance the 4-chunk pigeonhole index
      // covers exhaustively (VERDICT r1 contract fix)
      Dedup.simhashPairs(Tables(s, dir, "documents"), maxDist = 3)
        .orderBy(col("doc_a"), col("doc_b"))),
    "doc_langid" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextStats.langId(docs, TextStats.trainLangProfiles(docs))
        .select(col("doc_id"), col("lang_pred")).orderBy(col("doc_id"))
    }),
    "doc_decontaminate" -> ((s, dir) => {
      // benchmark = the first 8 tokens of every 50th document (planted
      // leakage: each source doc shares all 6 of its item's 3-gram
      // shingles); derived identically by the DuckDB oracle
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") / 50).cast("long").as("bench_id"),
          concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("text"))
      Decontaminate.flag(docs, bench, n = 3, minHits = 3)
        .orderBy(col("doc_id"), col("bench_id"))
    }),
    "doc_pii_scrub" -> ((s, dir) => {
      // plant emails/phones deterministically (counts nonzero by
      // construction); the oracle re-derives the same augmented text and
      // re-applies the IDENTICAL regexes — a cross-engine regex-semantics
      // check on count and replacement
      val docs = Tables(s, dir, "documents")
      val planted = docs.select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" reach me at user"), col("doc_id").cast("string"),
              lit("@example.org"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" or call +1 (555) 010-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      TextStats.piiScrub(planted).orderBy(col("doc_id"))
    }),
    "doc_bag_of_words" -> ((s, dir) =>
      // texttokens.cpp LDA prep: global alphabetical dictionary, per-doc
      // counts within [2, 1000] to exercise the threshold filter
      graft.text.FeatureStats.bagOfWords(Tables(s, dir, "documents"),
        minCount = 2, maxCount = 1000)
        .orderBy(col("doc_id"), col("word_id"))),
    "doc_dedup_clusters" -> ((s, dir) => {
      // transitive near-dup clustering — the production dedup stage's real
      // output: MinHash-verified pairs → connected components → min-id
      // cluster representative; docs in no pair are their own cluster
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashDedup(docs, n = 3, threshold = 0.8)
      val dupEdges = pairs.select(col("doc_a").as("src"),
        col("doc_b").as("dst"), lit(1.0).as("weight"))
      val comp = ConnectedComponents.components(s, dupEdges)
      docs.select("doc_id")
        .join(comp.select(col("id").as("doc_id"), col("label")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("cluster_id"))
        .orderBy("doc_id")
    }),
    "doc_tfidf" -> ((s, dir) =>
      // raw-count tf × smoothed idf ln((N+1)/(df+1)); q6 absorbs the
      // cross-engine libm ln ulp
      graft.text.FeatureStats.tfIdf(Tables(s, dir, "documents"), minCount = 2)
        .select(col("doc_id"), col("word_id"),
          floor(col("tfidf") * 1e6 + 0.5).cast("long").as("tfidf_q6"))
        .orderBy(col("doc_id"), col("word_id"))),
    "mutual_information" -> ((s, dir) =>
      // mi.cpp over two categorical columns of orders
      graft.text.FeatureStats.mutualInformation(Tables(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")),

    // ---- similarity search over embeddings ----------------------------------
    "ann_brute_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "embedding_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables(s, dir, "embeddings"), threshold = 0.4,
        bits = 6).orderBy(col("vec_a"), col("vec_b"))),
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "embedding_kmeans" -> ((s, dir) =>
      // grid-exact distributed Lloyd (vectors/KMeans.scala): k seeds = the
      // 10 lowest vec_ids, 3 iterations, 1e-3 coordinate grid
      graft.vectors.KMeans.lloyd(Tables(s, dir, "embeddings"),
        k = 10, iters = 3).orderBy("vec_id")),
    "embedding_semdedup" -> ((s, dir) =>
      // SemDeDup over the kmeans clusters: drop any member with a
      // smaller-id cluster-mate at cos >= 0.4 (tau^2 = 4/25, integer-exact)
      graft.vectors.KMeans.semDedup(Tables(s, dir, "embeddings"),
        k = 10, iters = 3, tauNum = 4, tauDen = 25).orderBy("vec_id")),
    "embedding_cluster_sample" -> ((s, dir) =>
      // cluster-balanced (curriculum) sampling: Lehmer-ranked top-8 per
      // Lloyd cluster, blocked window-free top-k
      graft.vectors.KMeans.clusterSample(Tables(s, dir, "embeddings"),
        k = 10, iters = 3, m = 8).orderBy("cluster", "rank")),
    "ann_ivf_trained_topk" -> ((s, dir) => {
      // IVF over TRAINED (grid-Lloyd) coarse cells — same cell count /
      // iterations as embedding_kmeans so the oracle reuses the Lloyd chain
      val emb = Tables(s, dir, "embeddings")
      graft.vectors.KMeans.ivfSearch(emb, emb.filter(col("vec_id") < 10),
        k = 5, cells = 10, iters = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_pq_topk" -> ((s, dir) => {
      // product-quantization ADC top-5 (m=8 subspaces, ks=16 codes each,
      // 2 joint grid-Lloyd iterations): the compressed-exhaustive ANN leg —
      // the oracle replays training, encoding, and the table-lookup scan
      val emb = Tables(s, dir, "embeddings")
      graft.vectors.Pq.adcTopK(emb, emb.filter(col("vec_id") < 10),
        scale = 1000, m = 8, ks = 16, iters = 2, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_pq_recall" -> ((s, dir) => {
      // recall@5 of the ADC ranking vs the EXACT grid-L2 top-5 — the same
      // driver-visible quality gate the LSH and trained-IVF paths carry
      val emb = Tables(s, dir, "embeddings")
      graft.vectors.Pq.adcRecall(emb, emb.filter(col("vec_id") < 10),
        scale = 1000, m = 8, ks = 16, iters = 2, k = 5)
        .orderBy(col("query_id"))
    }),
    "ann_ivfpq_topk" -> ((s, dir) => {
      // IVF-ADC: trained coarse cells (same 10-cell/3-iter Lloyd chain as
      // embedding_kmeans) pruning to nprobe=2, PQ codes trained on the
      // CELL RESIDUALS (m=8 × ks=16, 2 joint iterations) scoring the
      // probed members — the composed billion-scale recipe, oracle-replayed
      // end to end in exact integers
      val emb = Tables(s, dir, "embeddings")
      graft.vectors.Pq.ivfAdcTopK(emb, emb.filter(col("vec_id") < 10),
        k = 5, cells = 10, cellIters = 3, m = 8, ks = 16, pqIters = 2,
        nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_ivfpq_recall" -> ((s, dir) => {
      // recall@5 of the COMPOSED path vs exact grid-L2 — compounds the
      // cell-pruning loss (~20% of a uniform corpus probed) with the code
      // quantization loss; the honest quality number for IVFADC. Measured
      // 1.9 avg hits (38%) at sf0.001 and 2.0 (40%) at sf0.01 — residual
      // coding BEATS exhaustive PQ's 32% despite probing a fifth of the
      // corpus (residuals have smaller spread than raw vectors, so the
      // same ks=16 codebooks quantize them finer); floor at 1.0 (20%),
      // half the measured, same discipline as the LSH/IVF floors
      val emb = Tables(s, dir, "embeddings")
      val recall = graft.vectors.Pq.ivfAdcRecall(emb,
        emb.filter(col("vec_id") < 10),
        k = 5, cells = 10, cellIters = 3, m = 8, ks = 16, pqIters = 2,
        nprobe = 2)
        .orderBy(col("query_id"))
        .cache()
      val rows = recall.collect() // tiny (one row per query)
      recall.unpersist(false)
      val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
      require(mean >= 1.0,
        f"IVFADC recall@5 degraded: mean $mean%.2f hits < 1.0 floor")
      import s.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("query_id", "hits")
    }),
    "ann_lsh_recall" -> ((s, dir) => {
      // recall@5 of the LSH path against the exact brute-force top-5, per
      // query (VERDICT r2 item 6: makes the approximate path's quality claim
      // driver-visible, not just oracle-consistent with its own bucketing).
      // recall_pct = hits × 20 — integer-exact across engines.
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("vec_id"))
      val lsh = Similarity.lshTopK(emb, q, k = 5)
        .select(col("query_id"), col("vec_id"))
      val hits = brute.join(lsh, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val recall = brute.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0L)) * 20).as("recall_pct"))
        .orderBy("query_id")
        .cache()
      // quality floor, enforced at run time: the synthetic embeddings are
      // UNIFORM random (no cluster structure), the hardest case for angular
      // LSH — the top-5 are barely more angularly close than the bulk. At
      // ~18% of corpus probed (12 tables × N/2^6) the measured recall@5 is
      // ~36-38%, i.e. ~2× the probed fraction; structured real corpora do
      // far better. The floor asserts the 2×-over-random behavior holds.
      val rows = recall.collect() // tiny (one row per query)
      recall.unpersist(false)
      val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
      require(mean >= 25.0,
        f"LSH recall@5 degraded: mean $mean%.1f%% < 25%% floor")
      import s.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("query_id", "recall_pct")
    }),

    "ann_ivf_recall" -> ((s, dir) => {
      // recall@5 of the TRAINED-cell IVF path against exact brute force
      // (VERDICT r4 #6: ann_lsh_recall made the LSH quality claim
      // driver-visible; this does the same for KMeans.ivfSearch — the
      // exhaustive-probe contract test covers correctness, not pruning).
      // nprobe=2 of 10 trained cells probes ~20% of a UNIFORM corpus (no
      // cluster structure — the hardest case for IVF, exactly like the LSH
      // floor's rationale); measured recall ~2.5× the probed fraction.
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("vec_id"))
      val ivf = graft.vectors.KMeans.ivfSearch(emb, q, k = 5,
        cells = 10, iters = 3, nprobe = 2)
        .select(col("query_id"), col("vec_id"))
      val hits = brute.join(ivf, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val recall = brute.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0L)) * 20).as("recall_pct"))
        .orderBy("query_id")
        .cache()
      val rows = recall.collect() // tiny (one row per query)
      recall.unpersist(false)
      val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
      require(mean >= 30.0,
        f"trained-IVF recall@5 degraded: mean $mean%.1f%% < 30%% floor")
      import s.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("query_id", "recall_pct")
    }),

    // ---- events: windowed aggregation (batch + streaming parity) -----------
    "events_windowed" -> ((s, dir) =>
      graft.streaming.EventStream.windowedCountsBatch(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),
    "events_sessionize" -> ((s, dir) =>
      // native session_window, 24 h gap (≈8 events/session on this corpus)
      graft.streaming.EventStream.sessionizeBatch(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))),

    // ---- FRAP provenance analytics (generated typed graphs, persisted to
    // a fixture so the DuckDB oracle re-runs the WL rounds on equal bytes) --
    "frap_wl_kernels" -> ((s, _) => {
      val edges = Fixtures.persist(s, "prov_corpus_7",
        graft.frap.ProvGen.corpus(s, nNormal = 6, nAbnormal = 1))
      graft.frap.WLRelabel.kernelCounts(graft.frap.WLRelabel.run(edges, 3))
        .orderBy(col("graph_id"), col("label"))
    }),
    "frap_distance_matrix" -> ((s, _) => {
      val edges = Fixtures.persist(s, "prov_corpus_7",
        graft.frap.ProvGen.corpus(s, nNormal = 6, nAbnormal = 1))
      val counts = graft.frap.WLRelabel.kernelCounts(
        graft.frap.WLRelabel.run(edges, 3))
      graft.frap.Kernels.euclideanMatrix(counts)
        .select(col("ga"), col("gb"),
          floor(col("dist") * 1e6 + 0.5).cast("long").as("dist_q6"))
        .orderBy(col("ga"), col("gb"))
    }),
    "frap_detect" -> ((s, _) => {
      import s.implicits._
      val edges = Fixtures.persist(s, "prov_corpus_12",
        graft.frap.ProvGen.corpus(s, nNormal = 11, nAbnormal = 1))
      val learn = (0 until 10).map(i => f"normal-$i%03d")
      // Verdict columns only: the planted corpus makes the expected
      // (within_radius, abnormal) verdicts known by construction (the same
      // trick as the `scc` planted oracle), while the raw min-distance float
      // is k-means-path-dependent — it stays covered by FrapSpec, not the
      // cross-engine gate.
      graft.frap.FrapPipeline
        .run(edges, learn, Seq("normal-010", "bad-000"), iters = 4)
        .map(v => (v.graphId, v.withinRadius, v.abnormal))
        .toDF("graph_id", "within_radius", "abnormal")
        .orderBy(col("graph_id"))
    }),

    "frap_monitor_scale" -> ((s, _) => {
      // the 100 TB monitoring path: learn the profile driver-side (small,
      // reference semantics), then classify EVERY corpus graph with the
      // fully-distributed radius test (klCross — no count-array collects).
      // Planted expectation: all normals inside some radius, bad-000 outside.
      import org.apache.spark.sql.functions.{col => c}
      val edges = Fixtures.persist(s, "prov_corpus_12",
        graft.frap.ProvGen.corpus(s, nNormal = 11, nAbnormal = 1))
      val learn = (0 until 10).map(i => f"normal-$i%03d")
      val counts = graft.frap.WLRelabel.kernelCounts(
        graft.frap.WLRelabel.run(edges, 4)).cache()
      val dict = graft.frap.Kernels.dictionary(
        counts.filter(c("graph_id").isInCollection(learn))).cache()
      val dsize = dict.count().toInt
      val arr = graft.frap.Kernels.countArrays(counts, dict, dsize).collect()
        .map(r => r.getString(0) -> r.getSeq[Int](1).toArray).toMap
      val profile = graft.frap.Frap.learnProfile(learn.map(arr(_)).toVector)
      // verdicts are only known by construction for the HELD-OUT pair (learn
      // members can legitimately sit outside the kept radii: minFrac drops
      // minority clusters, reference semantics) — same gate design as
      // frap_detect, but through the distributed klCross radius test
      val out = graft.frap.FrapPipeline
        .monitorAtScale(s,
          counts.filter(c("graph_id").isin("normal-010", "bad-000")),
          profile, dict, dsize)
        .select(c("graph_id"), c("within_radius"))
        .orderBy("graph_id")
        .collect() // tiny; lets the caches below be released eagerly
      counts.unpersist(false); dict.unpersist(false)
      import s.implicits._
      out.map(r => (r.getString(0), r.getBoolean(1))).toSeq
        .toDF("graph_id", "within_radius")
    }),

    "frap_monitor_stream" -> ((s, _) => {
      // the deployment mode (myapps/server/): learn a frozen profile, then
      // classify provenance graphs as they ARRIVE — one whole graph per
      // streamed file, verdicts per micro-batch via the distributed radius
      // test. Planted expectation identical to frap_monitor_scale (stream ≡
      // batch for per-graph classification).
      import org.apache.spark.sql.functions.{col => c}
      val edges = Fixtures.persist(s, "prov_corpus_12",
        graft.frap.ProvGen.corpus(s, nNormal = 11, nAbnormal = 1))
      val learn = (0 until 10).map(i => f"normal-$i%03d")
      val counts = graft.frap.WLRelabel.kernelCounts(
        graft.frap.WLRelabel.run(
          edges.filter(c("graph_id").isInCollection(learn)), 4)).cache()
      val dict = graft.frap.Kernels.dictionary(counts).cache()
      val dsize = dict.count().toInt
      val arr = graft.frap.Kernels.countArrays(counts, dict, dsize).collect()
        .map(r => r.getString(0) -> r.getSeq[Int](1).toArray).toMap
      val profile = graft.frap.Frap.learnProfile(learn.map(arr(_)).toVector)
      counts.unpersist(false)
      // one whole graph per file: the server experiment's arrival unit
      val streamDir = java.nio.file.Files
        .createTempDirectory("graft-stream-prov").toString
      Seq("normal-010", "bad-000").foreach { g =>
        edges.filter(c("graph_id") === g).coalesce(1)
          .write.mode("append").parquet(streamDir)
      }
      val out = graft.frap.FrapPipeline
        .monitorStream(s, streamDir, profile, dict, dsize, iters = 4)
        .select(c("graph_id"), c("within_radius"))
        .orderBy("graph_id")
      dict.unpersist(false)
      out
    }),

    // ---- multimodal plumbing (synthetic binary media, persisted so the
    // oracle can recompute the features from the same raw bytes) ------------
    "multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select(col("doc_id")).limit(200)
      val media = Fixtures.persist(s, "media_200",
          graft.multimodal.Multimodal.synthesize(s, docs, "doc_id").toDF())
        .as[graft.multimodal.Multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media)
        .toDF().orderBy(col("media_id"))
    })
  )

  /** Shared unrolled-Lloyd CTE chain for the embedding_kmeans /
    * embedding_semdedup oracles — re-derives vectors/KMeans.lloyd step for
    * step on the integer grid (k=10 lowest-id seeds, 3 iterations, 1e-3
    * grid): per-dim quantized rows, argmin by (d2, cid), floor-div centroid
    * means. Everything is 64-bit integer arithmetic, so the comparison is
    * exact. AS MATERIALIZED keeps DuckDB from inlining the iteration chain
    * exponentially. Final assignment lands in `fin(vec_id, cid, d2)`.
    */
  private def lloydCtes: String = {
    def assign(c: String, a: String) =
      s"""$a AS MATERIALIZED (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT vec_id, cid, d2,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT q.vec_id, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS d2
         |          FROM qv q JOIN $c c USING (pos) GROUP BY 1, 2))
         |  WHERE rn = 1)"""
    def update(a: String, c: String) =
      s"""$c AS MATERIALIZED (
         |  SELECT a.cid, q.pos,
         |    CAST((SUM(q.v) - (((SUM(q.v) % COUNT(*)) + COUNT(*)) % COUNT(*)))
         |         / COUNT(*) AS BIGINT) AS v
         |  FROM qv q JOIN $a a USING (vec_id) GROUP BY 1, 2)"""
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id, d.range AS pos,
       |    CAST(floor(CAST(embedding[(d.range + 1)::INT] AS DOUBLE) * 1000
       |               + 0.5) AS BIGINT) AS v
       |  FROM embeddings, range(64) d),
       |seeds AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 10)),
       |c0 AS MATERIALIZED (
       |  SELECT s.cid, q.pos, q.v FROM qv q JOIN seeds s USING (vec_id)),
       |${assign("c0", "a1")},
       |${update("a1", "c1")},
       |${assign("c1", "a2")},
       |${update("a2", "c2")},
       |${assign("c2", "a3")},
       |${update("a3", "c3")},
       |${assign("c3", "fin")}""".stripMargin
  }

  /** Product-quantization chain for the ann_pq_* oracles: per-subspace
    * grid-Lloyd codebooks (m=8 × ks=16, 2 unrolled joint iterations —
    * the lloydCtes assign/floorDiv-update arithmetic with `sub` riding
    * every key), PQ codes, and the ADC table-lookup scan for queries
    * vec_id < 10.
    */
  private def pqCtes: String = {
    def assign(c: String, a: String) =
      s"""$a AS MATERIALIZED (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cid) AS rn
         |    FROM (SELECT q.vec_id, q.sub, c.cid,
         |            SUM((q.v - c.v) * (q.v - c.v)) AS d2
         |          FROM pqv q
         |          JOIN $c c ON c.sub = q.sub AND c.spos = q.spos
         |          GROUP BY 1, 2, 3))
         |  WHERE rn = 1)"""
    def update(a: String, c: String) =
      s"""$c AS MATERIALIZED (
         |  SELECT a.sub, a.cid, q.spos,
         |    CAST((SUM(q.v) - (((SUM(q.v) % COUNT(*)) + COUNT(*)) % COUNT(*)))
         |         / COUNT(*) AS BIGINT) AS v
         |  FROM pqv q JOIN $a a ON a.vec_id = q.vec_id AND a.sub = q.sub
         |  GROUP BY 1, 2, 3)"""
    s"""WITH pqv AS MATERIALIZED (
       |  SELECT vec_id, (d.range // 8)::INT AS sub, (d.range % 8)::INT AS spos,
       |    CAST(floor(CAST(embedding[(d.range + 1)::INT] AS DOUBLE) * 1000
       |               + 0.5) AS BIGINT) AS v
       |  FROM embeddings, range(64) d),
       |pqseeds AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
       |pqc0 AS MATERIALIZED (
       |  SELECT s.cid, q.sub, q.spos, q.v
       |  FROM pqv q JOIN pqseeds s USING (vec_id)),
       |${assign("pqc0", "pqa1")},
       |${update("pqa1", "pqc1")},
       |${assign("pqc1", "pqa2")},
       |${update("pqa2", "pqc2")},
       |${assign("pqc2", "pqcodes")},
       |pqt AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, q.sub, c.cid AS code,
       |    SUM((q.v - c.v) * (q.v - c.v)) AS pd2
       |  FROM pqv q JOIN pqc2 c ON c.sub = q.sub AND c.spos = q.spos
       |  WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
       |pqsc AS MATERIALIZED (
       |  SELECT t.query_id, e.vec_id, CAST(SUM(t.pd2) AS BIGINT) AS adist2
       |  FROM pqcodes e JOIN pqt t ON t.sub = e.sub AND t.code = e.cid
       |  GROUP BY 1, 2),
       |pqrk AS (
       |  SELECT query_id, vec_id, adist2,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY adist2, vec_id) AS rank
       |  FROM pqsc)""".stripMargin
  }

  /** [[lloydCtes]] extended with the trained-IVF probe/rerank chain
    * (integer probe ordering over the trained c3 centroids, nprobe=2,
    * exact rerank cosine in `r`) — shared by the ann_ivf_trained_topk and
    * ann_ivf_recall oracles.
    */
  private def ivfTrainedCtes: String =
    s"""$lloydCtes,
       |n2 AS MATERIALIZED (
       |  SELECT vec_id, SUM(v * v) AS n2 FROM qv GROUP BY 1),
       |probes AS (
       |  SELECT query_id, cid AS cell FROM (
       |    SELECT query_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY d2, cid) AS rn
       |    FROM (SELECT q.vec_id AS query_id, c.cid,
       |                 SUM((q.v - c.v) * (q.v - c.v)) AS d2
       |          FROM qv q JOIN c3 c USING (pos)
       |          WHERE q.vec_id < 10 GROUP BY 1, 2))
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.query_id, f.vec_id
       |  FROM probes p JOIN fin f ON f.cid = p.cell
       |  WHERE f.vec_id <> p.query_id),
       |dots AS (
       |  SELECT c.query_id, c.vec_id, SUM(qa.v * qb.v) AS dot
       |  FROM cand c
       |  JOIN qv qa ON qa.vec_id = c.vec_id
       |  JOIN qv qb ON qb.vec_id = c.query_id AND qb.pos = qa.pos
       |  GROUP BY 1, 2),
       |sims AS (
       |  SELECT d.query_id, d.vec_id,
       |    CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
       |      AS cos
       |  FROM dots d
       |  JOIN n2 a ON a.vec_id = d.vec_id
       |  JOIN n2 b ON b.vec_id = d.query_id),
       |r AS (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, vec_id) AS rank
       |  FROM sims)""".stripMargin

  /** [[lloydCtes]] extended with the IVF-ADC chain for the ann_ivfpq_*
    * oracles — re-derives Pq.ivfAdcTopK end to end: residuals of every
    * vector against its trained cell's centroid (rv), residual-space PQ
    * codebooks (the pqCtes assign/floorDiv-update arithmetic over rsv,
    * 2 unrolled joint iterations, ks=16), codes, the nprobe=2 cell probe,
    * per-(query, probed-cell) residual distance tables, and the ADC sum
    * over probed members only. All integer arithmetic — bit-identical to
    * the engine by construction.
    */
  private def ivfPqCtes: String = {
    def assign(c: String, a: String) =
      s"""$a AS MATERIALIZED (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |                         ORDER BY d2, cid) AS rn
         |    FROM (SELECT q.vec_id, q.sub, c.cid,
         |            SUM((q.v - c.v) * (q.v - c.v)) AS d2
         |          FROM rsv q
         |          JOIN $c c ON c.sub = q.sub AND c.spos = q.spos
         |          GROUP BY 1, 2, 3))
         |  WHERE rn = 1)"""
    def update(a: String, c: String) =
      s"""$c AS MATERIALIZED (
         |  SELECT a.sub, a.cid, q.spos,
         |    CAST((SUM(q.v) - (((SUM(q.v) % COUNT(*)) + COUNT(*)) % COUNT(*)))
         |         / COUNT(*) AS BIGINT) AS v
         |  FROM rsv q JOIN $a a ON a.vec_id = q.vec_id AND a.sub = q.sub
         |  GROUP BY 1, 2, 3)"""
    s"""$lloydCtes,
       |rv AS MATERIALIZED (
       |  SELECT q.vec_id, f.cid AS cell, q.pos, q.v - c.v AS v
       |  FROM qv q JOIN fin f USING (vec_id)
       |  JOIN c3 c ON c.cid = f.cid AND c.pos = q.pos),
       |rsv AS MATERIALIZED (
       |  SELECT vec_id, cell, (pos // 8)::INT AS sub, (pos % 8)::INT AS spos, v
       |  FROM rv),
       |rseeds AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
       |rc0 AS MATERIALIZED (
       |  SELECT s.cid, q.sub, q.spos, q.v
       |  FROM rsv q JOIN rseeds s USING (vec_id)),
       |${assign("rc0", "ra1")},
       |${update("ra1", "rc1")},
       |${assign("rc1", "ra2")},
       |${update("ra2", "rc2")},
       |${assign("rc2", "rcodes")},
       |qprobe AS (
       |  SELECT query_id, cid AS cell FROM (
       |    SELECT query_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY d2, cid) AS rn
       |    FROM (SELECT q.vec_id AS query_id, c.cid,
       |                 SUM((q.v - c.v) * (q.v - c.v)) AS d2
       |          FROM qv q JOIN c3 c USING (pos)
       |          WHERE q.vec_id < 10 GROUP BY 1, 2))
       |  WHERE rn <= 2),
       |qrsv AS MATERIALIZED (
       |  SELECT p.query_id, p.cell, (q.pos // 8)::INT AS sub,
       |         (q.pos % 8)::INT AS spos, q.v - c.v AS v
       |  FROM qprobe p JOIN qv q ON q.vec_id = p.query_id
       |  JOIN c3 c ON c.cid = p.cell AND c.pos = q.pos),
       |qtab AS MATERIALIZED (
       |  SELECT r.query_id, r.cell, r.sub, c.cid AS code,
       |         SUM((r.v - c.v) * (r.v - c.v)) AS pd2
       |  FROM qrsv r JOIN rc2 c ON c.sub = r.sub AND c.spos = r.spos
       |  GROUP BY 1, 2, 3, 4),
       |vcell AS (SELECT DISTINCT vec_id, cell FROM rsv),
       |ipsc AS MATERIALIZED (
       |  SELECT t.query_id, e.vec_id, CAST(SUM(t.pd2) AS BIGINT) AS adist2
       |  FROM rcodes e JOIN vcell vc USING (vec_id)
       |  JOIN qtab t ON t.cell = vc.cell AND t.sub = e.sub AND t.code = e.cid
       |  GROUP BY 1, 2),
       |iprk AS (
       |  SELECT query_id, vec_id, adist2,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY adist2, vec_id) AS rank
       |  FROM ipsc)""".stripMargin
  }

  /** Unrolled BPE-training CTE chain for the bpe_merges / doc_bpe_tokens
    * oracles — re-derives text/Bpe.train round for round: wf0 is the
    * char-split word-frequency table; each round counts symbol bigrams,
    * picks the (cnt desc, l, r) argmax, and applies it greedy-leftmost.
    * Greedy-leftmost in SQL is the gaps-islands even rule: within each run
    * of CONSECUTIVE candidate positions (only l = r produces runs), apply
    * at odd in-run ranks, then drop positions whose predecessor applied —
    * provably the same pairing as the engine's left fold. Round k's state
    * lands in wf`k`, the learned pair in best`k`.
    */
  /** Unrolled Jones-Plassmann rounds for the graph_coloring oracle: the
    * identical fixed Lehmer priority, winner rule, and mex — rounds past
    * the fixpoint are idempotent (empty frontiers).
    */
  private def jpCtes(rounds: Int, ldf: Boolean = false): String = {
    val hashPri = "((id % 2147483647) * 2654435761 + 42) % 2147483647" +
      " * 48271 % 2147483647 * 4294967296 + id % 4294967296"
    // LDF: (degree, hash, id) lexicographic as one exact HUGEINT — the
    // engine's decimal(38,0) encoding, bit for bit
    val pri =
      if (ldf) s"CAST(deg AS HUGEINT) * 9223372036854775808 + ($hashPri)"
      else s"CAST($hashPri AS BIGINT)"
    val ids =
      if (ldf) "SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY 1"
      else "SELECT DISTINCT src AS id FROM und"
    val per = (1 to rounds).map { k =>
      s"""m$k AS (SELECT u.src AS id, MAX(p.pri) AS maxnp
         |  FROM und u JOIN u${k - 1} p ON p.id = u.dst GROUP BY 1),
         |w$k AS MATERIALIZED (
         |  SELECT q.id FROM u${k - 1} q LEFT JOIN m$k m ON m.id = q.id
         |  WHERE m.maxnp IS NULL OR q.pri > m.maxnp),
         |s$k AS (SELECT w.id, list(DISTINCT c.color) AS used
         |  FROM w$k w JOIN und u ON u.src = w.id
         |  JOIN col${k - 1} c ON c.id = u.dst GROUP BY 1),
         |c$k AS (SELECT w.id, CAST(COALESCE(
         |    list_min(list_filter(range(0, len(s.used) + 1),
         |      x -> NOT list_contains(s.used, x))), 0) AS BIGINT) AS color
         |  FROM w$k w LEFT JOIN s$k s ON s.id = w.id),
         |col$k AS MATERIALIZED (
         |  SELECT * FROM col${k - 1} UNION ALL SELECT * FROM c$k),
         |u$k AS MATERIALIZED (
         |  SELECT q.id, q.pri FROM u${k - 1} q LEFT JOIN w$k w ON w.id = q.id
         |  WHERE w.id IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM ${Fixtures.sqlOf("planted_ring_cliques")}
       |    UNION ALL
       |    SELECT dst, src FROM ${Fixtures.sqlOf("planted_ring_cliques")})
       |  WHERE src <> dst),
       |u0 AS MATERIALIZED (
       |  SELECT id, $pri AS pri FROM ($ids)),
       |col0 AS (SELECT CAST(NULL AS BIGINT) AS id,
       |         CAST(NULL AS BIGINT) AS color WHERE FALSE),
       |$per""".stripMargin
  }

  /** Unrolled Luby-MIS rounds for the graph_mis oracle: the coloring
    * oracle's priority contest, but winners retire their whole
    * neighborhood each round; extra unrolled rounds are idempotent.
    */
  private def misCtes(rounds: Int): String = {
    val pri = "((id % 2147483647) * 2654435761 + 42) % 2147483647" +
      " * 48271 % 2147483647 * 4294967296 + id % 4294967296"
    val per = (1 to rounds).map { k =>
      s"""m$k AS (SELECT u.src AS id, MAX(p.pri) AS maxnp
         |  FROM und u JOIN u${k - 1} p ON p.id = u.dst GROUP BY 1),
         |w$k AS MATERIALIZED (
         |  SELECT q.id FROM u${k - 1} q LEFT JOIN m$k m ON m.id = q.id
         |  WHERE m.maxnp IS NULL OR q.pri > m.maxnp),
         |mis$k AS MATERIALIZED (
         |  SELECT * FROM mis${k - 1}
         |  UNION ALL SELECT id, CAST($k AS BIGINT) AS mis_round FROM w$k),
         |u$k AS MATERIALIZED (
         |  SELECT q.id, q.pri FROM u${k - 1} q
         |  LEFT JOIN w$k w ON w.id = q.id
         |  LEFT JOIN (SELECT DISTINCT u.src AS id
         |    FROM und u JOIN w$k ww ON ww.id = u.dst) nw ON nw.id = q.id
         |  WHERE w.id IS NULL AND nw.id IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM ${Fixtures.sqlOf("planted_ring_cliques")}
       |    UNION ALL
       |    SELECT dst, src FROM ${Fixtures.sqlOf("planted_ring_cliques")})
       |  WHERE src <> dst),
       |u0 AS MATERIALIZED (
       |  SELECT id, CAST($pri AS BIGINT) AS pri FROM (
       |    SELECT DISTINCT src AS id FROM und)),
       |mis0 AS (SELECT CAST(NULL AS BIGINT) AS id,
       |         CAST(NULL AS BIGINT) AS mis_round WHERE FALSE),
       |$per""".stripMargin
  }

  private def bpeCtes(m: Int): String = {
    def round(k: Int): String = {
      val prev = s"wf${k - 1}"
      s"""pc$k AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p
         |    FROM $prev WHERE len(syms) >= 2) GROUP BY 1, 2),
         |best$k AS MATERIALIZED (
         |  SELECT l, r, cnt FROM pc$k ORDER BY cnt DESC, l ASC, r ASC
         |  LIMIT 1),
         |app$k AS (
         |  SELECT word, freq, i, s, c,
         |    CASE WHEN c = 1 AND ROW_NUMBER() OVER (
         |        PARTITION BY word, c, i - rnc ORDER BY i) % 2 = 1
         |      THEN 1 ELSE 0 END AS a
         |  FROM (
         |    SELECT word, freq, i, s, c,
         |      ROW_NUMBER() OVER (PARTITION BY word, c ORDER BY i) AS rnc
         |    FROM (
         |      SELECT word, freq, e.p AS i, e.s AS s,
         |        CASE WHEN e.s = (SELECT l FROM best$k)
         |              AND LEAD(e.s) OVER (PARTITION BY word ORDER BY e.p)
         |                  = (SELECT r FROM best$k)
         |             THEN 1 ELSE 0 END AS c
         |      FROM (SELECT word, freq,
         |              unnest(list_transform(range(1, len(syms) + 1),
         |                j -> struct_pack(p := j, s := syms[j]))) AS e
         |            FROM $prev)))),
         |wf$k AS MATERIALIZED (
         |  SELECT word, MIN(freq) AS freq,
         |    list(CASE WHEN a = 1 THEN s || (SELECT r FROM best$k) ELSE s END
         |         ORDER BY i) AS syms
         |  FROM (SELECT *, COALESCE(LAG(a) OVER (
         |          PARTITION BY word ORDER BY i), 0) AS pa FROM app$k)
         |  WHERE pa = 0 GROUP BY word)"""
    }
    s"""WITH wf0 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       |    list_transform(range(1, length(word) + 1), j -> word[j:j]) AS syms
       |  FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0
       |            THEN []::VARCHAR[]
       |            ELSE regexp_split_to_array(trim(text), '\\s+') END) AS word
       |        FROM documents)
       |  GROUP BY word),
       |${(1 to m).map(round).mkString(",\n")}""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       SUM(l_extendedprice) AS sum_price,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "graph_edges" ->
      s"WITH edges AS (\n$E\n) SELECT src, dst, weight FROM edges ORDER BY src, dst",
    "graph_degrees" ->
      s"""WITH edges AS (
         |$E
         |)
         |SELECT id, CAST(SUM(o) AS BIGINT) AS out_deg,
         |       CAST(SUM(i) AS BIGINT) AS in_deg,
         |       CAST(SUM(o) + SUM(i) AS BIGINT) AS deg
         |FROM (
         |  SELECT src AS id, 1 AS o, 0 AS i FROM edges
         |  UNION ALL SELECT dst, 0, 1 FROM edges)
         |GROUP BY id ORDER BY id""".stripMargin,
    "pagerank_iters" -> PageRank.oracleSql(E, PrIters, 5),
    "pagerank_converged" -> PageRank.convergedOracleSql(E, 1e-6, 200, 8),
    "pagerank_personalized" ->
      PageRank.personalizedOracleSql(E, PprSeeds, PrIters, 8),
    "hits" -> graft.algos.Hits.oracleSql(E, HitsIters, 6),
    "ktruss" -> graft.algos.Truss.oracleSql(E, k = 4, rounds = 20),
    "pagerank_top20" ->
      // reuse the unrolled CTE chain, change the final projection to top-20
      PageRank.oracleSql(E, PrIters, 5).replace(
        s"FROM r$PrIters ORDER BY id",
        s"FROM r$PrIters ORDER BY 2 DESC, id LIMIT 20"),
    "connected_components" -> ConnectedComponents.oracleSql(E, CcIters),
    "component_sizes" -> {
      val cc = ConnectedComponents.oracleSql(E, CcIters)
      s"""WITH cc AS (
         |${cc.linesIterator.map("  " + _).mkString("\n")}
         |)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS cnt FROM cc
         |GROUP BY label ORDER BY cnt DESC, label""".stripMargin
    },
    "label_propagation" -> LabelPropagation.oracleSql(E, LpaIters),
    "degree_distribution" ->
      s"""WITH edges AS (
         |$E
         |),
         |deg AS (
         |  SELECT id, CAST(SUM(c) AS BIGINT) AS deg FROM (
         |    SELECT src AS id, 1 AS c FROM edges
         |    UNION ALL SELECT dst, 1 FROM edges)
         |  GROUP BY id)
         |SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_vertices
         |FROM deg GROUP BY deg ORDER BY deg""".stripMargin,
    "triangle_total" -> TriangleCount.totalOracleSql(E),
    "triangle_per_vertex" -> TriangleCount.perVertexOracleSql(E),
    "graph_clustering" -> TriangleCount.clusteringOracleSql(E),

    "msf" ->
      // the fixture's construction makes the unique MSF exactly the rows
      // with weight < 1 (see Planted.msfGraph); if Boruvka picked any other
      // edge set the hash compare fails
      s"""SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, weight
         |FROM ${Fixtures.sqlOf("planted_msf")}
         |WHERE weight < 1.0 ORDER BY u, v""".stripMargin,
    "scc" ->
      // expected label = max member id of each planted cluster (coloring
      // roots); arithmetic from the fixture's vertex set (Planted.sccGraph)
      s"""WITH e AS (SELECT * FROM ${Fixtures.sqlOf("planted_scc")}),
         |v AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM e UNION ALL SELECT dst FROM e))
         |SELECT id, (id // 8) * 8 + ((id // 8) % 7) AS scc
         |FROM v ORDER BY id""".stripMargin,
    "scc_hybrid" ->
      s"""WITH e AS (SELECT * FROM ${Fixtures.sqlOf("planted_scc")}),
         |v AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM e UNION ALL SELECT dst FROM e))
         |SELECT id, (id // 8) * 8 + ((id // 8) % 7) AS scc
         |FROM v ORDER BY id""".stripMargin,
    "kcores" -> graft.algos.KCores.oracleSql(E),
    "svd_topk" ->
      // exact spectrum by construction: disjoint rank-1 blocks ⇒ σ_g is the
      // per-block Frobenius norm (rows 50g..50g+49), computable in SQL
      s"""WITH m AS (SELECT * FROM ${Fixtures.sqlOf("planted_lowrank")}),
         |b AS (SELECT i // 50 AS g, SUM(value * value) AS s2
         |      FROM m GROUP BY 1),
         |r AS (SELECT sqrt(s2) AS sigma,
         |             ROW_NUMBER() OVER (ORDER BY s2 DESC) AS rank
         |      FROM b)
         |SELECT CAST(rank AS INT) AS rank,
         |       CAST(FLOOR(sigma * 1e4 + 0.5) AS BIGINT) AS sigma_q4
         |FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin,
    "svdpp_blocks" ->
      // expected = the planted block means (training must recover them to
      // within the integer rounding margin or the hash compare fails)
      s"""SELECT "user" // 20 AS ug, item // 20 AS ig,
         |       CAST(CASE WHEN "user" // 20 = item // 20 THEN 4 ELSE 2 END
         |            AS BIGINT) AS mean_pred
         |FROM ${Fixtures.sqlOf("planted_ratings")}
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "louvain_communities" ->
      // closed-form planted partition: each size-5 clique is one community
      // labeled by its min member (the engine's relabel convention)
      s"""SELECT id, (id // 5) * 5 AS community FROM (
         |  SELECT DISTINCT src AS id
         |  FROM ${Fixtures.sqlOf("planted_ring_cliques")}
         |  UNION
         |  SELECT DISTINCT dst FROM ${Fixtures.sqlOf("planted_ring_cliques")})
         |ORDER BY id""".stripMargin,
    "graph_coloring" ->
      // the full JP round loop re-derived in DuckDB (20 unrolled rounds,
      // extras idempotent); identical priority, winner, and mex arithmetic
      s"""${jpCtes(20)}
         |SELECT id, color FROM col20 ORDER BY id""".stripMargin,
    "graph_coloring_ldf" ->
      // the LDF loop with HUGEINT (degree, hash, id) priorities — same
      // unroll-past-fixpoint idempotence
      s"""${jpCtes(20, ldf = true)}
         |SELECT id, color FROM col20 ORDER BY id""".stripMargin,
    "doc_nb_classifier" ->
      // full NB retrain + rescore in DuckDB: identical hashing, add-one
      // smoothing, per-feature q6 ln quantization BEFORE the sums
      s"""WITH docs AS (SELECT * FROM ${Fixtures.sqlOf(
            "planted_two_domain_docs")}),
         |toks AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM docs WHERE length(trim(text)) > 0),
         |feats AS MATERIALIZED (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(tok), 1, 7))::BIGINT % 4096 AS fid,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM toks GROUP BY 1, 2),
         |lab AS (SELECT doc_id, label AS y,
         |    CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END AS train
         |  FROM docs),
         |tr AS MATERIALIZED (
         |  SELECT f.fid, f.x, l.y FROM feats f
         |  JOIN lab l USING (doc_id) WHERE l.train = 1),
         |perf AS (SELECT fid,
         |    CAST(SUM(CASE WHEN y > 0 THEN x ELSE 0 END) AS BIGINT) AS cp,
         |    CAST(SUM(CASE WHEN y < 0 THEN x ELSE 0 END) AS BIGINT) AS cn
         |  FROM tr GROUP BY 1),
         |tot AS (SELECT
         |    CAST(SUM(CASE WHEN y > 0 THEN x ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN y < 0 THEN x ELSE 0 END) AS BIGINT) AS tn
         |  FROM tr),
         |w AS MATERIALIZED (SELECT fid,
         |    CAST(FLOOR(LN((cp + 1.0) / (tp + 4096)) * 1e6 + 0.5) AS BIGINT)
         |    - CAST(FLOOR(LN((cn + 1.0) / (tn + 4096)) * 1e6 + 0.5) AS BIGINT)
         |      AS w
         |  FROM perf, tot),
         |b AS (SELECT CAST(FLOOR(LN(
         |    SUM(CASE WHEN y > 0 THEN 1.0 ELSE 0 END) /
         |    SUM(CASE WHEN y < 0 THEN 1.0 ELSE 0 END)) * 1e6 + 0.5)
         |    AS BIGINT) AS b FROM lab WHERE train = 1),
         |sc AS (SELECT f.doc_id, CAST(SUM(f.x * w.w) AS BIGINT) AS m
         |  FROM feats f JOIN w USING (fid) GROUP BY 1)
         |SELECT l.doc_id, l.y, CAST(l.train AS BIGINT) AS train,
         |  COALESCE(sc.m, 0) + b.b AS margin,
         |  CAST(CASE WHEN COALESCE(sc.m, 0) + b.b > 0 THEN 1
         |       ELSE -1 END AS BIGINT) AS pred
         |FROM lab l LEFT JOIN sc USING (doc_id), b
         |ORDER BY l.doc_id""".stripMargin,
    "graph_mis" ->
      // the Luby loop re-derived in DuckDB (12 unrolled rounds, extras
      // idempotent); identical priority contest, neighborhood retirement
      s"""${misCtes(12)}
         |SELECT id, mis_round FROM mis12 ORDER BY id""".stripMargin,
    "graph_link_prediction" ->
      graft.algos.LinkPrediction.oracleSql(E, maxApexDegree = 64L,
        minCn = 2L, topK = 200),
    "louvain_multilevel" ->
      // closed-form hierarchical plant: the final (level-2) community of v
      // is its clique PAIR's min member — cliques of 6, pairs of 12
      s"""SELECT id, (id // 12) * 12 AS community FROM (
         |  SELECT DISTINCT src AS id
         |  FROM ${Fixtures.sqlOf("planted_paired_cliques")}
         |  UNION
         |  SELECT DISTINCT dst FROM ${Fixtures.sqlOf("planted_paired_cliques")})
         |ORDER BY id""".stripMargin,
    "graph_modularity" ->
      // Q recomputed from the fixture + closed-form partition; HUGEINT
      // sums cast to BIGINT/DOUBLE to match the engine's 64-bit ledger
      s"""WITH fx AS (SELECT * FROM ${Fixtures.sqlOf("planted_paired_cliques")}),
         |win AS (
         |  SELECT COALESCE(SUM(w), 0) AS win FROM fx
         |  WHERE (src // 12) * 12 = (dst // 12) * 12),
         |deg AS (
         |  SELECT id, SUM(w) AS k FROM (
         |    SELECT src AS id, w FROM fx UNION ALL SELECT dst, w FROM fx)
         |  GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(s * s) AS BIGINT) AS ss,
         |         CAST(SUM(s) AS BIGINT) AS m2 FROM (
         |    SELECT (id // 12) * 12 AS c, SUM(k) AS s FROM deg GROUP BY 1))
         |SELECT CAST(FLOOR(
         |    CAST(m2 * 2 * win - ss AS DOUBLE)
         |      / CAST(m2 * m2 AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q_q6,
         |  m2
         |FROM win CROSS JOIN tot""".stripMargin,
    "graph_assortativity" ->
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |b AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         |deg AS MATERIALIZED (
         |  SELECT u AS id, CAST(COUNT(*) AS BIGINT) AS d FROM b GROUP BY 1),
         |p AS (SELECT dj.d AS dj, dk.d AS dk
         |      FROM b JOIN deg dj ON dj.id = b.u JOIN deg dk ON dk.id = b.v),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |        CAST(SUM(dj * dk) AS DOUBLE) AS sjk,
         |        CAST(SUM(dj) AS DOUBLE) AS sj,
         |        CAST(SUM(dj * dj) AS DOUBLE) AS sjj FROM p)
         |SELECT m AS m_directed,
         |  CAST(FLOOR((CAST(m AS DOUBLE) * sjk - sj * sj)
         |    / (CAST(m AS DOUBLE) * sjj - sj * sj) * 1e6 + 0.5) AS BIGINT)
         |    AS r_q6
         |FROM s""".stripMargin,
    "timesvdpp_drift" ->
      // expected = the planted block means SHIFTED by the antisymmetric
      // drift (±1 by user group × bucket) — a static or bias-only model
      // flattens t and fails the integer rounding
      s"""SELECT "user" // 20 AS ug, item // 20 AS ig, t,
         |  CAST(CASE WHEN "user" // 20 = item // 20 THEN 4 ELSE 2 END
         |       + CASE WHEN "user" // 20 = 0 THEN 2 * t - 1
         |              ELSE 1 - 2 * t END AS BIGINT) AS mean_pred
         |FROM ${Fixtures.sqlOf("planted_temporal")}
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "adpredictor" ->
      // expected predict == y: the planted design is linearly separable and
      // the class features' posterior means carry the whole decision
      s"""SELECT sample, y, y AS predict
         |FROM ${Fixtures.sqlOf("planted_clicks")}
         |ORDER BY sample""".stripMargin,
    "cf_baseline" ->
      """WITH r AS MATERIALIZED (
        |  SELECT l_suppkey AS u, l_partkey AS i,
        |         CAST(l_quantity AS DOUBLE) AS rating FROM lineitem),
        |g AS (SELECT AVG(rating) AS p FROM r),
        |um AS (SELECT u, AVG(rating) AS p FROM r GROUP BY 1),
        |im AS (SELECT i, AVG(rating) AS p FROM r GROUP BY 1)
        |SELECT algo, CAST(FLOOR(rmse * 1e6 + 0.5) AS BIGINT) AS rmse_q6
        |FROM (
        |  SELECT 'global_mean' AS algo, SQRT(AVG(POW(rating -
        |    LEAST(GREATEST((SELECT p FROM g), 5), 30), 2))) AS rmse FROM r
        |  UNION ALL
        |  SELECT 'user_mean', SQRT(AVG(POW(rating -
        |    LEAST(GREATEST(um.p, 5), 30), 2)))
        |  FROM r JOIN um USING (u)
        |  UNION ALL
        |  SELECT 'item_mean', SQRT(AVG(POW(rating -
        |    LEAST(GREATEST(im.p, 5), 30), 2)))
        |  FROM r JOIN im USING (i))
        |ORDER BY algo""".stripMargin,
    "cf_ap_at_k" ->
      """WITH pred AS (
        |  SELECT l_orderkey AS u, l_partkey AS i,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rnk
        |  FROM lineitem),
        |act AS (
        |  SELECT l_orderkey AS u, l_partkey AS i,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey)
        |      AS pos FROM lineitem),
        |atr AS MATERIALIZED (SELECT * FROM act WHERE pos <= 3),
        |asize AS (SELECT u, COUNT(*) AS asize FROM atr GROUP BY 1),
        |mem AS (SELECT DISTINCT u, i FROM atr),
        |sc AS (
        |  SELECT p.u, p.rnk,
        |         CASE WHEN m.i IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM pred p LEFT JOIN mem m ON m.u = p.u AND m.i = p.i
        |  WHERE p.rnk <= 3),
        |cum AS (
        |  SELECT u, rnk, hit,
        |         SUM(hit) OVER (PARTITION BY u ORDER BY rnk) AS cum_hits
        |  FROM sc),
        |sco AS (SELECT u, SUM(hit * cum_hits * (6 // rnk)) AS num
        |        FROM cum GROUP BY 1)
        |SELECT s.u AS orderkey,
        |  CAST(FLOOR(num / (LEAST(asize, 3) * 6) * 1e6 + 0.5) AS BIGINT)
        |    AS ap_q6
        |FROM sco s JOIN asize a ON a.u = s.u ORDER BY orderkey""".stripMargin,
    "cf_rating_topk" ->
      // dyadic factor values make every dot product exact, so the DuckDB
      // join+SUM ranking is bit-identical to Spark's zip_with/aggregate;
      // exclusion set recomputed arithmetically ((u*3+i)%7=0), tie-break
      // after the [-4,4] clamp is item ascending on both sides
      s"""WITH f AS MATERIALIZED (
         |  SELECT * FROM ${Fixtures.sqlOf("planted_cf_factors")}),
         |p AS (SELECT u.id AS usr, v.id AS itm, SUM(u.val * v.val) AS dot
         |      FROM (SELECT * FROM f WHERE side = 'u') u
         |      JOIN (SELECT * FROM f WHERE side = 'v') v USING (pos)
         |      GROUP BY 1, 2),
         |c AS (SELECT usr, itm, LEAST(GREATEST(dot, -4), 4) AS pred
         |      FROM p WHERE (usr * 3 + itm) % 7 <> 0),
         |r AS (SELECT usr, itm, pred, ROW_NUMBER() OVER (
         |        PARTITION BY usr ORDER BY pred DESC, itm) AS rnk FROM c)
         |SELECT usr AS "user", CAST(rnk AS INT) AS rank, itm AS item,
         |       CAST(FLOOR(pred * 1e6 + 0.5) AS BIGINT) AS pred_q6
         |FROM r WHERE rnk <= 5 ORDER BY 1, 2""".stripMargin,
    "coem" ->
      // expected hard label = planted block membership (bridge 150 → block
      // A by its 3-vs-1 co-occurrence weight), Planted.coemGraph scaladoc
      s"""WITH e AS (SELECT * FROM ${Fixtures.sqlOf("planted_coem")}),
         |v AS (SELECT DISTINCT src AS id FROM e)
         |SELECT id,
         |       CAST(CASE WHEN id < 50 OR (id BETWEEN 100 AND 124)
         |                      OR id = 150
         |                 THEN 1 ELSE 2 END AS BIGINT) AS label
         |FROM v ORDER BY id""".stripMargin,
    "cf_item_similarity" ->
      """WITH inter AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |udeg AS (SELECT u, COUNT(*) AS udeg FROM inter GROUP BY 1),
        |bounded AS MATERIALIZED (
        |  SELECT inter.u, inter.i FROM inter JOIN udeg USING (u)
        |  WHERE udeg <= 1000),
        |ideg AS MATERIALIZED (SELECT i, COUNT(*) AS ideg FROM bounded GROUP BY 1),
        |co AS MATERIALIZED (
        |  SELECT a.i AS item_a, b.i AS item_b, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM bounded a JOIN bounded b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sims AS (
        |  SELECT item_a, item_b,
        |         x / (sa.ideg + sb.ideg - x) AS jaccard
        |  FROM co
        |  JOIN ideg sa ON sa.i = item_a
        |  JOIN ideg sb ON sb.i = item_b),
        |sym AS (
        |  SELECT item_a AS item, item_b AS other, jaccard AS sim FROM sims
        |  UNION ALL SELECT item_b, item_a, jaccard FROM sims),
        |r AS (
        |  SELECT item, other, sim,
        |         ROW_NUMBER() OVER (PARTITION BY item
        |                            ORDER BY sim DESC, other) AS rank
        |  FROM sym)
        |SELECT item, other, CAST(FLOOR(sim * 1e6 + 0.5) AS BIGINT) AS sim_q6,
        |       CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    "prov_json_edges" -> {
      val fx = Fixtures.sqlOf("prov_json_docs")
      val vvocab = graft.sources.ProvJsonReader.VertexTypes
        .map { case (n, i) => s"('$n', $i)" }.mkString(", ")
      val evocab = graft.sources.ProvJsonReader.EdgeTypes
        .map { case (n, i) => s"('$n', $i)" }.mkString(", ")
      def vcat(name: String) =
        s"""SELECT k AS vid_str,
           |  COALESCE(json_extract_string(value, '/$name/' || k || '/prov:type'),
           |           'unknown') AS vtype_str
           |FROM (SELECT value, unnest(json_keys(value, '$$.$name')) AS k
           |      FROM docs)""".stripMargin
      def rcat(name: String, sf: String, df: String) =
        s"""SELECT
           |  json_extract_string(value, '/$name/' || k || '/$sf') AS src_str,
           |  json_extract_string(value, '/$name/' || k || '/$df') AS dst_str,
           |  COALESCE(json_extract_string(value, '/$name/' || k || '/prov:type'),
           |           'unknown') AS etype_str
           |FROM (SELECT value, unnest(json_keys(value, '$$.$name')) AS k
           |      FROM docs)""".stripMargin
      s"""WITH docs AS MATERIALIZED (SELECT value FROM $fx),
         |vvocab(name, vt) AS (VALUES $vvocab),
         |evocab(name, et) AS (VALUES $evocab),
         |decls AS (
         |  SELECT vid_str, MIN(vtype_str) AS vtype_str FROM (
         |    ${vcat("activity")}
         |    UNION ALL ${vcat("entity")}
         |    UNION ALL ${vcat("agent")})
         |  GROUP BY 1),
         |verts AS MATERIALIZED (
         |  SELECT d.vid_str, ROW_NUMBER() OVER (ORDER BY d.vid_str) - 1 AS vid,
         |         COALESCE(v.vt, 0) AS vtype
         |  FROM decls d LEFT JOIN vvocab v ON v.name = d.vtype_str),
         |rels AS (
         |  ${rcat("used", "prov:entity", "prov:activity")}
         |  UNION ALL ${rcat("wasGeneratedBy", "prov:activity", "prov:entity")}
         |  UNION ALL ${rcat("wasInformedBy", "prov:informant", "prov:informed")}
         |  UNION ALL ${rcat("wasDerivedFrom", "prov:usedEntity",
              "prov:generatedEntity")})
         |SELECT 'prov' AS graph_id, s.vid AS src, d.vid AS dst,
         |       s.vtype AS src_type, d.vtype AS dst_type,
         |       COALESCE(e.et, 0) AS edge_type
         |FROM rels r
         |JOIN verts s ON s.vid_str = r.src_str
         |JOIN verts d ON d.vid_str = r.dst_str
         |LEFT JOIN evocab e ON e.name = r.etype_str
         |WHERE r.src_str IS NOT NULL AND r.dst_str IS NOT NULL
         |ORDER BY src, dst, edge_type""".stripMargin
    },
    "frap_wl_kernels" -> graft.frap.WLRelabel.kernelOracleSql(
      Fixtures.sqlOf("prov_corpus_7"), 3),
    "frap_distance_matrix" -> graft.frap.WLRelabel.distanceOracleSql(
      Fixtures.sqlOf("prov_corpus_7"), 3),
    "frap_detect" ->
      // Expected-verdict table, known by the planted corpus' construction
      // (ProvGen: normals are a tight pipeline family, bad-000 adds a
      // socket-exfiltration star + mass file reads — the reference's own
      // results ledger records verdicts the same way, myapps/results.md).
      // The oracle also cross-checks the plant against the persisted fixture:
      // verdicts are only emitted if bad-000 really does carry connect-type
      // edges (edge_type=3) that no normal graph has.
      s"""WITH corpus AS (SELECT * FROM ${Fixtures.sqlOf("prov_corpus_12")}),
         |planted AS (
         |  SELECT graph_id,
         |         SUM(CASE WHEN edge_type = 3 THEN 1 ELSE 0 END) AS n_connect
         |  FROM corpus WHERE graph_id IN ('normal-010', 'bad-000')
         |  GROUP BY 1)
         |SELECT graph_id,
         |       (n_connect = 0) AS within_radius,
         |       (n_connect > 0) AS abnormal
         |FROM planted ORDER BY graph_id""".stripMargin,
    "frap_monitor_scale" ->
      // planted expectation for the held-out pair: inside the learned
      // radius iff no socket-connect edges (edge_type=3)
      s"""WITH corpus AS (SELECT * FROM ${Fixtures.sqlOf("prov_corpus_12")}),
         |planted AS (
         |  SELECT graph_id,
         |         SUM(CASE WHEN edge_type = 3 THEN 1 ELSE 0 END) AS n_connect
         |  FROM corpus WHERE graph_id IN ('normal-010', 'bad-000')
         |  GROUP BY 1)
         |SELECT graph_id, (n_connect = 0) AS within_radius
         |FROM planted ORDER BY graph_id""".stripMargin,
    "frap_monitor_stream" ->
      // stream ≡ batch for per-graph classification: the planted expectation
      // is the same as frap_monitor_scale's
      s"""WITH corpus AS (SELECT * FROM ${Fixtures.sqlOf("prov_corpus_12")}),
         |planted AS (
         |  SELECT graph_id,
         |         SUM(CASE WHEN edge_type = 3 THEN 1 ELSE 0 END) AS n_connect
         |  FROM corpus WHERE graph_id IN ('normal-010', 'bad-000')
         |  GROUP BY 1)
         |SELECT graph_id, (n_connect = 0) AS within_radius
         |FROM planted ORDER BY graph_id""".stripMargin,
    "random_walks" -> graft.algos.RandomWalks.oracleSql(E,
      nSources = 50, walksPerSource = 10, steps = 4),
    "node2vec_walks" -> graft.algos.RandomWalks.node2vecOracleSql(E,
      nSources = 30, walksPerSource = 5, steps = 4, p = 4, q = 2),
    "graph_ppmi" -> graft.algos.GraphEmbed.ppmiOracleSql(E,
      nSources = 30, walksPerSource = 5, steps = 4, p = 4, q = 2,
      window = 2),
    "sssp" -> graft.algos.GraphOps.ssspOracleSql(E,
      LinkGraph.CUST + 1L, rounds = 8, roundTo = 6),
    "bond_percolation" ->
      graft.algos.GraphOps.bondPercolationOracleSql(E, 0.5),

    "neighborhood_function" ->
      s"""$LandmarkBfsCte
         |SELECT b.seed, CAST(t.t AS BIGINT) AS t,
         |       CAST(COUNT(*) AS BIGINT) AS n_reached
         |FROM b3 b, range(0, 4) t(t) WHERE b.dist <= t.t
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "harmonic_centrality" ->
      s"""$LandmarkBfsCte
         |SELECT seed, CAST(SUM(CASE dist WHEN 1 THEN 6 WHEN 2 THEN 3
         |                                WHEN 3 THEN 2 ELSE 0 END) AS BIGINT)
         |         AS harmonic_x6
         |FROM b3 WHERE dist > 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "betweenness_centrality" ->
      // forward: level-synchronized σ path counts (3 unrolled rounds);
      // backward: per-DAG-edge integer q6 terms, identical DIV flooring
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
         |verts AS MATERIALIZED (
         |  SELECT DISTINCT id FROM (
         |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |n0 AS MATERIALIZED (
         |  SELECT id AS seed, id, CAST(1 AS BIGINT) AS sigma
         |  FROM verts WHERE id % 599 = 0),
         |c1 AS (SELECT p.seed, u.dst AS id,
         |         CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |       FROM und u JOIN n0 p ON p.id = u.src GROUP BY 1, 2),
         |n1 AS MATERIALIZED (
         |  SELECT c.seed, c.id, c.sigma FROM c1 c
         |  LEFT JOIN n0 r ON r.seed = c.seed AND r.id = c.id
         |  WHERE r.id IS NULL),
         |r1 AS (SELECT seed, id FROM n0 UNION ALL SELECT seed, id FROM n1),
         |c2 AS (SELECT p.seed, u.dst AS id,
         |         CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |       FROM und u JOIN n1 p ON p.id = u.src GROUP BY 1, 2),
         |n2 AS MATERIALIZED (
         |  SELECT c.seed, c.id, c.sigma FROM c2 c
         |  LEFT JOIN r1 r ON r.seed = c.seed AND r.id = c.id
         |  WHERE r.id IS NULL),
         |r2 AS (SELECT * FROM r1 UNION ALL SELECT seed, id FROM n2),
         |c3 AS (SELECT p.seed, u.dst AS id,
         |         CAST(SUM(p.sigma) AS BIGINT) AS sigma
         |       FROM und u JOIN n2 p ON p.id = u.src GROUP BY 1, 2),
         |n3 AS MATERIALIZED (
         |  SELECT c.seed, c.id, c.sigma FROM c3 c
         |  LEFT JOIN r2 r ON r.seed = c.seed AND r.id = c.id
         |  WHERE r.id IS NULL),
         |d3 AS (SELECT seed, id, sigma, CAST(0 AS BIGINT) AS delta FROM n3),
         |x2 AS (SELECT w.seed, u.src AS id,
         |         CAST(SUM((v.sigma * (1000000 + w.delta)) // w.sigma)
         |           AS BIGINT) AS delta
         |       FROM d3 w JOIN und u ON u.dst = w.id
         |       JOIN n2 v ON v.seed = w.seed AND v.id = u.src
         |       GROUP BY 1, 2),
         |d2 AS MATERIALIZED (
         |  SELECT v.seed, v.id, v.sigma, COALESCE(x2.delta, 0) AS delta
         |  FROM n2 v LEFT JOIN x2 ON x2.seed = v.seed AND x2.id = v.id),
         |x1 AS (SELECT w.seed, u.src AS id,
         |         CAST(SUM((v.sigma * (1000000 + w.delta)) // w.sigma)
         |           AS BIGINT) AS delta
         |       FROM d2 w JOIN und u ON u.dst = w.id
         |       JOIN n1 v ON v.seed = w.seed AND v.id = u.src
         |       GROUP BY 1, 2),
         |d1 AS MATERIALIZED (
         |  SELECT v.seed, v.id, v.sigma, COALESCE(x1.delta, 0) AS delta
         |  FROM n1 v LEFT JOIN x1 ON x1.seed = v.seed AND x1.id = v.id)
         |SELECT id, CAST(SUM(delta) AS BIGINT) AS bc_q6 FROM (
         |  SELECT seed, id, delta FROM d3
         |  UNION ALL SELECT seed, id, delta FROM d2
         |  UNION ALL SELECT seed, id, delta FROM d1)
         |WHERE seed <> id
         |GROUP BY id HAVING SUM(delta) > 0 ORDER BY id""".stripMargin,
    "graph_neighbor_sample" -> {
      // same Lehmer ranking per hop (seed 42+h), dst tie-break; hop-2
      // frontier = distinct hop-1 sample targets
      def hopSql(srcSet: String, seedH: Long, k: Int) =
        s"""SELECT src, dst FROM (
           |  SELECT u.src, u.dst, ROW_NUMBER() OVER (PARTITION BY u.src
           |    ORDER BY ((u.src % 2147483647) * 2654435761
           |              + (u.dst % 2147483647) * 40503 + $seedH)
           |             % 2147483647 * 48271 % 2147483647, u.dst) AS rn
           |  FROM und u JOIN $srcSet f ON f.src = u.src) WHERE rn <= $k"""
          .stripMargin
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
         |verts AS MATERIALIZED (
         |  SELECT DISTINCT id FROM (
         |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |f0 AS (SELECT id AS src FROM verts WHERE id % 599 = 0),
         |s1 AS MATERIALIZED (${hopSql("f0", 43L, 3)}),
         |f1 AS (SELECT DISTINCT dst AS src FROM s1),
         |s2 AS MATERIALIZED (${hopSql("f1", 44L, 2)})
         |SELECT CAST(1 AS BIGINT) AS hop, src, dst FROM s1
         |UNION ALL SELECT CAST(2 AS BIGINT) AS hop, src, dst FROM s2
         |ORDER BY hop, src, dst""".stripMargin
    },

    "graph_negative_sample" ->
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
         |verts AS MATERIALIZED (
         |  SELECT DISTINCT id FROM (
         |    SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |idx AS MATERIALIZED (
         |  SELECT id AS vid,
         |         CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS vidx
         |  FROM verts),
         |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),
         |props AS MATERIALIZED (
         |  SELECT s.src, g.i,
         |    ((s.src % 2147483647) * 2654435761
         |     + (g.i % 2147483647) * 40503 + 42)
         |    % 2147483647 * 48271 % 2147483647 % (SELECT n FROM nv) AS vidx
         |  FROM (SELECT DISTINCT src FROM edges) s, range(0, 12) g(i)),
         |cand AS MATERIALIZED (
         |  SELECT p.src, p.i, x.vid AS dst
         |  FROM props p JOIN idx x USING (vidx) WHERE x.vid <> p.src),
         |nonedge AS MATERIALIZED (
         |  SELECT c.src, c.dst, c.i FROM cand c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM und u WHERE u.src = c.src AND u.dst = c.dst)),
         |dedup AS (SELECT src, dst, MIN(i) AS i FROM nonedge GROUP BY 1, 2)
         |SELECT src, dst,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY i) AS BIGINT)
         |    AS neg_rank
         |FROM dedup QUALIFY neg_rank <= 3 ORDER BY src, neg_rank""".stripMargin,

    "khop_subgraph" -> {
      // 3 unrolled BFS rounds from seed CUST+1 over the undirected view,
      // then the induced directed edge set
      val hops = (1 to 3).map { k =>
        s"""r$k AS MATERIALIZED (
           |  SELECT DISTINCT id FROM (
           |    SELECT id FROM r${k - 1}
           |    UNION ALL
           |    SELECT u.dst FROM und u JOIN r${k - 1} p ON p.id = u.src))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
         |r0 AS (SELECT CAST(${LinkGraph.CUST + 1L} AS BIGINT) AS id),
         |$hops
         |SELECT e.src, e.dst, e.weight
         |FROM edges e
         |JOIN r3 a ON a.id = e.src
         |JOIN r3 b ON b.id = e.dst
         |ORDER BY e.src, e.dst""".stripMargin
    },

    "seeded_label_propagation" -> {
      // 8 unrolled weighted-mix rounds (alpha = 0): seeds frozen, non-seeds
      // adopt the in-weight-normalized neighbor mix each round
      val rounds = (1 to 8).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT id, label, p FROM d0
           |  UNION ALL
           |  SELECT m.id, m.label, m.wp / w.wsum AS p FROM (
           |    SELECT e.dst AS id, d.label, SUM(d.p * e.weight) AS wp
           |    FROM d${k - 1} d JOIN edges e ON e.src = d.id
           |    GROUP BY 1, 2) m
           |  JOIN inw w ON w.dst = m.id
           |  WHERE m.id NOT IN (SELECT id FROM d0))""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS MATERIALIZED (
         |$E
         |),
         |inw AS MATERIALIZED (SELECT dst, SUM(weight) AS wsum FROM edges GROUP BY 1),
         |d0 AS MATERIALIZED (
         |  SELECT * FROM (VALUES
         |    (CAST(${LinkGraph.CUST + 1L} AS BIGINT), CAST(100 AS BIGINT),
         |     CAST(1.0 AS DOUBLE)),
         |    (CAST(${LinkGraph.CUST + 2L} AS BIGINT), CAST(200 AS BIGINT),
         |     CAST(1.0 AS DOUBLE))) t(id, label, p)),
         |$rounds,
         |r AS (
         |  SELECT id, label, p,
         |         ROW_NUMBER() OVER (PARTITION BY id
         |                            ORDER BY p DESC, label DESC) AS rn
         |  FROM d8)
         |SELECT id, label, CAST(FLOOR(p * 1e6 + 0.5) AS BIGINT) AS p_q6
         |FROM r WHERE rn = 1 ORDER BY id""".stripMargin
    },

    "lakehouse_edges" -> {
      val fx = Fixtures.sqlOf("lakehouse_files_20k")
      s"""WITH files AS MATERIALIZED (SELECT * FROM $fx),
         |cat AS MATERIALIZED (
         |  SELECT fkey, ROW_NUMBER() OVER (ORDER BY fkey) - 1 AS fid
         |  FROM (SELECT DISTINCT repo || '/' || path AS fkey FROM files)),
         |refs AS (
         |  SELECT repo || '/' || path AS src_key,
         |         unnest(regexp_extract_all(content, '(?m)^import (.+)$$', 1))
         |           AS dst_key
         |  FROM files)
         |SELECT s.fid AS src, d.fid AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
         |FROM refs
         |JOIN cat s ON s.fkey = refs.src_key
         |JOIN cat d ON d.fkey = refs.dst_key
         |WHERE s.fid <> d.fid
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "lakehouse_manifest" ->
      s"""SELECT repo, path, "commit", sha256(content) AS content_sha256
         |FROM ${Fixtures.sqlOf("lakehouse_files_5k")}
         |ORDER BY repo, path""".stripMargin,

    "code_file_stats" ->
      s"""WITH f AS (SELECT *, string_split(content, chr(10)) AS ls
         |           FROM ${Fixtures.sqlOf("lakehouse_files_5k")}),
         |s AS (SELECT repo, path, lang,
         |  CAST(len(ls) AS BIGINT) AS n_lines,
         |  CAST(list_max(list_transform(ls, x -> length(x))) AS BIGINT)
         |    AS max_line_len,
         |  (length(content) - len(ls) + 1) * 10000 // len(ls) AS avg_line_q4,
         |  length(regexp_replace(content, '[^A-Za-z0-9]', '', 'g')) * 10000
         |    // GREATEST(length(content), 1) AS alnum_q4
         |  FROM f)
         |SELECT repo, path, lang, n_lines, max_line_len,
         |  CAST(avg_line_q4 AS BIGINT) AS avg_line_q4,
         |  CAST(alnum_q4 AS BIGINT) AS alnum_q4,
         |  CAST(CASE WHEN max_line_len <= 1000 AND avg_line_q4 <= 1000000
         |            AND alnum_q4 >= 2500 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM s ORDER BY repo, path""".stripMargin,

    "code_line_dedup" ->
      s"""WITH f AS MATERIALIZED (
         |  SELECT repo || '/' || path AS file,
         |         string_split(content, chr(10)) AS ls
         |  FROM ${Fixtures.sqlOf("lakehouse_files_20k")}),
         |e AS (SELECT file, unnest(range(1, len(ls)+1)) AS pos, ls FROM f),
         |l AS MATERIALIZED (
         |  SELECT file, pos, ls[CAST(pos AS INT)] AS line FROM e),
         |dfc AS (SELECT line, COUNT(*) AS df
         |        FROM (SELECT DISTINCT file, line FROM l) GROUP BY 1),
         |k AS (SELECT l.file, l.pos, l.line
         |      FROM l JOIN dfc USING (line) WHERE df < 3),
         |t AS (SELECT file, CAST(COUNT(*) AS BIGINT) AS n_lines
         |      FROM l GROUP BY 1)
         |SELECT k.file, t.n_lines, CAST(COUNT(*) AS BIGINT) AS kept_lines,
         |  md5(string_agg(k.line, chr(10) ORDER BY k.pos)) AS new_md5
         |FROM k JOIN t ON t.file = k.file
         |GROUP BY k.file, t.n_lines ORDER BY k.file""".stripMargin,

    "lakehouse_fork_detect" ->
      s"""WITH fh AS MATERIALIZED (
         |  SELECT DISTINCT repo, sha256(content) AS h
         |  FROM ${Fixtures.sqlOf("lakehouse_forked_20k")}),
         |sz AS (SELECT repo, COUNT(*) AS n FROM fh GROUP BY 1),
         |sh AS (SELECT h FROM fh GROUP BY h
         |       HAVING COUNT(*) BETWEEN 2 AND 50),
         |fr AS (SELECT fh.repo, fh.h FROM fh JOIN sh USING (h)),
         |p AS (SELECT a.repo AS repo_a, b.repo AS repo_b,
         |             CAST(COUNT(*) AS BIGINT) AS shared
         |      FROM fr a JOIN fr b USING (h) WHERE a.repo < b.repo
         |      GROUP BY 1, 2 HAVING COUNT(*) >= 5)
         |SELECT p.repo_a, p.repo_b, p.shared,
         |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
         |  CAST(p.shared * 1000000 // (sa.n + sb.n - p.shared) AS BIGINT)
         |    AS jaccard_q6
         |FROM p JOIN sz sa ON sa.repo = p.repo_a
         |       JOIN sz sb ON sb.repo = p.repo_b
         |ORDER BY repo_a, repo_b""".stripMargin,

    "doc_exact_dedup" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS dup_cnt
        |FROM documents GROUP BY 1 ORDER BY text_md5""".stripMargin,
    "doc_shuffle_shards" ->
      // same Lehmer arithmetic (P = 2^31−1) in exact BIGINT space; shard =
      // key mod 8, pos = 0-based rank within shard by (key, doc_id)
      """WITH k AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483647) * 2654435761 + 42 * 40503)
        |      % 2147483647 * 48271 % 2147483647 AS kh
        |  FROM documents)
        |SELECT doc_id, CAST(kh % 8 AS INT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY kh % 8
        |    ORDER BY kh, doc_id) - 1 AS INT) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,
    "doc_holdout_split" ->
      // salt 1 stream; cuts 0.75 and 0.75+0.125 = 0.875 are exact dyadic
      // doubles, so the CASE thresholds equal Spark's scanLeft sums
      """WITH k AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483647) * 2654435761 + 42 * 40503 + 69621)
        |      % 2147483647 * 48271 % 2147483647 / 2147483647.0 AS f
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN f < 0.75 THEN 'train'
        |       WHEN f < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM k ORDER BY doc_id""".stripMargin,
    "doc_mixture_sample" ->
      // salt 2 stream for the fractional-copy decision; dyadic weights make
      // w - floor(w) exact on both engines
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
        |                WHEN 'src2' THEN 3.0 WHEN 'src3' THEN 0.25
        |    END AS w,
        |    ((doc_id % 2147483647) * 2654435761 + 42 * 40503 + 2 * 69621)
        |      % 2147483647 * 48271 % 2147483647 / 2147483647.0 AS f
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |e AS (
        |  SELECT doc_id, source, w, f,
        |    UNNEST(generate_series(0, CAST(CEIL(w) AS INT) - 1)) AS copy
        |  FROM d)
        |SELECT doc_id, source, CAST(copy AS INT) AS copy
        |FROM e WHERE copy < FLOOR(w) OR f < w - FLOOR(w)
        |ORDER BY doc_id, copy""".stripMargin,
    "doc_export_pipeline" ->
      // the full chain in one SQL statement: quality q6 formula (as in
      // doc_quality), md5 keep (doc_exact_dedup), 3-gram bench leakage
      // (doc_decontaminate), salt-1 split / salt-2 mixture / salt-0
      // shuffle Lehmer streams (doc_holdout_split / doc_mixture_sample /
      // doc_shuffle_shards) — all dyadic constants so every compare is
      // IEEE-exact in both engines
      """WITH t AS (
        |  SELECT doc_id, text, source,
        |         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(toks,
        |      x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS nstop,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS nws
        |  FROM t),
        |r AS (
        |  SELECT doc_id, ntok,
        |    CASE WHEN ntok > 0 THEN nstop / ntok ELSE 0.0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct / nchars ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN nws / ntok ELSE 0.0 END AS mean_tok_len
        |  FROM m),
        |good AS (
        |  SELECT doc_id FROM r
        |  WHERE CAST(FLOOR((LEAST(ntok / 50.0, 1.0) * 0.4
        |    + LEAST(stop_ratio * 10.0, 1.0) * 0.2
        |    + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0
        |            THEN 1.0 ELSE 0.0 END) * 0.2
        |    + (1.0 - LEAST(punct_ratio * 5.0, 1.0)) * 0.2) * 1e6 + 0.5)
        |    AS BIGINT) >= 700000),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |bench AS (
        |  SELECT doc_id // 50 AS bench_id, toks[1:8] AS bt
        |  FROM t WHERE doc_id % 50 = 0),
        |bsh AS (
        |  SELECT DISTINCT bench_id,
        |    unnest(list_transform(range(1, len(bt) - 1),
        |      i -> array_to_string(bt[i:i+2], ' '))) AS shingle
        |  FROM bench WHERE len(bt) >= 3),
        |dsh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(toks[i:i+2], ' '))) AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |dirty AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, bench_id FROM dsh JOIN bsh USING (shingle)
        |    GROUP BY 1, 2 HAVING COUNT(*) >= 3)),
        |clean AS (
        |  SELECT d.doc_id, d.source FROM documents d
        |  JOIN good USING (doc_id) JOIN keep USING (doc_id)
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)),
        |train AS (
        |  SELECT doc_id, source FROM clean
        |  WHERE ((doc_id % 2147483647) * 2654435761 + 42 * 40503 + 69621)
        |    % 2147483647 * 48271 % 2147483647 / 2147483647.0 < 0.875),
        |mix AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.0 WHEN 'src1' THEN 0.5
        |      WHEN 'src2' THEN 1.5 WHEN 'src3' THEN 0.25
        |      WHEN 'src4' THEN 1.0 WHEN 'src5' THEN 2.5
        |      WHEN 'src6' THEN 0.75 WHEN 'src7' THEN 1.0
        |      WHEN 'src8' THEN 0.5 WHEN 'src9' THEN 1.25 END AS w,
        |    ((doc_id % 2147483647) * 2654435761 + 42 * 40503 + 2 * 69621)
        |      % 2147483647 * 48271 % 2147483647 / 2147483647.0 AS f
        |  FROM train
        |  WHERE source IN ('src0','src1','src2','src3','src4',
        |                   'src5','src6','src7','src8','src9')),
        |e AS (
        |  SELECT doc_id, source, w, f,
        |    UNNEST(generate_series(0, CAST(CEIL(w) AS INT) - 1)) AS copy
        |  FROM mix),
        |picked AS (
        |  SELECT doc_id, source, CAST(copy AS INT) AS copy,
        |         doc_id * 4 + copy AS uid
        |  FROM e WHERE copy < FLOOR(w) OR f < w - FLOOR(w)),
        |k AS (
        |  SELECT doc_id, source, copy,
        |    ((uid % 2147483647) * 2654435761 + 42 * 40503)
        |      % 2147483647 * 48271 % 2147483647 AS kh, uid
        |  FROM picked)
        |SELECT doc_id, source, copy, CAST(kh % 4 AS INT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY kh % 4
        |    ORDER BY kh, uid) - 1 AS INT) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,
    "doc_pack_sequences" ->
      // token counts as doc_token_counts, +1 separator per doc; Lehmer
      // shuffle key as doc_shuffle_shards; per-shard running end offsets;
      // each doc spans sequences floor(start/512)..floor((end-1)/512),
      // exact integer GREATEST/LEAST span arithmetic
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS BIGINT) + 1 AS ntok,
        |    ((doc_id % 2147483647) * 2654435761 + 42 * 40503)
        |      % 2147483647 * 48271 % 2147483647 AS kh
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ntok, CAST(kh % 8 AS INT) AS shard,
        |    CAST(SUM(ntok) OVER (PARTITION BY kh % 8
        |      ORDER BY kh, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
        |  FROM t),
        |x AS (
        |  SELECT doc_id, shard, e, e - ntok AS st,
        |    UNNEST(generate_series(CAST(FLOOR((e - ntok) / 512.0) AS BIGINT),
        |                           CAST(FLOOR((e - 1) / 512.0) AS BIGINT)))
        |      AS seq
        |  FROM c)
        |SELECT shard, CAST(seq AS BIGINT) AS seq, doc_id,
        |  GREATEST(seq * 512, st) - st AS off_in_doc,
        |  GREATEST(seq * 512, st) - seq * 512 AS off_in_seq,
        |  LEAST((seq + 1) * 512, e) - GREATEST(seq * 512, st) AS span_len
        |FROM x ORDER BY shard, seq, off_in_seq""".stripMargin,
    "doc_token_counts" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |    AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(toks,
        |      x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS nstop,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS nws
        |  FROM t),
        |r AS (
        |  SELECT doc_id, ntok,
        |    CASE WHEN ntok > 0 THEN nstop / ntok ELSE 0.0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct / nchars ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN nws / ntok ELSE 0.0 END AS mean_tok_len
        |  FROM m)
        |SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
        |  CAST(FLOOR(stop_ratio * 1e6 + 0.5) AS BIGINT) AS stop_ratio_q6,
        |  CAST(FLOOR(punct_ratio * 1e6 + 0.5) AS BIGINT) AS punct_ratio_q6,
        |  CAST(FLOOR(mean_tok_len * 1e6 + 0.5) AS BIGINT) AS mean_tok_len_q6,
        |  CAST(FLOOR((LEAST(ntok / 50.0, 1.0) * 0.4
        |    + LEAST(stop_ratio * 10.0, 1.0) * 0.2
        |    + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0
        |            THEN 1.0 ELSE 0.0 END) * 0.2
        |    + (1.0 - LEAST(punct_ratio * 5.0, 1.0)) * 0.2) * 1e6 + 0.5)
        |    AS BIGINT) AS quality_q6
        |FROM r ORDER BY doc_id""".stripMargin,
    "doc_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c2 AS (
        |  SELECT doc_id, g, COUNT(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(toks)),
        |        i -> array_to_string(toks[i:i+1], ' '))) AS g
        |    FROM t WHERE len(toks) >= 2) GROUP BY 1, 2),
        |top2 AS (
        |  SELECT doc_id, MAX(c) AS maxc, SUM(c) AS n2 FROM c2 GROUP BY 1),
        |d3 AS (
        |  SELECT doc_id, len(l) AS n3, len(list_distinct(l)) AS u3 FROM (
        |    SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(toks[i:i+2], ' ')) AS l
        |    FROM t WHERE len(toks) >= 3)),
        |dt AS (
        |  SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS ut
        |  FROM t)
        |SELECT t.doc_id,
        |  CAST(FLOOR(COALESCE(CAST(top2.maxc AS DOUBLE) / top2.n2, 0.0)
        |    * 1e6 + 0.5) AS BIGINT) AS top2gram_frac_q6,
        |  CAST(FLOOR(COALESCE(CAST(d3.n3 - d3.u3 AS DOUBLE) / d3.n3, 0.0)
        |    * 1e6 + 0.5) AS BIGINT) AS dup3gram_frac_q6,
        |  CAST(FLOOR(CASE WHEN dt.nt > 0
        |    THEN CAST(dt.nt - dt.ut AS DOUBLE) / dt.nt ELSE 0.0 END
        |    * 1e6 + 0.5) AS BIGINT) AS dup_tok_frac_q6
        |FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
        |  JOIN dt ON dt.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "doc_lm_perplexity" ->
      // add-one bigram LM trained on the corpus; per-term ln quantized to
      // 1e-6 as BIGINT BEFORE summation (order-free on both engines)
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END,
        |      w -> length(w) >= 2) AS toks
        |  FROM documents),
        |p AS MATERIALIZED (
        |  SELECT doc_id, pr.v AS v, pr.nx AS nx FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(v := toks[i], nx := toks[i + 1]))) AS pr
        |    FROM t WHERE len(toks) >= 2)),
        |bg AS (SELECT v, nx, COUNT(*) AS cvw FROM p GROUP BY 1, 2),
        |pf AS (SELECT v, SUM(cvw) AS cv FROM bg GROUP BY 1),
        |vo AS (SELECT COUNT(DISTINCT w) AS vv
        |       FROM (SELECT unnest(toks) AS w FROM t)),
        |sc AS (
        |  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(-SUM(CAST(FLOOR(ln((bg.cvw + 1)
        |        / CAST(pf.cv + vo.vv AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))
        |      AS BIGINT) AS nll_q6
        |  FROM p JOIN bg USING (v, nx) JOIN pf USING (v) CROSS JOIN vo
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_pairs, 0) AS n_pairs,
        |  COALESCE(sc.nll_q6, 0) AS nll_q6,
        |  COALESCE(sc.nll_q6 // sc.n_pairs, 0) AS mean_nll_q6
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "bpe_merges" ->
      // the full 12-round train loop re-derived in DuckDB (see bpeCtes)
      s"""${bpeCtes(12)}
         |SELECT * FROM (
         |${(1 to 12).map(k =>
             s"SELECT CAST($k AS BIGINT) AS rank, l AS left_sym, " +
               s"r AS right_sym, cnt FROM best$k").mkString(" UNION ALL\n")}
         |) ORDER BY rank""".stripMargin,
    "doc_bpe_tokens" ->
      // same chain; per-doc token counts from the final symbolization
      s"""${bpeCtes(12)},
         |tk AS (
         |  SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0
         |      THEN []::VARCHAR[]
         |      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS word
         |  FROM documents),
         |ct AS (
         |  SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |         CAST(SUM(len(w.syms)) AS BIGINT) AS n_bpe_tokens
         |  FROM tk JOIN wf12 w USING (word) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(ct.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(COALESCE(ct.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN ct USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "doc_dsir_sample" ->
      // the whole DSIR chain re-derived: hashed feature buckets, add-one
      // bucket models, per-term q6 log-ratio sums, Lehmer-Gumbel top-k
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(toks) AS f FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS f
        |  FROM t WHERE len(toks) >= 2),
        |fc AS MATERIALIZED (
        |  SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 512 AS b,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM f GROUP BY 1, 2),
        |tgt AS (
        |  SELECT b, SUM(c) AS ct FROM fc JOIN t USING (doc_id)
        |  WHERE lang = 'en' GROUP BY 1),
        |model AS MATERIALIZED (
        |  SELECT raw.b, raw.cr, COALESCE(tgt.ct, 0) AS ct
        |  FROM (SELECT b, SUM(c) AS cr FROM fc GROUP BY 1) raw
        |  LEFT JOIN tgt USING (b)),
        |tot AS (SELECT SUM(cr) AS totr, SUM(ct) AS tott FROM model),
        |lr AS MATERIALIZED (
        |  SELECT b, ln((ct + 1) / CAST(tott + 512 AS DOUBLE))
        |           - ln((cr + 1) / CAST(totr + 512 AS DOUBLE)) AS lr
        |  FROM model CROSS JOIN tot),
        |lw AS (
        |  SELECT t.doc_id, COALESCE(s.logw_q6, 0) AS logw_q6
        |  FROM t LEFT JOIN (
        |    SELECT doc_id,
        |      CAST(SUM(CAST(FLOOR(c * lr * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |        AS logw_q6
        |    FROM fc JOIN lr USING (b) GROUP BY 1) s USING (doc_id))
        |SELECT doc_id, logw_q6,
        |  logw_q6 + CAST(FLOOR(-ln(-ln(
        |      (((doc_id % 2147483647) * 2654435761 + 42)
        |        % 2147483647 * 48271 % 2147483647 + 1) / 2147483648.0))
        |    * 1e6 + 0.5) AS BIGINT) AS score_q6
        |FROM lw
        |ORDER BY score_q6 DESC, doc_id LIMIT 100""".stripMargin,
    "doc_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS text_md5,
        |         regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id, text_md5,
        |  CASE WHEN len(toks) >= 5 THEN
        |    list_min(list_transform(range(1, len(toks) - 3),
        |      i -> md5(array_to_string(toks[i:i+4], ' '))))
        |  ELSE text_md5 END AS min_shingle_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "doc_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |  FROM toks WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |freq AS (SELECT shingle FROM sh GROUP BY shingle
        |         HAVING COUNT(*) BETWEEN 2 AND 1000),
        |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM shr a JOIN shr b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, inter,
        |  CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
        |  CAST(FLOOR(inter / (sa.sz + sb.sz - inter) * 1e6 + 0.5) AS BIGINT)
        |    AS jaccard_q6
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "doc_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |bench AS (
        |  SELECT doc_id // 50 AS bench_id, t[1:8] AS bt
        |  FROM toks WHERE doc_id % 50 = 0),
        |bsh AS (
        |  SELECT DISTINCT bench_id,
        |    unnest(list_transform(range(1, len(bt) - 1),
        |      i -> array_to_string(bt[i:i+2], ' '))) AS shingle
        |  FROM bench WHERE len(bt) >= 3),
        |dsh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |  FROM toks WHERE len(t) >= 3)
        |SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS hits
        |FROM dsh JOIN bsh USING (shingle)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY doc_id, bench_id""".stripMargin,
    "doc_substring_dedup" ->
      // repeated-passage windows (6 tokens) re-derived: plant, window-hash,
      // count >= 2, per-doc interval merge via the lag/cummax recurrence
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN text ||
        |      ' license header alpha beta gamma delta epsilon zeta eta theta'
        |    ELSE text END AS text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM t),
        |wins AS MATERIALIZED (
        |  SELECT doc_id, p,
        |    md5(array_to_string(toks[(p+1)::INT:(p+6)::INT], ' ')) AS h
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks) - 5)) AS p
        |        FROM tok WHERE len(toks) >= 6)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
        |dup AS MATERIALIZED (SELECT doc_id, p FROM wins JOIN duph USING (h)),
        |m AS (
        |  SELECT doc_id, p,
        |    CASE WHEN MAX(p + 6) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR p > MAX(p + 6) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS new_span
        |  FROM dup),
        |sp AS (
        |  SELECT doc_id, p,
        |    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p) AS sid
        |  FROM m)
        |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
        |  CAST(MAX(p) + 6 AS BIGINT) AS span_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM sp GROUP BY doc_id, sid ORDER BY doc_id, span_start""".stripMargin,
    "doc_pii_scrub" -> {
      val e = graft.text.TextStats.EmailRe
      val p = graft.text.TextStats.PhoneRe
      s"""WITH planted AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.org' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' or call +1 (555) 010-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |      AS text
         |  FROM documents),
         |de AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_emails,
         |    regexp_replace(text, '$e', '<EMAIL>', 'g') AS t1
         |  FROM planted)
         |SELECT doc_id, n_emails,
         |  CAST(len(regexp_extract_all(t1, '$p')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(t1, '$p', '<PHONE>', 'g')) AS scrubbed_md5
         |FROM de ORDER BY doc_id""".stripMargin
    },
    "doc_bag_of_words" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                       w -> length(w) >= 2)) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |cnt AS (
        |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2),
        |dict AS (
        |  SELECT word,
        |         CAST(dense_rank() OVER (ORDER BY word) AS BIGINT) AS word_id
        |  FROM (SELECT DISTINCT word FROM toks))
        |SELECT c.doc_id, d.word_id, c.cnt
        |FROM cnt c JOIN dict d USING (word)
        |WHERE c.cnt BETWEEN 2 AND 1000
        |ORDER BY doc_id, word_id""".stripMargin,
    "doc_dedup_clusters" ->
      // the doc_minhash_dedup pair pipeline + recursive transitive closure;
      // cluster id = min doc reachable (== the engine's hash-min CC label)
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |  FROM toks WHERE len(t) >= 3),
        |mins AS MATERIALIZED (
        |  SELECT doc_id, i.range AS i,
        |         MIN(md5(i.range || ':' || shingle)) AS minh
        |  FROM sh, range(32) i GROUP BY 1, 2),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(i || ':' || minh, ','
        |           ORDER BY i || ':' || minh)) AS sig
        |  FROM mins GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |  WHERE a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.doc_a
        |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.8),
        |und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        |clus AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY 1)
        |SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN clus c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "doc_tfidf" ->
      // same tokenize/dictionary as doc_bag_of_words (minCount 2, no max);
      // df counted over the SAME filtered bag the Spark side joins
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                       w -> length(w) >= 2)) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |cnt AS (
        |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2),
        |kept AS (SELECT * FROM cnt WHERE cnt >= 2),
        |dict AS (
        |  SELECT word,
        |         CAST(dense_rank() OVER (ORDER BY word) AS BIGINT) AS word_id
        |  FROM (SELECT DISTINCT word FROM toks)),
        |bow AS (
        |  SELECT c.doc_id, d.word_id, c.cnt
        |  FROM kept c JOIN dict d USING (word)),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |dfreq AS (SELECT word_id, COUNT(*) AS df FROM bow GROUP BY 1)
        |SELECT b.doc_id, b.word_id,
        |  CAST(FLOOR(b.cnt * LN((n.n + 1.0) / (f.df + 1.0)) * 1e6 + 0.5)
        |    AS BIGINT) AS tfidf_q6
        |FROM bow b JOIN dfreq f USING (word_id) CROSS JOIN n
        |ORDER BY doc_id, word_id""".stripMargin,
    "mutual_information" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders),
        |xy AS (SELECT o_orderstatus AS x, o_orderpriority AS y,
        |              CAST(COUNT(*) AS DOUBLE) AS cxy FROM orders GROUP BY 1, 2),
        |px AS (SELECT o_orderstatus AS x, CAST(COUNT(*) AS DOUBLE) AS cx
        |       FROM orders GROUP BY 1),
        |py AS (SELECT o_orderpriority AS y, CAST(COUNT(*) AS DOUBLE) AS cy
        |       FROM orders GROUP BY 1)
        |SELECT CAST(n.n AS BIGINT) AS n,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM px) AS unique_x,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM py) AS unique_y,
        |  CAST(FLOOR((SELECT SUM(cxy / n.n * log2((cxy * n.n) / (cx * cy)))
        |    FROM xy JOIN px USING (x) JOIN py USING (y)) * 1e6 + 0.5)
        |    AS BIGINT) AS mi_q6,
        |  CAST(FLOOR((SELECT -SUM(cx / n.n * log2(cx / n.n)) FROM px)
        |    * 1e6 + 0.5) AS BIGINT) AS h_x_q6
        |FROM n""".stripMargin,
    "doc_minhash_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))) AS shingle
        |  FROM toks WHERE len(t) >= 3),
        |mins AS MATERIALIZED (
        |  SELECT doc_id, i.range AS i,
        |         MIN(md5(i.range || ':' || shingle)) AS minh
        |  FROM sh, range(32) i GROUP BY 1, 2),
        |bands AS MATERIALIZED (
        |  SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(i || ':' || minh, ','
        |           ORDER BY i || ':' || minh)) AS sig
        |  FROM mins GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |  WHERE a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.doc_a
        |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(FLOOR(inter / (sa.sz + sb.sz - inter) * 1e6 + 0.5) AS BIGINT)
        |    AS jaccard_q6
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "doc_simhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM (SELECT doc_id, unnest(t) AS token FROM toks)
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT doc_id, w,
        |         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
        |  FROM tok),
        |bits AS (
        |  SELECT doc_id, b.range AS bit,
        |         SUM(CASE WHEN (h >> b.range::INT) & 1 = 1 THEN w
        |             ELSE -w END) AS s
        |  FROM h, range(60) b GROUP BY 1, 2),
        |sh AS MATERIALIZED (
        |  SELECT doc_id,
        |         SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit::INT
        |             ELSE 0 END) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.simhash, b.simhash)) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "doc_langid" ->
      """WITH tri AS MATERIALIZED (
        |  SELECT doc_id, lang, unnest(tg) AS trigram FROM (
        |    SELECT doc_id, lang,
        |      CASE WHEN length(s) >= 3 THEN
        |        list_transform(range(1, length(s) - 1), i -> substr(s, i::INT, 3))
        |      ELSE []::VARCHAR[] END AS tg
        |    FROM (SELECT doc_id, lang,
        |            lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS s
        |          FROM documents))),
        |prof AS MATERIALIZED (
        |  SELECT lang, trigram, CAST(101 - rn AS BIGINT) AS weight FROM (
        |    SELECT lang, trigram, COUNT(*) AS cnt,
        |           ROW_NUMBER() OVER (PARTITION BY lang
        |                              ORDER BY COUNT(*) DESC, trigram) AS rn
        |    FROM tri GROUP BY 1, 2)
        |  WHERE rn <= 100),
        |tf AS (
        |  SELECT doc_id, trigram, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tri GROUP BY 1, 2),
        |scored AS (
        |  SELECT tf.doc_id, p.lang, SUM(tf.tf * p.weight) AS score
        |  FROM tf JOIN prof p ON p.trigram = tf.trigram
        |  GROUP BY 1, 2)
        |SELECT doc_id, lang AS lang_pred FROM (
        |  SELECT doc_id, lang,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, ascii(lang)) AS rn
        |  FROM scored)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "ann_brute_topk" ->
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS MATERIALIZED (
        |  SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
        |  FROM c),
        |q AS (SELECT vec_id AS query_id, v AS qv, nn AS qn FROM n
        |      WHERE vec_id < 10),
        |sims AS (
        |  SELECT q.query_id, n.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]))
        |      / (n.nn * q.qn) AS cos
        |  FROM n JOIN q ON n.vec_id <> q.query_id),
        |r AS (
        |  SELECT query_id, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, vec_id) AS rank
        |  FROM sims)
        |SELECT query_id, vec_id,
        |  CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cos_q6,
        |  CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_lsh_topk" ->
      // md5-sign SRP planes (12 tables × 6 bits), shared-bucket candidates,
      // exact cosine rerank — replicating Similarity.lshTopK bit for bit
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS MATERIALIZED (
        |  SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
        |  FROM c),
        |planes AS MATERIALIZED (
        |  SELECT t.range AS t, b.range AS b, d.range AS d,
        |    CASE WHEN substr(md5('srp:' || t.range || ':' || b.range || ':'
        |                         || d.range), 1, 1)
        |         IN ('8','9','a','b','c','d','e','f')
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(12) t, range(6) b, range(64) d),
        |buckets AS MATERIALIZED (
        |  SELECT vec_id, t,
        |         SUM(CASE WHEN dotp > 0 THEN 1::BIGINT << b::INT
        |             ELSE 0 END) AS bkt
        |  FROM (
        |    SELECT n.vec_id, p.t, p.b, SUM(n.v[(p.d + 1)::INT] * p.s) AS dotp
        |    FROM n, planes p GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT q.vec_id AS query_id, x.vec_id
        |  FROM buckets x JOIN buckets q ON x.t = q.t AND x.bkt = q.bkt
        |  WHERE q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |sims AS (
        |  SELECT cd.query_id, cd.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |      / (a.nn * b.nn) AS cos
        |  FROM cand cd
        |  JOIN n a ON a.vec_id = cd.vec_id
        |  JOIN n b ON b.vec_id = cd.query_id),
        |r AS (
        |  SELECT query_id, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, vec_id) AS rank
        |  FROM sims)
        |SELECT query_id, vec_id,
        |  CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cos_q6,
        |  CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_ivf_topk" ->
      // IVF-flat re-derived: sampled coarse cells, L2 cell assignment
      // (argmin via (d2, cent_id) ordering), nprobe=3 probe, exact rerank
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS MATERIALIZED (
        |  SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
        |  FROM c),
        |cents AS MATERIALIZED (
        |  SELECT vec_id AS cent_id, v AS w,
        |         list_sum(list_transform(v, x -> x * x)) AS wn2
        |  FROM c WHERE vec_id % 50 = 0),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, cent_id AS cell FROM (
        |    SELECT n.vec_id, ct.cent_id,
        |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
        |        ct.wn2 - 2.0 * list_sum(list_transform(range(1, 65),
        |          i -> n.v[i] * ct.w[i])), ct.cent_id) AS rn
        |    FROM n, cents ct)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv, nn AS qn FROM n
        |      WHERE vec_id < 10),
        |probes AS (
        |  SELECT query_id, cent_id AS cell FROM (
        |    SELECT q.query_id, ct.cent_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        |        ct.wn2 - 2.0 * list_sum(list_transform(range(1, 65),
        |          i -> q.qv[i] * ct.w[i])), ct.cent_id) AS rn
        |    FROM q, cents ct)
        |  WHERE rn <= 3),
        |cand AS (
        |  SELECT p.query_id, a.vec_id
        |  FROM probes p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.query_id),
        |sims AS (
        |  SELECT cd.query_id, cd.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> a.v[i] * b.qv[i]))
        |      / (a.nn * b.qn) AS cos
        |  FROM cand cd
        |  JOIN n a ON a.vec_id = cd.vec_id
        |  JOIN q b ON b.query_id = cd.query_id),
        |r AS (
        |  SELECT query_id, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, vec_id) AS rank
        |  FROM sims)
        |SELECT query_id, vec_id,
        |  CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cos_q6,
        |  CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "embedding_kmeans" ->
      // unrolled 3-iteration integer-grid Lloyd (see lloydCtes) — exact
      s"""$lloydCtes
         |SELECT vec_id, CAST(cid AS INT) AS cluster,
         |       CAST(d2 AS BIGINT) AS dist2
         |FROM fin ORDER BY vec_id""".stripMargin,
    "embedding_cluster_sample" ->
      // Lloyd chain + per-cluster Lehmer ranking (ties by vec_id)
      s"""$lloydCtes
         |SELECT CAST(cid AS INT) AS cluster, rank, vec_id FROM (
         |  SELECT cid, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY
         |      ((vec_id % 2147483647) * 2654435761 + 7 * 40503 + 42)
         |        % 2147483647 * 48271 % 2147483647, vec_id) AS rank
         |  FROM fin)
         |WHERE rank <= 8 ORDER BY cluster, rank""".stripMargin,
    "embedding_semdedup" ->
      // Lloyd chain + within-cluster integer cosine test: drop vec_b when a
      // smaller-id REFERENCE cluster-mate has dot>0 and
      // dot^2*25 >= 4*|a|^2*|b|^2. refs mirrors the skew guard's per-cluster
      // cap (512 smallest ids — a no-op at this corpus size, asserted
      // exactly so the gate stays green at ANY sf)
      s"""$lloydCtes,
         |n2 AS MATERIALIZED (
         |  SELECT vec_id, SUM(v * v) AS n2 FROM qv GROUP BY 1),
         |refs AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
         |    FROM fin) WHERE rn <= 512),
         |dots AS (
         |  SELECT p1.vec_id AS vec_a, p2.vec_id AS vec_b,
         |         SUM(qa.v * qb.v) AS dot
         |  FROM refs p1 JOIN fin p2
         |    ON p1.cid = p2.cid AND p1.vec_id < p2.vec_id
         |  JOIN qv qa ON qa.vec_id = p1.vec_id
         |  JOIN qv qb ON qb.vec_id = p2.vec_id AND qb.pos = qa.pos
         |  GROUP BY 1, 2),
         |dups AS (
         |  SELECT DISTINCT d.vec_b AS vec_id
         |  FROM dots d
         |  JOIN n2 a ON a.vec_id = d.vec_a
         |  JOIN n2 b ON b.vec_id = d.vec_b
         |  WHERE d.dot > 0 AND d.dot * d.dot * 25 >= 4 * a.n2 * b.n2)
         |SELECT f.vec_id, CAST(f.cid AS INT) AS cluster,
         |       (d.vec_id IS NULL) AS kept
         |FROM fin f LEFT JOIN dups d USING (vec_id)
         |ORDER BY f.vec_id""".stripMargin,
    "ann_ivf_trained_topk" ->
      // Lloyd chain (shared CTEs) + integer probe ordering + exact rerank:
      // the only floats are the final cosine's sqrt/×/÷ on identical ints
      s"""$ivfTrainedCtes
         |SELECT query_id, vec_id,
         |  CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cos_q6,
         |  CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_ivf_recall" ->
      // recall@5 of the TRAINED IVF path (nprobe=2 of 10 cells) against the
      // float brute-force top-5 (VERDICT r4 #6: the exhaustive-probe
      // contract test covers correctness, this makes PRUNING quality
      // driver-visible). Both pipelines re-derived; recall_pct = hits × 20.
      s"""$ivfTrainedCtes,
         |ivf5 AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM r WHERE rank <= 5),
         |cflt AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |nrm AS MATERIALIZED (
         |  SELECT vec_id, v,
         |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
         |  FROM cflt),
         |qf AS (SELECT vec_id AS query_id, v AS qfv, nn AS qn FROM nrm
         |       WHERE vec_id < 10),
         |bsims AS (
         |  SELECT qf.query_id, nrm.vec_id,
         |    list_sum(list_transform(range(1, 65), i -> nrm.v[i] * qf.qfv[i]))
         |      / (nrm.nn * qf.qn) AS cos
         |  FROM nrm JOIN qf ON nrm.vec_id <> qf.query_id),
         |br AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |                         ORDER BY cos DESC, vec_id) AS rank
         |    FROM bsims) WHERE rank <= 5),
         |hits AS (
         |  SELECT br.query_id, CAST(COUNT(*) AS BIGINT) AS h
         |  FROM br JOIN ivf5 ON ivf5.query_id = br.query_id
         |                   AND ivf5.vec_id = br.vec_id
         |  GROUP BY 1)
         |SELECT qq.query_id, COALESCE(h.h, 0) * 20 AS recall_pct
         |FROM (SELECT DISTINCT query_id FROM br) qq
         |LEFT JOIN hits h ON h.query_id = qq.query_id
         |ORDER BY qq.query_id""".stripMargin,
    "ann_pq_topk" ->
      // the full PQ chain re-derived: 2 unrolled joint Lloyd iterations
      // per subspace, codes, ADC table-lookup sums, (adist2, vec_id) rank
      s"""$pqCtes
         |SELECT query_id, rank, vec_id, adist2
         |FROM pqrk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_pq_recall" ->
      // ADC top-5 ∩ exact grid-L2 top-5 per query, as an integer hit count
      s"""$pqCtes,
         |exd AS MATERIALIZED (
         |  SELECT f.vec_id AS query_id, e.vec_id,
         |    SUM((e.v - f.v) * (e.v - f.v)) AS d2
         |  FROM pqv e JOIN pqv f ON f.sub = e.sub AND f.spos = e.spos
         |  WHERE f.vec_id < 10 GROUP BY 1, 2),
         |exr AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY d2, vec_id) AS rn
         |  FROM exd) WHERE rn <= 5),
         |hit AS (SELECT a.query_id, a.vec_id FROM
         |  (SELECT query_id, vec_id FROM pqrk WHERE rank <= 5) a
         |  JOIN exr USING (query_id, vec_id))
         |SELECT q.query_id, CAST(COUNT(h.vec_id) AS BIGINT) AS hits
         |FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
         |      WHERE vec_id < 10) q
         |LEFT JOIN hit h ON h.query_id = q.query_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_ivfpq_topk" ->
      // the composed IVFADC chain re-derived: coarse Lloyd cells, cell
      // residuals, residual-space PQ training/codes, nprobe=2 probe,
      // per-(query, cell) residual tables, ADC sums over probed members
      s"""$ivfPqCtes
         |SELECT query_id, rank, vec_id, adist2
         |FROM iprk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_ivfpq_recall" ->
      // IVFADC top-5 ∩ exact grid-L2 top-5 per query, integer hit counts
      s"""$ivfPqCtes,
         |exd AS MATERIALIZED (
         |  SELECT f.vec_id AS query_id, e.vec_id,
         |    SUM((e.v - f.v) * (e.v - f.v)) AS d2
         |  FROM qv e JOIN qv f ON f.pos = e.pos
         |  WHERE f.vec_id < 10 GROUP BY 1, 2),
         |exr AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY d2, vec_id) AS rn
         |  FROM exd) WHERE rn <= 5),
         |hit AS (SELECT a.query_id, a.vec_id FROM
         |  (SELECT query_id, vec_id FROM iprk WHERE rank <= 5) a
         |  JOIN exr USING (query_id, vec_id))
         |SELECT q.query_id, CAST(COUNT(h.vec_id) AS BIGINT) AS hits
         |FROM (SELECT DISTINCT vec_id AS query_id FROM embeddings
         |      WHERE vec_id < 10) q
         |LEFT JOIN hit h ON h.query_id = q.query_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_lsh_recall" ->
      // both pipelines re-derived (brute CTEs + LSH CTEs), then per-query
      // overlap of the two top-5 sets; recall_pct = hits × 20
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS MATERIALIZED (
        |  SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
        |  FROM c),
        |q AS (SELECT vec_id AS query_id, v AS qv, nn AS qn FROM n
        |      WHERE vec_id < 10),
        |bsims AS (
        |  SELECT q.query_id, n.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> n.v[i] * q.qv[i]))
        |      / (n.nn * q.qn) AS cos
        |  FROM n JOIN q ON n.vec_id <> q.query_id),
        |br AS MATERIALIZED (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY cos DESC, vec_id) AS rank
        |    FROM bsims) WHERE rank <= 5),
        |planes AS MATERIALIZED (
        |  SELECT t.range AS t, b.range AS b, d.range AS d,
        |    CASE WHEN substr(md5('srp:' || t.range || ':' || b.range || ':'
        |                         || d.range), 1, 1)
        |         IN ('8','9','a','b','c','d','e','f')
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(12) t, range(6) b, range(64) d),
        |buckets AS MATERIALIZED (
        |  SELECT vec_id, t,
        |         SUM(CASE WHEN dotp > 0 THEN 1::BIGINT << b::INT
        |             ELSE 0 END) AS bkt
        |  FROM (
        |    SELECT n.vec_id, p.t, p.b, SUM(n.v[(p.d + 1)::INT] * p.s) AS dotp
        |    FROM n, planes p GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT q.vec_id AS query_id, x.vec_id
        |  FROM buckets x JOIN buckets q ON x.t = q.t AND x.bkt = q.bkt
        |  WHERE q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |lsims AS (
        |  SELECT cd.query_id, cd.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |      / (a.nn * b.nn) AS cos
        |  FROM cand cd
        |  JOIN n a ON a.vec_id = cd.vec_id
        |  JOIN n b ON b.vec_id = cd.query_id),
        |lr AS MATERIALIZED (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |                         ORDER BY cos DESC, vec_id) AS rank
        |    FROM lsims) WHERE rank <= 5),
        |hits AS (
        |  SELECT br.query_id, CAST(COUNT(*) AS BIGINT) AS h
        |  FROM br JOIN lr ON lr.query_id = br.query_id
        |                 AND lr.vec_id = br.vec_id
        |  GROUP BY 1)
        |SELECT qq.query_id, COALESCE(h.h, 0) * 20 AS recall_pct
        |FROM (SELECT DISTINCT query_id FROM br) qq
        |LEFT JOIN hits h ON h.query_id = qq.query_id
        |ORDER BY qq.query_id""".stripMargin,
    "embedding_neardup" ->
      // SRP bucket (6 bits, tag 'nd') + Hamming<=1 meet + exact verification
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS MATERIALIZED (
        |  SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
        |  FROM c),
        |planes AS MATERIALIZED (
        |  SELECT b.range AS b, d.range AS d,
        |    CASE WHEN substr(md5('srp:nd:' || b.range || ':' || d.range), 1, 1)
        |         IN ('8','9','a','b','c','d','e','f')
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(6) b, range(64) d),
        |bkt AS MATERIALIZED (
        |  SELECT vec_id,
        |         SUM(CASE WHEN dotp > 0 THEN 1::BIGINT << b::INT
        |             ELSE 0 END) AS bkt
        |  FROM (
        |    SELECT n.vec_id, p.b, SUM(n.v[(p.d + 1)::INT] * p.s) AS dotp
        |    FROM n, planes p GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT vec_a, vec_b, CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cos_q6
        |FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_sum(list_transform(range(1, 65), i -> na.v[i] * nb.v[i]))
        |      / (na.nn * nb.nn) AS cos
        |  FROM bkt a
        |  JOIN bkt b ON a.vec_id < b.vec_id
        |             AND bit_count(xor(a.bkt, b.bkt)) <= 1
        |  JOIN n na ON na.vec_id = a.vec_id
        |  JOIN n nb ON nb.vec_id = b.vec_id)
        |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    "multimodal_features" ->
      // REAL-format decode re-derived from the persisted raw bytes in hex
      // arithmetic: PGM header digits (ASCII − 48) at the synthesizer's
      // fixed offsets, WAV little-endian fields, PCM16 two's complement,
      // concatenated-PGM frame walk. Integer sums are exact in both
      // engines; the one division is double-of-exact-ints.
      s"""WITH m AS (SELECT media_id, modality, bytes
         |           FROM ${Fixtures.sqlOf("media_200")}),
         |hx AS MATERIALIZED (
         |  SELECT media_id, modality, hex(bytes) AS h,
         |         CAST(octet_length(bytes) AS BIGINT) AS n
         |  FROM m),
         |img AS (
         |  SELECT media_id, h, n,
         |    (('0x' || substr(h, 7, 2))::BIGINT - 48) * 100 +
         |    (('0x' || substr(h, 9, 2))::BIGINT - 48) * 10 +
         |    (('0x' || substr(h, 11, 2))::BIGINT - 48) AS w,
         |    (('0x' || substr(h, 15, 2))::BIGINT - 48) * 100 +
         |    (('0x' || substr(h, 17, 2))::BIGINT - 48) * 10 +
         |    (('0x' || substr(h, 19, 2))::BIGINT - 48) AS ht
         |  FROM hx WHERE modality = 'image'),
         |imean AS (
         |  SELECT media_id,
         |    SUM(('0x' || substr(h, CAST(31 + 2 * i AS INT), 2))::BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT media_id, h, unnest(range(w * ht)) AS i FROM img)
         |  GROUP BY 1),
         |irow AS (
         |  SELECT i.media_id, 'image' AS modality, i.n AS n_bytes,
         |    CAST(i.w AS INT) AS width, CAST(i.ht AS INT) AS height,
         |    CAST(1 AS INT) AS channels, CAST(0 AS INT) AS sample_rate,
         |    CAST(0 AS BIGINT) AS n_samples, CAST(1 AS INT) AS n_frames,
         |    CAST(1 AS INT) AS frames_sampled,
         |    CAST(FLOOR(CAST(p.s AS DOUBLE) / p.c * 1e6 + 0.5) AS BIGINT)
         |      AS mean_q6
         |  FROM img i JOIN imean p USING (media_id)),
         |aud AS (
         |  SELECT media_id, h, n,
         |    ('0x' || substr(h, 49, 2))::BIGINT +
         |    ('0x' || substr(h, 51, 2))::BIGINT * 256 +
         |    ('0x' || substr(h, 53, 2))::BIGINT * 65536 +
         |    ('0x' || substr(h, 55, 2))::BIGINT * 16777216 AS rate,
         |    (n - 44) // 2 AS ns
         |  FROM hx WHERE modality = 'audio'),
         |amean AS (
         |  SELECT media_id,
         |    SUM(ABS(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (
         |    SELECT media_id,
         |      ('0x' || substr(h, CAST(89 + 4 * i AS INT), 2))::BIGINT +
         |      ('0x' || substr(h, CAST(91 + 4 * i AS INT), 2))::BIGINT * 256
         |        AS v
         |    FROM (SELECT media_id, h, unnest(range(ns)) AS i FROM aud))
         |  GROUP BY 1),
         |arow AS (
         |  SELECT a.media_id, 'audio' AS modality, a.n AS n_bytes,
         |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height,
         |    CAST(1 AS INT) AS channels, CAST(a.rate AS INT) AS sample_rate,
         |    CAST(a.ns AS BIGINT) AS n_samples, CAST(0 AS INT) AS n_frames,
         |    CAST(0 AS INT) AS frames_sampled,
         |    CAST(FLOOR(CAST(p.s AS DOUBLE) / p.c * 1e6 + 0.5) AS BIGINT)
         |      AS mean_q6
         |  FROM aud a JOIN amean p USING (media_id)),
         |vid AS (
         |  SELECT media_id, h, n,
         |    (('0x' || substr(h, 7, 2))::BIGINT - 48) * 100 +
         |    (('0x' || substr(h, 9, 2))::BIGINT - 48) * 10 +
         |    (('0x' || substr(h, 11, 2))::BIGINT - 48) AS w,
         |    (('0x' || substr(h, 15, 2))::BIGINT - 48) * 100 +
         |    (('0x' || substr(h, 17, 2))::BIGINT - 48) * 10 +
         |    (('0x' || substr(h, 19, 2))::BIGINT - 48) AS ht
         |  FROM hx WHERE modality = 'video'),
         |vid2 AS (
         |  SELECT media_id, h, n, w, ht, 15 + w * ht AS fs,
         |         n // (15 + w * ht) AS nf
         |  FROM vid),
         |vpx AS (
         |  SELECT media_id, h, fs, f, unnest(range(w * ht)) AS i
         |  FROM (SELECT media_id, h, fs, w, ht, unnest(range(nf)) AS f
         |        FROM vid2)
         |  WHERE f % 4 = 0),
         |vmean AS (
         |  SELECT media_id,
         |    SUM(('0x' || substr(h, CAST(1 + 2 * (f * fs + 15 + i) AS INT),
         |                        2))::BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM vpx GROUP BY 1),
         |vrow AS (
         |  SELECT v.media_id, 'video' AS modality, v.n AS n_bytes,
         |    CAST(v.w AS INT) AS width, CAST(v.ht AS INT) AS height,
         |    CAST(1 AS INT) AS channels, CAST(0 AS INT) AS sample_rate,
         |    CAST(0 AS BIGINT) AS n_samples, CAST(v.nf AS INT) AS n_frames,
         |    CAST((v.nf - 1) // 4 + 1 AS INT) AS frames_sampled,
         |    CAST(FLOOR(CAST(p.s AS DOUBLE) / p.c * 1e6 + 0.5) AS BIGINT)
         |      AS mean_q6
         |  FROM vid2 v JOIN vmean p USING (media_id))
         |SELECT * FROM (
         |  SELECT * FROM irow UNION ALL
         |  SELECT * FROM arow UNION ALL
         |  SELECT * FROM vrow)
         |ORDER BY media_id""".stripMargin,
    "events_windowed" ->
      // value pre-quantized PER EVENT, then summed as exact integers —
      // summation-order-free on both engines (ADVICE r4)
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_q4
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessionize" ->
      // session_window re-derived by the lag/gap recurrence: a new session
      // starts when the microsecond gap to the previous event EXCEEDS 24 h
      // (Spark merges windows that touch — next.ts == prev.ts + gap is one
      // session; StreamingSpec pins this); session_end = last event + gap
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |            > 24::BIGINT * 3600 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, new_sess DESC ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 24 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_q4
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
  )
}
