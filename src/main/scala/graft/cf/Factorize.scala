package graft.cf

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matrix-factorization CF — the reference toolkit's ALS flagship
  * (/root/reference/toolkits/collaborative_filtering/als.cpp) via Spark's
  * native implementation (`org.apache.spark.ml.recommendation.ALS`), which
  * IS the idiomatic replacement for GraphChi's shard-swept alternating
  * solves: blocked normal equations with hash-partitioned in/out blocks.
  * The reference's 29-app toolkit (SGD/bias-SGD/NMF/libFM/...) shares this
  * one data model; ALS + [[ItemCF]] cover its query surface (rating
  * prediction + item similarity + top-k recommendation).
  */
object Factorize {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame)

  /** Train ALS on (user, item, rating) and return factor tables. */
  def als(ratings: DataFrame, rank: Int = 8, iters: Int = 10,
      regParam: Double = 0.1, seed: Long = 42L): Model = {
    val m = new ALS()
      .setRank(rank).setMaxIter(iters).setRegParam(regParam).setSeed(seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(ratings.select(
        col("user").cast("int").as("user"),
        col("item").cast("int").as("item"),
        col("rating").cast("float").as("rating")))
    Model(m.userFactors.toDF("id", "features"),
      m.itemFactors.toDF("id", "features"))
  }

  /** Non-negative matrix factorization — the toolkit's nmf.cpp (Lee-Seung
    * multiplicative updates) re-expressed as ALS with non-negativity-
    * constrained least squares (`setNonnegative`): same model class
    * (R ≈ U·Vᵀ, U,V ≥ 0), the solver Spark ships for it. Documented
    * algorithmic deviation: NNLS-per-block instead of multiplicative
    * updates — both converge to a local minimum of the same objective.
    */
  def nmf(ratings: DataFrame, rank: Int = 8, iters: Int = 10,
      regParam: Double = 0.05, seed: Long = 42L): Model = {
    val m = new ALS()
      .setRank(rank).setMaxIter(iters).setRegParam(regParam).setSeed(seed)
      .setNonnegative(true)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(ratings.select(
        col("user").cast("int").as("user"),
        col("item").cast("int").as("item"),
        col("rating").cast("float").as("rating")))
    Model(m.userFactors.toDF("id", "features"),
      m.itemFactors.toDF("id", "features"))
  }

  /** Weighted ALS for implicit feedback — the toolkit's wals.cpp (header
    * cites Hu/Koren/Volinsky, "Collaborative Filtering for Implicit Feedback
    * Datasets", ICDM 2008) via the same paper's implementation Spark ships:
    * `ALS.setImplicitPrefs(true)`. Interaction counts become confidence
    * weights c = 1 + α·r over a binary preference matrix, and the factors
    * minimize the confidence-weighted reconstruction — the reference weights
    * its RMSE sweep by the edge's weight field the same way
    * (wals.cpp:125: error × edge.time). Predictions from the returned
    * factors are preference scores in [0,1]-ish range, not ratings.
    */
  def wals(ratings: DataFrame, rank: Int = 8, iters: Int = 10,
      regParam: Double = 0.1, alpha: Double = 10.0, seed: Long = 42L): Model = {
    val m = new ALS()
      .setRank(rank).setMaxIter(iters).setRegParam(regParam).setSeed(seed)
      .setImplicitPrefs(true).setAlpha(alpha)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(ratings.select(
        col("user").cast("int").as("user"),
        col("item").cast("int").as("item"),
        col("rating").cast("float").as("rating")))
    Model(m.userFactors.toDF("id", "features"),
      m.itemFactors.toDF("id", "features"))
  }

  /** dot(u, v) over two equal-length array<double> factor columns — one
    * codegen'd expression, shared by [[predict]] and [[recommendTopK]].
    */
  private def dot(uf: Column, vf: Column): Column =
    aggregate(zip_with(uf, vf, (x, y) => x * y), lit(0.0d),
      (acc, v) => acc + v)

  /** Predicted rating for every (user, item) in `pairs` via factor dot
    * product — a join + codegen'd aggregate, no UDF.
    */
  def predict(model: Model, pairs: DataFrame): DataFrame =
    pairs
      .join(model.userFactors.select(col("id").as("user"),
        col("features").as("uf")), "user")
      .join(model.itemFactors.select(col("id").as("item"),
        col("features").as("if")), "item")
      .select(col("user"), col("item"),
        dot(col("uf"), col("if")).as("prediction"))

  /** Top-K recommendation serving from a learned factor model — the
    * toolkit's rating.cpp (the app a user runs AFTER als/nmf/svd to turn
    * factor tables into per-user item lists):
    *
    *  - predictions only for items the user has NOT rated in training
    *    (rating.cpp:231-240's `curratings` skip);
    *  - prediction = dot(u, v) clamped to [minval, maxval]
    *    (als_predict, :97-106); with `singularValues` set, the SVD variant
    *    u'·diag(σ)·v (svd_predict, :113-131) — folded into the item
    *    factors once, before the scan;
    *  - per user the `k` largest predictions, descending
    *    (reverse_sort_index2, :269-274), ties broken by ascending item id
    *    so the ranking is deterministic across engines (the reference's
    *    tie order is Eigen-sort-internal; deviation documented).
    *
    * Scale shape: the reference holds ALL M+N factor vectors in every
    * thread's RAM and loops each user over the full item catalog
    * (:237-253). Here the item factors are a broadcast table — strictly
    * less memory than the reference's replication — streamed against the
    * user side with NO shuffle of the users×items candidate space: the
    * rated-item set rides along as an array column (membership test is
    * map-side), and top-k is taken by a two-level bounded aggregation —
    * first within item blocks of `blockSize` (partial-aggregation buffers
    * hold ≤ blockSize rows per (user, block)), then across the ≤
    * ⌈N/blockSize⌉·k block winners per user. Both levels are plain
    * `collect_list`+`sort_array`+`slice` — declarative, codegen'd, no
    * UDAF — and the only shuffle in the whole job carries ≤
    * ⌈N/blockSize⌉·k rows per user. Users without any unrated item yield
    * no row (the reference zero-pads its fixed-size output buffer;
    * deviation documented).
    */
  def recommendTopK(model: Model, ratings: DataFrame, k: Int,
      minval: Double = -1e100, maxval: Double = 1e100,
      singularValues: Option[Seq[Double]] = None,
      blockSize: Int = 4096): DataFrame = {
    require(k >= 1 && blockSize >= 1)
    val items0 = model.itemFactors
      .select(col("id").as("item"), col("features").as("vf"))
    val items = singularValues.fold(items0) { s =>
      items0.withColumn("vf", zip_with(col("vf"),
        array(s.map(lit): _*), (v, w) => v * w))
    }
    val rated = ratings.groupBy("user").agg(collect_set("item").as("rated"))
    val users = model.userFactors
      .select(col("id").as("user"), col("features").as("uf"))
      .join(rated, Seq("user"), "left")
    val cand = users.crossJoin(broadcast(items))
      .filter(!coalesce(array_contains(col("rated"), col("item")),
        lit(false)))
      .select(col("user"), col("item"),
        least(greatest(dot(col("uf"), col("vf")), lit(minval)),
          lit(maxval)).as("prediction"))
    // negated prediction first: lexicographic struct sort = prediction
    // descending, then item ascending
    val entry = struct((-col("prediction")).as("np"), col("item").as("item"))
    val perBlock = cand
      .withColumn("blk", floor(col("item") / blockSize))
      .groupBy("user", "blk")
      .agg(slice(sort_array(collect_list(entry)), 1, k).as("top"))
    perBlock
      .select(col("user"), explode(col("top")).as("c"))
      .groupBy("user")
      .agg(slice(sort_array(collect_list(col("c"))), 1, k).as("top"))
      .select(col("user"), posexplode(col("top")))
      .select(col("user"), (col("pos") + 1).cast("int").as("rank"),
        col("col.item").as("item"), (-col("col.np")).as("prediction"))
  }

  /** Training RMSE — the toolkit's convergence report (rmse_engine.hpp). */
  def rmse(model: Model, ratings: DataFrame): Double =
    predict(model, ratings.select("user", "item"))
      .join(ratings, Seq("user", "item"))
      .agg(sqrt(avg(pow(col("prediction") - col("rating"), 2))))
      .head().getDouble(0)
}
