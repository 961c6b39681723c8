package graft.cf

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
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
        aggregate(zip_with(col("uf"), col("if"),
          (x, y) => x * y), lit(0.0d), (acc, v) => acc + v).as("prediction"))

  /** Training RMSE — the toolkit's convergence report (rmse_engine.hpp). */
  def rmse(model: Model, ratings: DataFrame): Double =
    predict(model, ratings.select("user", "item"))
      .join(ratings, Seq("user", "item"))
      .agg(sqrt(avg(pow(col("prediction") - col("rating"), 2))))
      .head().getDouble(0)
}
