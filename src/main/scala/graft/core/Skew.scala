package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew weapons (north_rule: "skewed high-degree vertices handled
  * by salting plus broadcast-side replication").
  *
  * Spark's hash aggregate already does map-side partial aggregation, which
  * absorbs most aggregation skew for algebraic functions; the salted
  * two-level form below matters when partial aggregation is defeated — high
  * per-partition key cardinality (hash map spills before combining) or
  * non-algebraic aggregates — and it is the explicit, plan-visible contract
  * the engine relies on at 10^12-file scale where single hot vertices
  * (the "stdlib file") receive a double-digit percentage of all edges.
  */
object Skew {

  /** Two-level salted sum: groupBy(key, salt) partial → groupBy(key) final.
    * The salt is a deterministic hash of the *other* columns, so results are
    * reproducible. Returns (key, outCol).
    */
  def saltedSum(df: DataFrame, key: String, value: String, outCol: String,
      buckets: Int, saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(outCol))

  /** Skew-join by broadcast-side replication: every row of the big side gets
    * a deterministic salt in [0, buckets); the small side is replicated once
    * per salt value. The join key becomes (key, salt), spreading a hot key
    * over `buckets` reducers. Small side must be broadcast-sized × buckets.
    *
    * @return (bigWithSalt ⋈ smallReplicated) on key+salt, salt dropped.
    */
  def replicatedSkewJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, bigSaltSource: Column): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigSaltSource), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(broadcast(replicated), Seq(key, "__salt")).drop("__salt")
  }
}
