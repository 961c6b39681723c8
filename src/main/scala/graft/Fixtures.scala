package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted parquet fixtures for queries whose inputs are *generated*
  * (lakehouse table, provenance corpus, planted graphs) rather than read from
  * the sf-dir tables. Persisting the generated input lets the DuckDB oracle
  * read the exact same bytes via `read_parquet(...)`, turning generated-input
  * queries into hard oracle-checked rows (VERDICT round 1, next-round item 1).
  *
  * The directory is a fixed absolute path inside the repo (gitignored) so the
  * static [[SparkEntry.oracleSql]] strings can reference it.
  */
object Fixtures {

  val Dir = "/root/repo/.fixtures"

  private val written = scala.collection.mutable.Set.empty[String]

  /** Write `df` once per JVM under `name` and return the read-back frame, so
    * the Spark query and the DuckDB oracle consume identical input.
    */
  def persist(spark: SparkSession, name: String, df: => DataFrame): DataFrame = {
    val path = s"$Dir/$name"
    synchronized {
      if (!written.contains(name)) {
        df.coalesce(4).write.mode("overwrite").parquet(path)
        written += name
      }
    }
    spark.read.parquet(path)
  }

  /** DuckDB table expression for a persisted fixture. */
  def sqlOf(name: String): String = s"read_parquet('$Dir/$name/*.parquet')"
}
