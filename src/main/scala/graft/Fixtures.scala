package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted parquet fixtures for queries whose inputs are *generated*
  * (lakehouse table, provenance corpus, planted graphs) rather than read from
  * the sf-dir tables. Persisting the generated input lets the DuckDB oracle
  * read the exact same bytes via `read_parquet(...)`, turning generated-input
  * queries into hard oracle-checked rows (VERDICT round 1, next-round item 1).
  *
  * The directory is resolved once per JVM — `graft.fixtures.dir` system
  * property, then `GRAFT_FIXTURES_DIR` env, then `<cwd>/.fixtures`
  * (gitignored) — so the static [[SparkEntry.oracleSql]] strings can
  * reference it and Verify/Bench work from any checkout location (ADVICE r2).
  */
object Fixtures {

  val Dir: String =
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse(new java.io.File(".fixtures").getAbsolutePath)

  /** All fixture IO goes through the [[graft.engine.TableFormat]] seam —
    * parquet directories here, a catalog format on a real deployment.
    */
  private val format = new graft.engine.ParquetFormat(Dir)

  private val written = scala.collection.mutable.Set.empty[String]

  /** Write `df` once under `name` and return the read-back frame, so the
    * Spark query and the DuckDB oracle consume identical input. The write is
    * atomic within the format's guarantees (temp dir + rename for parquet)
    * so a concurrent JVM reading `name` never sees a half-written fixture;
    * an already-complete fixture is reused as-is.
    *
    * Contract: content under a given `name` must be deterministic — when a
    * generator changes, bump the name (the existing `prov_corpus_7` /
    * `prov_corpus_12` / `media_200` convention), never reuse it.
    */
  def persist(spark: SparkSession, name: String, df: => DataFrame): DataFrame = {
    synchronized {
      if (!written.contains(name)) {
        format.createIfAbsent(df.coalesce(4), name)
        written += name
      }
    }
    format.read(spark, name)
  }

  /** DuckDB table expression for a persisted fixture. */
  def sqlOf(name: String): String =
    s"read_parquet('${format.location(name)}/*.parquet')"
}
