package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus curation operators over the lakehouse table
  * (repo, path, commit, lang, content) — the filters a source-code
  * training-data pipeline runs before anything else at 10^12-file scale
  * (BASELINE.json input_hint's table shape). Three operators:
  *
  *  - [[fileStats]]: per-file quality statistics + keep flag (The Stack /
  *    StarCoder preprocessing rules: max/avg line length, alphanumeric
  *    fraction). Pure column scan, ZERO shuffles — at 100 TB this is a
  *    map-only pass whose cost is the parquet read itself.
  *  - [[forkPairs]]: repo-level fork detection — repo pairs sharing many
  *    identical file contents (sha256 equality, the input_hint's row
  *    invariant), scored by exact Jaccard over the repos' content-hash
  *    sets. Candidate generation is an equi-join on content hash with a
  *    ubiquity cap, never all-pairs over repos.
  *  - [[lineDedup]]: CCNet-style cross-corpus line deduplication — drop
  *    every line occurring in ≥ `minDf` distinct files (license headers,
  *    boilerplate imports), reassemble the survivors in order.
  *
  * All hashes are md5/sha2 so the DuckDB oracle recomputes identical
  * values; all ratios are exact integer floor-divisions on a fixed grid
  * (no float summation anywhere), so results are bit-stable across
  * engines and partitionings.
  */
object CodeFilters {

  /** Exact non-negative integer floor-division that both Spark and DuckDB
    * (`//`) evaluate identically: subtract the remainder first so the
    * double division is of an exact multiple (same form as
    * [[graft.vectors.KMeans]]).
    */
  private def floorDiv(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast("long")

  /** Per-file quality stats + keep flag. Thresholds default to the
    * published StarCoder/The-Stack filter values: drop files with a line
    * longer than `maxLineLen` (=1000), average line length above
    * `maxAvgLineLen` (=100), or alphanumeric character fraction below
    * `minAlnumQ4`/1e4 (=0.25) — minified/generated/binary-ish files.
    *
    * Output: (repo, path, lang, n_lines, max_line_len, avg_line_q4,
    * alnum_q4, keep) with keep as 0/1 long. avg_line_q4 is
    * floor(1e4 · line_chars / n_lines) where line_chars excludes the
    * n_lines−1 separators; alnum_q4 is floor(1e4 · alnum_chars / chars).
    *
    * Scale: one narrow projection, no exchange in the plan; the `split`
    * is transient (never shuffled). The regexp is RE2-safe (single
    * character class).
    */
  def fileStats(files: DataFrame, maxLineLen: Long = 1000L,
      maxAvgLineLen: Long = 100L, minAlnumQ4: Long = 2500L): DataFrame = {
    val lines = split(col("content"), "\n")
    val nLines = size(lines).cast("long")
    val nChars = length(col("content")).cast("long")
    val stats = files.select(
      col("repo"), col("path"), col("lang"),
      nLines.as("n_lines"),
      array_max(transform(lines, l => length(l))).cast("long")
        .as("max_line_len"),
      floorDiv((nChars - nLines + 1L) * 10000L, nLines).as("avg_line_q4"),
      floorDiv(
        length(regexp_replace(col("content"), "[^A-Za-z0-9]", ""))
          .cast("long") * 10000L,
        greatest(nChars, lit(1L))).as("alnum_q4"))
    stats.withColumn("keep",
      (col("max_line_len") <= maxLineLen &&
        col("avg_line_q4") <= maxAvgLineLen * 10000L &&
        col("alnum_q4") >= minAlnumQ4).cast("long"))
  }

  /** Planted forks for the fork-detection fixture: for each repo in
    * `parents`, emit a `<repo>-fork` copy keeping each file independently
    * with probability `keepQ4`/1e4 (deterministic per (seed, repo, path)),
    * content byte-identical, commit ids rewritten (a fork has its own
    * history). Union with the base table to build the fixture.
    */
  def plantForks(files: DataFrame, parents: Seq[String], keepQ4: Int,
      seed: Long): DataFrame =
    files
      .filter(col("repo").isin(parents: _*))
      .filter(pmod(xxhash64(lit(seed), lit("forkkeep"), col("repo"),
        col("path")), lit(10000L)) < keepQ4)
      .withColumn("repo", concat(col("repo"), lit("-fork")))
      .withColumn("commit",
        substring(sha2(concat_ws("|", lit(seed), col("repo"), col("path")),
          256), 1, 12))

  /** Fork detection: repo pairs (repo_a < repo_b) sharing ≥ `minShared`
    * identical file contents, with exact Jaccard over the repos' distinct
    * content-sha256 sets: (repo_a, repo_b, shared, n_a, n_b, jaccard_q6).
    *
    * Scale shape: ONE equi-join on content hash generates candidates —
    * a hash present in H repos contributes H·(H−1)/2 pair rows, so
    * ubiquitous contents (empty __init__.py, LICENSE files: the classic
    * blowup) are dropped by `maxReposPerHash` first, exactly like the
    * MinHash hot-shingle cap ([[graft.text.Dedup.ngramJaccardPairs]]).
    * Those files carry no fork signal but quadratic cost. Nothing here is
    * ever repos × repos; the pair aggregation is map-side combinable.
    */
  def forkPairs(files: DataFrame, minShared: Long = 5L,
      maxReposPerHash: Long = 50L): DataFrame = {
    val fh = files
      .select(col("repo"), sha2(col("content"), 256).as("h")).distinct()
    val sizes = fh.groupBy("repo").agg(count(lit(1)).as("n"))
    val shared = fh.groupBy("h").agg(count(lit(1)).as("rf"))
      .filter(col("rf") >= 2 && col("rf") <= maxReposPerHash)
      .select("h")
    val fhr = fh.join(shared, "h")
    fhr.select(col("repo").as("repo_a"), col("h"))
      .join(fhr.select(col("repo").as("repo_b"), col("h")), "h")
      .filter(col("repo_a") < col("repo_b"))
      .groupBy("repo_a", "repo_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.select(col("repo").as("repo_a"), col("n").as("n_a")),
        "repo_a")
      .join(sizes.select(col("repo").as("repo_b"), col("n").as("n_b")),
        "repo_b")
      .withColumn("jaccard_q6", floorDiv(col("shared") * 1000000L,
        col("n_a") + col("n_b") - col("shared")))
      .select("repo_a", "repo_b", "shared", "n_a", "n_b", "jaccard_q6")
  }

  /** CCNet-style line-level dedup (Wenzek et al. 2020, arXiv:1911.00359
    * §3.1 — there over paragraphs; here over source lines): a line is
    * boilerplate when it occurs in ≥ `minDf` distinct files; drop every
    * instance corpus-wide and reassemble each file's surviving lines in
    * original order. Output: (file, n_lines, kept_lines, new_md5) for
    * files with ≥ 1 surviving line — new_md5 the md5 of the reassembled
    * text (narrow, order-checked without shipping bodies).
    *
    * Scale shape: line document-frequency is ONE map-side-combinable
    * aggregation over distinct (file, line); the survivors join is an
    * equi-join against the 1-row-per-line DF table where hot lines skew
    * the probe side only (AQE skew-split applies; the build side is never
    * hot). Reassembly is one groupBy(file) whose value is bounded by the
    * file's own line count — no global sort.
    */
  def lineDedup(files: DataFrame, minDf: Long = 3L): DataFrame = {
    val fid = concat(col("repo"), lit("/"), col("path"))
    val lines = files.select(fid.as("file"),
      posexplode(split(col("content"), "\n")).as(Seq("pos", "line")))
    val dfc = lines.select(col("file"), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))
    val total = lines.groupBy("file").agg(count(lit(1)).as("n_lines"))
    lines.join(dfc, "line").filter(col("df") < minDf)
      .groupBy("file").agg(
        count(lit(1)).as("kept_lines"),
        md5(concat_ws("\n",
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")))).as("new_md5"))
      .join(total, "file")
      .select("file", "n_lines", "kept_lines", "new_md5")
  }
}
