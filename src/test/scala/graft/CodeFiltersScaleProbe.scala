package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.derive.{CodeFilters, CodeLakehouse}

/** Env-gated scale probe for the code-corpus curation operators (src/test
  * so running it never stales BENCH_LARGE.json). Generates the synthetic
  * lakehouse at N files and times the three passes a real curation run
  * chains: per-file stats scan, corpus-wide line dedup, fork detection.
  *
  * Run: SPARK_GRAFT_CODE_PROBE=2000000 sbt -batch "testOnly graft.CodeFiltersScaleProbe"
  * Results recorded in BENCH.md "Code-corpus curation at scale".
  */
class CodeFiltersScaleProbe extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  test("code curation throughput at scale (env-gated)") {
    val nOpt = sys.env.get("SPARK_GRAFT_CODE_PROBE").map(_.toLong)
    assume(nOpt.nonEmpty, "set SPARK_GRAFT_CODE_PROBE=<n_files> to run")
    val n = nOpt.get
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = CodeLakehouse.table(spark, n, nRepos = 1000,
        partitions = parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    info(s"lakehouse: ${base.count()} files")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      info(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // 1. fileStats — map-only scan; report keep-rate so the work is real
    val kept = timed(s"fileStats n=$n") {
      CodeFilters.fileStats(base).agg(sum("keep"), count(lit(1)))
        .collect()(0)
    }
    info(s"fileStats keep ${kept.getLong(0)} of ${kept.getLong(1)}")

    // 2. lineDedup — DF count + survivor join + per-file reassembly
    val ld = timed(s"lineDedup n=$n") {
      CodeFilters.lineDedup(base, minDf = 5L)
        .agg(count(lit(1)), sum("n_lines"), sum("kept_lines")).collect()(0)
    }
    info(s"lineDedup files=${ld.getLong(0)} lines=${ld.getLong(1)} " +
      s"kept=${ld.getLong(2)}")

    // 3. forkPairs over base + forks of 20 parents (hash join + cap)
    val parents = (10 until 30).map(i => f"repo-$i%04d")
    val forked = base.unionByName(
      CodeFilters.plantForks(base, parents, keepQ4 = 8000, seed = 7L))
    val fp = timed(s"forkPairs n=$n+forks") {
      CodeFilters.forkPairs(forked).collect()
    }
    info(s"forkPairs: ${fp.length} pairs, " +
      s"jaccard_q6 range ${fp.map(_.getAs[Long]("jaccard_q6")).min}.." +
      s"${fp.map(_.getAs[Long]("jaccard_q6")).max}")
    assert(fp.length >= parents.size,
      "every planted fork must be detected")
    base.unpersist()
  }
}
