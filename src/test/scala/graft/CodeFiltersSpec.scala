package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.derive.{CodeFilters, CodeLakehouse}

/** Hand-fixture semantics of the code-corpus curation operators. */
class CodeFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def lake(rows: (String, String, String)*) =
    rows.toDF("repo", "path", "content")
      .withColumn("commit", lit("c0"))
      .withColumn("lang", lit("scala"))

  test("fileStats: StarCoder filters separate normal from minified files") {
    val normal = "package a\nval x = 1\nval y = 2" // 3 short alnum-ish lines
    val minified = "var " + "a" * 1500 + "=1;"     // one 1507-char line
    val binaryish = "%%%\n^^^ $$$ !!!\n(((" +
      ")))" // almost no alnum chars
    val out = CodeFilters.fileStats(lake(
      ("r1", "Normal.scala", normal),
      ("r1", "Min.js", minified),
      ("r1", "Bin.dat", binaryish))).collect()
      .map(r => r.getString(1) -> r).toMap

    val n = out("Normal.scala")
    assert(n.getAs[Long]("n_lines") == 3L)
    assert(n.getAs[Long]("max_line_len") == "val x = 1".length.toLong)
    // line chars = 9+9+9 = 27, avg = 9.0000
    assert(n.getAs[Long]("avg_line_q4") == 90000L)
    assert(n.getAs[Long]("keep") == 1L)

    val m = out("Min.js")
    assert(m.getAs[Long]("max_line_len") == 1507L)
    assert(m.getAs[Long]("keep") == 0L, "minified one-liner must be dropped")

    val b = out("Bin.dat")
    assert(b.getAs[Long]("alnum_q4") < 2500L)
    assert(b.getAs[Long]("keep") == 0L, "non-alnum soup must be dropped")
  }

  test("forkPairs: shared-content Jaccard; ubiquitous files carry no signal") {
    // repos A and B share f1..f5 (a fork keeping 5 of A's 6 files);
    // `LICENSE` content is in ALL repos — maxReposPerHash=2 must drop it
    // or A-C / B-C would surface as fake fork pairs.
    val files = (1 to 6).map(i => ("A", s"f$i", s"body-$i")) ++
      (1 to 5).map(i => ("B", s"f$i", s"body-$i")) ++
      Seq(("A", "LICENSE", "MIT"), ("B", "LICENSE", "MIT"),
        ("C", "LICENSE", "MIT"), ("C", "g1", "other-1"),
        ("C", "g2", "other-2"))
    val pairs = CodeFilters.forkPairs(lake(files: _*), minShared = 2L,
      maxReposPerHash = 2L).collect()
    assert(pairs.length == 1, s"only (A,B) is a fork pair: ${pairs.toSeq}")
    val p = pairs.head
    assert(p.getAs[String]("repo_a") == "A" && p.getAs[String]("repo_b") == "B")
    assert(p.getAs[Long]("shared") == 5L)
    assert(p.getAs[Long]("n_a") == 7L && p.getAs[Long]("n_b") == 6L)
    // J = 5 / (7 + 6 - 5) = 0.625
    assert(p.getAs[Long]("jaccard_q6") == 625000L)
  }

  test("forkPairs: within-repo duplicate contents count once") {
    val files = Seq(("A", "x1", "dup"), ("A", "x2", "dup"), ("B", "y", "dup"),
      ("A", "z", "only-a"), ("B", "w", "dup"), ("B", "v", "shared2"),
      ("A", "u", "shared2"))
    val p = CodeFilters.forkPairs(lake(files: _*), minShared = 1L,
      maxReposPerHash = 50L).collect()
    assert(p.length == 1)
    // distinct sets: A={dup,only-a,shared2} B={dup,shared2} → J = 2/3
    assert(p.head.getAs[Long]("shared") == 2L)
    assert(p.head.getAs[Long]("n_a") == 3L && p.head.getAs[Long]("n_b") == 2L)
    assert(p.head.getAs[Long]("jaccard_q6") == 666666L)
  }

  test("lineDedup: boilerplate lines drop corpus-wide, order preserved") {
    // "import std" occurs in 3 files (df=3 ≥ minDf=3 → dropped);
    // "import rare" in 2 (kept); bodies unique (kept). A repeated line
    // WITHIN one file counts once for df but both instances share fate.
    val files = lake(
      ("r", "a", "import std\nimport rare\nbody-a\nbody-a"),
      ("r", "b", "import std\nimport rare\nbody-b"),
      ("r", "c", "import std\nbody-c"))
    val out = CodeFilters.lineDedup(files, minDf = 3L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("r/a").getAs[Long]("n_lines") == 4L)
    assert(out("r/a").getAs[Long]("kept_lines") == 3L)
    val md5a = java.security.MessageDigest.getInstance("MD5")
      .digest("import rare\nbody-a\nbody-a".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out("r/a").getAs[String]("new_md5") == md5a,
      "survivors must reassemble in original order")
    assert(out("r/b").getAs[Long]("kept_lines") == 2L)
    assert(out("r/c").getAs[Long]("kept_lines") == 1L)
  }

  test("plantForks keeps content byte-identical under a new repo name") {
    val base = CodeLakehouse.table(spark, 5000L)
    val forks = CodeFilters.plantForks(base, Seq("repo-0010"), 8000, 7L)
      .cache()
    val nParent = base.filter(col("repo") === "repo-0010").count()
    val nFork = forks.count()
    assert(nFork > 0 && nFork < nParent,
      s"fork must be a strict subset: $nFork of $nParent")
    // every fork row's content matches its parent path's content
    val mismatch = forks.select(col("path"), col("content").as("fc"))
      .join(base.filter(col("repo") === "repo-0010"), "path")
      .filter(col("fc") =!= col("content")).count()
    assert(mismatch == 0L)
    forks.unpersist()
  }
}
