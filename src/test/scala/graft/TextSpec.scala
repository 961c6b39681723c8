package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.text.{Dedup, TextStats}

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  lazy val docs = Tables(spark, TestSessions.Sf0001, "documents").cache()

  private def mkDocs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("token counts match a plain-Scala split") {
    val got = TextStats.tokenCounts(docs)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> ((t.length.toLong, t.trim.split("\\s+").count(_.nonEmpty).toLong))
      }.toMap
    assert(got == want)
  }

  test("exact dedup keeps the min doc_id per identical text") {
    val d = mkDocs(Seq(1L -> "a b c", 2L -> "a b c", 3L -> "x y", 7L -> "a b c"))
    val got = Dedup.exact(d)
      .select("keep_id", "dup_cnt").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (3L, 1L)))
  }

  test("repetition fractions match a plain-Scala recomputation") {
    val hand = mkDocs(Seq(
      1L -> "spam spam spam spam",        // one 2-gram dominates
      2L -> "a b c d e",                  // all distinct
      3L -> "x y x y x y z",              // duplicated 2/3-grams
      4L -> "solo",                       // too short for any gram
      5L -> ""))                          // empty
    val got = TextStats.repetition(hand)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def grams(t: String, n: Int): Seq[String] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val want = Seq(1L -> "spam spam spam spam", 2L -> "a b c d e",
      3L -> "x y x y x y z", 4L -> "solo", 5L -> "").map { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val g2 = grams(t, 2); val g3 = grams(t, 3)
      val top2 = if (g2.isEmpty) 0.0
        else g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size
      def dup(xs: Seq[String]) = if (xs.isEmpty) 0.0
        else (xs.size - xs.distinct.size).toDouble / xs.size
      id -> ((q6(top2), q6(dup(g3)), q6(dup(toks))))
    }.toMap
    assert(got == want)
    // and over the real corpus: never NaN/negative, all within [0, 1e6]
    val corpus = TextStats.repetition(docs)
      .as[(Long, Long, Long, Long)].collect()
    assert(corpus.forall(r => Seq(r._2, r._3, r._4)
      .forall(v => v >= 0L && v <= 1000000L)))
  }

  test("ngram jaccard pairs match a plain-Scala shingle computation") {
    val got = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard_q6")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = local.map { case (id, t) => id -> sh(t) }.toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a, b) -> math.floor(j * 1e6 + 0.5).toLong).toMap
    assert(got == want)
    assert(got.nonEmpty, "corpus should contain planted near-dups")
  }

  test("substring dedup: cross-doc + within-doc spans, merge semantics") {
    // doc 0 and doc 1 share the 6-token passage "a b c d e f" at offsets 0
    // and 2; doc 2 repeats its own 5-token prefix (within-doc duplication,
    // windows wrap the repeat into ONE merged span covering the doc);
    // doc 3 is unique (no output row)
    val df = mkDocs(Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e f q"),
      (2L, "p q r s t p q r s t"),
      (3L, "u v w only once here never repeated")))
    val got = Dedup.substringSpans(df, windowTokens = 4)
      .select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc0: dup windows at p=0,1,2 ("a b c d","b c d e","c d e f") → [0,6)
    // doc1: same three windows at p=2,3,4 → [2,8)
    // doc2: windows p∈{0,1,5,6} (p0==p5 "p q r s", p1==p6 "q r s t");
    //       p=5 TOUCHES the previous end (1+4=5) → one span [0,10)
    assert(got == Set((0L, 0L, 6L, 3L), (1L, 2L, 8L, 3L),
      (2L, 0L, 10L, 4L)))
  }

  test("substring dedup: hot ubiquitous window stays linear and exact") {
    // the same window in EVERY doc (boilerplate): spans exist per doc and
    // cover exactly the boilerplate, not the unique tails
    val df = mkDocs((0L until 40L).map(i =>
      (i, s"common header tokens one two three unique$i tail$i")))
    val got = Dedup.substringSpans(df, windowTokens = 6)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 40)
    assert(got.forall { case (_, s, e) => s == 0L && e == 6L })
  }

  test("minhash LSH finds every high-jaccard pair the exact method finds") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashDedup(docs, n = 3, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // 8 bands × 4 rows: P(miss | J=0.9) = (1-0.9^4)^8 ≈ 4e-3 per pair — with
    // fixed seeds this is deterministic; assert full recall on this corpus
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
    // and minhash never reports below-threshold pairs (exact verification)
    assert(mh.subsetOf(
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.9)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet))
  }

  test("simhash: identical docs collide, near-dups land within distance") {
    val d = mkDocs(Seq(
      1L -> "spark join filter window group sort merge data table scan",
      2L -> "spark join filter window group sort merge data table scan",
      3L -> "spark join filter window group sort merge data table scans",
      4L -> "completely different words entirely unrelated content here now"))
    val hashes = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(3L)) <= 16)
    assert(ham(hashes(1L), hashes(4L)) > 16)
    val pairs = Dedup.simhashPairs(d, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // the 4-chunk pigeonhole index is exhaustive at the contract distance:
    // exactly the brute-force pairs at Hamming <= 3, no misses
    val brute = (for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq
      if a < b && ham(ha, hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)
    // distances beyond the pigeonhole guarantee are rejected, not silently
    // under-recalled (VERDICT r1 contract fix)
    intercept[IllegalArgumentException](Dedup.simhashPairs(d, maxDist = 10))
  }

  test("langid is deterministic and assigns every doc a trained language") {
    val profiles = TextStats.trainLangProfiles(docs)
    val a = TextStats.langId(docs, profiles)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    val b = TextStats.langId(docs, profiles)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.size == docs.count())
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(a.values.toSet.subsetOf(langs))
  }

  test("fingerprints: identical texts share both hashes; short docs fall back") {
    val d = mkDocs(Seq(1L -> "a b c d e f g", 2L -> "a b c d e f g", 3L -> "x y"))
    val fp = TextStats.fingerprints(d, n = 5)
      .select("doc_id", "text_md5", "min_shingle_md5")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(3L)._1 == fp(3L)._2) // < n tokens → fallback to full-text md5
  }

  test("decontaminate flags exactly the docs sharing enough bench shingles") {
    import graft.text.Decontaminate
    val corpus = mkDocs(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "quick brown fox jumps high today",       // shares 2 trigrams w/ b0
      3L -> "completely unrelated text about spark engines",
      4L -> "the quick brown fox jumps again"))       // shares 3 trigrams w/ b0
    val bench = Seq(0L -> "the quick brown fox jumps").toDF("bench_id", "text")
    val got = Decontaminate.flag(corpus, bench, n = 3, minHits = 3)
      .select("doc_id", "bench_id", "hits").as[(Long, Long, Long)]
      .collect().toSet
    // doc 1: trigrams of bench all present (3 of 3); doc 4: same 3; doc 2
    // has only "quick brown fox","brown fox jumps" = 2 < minHits; doc 3: 0
    assert(got == Set((1L, 0L, 3L), (4L, 0L, 3L)))
  }

  test("pii scrub counts and replaces planted emails and phones") {
    val d = mkDocs(Seq(
      1L -> "contact alice.smith+x@example.org or bob@test.io today",
      2L -> "call +1 (555) 010-9999 or 555-010-8888 now",
      3L -> "no pii here at all"))
    val got = TextStats.piiScrub(d)
      .select("doc_id", "n_emails", "n_phones")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 0L)))
    assert(got(2L) == ((0L, 2L)))
    assert(got(3L) == ((0L, 0L)))
    // the scrubbed hash actually changes (spans were replaced)
    val h = TextStats.piiScrub(d).select("doc_id", "scrubbed_md5")
      .as[(Long, String)].collect().toMap
    val raw = d.select(col("doc_id"), md5(col("text")))
      .as[(Long, String)].collect().toMap
    assert(h(1L) != raw(1L) && h(2L) != raw(2L) && h(3L) == raw(3L))
  }

  test("bag of words: alphabetical ids, per-doc counts, threshold filter") {
    import graft.text.FeatureStats
    val d = mkDocs(Seq(
      1L -> "bb aa bb cc x bb",   // x is length-1 → dropped
      2L -> "cc cc dd",
      3L -> ""))
    // vocabulary sorted: aa=1 bb=2 cc=3 dd=4
    val dict = FeatureStats.wordDictionary(d)
      .as[(String, Long)].collect().toMap
    assert(dict == Map("aa" -> 1L, "bb" -> 2L, "cc" -> 3L, "dd" -> 4L))
    val all = FeatureStats.bagOfWords(d)
      .as[(Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 1L),
      (2L, 3L, 2L), (2L, 4L, 1L)))
    // minCount = 2 keeps only the repeated-in-doc words
    val thr = FeatureStats.bagOfWords(d, minCount = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(thr == Set((1L, 2L, 3L), (2L, 3L, 2L)))
  }

  test("bigram LM NLL matches a hand-computed add-one model") {
    // vocab {aa, bb, cc, zz} (V = 4; the 1-char token is dropped by the
    // len >= 2 filter); bigrams (aa,bb)x3, (bb,aa)x1, (bb,cc)x1 -> prefix
    // counts aa:3, bb:2
    val d = mkDocs(Seq(
      1L -> "aa bb aa bb",   // pairs (aa,bb) (bb,aa) (aa,bb)
      2L -> "aa bb cc",      // pairs (aa,bb) (bb,cc)
      3L -> "zz",            // single token: no pairs
      4L -> "x",             // filtered to empty
      5L -> ""))             // empty
    def q6(p: Double) = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val pAaBb = q6(4.0 / 7.0)  // (3+1)/(3+4)
    val pBbX = q6(2.0 / 6.0)   // (1+1)/(2+4), both (bb,aa) and (bb,cc)
    val want = Map(
      1L -> ((3L, -(2 * pAaBb + pBbX))),
      2L -> ((2L, -(pAaBb + pBbX))),
      3L -> ((0L, 0L)), 4L -> ((0L, 0L)), 5L -> ((0L, 0L)))
    val got = TextStats.lmPerplexity(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
    // mean = truncating division of non-negative longs
    val means = TextStats.lmPerplexity(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(means == want.map { case (k, (n, s)) =>
      k -> (if (n > 0) s / n else 0L) })
  }

  test("BPE train matches a sequential reference on real documents") {
    import graft.text.Bpe
    // plain-Scala Sennrich BPE: pair counts over the word-freq table,
    // greedy leftmost merge application
    def refTrain(words: Map[String, Long], m: Int)
    : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
      var syms = words.map { case (w, _) => w -> w.split("").toVector }
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      for (_ <- 1 to m) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        for ((w, f) <- words; Seq(a, b) <- syms(w).sliding(2)
             if syms(w).size >= 2)
          counts((a, b)) = counts.getOrElse((a, b), 0L) + f
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
          merges += ((l, r, c))
          syms = syms.map { case (w, ss) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < ss.size) {
              if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += ss(i); i += 1 }
            }
            w -> out.result()
          }
        }
      }
      (merges.toSeq, syms)
    }
    val words = docs.select(explode(split(trim(col("text")), "\\s+")))
      .filter(length(col("col")) > 0)
      .groupBy("col").count().as[(String, Long)].collect().toMap
    val (wantMerges, wantSyms) = refTrain(words, 8)
    val (gotM, gotS) = Bpe.train(docs, 8)
    assert(gotM.select("left_sym", "right_sym", "cnt").as[(String, String, Long)]
      .collect().toSeq == wantMerges)
    val gotSyms = gotS.select("word", "syms").as[(String, Seq[String])]
      .collect().map { case (w, s) => w -> s.toVector }.toMap
    assert(gotSyms == wantSyms)
    // cascade sanity on a hand case: freq makes (a,a) then (aa,aa) win
    val hand = mkDocs(Seq(1L -> "aaaa aaaa aaaa", 2L -> "bc bc"))
    val (hm, hs) = Bpe.train(hand, 2)
    assert(hm.select("left_sym", "right_sym").as[(String, String)]
      .collect().toSeq == Seq(("a", "a"), ("aa", "aa")))
    val aaaa = hs.filter(col("word") === "aaaa").select("syms")
      .as[Seq[String]].head()
    assert(aaaa == Seq("aaaa"))
  }

  test("mutual information: zero when independent, H(X) when determined") {
    import graft.text.FeatureStats
    // independent: every (x, y) combination equally frequent
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q", "r"); _ <- 1 to 4)
      yield (x, y)).toDF("x", "y")
    val r1 = FeatureStats.mutualInformation(ind, "x", "y")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r1 == ((24L, 2L, 3L, 0L, 1000000L))) // H(X) = 1 bit, MI = 0
    // fully dependent: y = f(x) → MI = H(X); p(a)=1/4, p(b)=3/4
    val dep = (Seq.fill(2)(("a", "p")) ++ Seq.fill(6)(("b", "q")))
      .toDF("x", "y")
    val r2 = FeatureStats.mutualInformation(dep, "x", "y")
      .as[(Long, Long, Long, Long, Long)].head()
    val hx = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75)) / math.log(2)
    val hxQ6 = math.floor(hx * 1e6 + 0.5).toLong
    assert(r2 == ((8L, 2L, 2L, hxQ6, hxQ6)))
  }

  test("dsir importance weights separate target-like from raw-like docs") {
    import graft.text.Dsir
    // target docs (1, 2) share a vocabulary; raw-only docs (3, 4) another;
    // doc 5 is written in the target vocabulary but NOT marked target —
    // DSIR must give it a higher importance weight than the raw-only docs
    val d = mkDocs(Seq(
      1L -> "alpha beta alpha beta gamma",
      2L -> "beta alpha gamma alpha beta",
      3L -> "delta epsilon zeta delta epsilon",
      4L -> "zeta epsilon delta zeta zeta",
      5L -> "alpha beta gamma beta alpha"))
      .withColumn("lang", when(col("doc_id") <= 2, "en").otherwise("xx"))
    val w = Dsir.importanceWeights(d, col("lang") === "en", buckets = 64)
      .as[(Long, Long)].collect().toMap
    assert(w(5L) > w(3L) && w(5L) > w(4L),
      s"target-like doc must outweigh raw-only docs: $w")
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    // partitioning invariance: per-term q6 integer sums are order-free
    val w2 = Dsir.importanceWeights(d.repartition(7, col("text")),
      col("lang") === "en", buckets = 64).as[(Long, Long)].collect().toMap
    assert(w2 == w)
    // resample: deterministic, k rows, ranked by score then doc_id
    val sel = Dsir.resample(d, col("lang") === "en", buckets = 64, k = 3)
      .as[(Long, Long, Long)].collect()
    val sel2 = Dsir.resample(d.repartition(5), col("lang") === "en",
      buckets = 64, k = 3).as[(Long, Long, Long)].collect()
    assert(sel.toSeq == sel2.toSeq && sel.length == 3)
    assert(sel.map(_._3).toSeq == sel.map(_._3).sorted.reverse.toSeq)
    // real corpus smoke: English docs must average a higher weight than
    // non-English (they ARE the target distribution)
    val corpus = Dsir.importanceWeights(docs, col("lang") === "en", 512)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val means = corpus.groupBy(col("lang") === "en")
      .agg(avg(col("logw_q6"))).as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"en target mean must exceed non-en: $means")
  }

  test("NB classifier: exact hand weights, held-out recovery, invariance") {
    import graft.text.Classifier
    // hand case: 2 docs, F=16. pos doc "aa aa bb", neg doc "cc".
    // tp=3, tn=1; w(fid) = q6(ln((cp+1)/(tp+16))) - q6(ln((cn+1)/(tn+16)))
    val hand = Seq((0L, "aa aa bb", 1L), (1L, "cc", -1L))
      .toDF("doc_id", "text", "y")
    val f = Classifier.hashedCounts(hand.select("doc_id", "text"), 16)
    val (w, b) = Classifier.trainNb(f, hand.select("doc_id", "y"), 16)
    def q6ln(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    def fid(tok: String, m: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % m
    }
    val wm = w.as[(Long, Long)].collect().toMap
    assert(wm(fid("aa", 16)) == q6ln(3.0 / 19) - q6ln(1.0 / 17))
    assert(wm(fid("bb", 16)) == q6ln(2.0 / 19) - q6ln(1.0 / 17))
    assert(wm(fid("cc", 16)) == q6ln(1.0 / 19) - q6ln(2.0 / 17))
    assert(b.as[Long].collect().toSeq == Seq(0L)) // ln(1/1) = 0
    // planted two-domain corpus: train on 80%, ALL docs (train + the
    // held-out 20%) must classify perfectly — the p/n vocabularies are
    // disjoint by construction
    val docs2 = graft.core.Planted.twoDomainDocs(spark)
    val feats = Classifier.hashedCounts(
      docs2.select("doc_id", "text"), 4096)
    val trainL = docs2.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("label").as("y"))
    val (w2, b2) = Classifier.trainNb(feats, trainL, 4096)
    val out = Classifier.classify(feats, w2, b2)
      .join(docs2.select(col("doc_id"), col("label")), "doc_id")
    assert(out.count() == 600)
    val wrong = out.filter(col("pred") =!= col("label")).count()
    assert(wrong == 0, s"misclassified $wrong of 600")
    // bias-only path: a doc of only unseen tokens scores exactly b
    val novel = Classifier.classify(
      Classifier.hashedCounts(Seq((9L, "zz")).toDF("doc_id", "text"), 16),
      w, b).as[(Long, Long, Long)].collect().toSeq
    assert(novel.map(_._2) == Seq(0L))
    // partitioning invariance (order-free integer sums)
    val m1 = Classifier.classify(feats, w2, b2)
      .as[(Long, Long, Long)].collect().toSet
    val (w3, b3) = Classifier.trainNb(
      feats.repartition(7, col("fid")), trainL.repartition(3), 4096)
    val m2 = Classifier.classify(feats.repartition(5, col("doc_id")),
      w3, b3).as[(Long, Long, Long)].collect().toSet
    assert(m1 == m2)
  }
}
