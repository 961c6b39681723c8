package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("binary media plumbing: synthesize → decode-stub → features") {
    val ids = Tables(spark, TestSessions.Sf0001, "documents")
      .select("doc_id").limit(100)
    val media = Multimodal.synthesize(spark, ids, "doc_id")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 100)
    // header roundtrip: decoded dims match the synthesizer's formulas
    feats.foreach { f =>
      assert(f.width == (64 + (f.media_id * 37) % 192).toInt)
      assert(f.height == (64 + (f.media_id * 53) % 128).toInt)
      assert(f.channels == (1 + f.media_id % 4).toInt)
      assert(f.n_bytes >= 262 && f.frames_sampled > 0)
      assert(Set("image", "audio", "video").contains(f.modality))
    }
    // determinism across runs
    val again = Multimodal.extractFeatures(
      Multimodal.synthesize(spark, ids, "doc_id")).collect()
    assert(feats.sortBy(_.media_id).sameElements(again.sortBy(_.media_id)))
  }
}
