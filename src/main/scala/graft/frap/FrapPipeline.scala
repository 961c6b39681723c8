package graft.frap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end FRAP pipeline (the reference's main.cpp flow re-expressed):
  * distributed WL relabeling + kernel histograms + pairwise KL distance
  * matrix over all graphs at once ([[Kernels.klMatrix]] — the learning
  * distance stage never collects G×D arrays), then driver-side k-means
  * clustering/profiling/detection. The k-means stage still runs on collected
  * count arrays for the learn/monitor graphs only — faithful to the
  * reference's single-process centroid arithmetic (integer means,
  * helper.cpp:193-305) and bounded by (learn+monitor graphs) × D, a
  * documented, contained driver cost; the corpus-proportional stages (WL,
  * histograms, distances) are all distributed.
  */
object FrapPipeline {

  final case class Verdict(graphId: String, withinRadius: Boolean,
      abnormal: Boolean, minDistance: Double)

  /** Dense count arrays for every graph in `edges`, over a dictionary built
    * from the `learnIds` graphs only (the frozen learning relabel_map).
    * Returns (arrays by graphId, dictionary size).
    */
  def arrays(edges: DataFrame, learnIds: Seq[String], iters: Int)
      : (Map[String, Array[Int]], Int) = {
    val wl = WLRelabel.run(edges, iters)
    val counts = WLRelabel.kernelCounts(wl)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = Kernels.dictionary(
      counts.filter(col("graph_id").isInCollection(learnIds)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dictSize = dict.count().toInt
    val arr = Kernels.countArrays(counts, dict, dictSize)
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Int](1).toArray)
      .toMap
    counts.unpersist(false); dict.unpersist(false)
    (arr, dictSize)
  }

  /** Learn a profile from `learnIds` graphs and classify `monitorIds`. */
  def run(edges: DataFrame, learnIds: Seq[String], monitorIds: Seq[String],
      iters: Int = 4): Seq[Verdict] = {
    val wl = WLRelabel.run(edges, iters)
    val counts = WLRelabel.kernelCounts(wl)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = Kernels.dictionary(
      counts.filter(col("graph_id").isInCollection(learnIds)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dictSize = dict.count().toInt

    // distance stage: fully distributed from the sparse in-dictionary counts
    val inDict = counts.join(dict.select("label"), "label")
    val dm = Kernels.klMatrix(
      inDict.filter(col("graph_id").isInCollection(learnIds)), dictSize)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def d(a: String, b: String) = if (a < b) dm((a, b)) else dm((b, a))
    val n = learnIds.size
    val flat = (for {
      i <- 0 until n
      j <- 1 until n - i
    } yield d(learnIds(i), learnIds(i + j))).toVector

    // k-means stage: collect arrays for the learn+monitor graphs only
    val keep = (learnIds ++ monitorIds).toSet
    val arr = Kernels.countArrays(
      counts.filter(col("graph_id").isInCollection(keep.toSeq)), dict, dictSize)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toArray)
      .toMap
    counts.unpersist(false); dict.unpersist(false)

    val profile = Frap.learnProfileFromDistances(
      learnIds.map(arr(_)).toVector, flat)
    monitorIds.map { g =>
      val det = Frap.detect(profile, arr(g))
      Verdict(g, det.withinRadius, det.abnormal, det.distances.min)
    }
  }
}
