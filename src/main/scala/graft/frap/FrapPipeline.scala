package graft.frap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end FRAP pipeline (the reference's main.cpp flow re-expressed):
  * distributed WL relabeling + kernel histograms over all graphs at once,
  * then driver-side clustering/profiling/detection on the tiny per-graph
  * count arrays.
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
    val (arr, _) = arrays(edges, learnIds, iters)
    val profile = Frap.learnProfile(learnIds.map(arr(_)).toVector)
    monitorIds.map { g =>
      val det = Frap.detect(profile, arr(g))
      Verdict(g, det.withinRadius, det.abnormal, det.distances.min)
    }
  }
}
