package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.LinkGraph

/** k-core decomposition by iterative degeneracy peeling, matching the
  * reference's kcores app (/root/reference/toolkits/graph_analytics/
  * kcores.cpp:81-142): for k = 1, 2, ... repeatedly remove vertices whose
  * remaining undirected degree is < k; a vertex's coreness is the largest k
  * at which it survives. Each peeling round is a degree aggregation + an
  * anti-join — the inner fixpoint runs until no vertex is removed, then k
  * advances.
  */
object KCores {

  /** (id, coreness) for every vertex of the undirected graph. */
  def coreness(spark: SparkSession, edges: DataFrame, maxK: Int = 64): DataFrame = {
    var und = LinkGraph.undirected(edges.select("src", "dst", "weight"))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    var result = LinkGraph.vertices(edges)
      .select(col("id"), lit(0).as("coreness"))
      .localCheckpoint(true)

    var k = 1
    var remaining = und.select(col("src").as("id")).distinct().count()
    while (remaining > 0 && k <= maxK) {
      // peel to the k-core: drop degree < k vertices until fixpoint
      var changed = true
      while (changed && remaining > 0) {
        val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val keep = deg.filter(col("deg") >= k).select("id")
          .localCheckpoint(true)
        val kept = keep.count()
        changed = kept < remaining
        remaining = kept
        if (changed) {
          und = und
            .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .select("src", "dst")
            .localCheckpoint(true)
        }
      }
      if (remaining > 0) {
        // survivors of the k-core have coreness >= k
        val survivors = und.select(col("src").as("id")).distinct()
        result = result.join(survivors.withColumnRenamed("id", "sid"),
          result("id") === col("sid"), "left")
          .select(result("id"),
            when(col("sid").isNotNull, lit(k)).otherwise(col("coreness"))
              .as("coreness"))
          .localCheckpoint(true)
      }
      k += 1
    }
    result
  }
}
