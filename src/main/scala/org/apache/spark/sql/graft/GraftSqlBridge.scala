package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Minimal bridge into Spark's `private[sql]` surface (the standard
  * extension-library pattern): lives inside the `org.apache.spark.sql`
  * package tree ONLY to reach `classic.Dataset.ofRows`. Kept to one
  * function so the private-API exposure is auditable at a glance; all
  * engine logic stays in the graft packages.
  */
object GraftSqlBridge {

  /** Re-wrap an eagerly localCheckpointed DataFrame's LogicalRDD WITHOUT
    * its origin statistics (see graft.core.Dataflow.checkpointRebased for
    * the why: per-round multiplicative stats products otherwise compound
    * exponentially across delta-iteration rounds). Same checkpointed
    * InternalRow RDD, same output partitioning/ordering — only the stats
    * provenance is dropped, so the leaf falls back to the engine's
    * default estimate.
    */
  def dropOriginStats(checkpointed: DataFrame): DataFrame =
    checkpointed.queryExecution.logical match {
      case lr: LogicalRDD =>
        val ses = checkpointed.sparkSession.asInstanceOf[classic.SparkSession]
        classic.Dataset.ofRows(ses,
          new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(ses, None, None))
      case _ => checkpointed // unexpected shape: keep Spark's own result
    }
}
