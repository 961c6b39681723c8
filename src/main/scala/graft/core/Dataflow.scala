package graft.core

import org.apache.spark.sql.DataFrame

/** Shared iterative-dataflow helpers. */
object Dataflow {

  /** Eager checkpoint + STATS REBASE for loops whose state is referenced
    * multiplicatively. `localCheckpoint` alone is not enough: the returned
    * LogicalRDD inherits the replaced plan's *estimated* sizeInBytes, and
    * Catalyst's inner-join size estimate is the PRODUCT of its children —
    * a loop that joins its state leaf k (>1) times per iteration grows the
    * estimate's BigInteger bit-length ~k× every iteration, until a single
    * stats multiplication runs for minutes and blocks safepoints (observed:
    * SVD++ sweep 7 spending 100 s inside BigInteger.multiplyToomCook3).
    * Delta-iterated algos (CC, SCC, k-cores) dodge this structurally —
    * semi/anti joins take the left child's size, no product — but factor
    * sweeps and k-means assignment joins cannot, so rebuild the leaf via
    * createDataFrame(rdd, schema): same materialized rows, fresh constant
    * stats. The conservative default leaf size also keeps the optimizer
    * from ever broadcasting the state side — right for cluster-scale state.
    */
  def checkpointRebased(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
