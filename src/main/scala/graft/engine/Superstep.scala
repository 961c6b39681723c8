package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BSP superstep driver. The reference's iteration loop
  * (/root/reference/src/engine/graphchi_engine.hpp:779-959) re-expressed for
  * Spark: each superstep is a pure function `state => nextState`, the driver
  * checkpoints the new state (lineage truncation — replacing GraphChi's
  * mutate-in-place shards), measures convergence on the *checkpointed* frame
  * (so the superstep plan executes exactly once), records per-superstep
  * metrics (the `.deltalog` analog, graphchi_engine.hpp:593-599), and stops
  * when converged. Supports resume-from-manifest via [[DurableStore]].
  *
  * Convention: the state carries its own convergence signal as a `delta`
  * column (per-vertex |change| — the reference's `ctx.log_change`,
  * graphchi_context.hpp:78-105). The driver aggregates
  * `(max(delta), count(delta > tol), count(*))` in one pass; `active` (rows
  * still changing) doubles as the delta-iteration frontier size, mirroring
  * the bitset scheduler (bitset_scheduler.hpp:38-104).
  */
object Superstep {

  final case class RunResult(
      state: DataFrame,
      supersteps: Int,
      converged: Boolean,
      metrics: Seq[SuperstepMetrics])

  /** Iterate from `init` until `max(delta) <= tol` or `maxIters` supersteps.
    *
    * @param init     iteration-0 state; must contain a `delta` column
    * @param step     (state, iter) => next state (same schema); iter from 1
    * @param tol      stop when max(delta) <= tol
    * @param maxIters superstep cap
    * @param store    persistence/metrics backend
    */
  def run(
      init: DataFrame,
      step: (DataFrame, Int) => DataFrame,
      tol: Double,
      maxIters: Int,
      store: StateStore): RunResult = {

    val collected = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    val (startIter, initState) = store.resumePoint() match {
      case Some((iter, st)) => (iter + 1, st)
      case None             => (1, store.persist(init, 0))
    }

    var state = initState
    var iter = startIter
    var converged = false
    while (iter <= maxIters && !converged) {
      val t0 = System.nanoTime()
      val next = store.persist(step(state, iter), iter)
      val Row(maxDelta: Double, active: Long, rows: Long) = next.agg(
        coalesce(max(col("delta")), lit(0.0)),
        coalesce(sum(when(col("delta") > tol, 1L).otherwise(0L)), lit(0L)),
        count(lit(1))).head()
      val wall = (System.nanoTime() - t0) / 1e9
      val parts = store match {
        case d: DurableStore => d.partitionMetrics(iter)
        case _               => Nil
      }
      val m = SuperstepMetrics(
        iter, rows, parts.map(_.bytes).sum, maxDelta, active, wall, parts)
      store.log(m)
      collected += m
      store.release(state)
      state = next
      converged = maxDelta <= tol
      iter += 1
    }
    RunResult(state, iter - 1, converged, collected.toSeq)
  }
}
