package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.LinkGraph

/** Strongly-connected components via iterative forward-coloring + backward
  * confirmation — the same Salihoglu-Widom "coloring" scheme the reference
  * implements (/root/reference/example_apps/stronglyconnectedcomponents.cpp:
  * 146-407: forward min/max color spread, backward confirm, peel, repeat),
  * expressed as nested BSP fixpoints:
  *
  *   while vertices remain:
  *     1. forward fixpoint: color(v) = max id that reaches v (incl. self)
  *     2. roots: color(v) == v
  *     3. backward fixpoint within each color class from its root — the
  *        confirmed set is one SCC (labeled by its root id)
  *     4. peel confirmed vertices and their edges, repeat
  *
  * SCC labels are the root ids (the max vertex id of each SCC) — a canonical
  * labeling, exact-match testable against a Tarjan oracle.
  */
object SCC {

  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    var liveEdges = edges.select("src", "dst").distinct().localCheckpoint(true)
    var live = LinkGraph.vertices(edges).localCheckpoint(true)
    var result: DataFrame = null
    var remaining = live.count()
    var round = 0

    while (remaining > 0 && round < maxRounds) {
      // --- 1. forward max-color fixpoint -------------------------------
      var colors = live.select(col("id"), col("id").as("color"))
        .localCheckpoint(true)
      var changed = 1L
      while (changed > 0) {
        val msgs = colors.join(liveEdges, colors("id") === liveEdges("src"))
          .groupBy(col("dst")).agg(max(col("color")).as("mcolor"))
        val next = colors.join(msgs, colors("id") === msgs("dst"), "left")
          .select(colors("id"),
            greatest(col("color"), coalesce(col("mcolor"), col("color")))
              .as("color"),
            (coalesce(col("mcolor"), col("color")) > col("color"))
              .cast("int").as("chg"))
          .localCheckpoint(true)
        changed = next.agg(sum("chg")).head().getLong(0)
        colors = next.select("id", "color")
      }

      // --- 2+3. backward confirmation within color classes --------------
      // Frontier-batched: only vertices confirmed LAST round probe their
      // predecessors (one action per round, joins shrink with the frontier —
      // round 1 re-joined the whole confirmed set and counted twice).
      val roots = colors.filter(col("color") === col("id"))
        .select(col("id"), col("id").as("scc"))
        .localCheckpoint(true)
      var inScc = roots
      var frontier = roots
      var grew = frontier.count()
      while (grew > 0) {
        val preds = frontier
          .join(liveEdges, frontier("id") === liveEdges("dst"))
          .select(col("src").as("id"), col("scc"))
        // predecessor joins the SCC iff it has the same forward color
        val confirmed = preds.join(colors.withColumnRenamed("id", "cid"),
          preds("id") === col("cid") && preds("scc") === col("color"))
          .select(col("id"), col("scc")).distinct()
          .join(inScc.select(col("id").as("did")), col("id") === col("did"),
            "left_anti")
          .localCheckpoint(true)
        grew = confirmed.count()
        if (grew > 0) {
          inScc = inScc.unionAll(confirmed).localCheckpoint(true)
          frontier = confirmed
        }
      }

      result = if (result == null) inScc else result.unionAll(inScc)
      result = result.localCheckpoint(true)

      // --- 4. peel ------------------------------------------------------
      live = live.join(inScc.select(col("id").as("did")),
        live("id") === col("did"), "left_anti").localCheckpoint(true)
      liveEdges = liveEdges
        .join(live.select(col("id").as("ls")), liveEdges("src") === col("ls"),
          "left_semi")
        .join(live.select(col("id").as("ld")), liveEdges("dst") === col("ld"),
          "left_semi")
        .localCheckpoint(true)
      remaining = live.count()
      round += 1
    }
    // A graph can need up to one round per SCC in the worst case (descending
    // chain); silently returning a partial labeling would be wrong (ADVICE
    // r1) — fail loudly instead.
    if (remaining > 0)
      throw new IllegalStateException(
        s"SCC peeling did not finish within $maxRounds rounds " +
          s"($remaining vertices unlabeled); raise maxRounds")
    if (result == null)
      live.select(col("id"), col("id").as("scc"))
    else result.select("id", "scc")
  }
}
