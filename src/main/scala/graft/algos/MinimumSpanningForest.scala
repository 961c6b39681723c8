package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.LinkGraph

/** Minimum spanning forest via Boruvka rounds — the reference's
  * minimumspanningforest app (/root/reference/example_apps/
  * minimumspanningforest.cpp:98-498: per-component min-weight edge selection
  * with a min-weight duplicate filter, star contraction, contracted-graph
  * re-output) as dataflow:
  *
  *   repeat (O(log V) rounds):
  *     1. keep edges whose endpoints lie in different components
  *     2. per component, pick its minimum-weight incident edge
  *        (deterministic tie-break on (weight, u, v))
  *     3. add picks to the forest; contract by running hash-min CC on the
  *        picked component-pairs and composing the labeling
  *
  * Each round's contraction re-uses [[ConnectedComponents]] on the (tiny)
  * component graph — the dataflow form of the reference's
  * `sharded_graph_output` contracted re-sharding.
  */
object MinimumSpanningForest {

  /** Returns the forest edges (u, v, weight) — u < v canonical. */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val und = edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"),
      col("weight"))
      .filter(col("u") =!= col("v"))
      .groupBy("u", "v").agg(min("weight").as("weight")) // duplicate filter
      .localCheckpoint(true)

    // comp: vertex -> component label
    var comp = LinkGraph.vertices(edges.select(col("src"), col("dst"),
      col("weight")))
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var forest: DataFrame = null
    var round = 0
    var active = 1L

    while (active > 0 && round < maxRounds) {
      val cu = comp.select(col("id").as("u"), col("comp").as("cu"))
      val cv = comp.select(col("id").as("v"), col("comp").as("cv"))
      val live = und.join(cu, "u").join(cv, "v")
        .filter(col("cu") =!= col("cv"))
        .localCheckpoint(true)
      active = live.count()
      if (active > 0) {
        // per-component minimum incident edge, deterministic tie-break
        val incident = live.select(col("cu").as("c"), col("weight"),
          col("u"), col("v"), col("cv").as("other"))
          .unionAll(live.select(col("cv").as("c"), col("weight"),
            col("u"), col("v"), col("cu").as("other")))
        val picks = incident.groupBy("c").agg(
          min_by(struct(col("u"), col("v"), col("weight"), col("other")),
            struct(col("weight"), col("u"), col("v"))).as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"),
            col("e.weight").as("weight"),
            col("c"), col("e.other").as("other"))
          .localCheckpoint(true)
        val newForest = picks.select("u", "v", "weight").distinct()
        forest =
          if (forest == null) newForest
          else forest.unionAll(newForest).distinct()
        forest = forest.localCheckpoint(true)

        // contract: CC over the picked component-pair graph
        val compEdges = picks.select(col("c").as("src"),
          col("other").as("dst"), lit(1.0).as("weight"))
        val contracted = ConnectedComponents
          .run(spark, compEdges, maxIters = 50).state
          .select(col("id").as("comp"), col("label").as("newComp"))
        comp = comp.join(contracted, Seq("comp"), "left")
          .select(col("id"),
            coalesce(col("newComp"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
      round += 1
    }
    if (forest == null)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        und.schema)
    else forest
  }
}
