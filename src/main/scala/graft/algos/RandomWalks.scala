package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Random walks as dataflow, the reference's randomwalks app
  * (/root/reference/example_apps/randomwalks.cpp:57-137: `nwalks` particles
  * per source hopping along random out-edges; walks at dead ends stop;
  * output = per-vertex visit counts).
  *
  * Determinism: the "random" neighbor choice is
  * `xxhash64(walk_id, step, seed) mod outdeg` — reproducible across runs and
  * parallelism levels (the reference uses `random_outedge`,
  * graph_objects.hpp:291-294; seeded hashing is the dataflow equivalent).
  * Walk state is one row per live walk; each hop is one join against the
  * grouped adjacency (out-neighbors as an array column, built once).
  */
object RandomWalks {

  /** Run `walksPerSource` walks of length `steps` from each source.
    * Returns (id, visits) — visit counts over all intermediate positions
    * (excluding the start, matching the reference which counts `hops`).
    */
  def visitCounts(spark: SparkSession, edges: DataFrame, sources: DataFrame,
      walksPerSource: Int, steps: Int, seed: Long = 42L): DataFrame = {
    val adj = edges.select("src", "dst")
      .groupBy("src").agg(sort_array(collect_list("dst")).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    // walk_id encodes (source, replica); state: live walks' positions
    var walks = sources.select(col("id"))
      .crossJoin(spark.range(0, walksPerSource).toDF("rep"))
      .select(
        (col("id") * walksPerSource + col("rep")).as("walk_id"),
        col("id").as("pos"))
      .localCheckpoint(true)

    var visits: DataFrame = null
    for (step <- 1 to steps) {
      walks = walks.join(adj, walks("pos") === adj("src"))
        .select(col("walk_id"),
          element_at(col("nbrs"),
            (pmod(xxhash64(col("walk_id"), lit(step), lit(seed)),
              size(col("nbrs"))) + 1).cast("int")).as("pos"))
        .localCheckpoint(true) // walks at sinks drop out (inner join)
      val v = walks.select(col("pos").as("id"))
      visits = if (visits == null) v else visits.unionAll(v)
    }
    adj.unpersist(false)
    if (visits == null) spark.emptyDataFrame
    else visits.groupBy("id").agg(count(lit(1)).as("visits"))
  }
}
