package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted-structure graphs for hard-oracle verification of the
  * algorithms whose outputs SQL cannot recompute independently (SCC, MSF).
  * Both generators are pure column expressions over `spark.range` — fully
  * distributed, no driver state, same rows at any parallelism — and are
  * persisted as parquet fixtures so the DuckDB oracle reads identical bytes.
  *
  * The *expected result* of each graph is known by construction and is
  * expressible in plain arithmetic SQL, so the oracle verifies the real
  * algorithm run (if Boruvka/coloring were wrong, the hash compare fails).
  */
object Planted {

  /** SCC test graph: clusters of strongly-connected vertices (directed cycle
    * + chord) joined by an intra-block DAG whose order is *permuted* relative
    * to vertex ids (so the coloring algorithm needs several peel rounds —
    * with id-ordered DAG edges every SCC would be a root in round 1).
    *
    * Layout: cluster c occupies ids [c*8, c*8 + sz(c)) with sz(c) = 1+(c%7)
    * (sizes 1..7, singletons included). DAG edges within blocks of 4
    * clusters follow the permutation k -> (3k) mod 4.
    *
    * Expected SCC label (max member id, the coloring root):
    *   scc(id) = (id/8)*8 + ((id/8) % 7)
    */
  def sccGraph(spark: SparkSession, nClusters: Int = 240): DataFrame = {
    require(nClusters % 4 == 0)
    val c = col("id")
    val sz = (c % 7) + 1
    val base = c * 8
    val clusters = spark.range(0, nClusters, 1, 8)
    val cycle = clusters.filter(sz >= 2)
      .select(base.as("b"), sz.as("s"),
        explode(sequence(lit(0L), sz - 1)).as("j"))
      .select((col("b") + col("j")).as("src"),
        (col("b") + (col("j") + 1) % col("s")).as("dst"))
    val chord = clusters.filter(sz >= 4)
      .select(base.as("src"), (base + 2).as("dst"))
    val dag = spark.range(0, nClusters / 4, 1, 8).select(col("id").as("bk"))
      .select(col("bk"), explode(sequence(lit(0L), lit(2L))).as("k"))
      .select((col("bk") * 4 + (col("k") * 3) % 4).as("sc"),
        (col("bk") * 4 + (col("k") * 3 + 3) % 4).as("dc"))
      .select((col("sc") * 8 + col("sc") % 7).as("src"), // max vertex of sc
        (col("dc") * 8).as("dst"))
    cycle.unionAll(chord).unionAll(dag)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), lit(1.0).as("weight"))
  }

  /** MSF test graph: a spanning tree with distinct weights < 1 plus random
    * extra edges with distinct weights >= 2. Every non-tree edge is the
    * strict maximum of its cycle, so the unique minimum spanning forest is
    * exactly the planted tree — the oracle is `WHERE weight < 1`.
    */
  def msfGraph(spark: SparkSession, n: Long = 4000L,
      extras: Long = 12000L): DataFrame = {
    val tree = spark.range(1, n, 1, 8).select(
      col("id").as("src"),
      (col("id") - 1 -
        pmod(xxhash64(lit("t"), col("id")), least(col("id"), lit(50L))))
        .as("dst"),
      (lit(1e-4) + col("id").cast("double") * 1e-7).as("weight"))
    val extra = spark.range(0, extras, 1, 8).select(
      pmod(xxhash64(lit("u"), col("id")), lit(n)).as("src"),
      pmod(xxhash64(lit("v"), col("id")), lit(n)).as("dst"),
      (lit(2.0) + col("id").cast("double") * 1e-6).as("weight"))
      .filter(col("src") =!= col("dst"))
    tree.unionAll(extra)
  }
}
