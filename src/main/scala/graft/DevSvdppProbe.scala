package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: per-sweep wall time + plan size of SvdPlusPlus.train. */
object DevSvdppProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val useFx = args.headOption.contains("fx")
    val ratings =
      if (useFx) Fixtures.persist(s, "planted_ratings",
        graft.core.Planted.blockRatings(s))
      else graft.core.Planted.blockRatings(s)
    println(s"[svdpp] input=${if (useFx) "fixture-parquet" else "range"}")
    import org.apache.spark.sql.functions._
    val lr = args.lift(1).map(_.toDouble).getOrElse(0.2)
    val reg = args.lift(2).map(_.toDouble).getOrElse(0.005)
    for (it <- Seq(args.lift(3).map(_.toInt).getOrElse(60))) {
      val t = System.nanoTime()
      val m = graft.cf.SvdPlusPlus.train(ratings, rank = 2, iters = it,
        lr = lr, reg = reg)
      val blocks = graft.cf.SvdPlusPlus
        .predict(m, ratings.select("user", "item"), ratings)
        .select((col("user") / 20).cast("long").as("ug"),
          (col("item") / 20).cast("long").as("ig"), col("pred"))
        .groupBy("ug", "ig").agg(avg("pred").as("mp"))
        .orderBy("ug", "ig").collect()
        .map(r => f"${r.getLong(0)}${r.getLong(1)}:${r.getDouble(2)}%.2f")
        .mkString(" ")
      println(f"[svdpp] iters=$it lr=$lr reg=$reg " +
        f"sec=${(System.nanoTime() - t) / 1e9}%.1f blocks: $blocks")
    }
    s.stop()
  }
}
