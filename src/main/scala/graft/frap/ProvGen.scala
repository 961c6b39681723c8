package graft.frap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic generator of small typed provenance graphs in the shape of
  * the reference's CamFlow datasets (/root/reference/myapps/dataset1 —
  * ~1k-edge graphs of typed vertices and edges produced by jsonparser.cpp):
  * used as the frapspark test corpus (no external data). "Normal" graphs are
  * variations of a process→file pipeline pattern; "abnormal" graphs add a
  * socket-exfiltration star, mimicking the good/bad instance split of
  * /root/reference/myapps/results.md.
  *
  * Vertex types: 1=process 2=file 3=socket; edge types: 1=read 2=write
  * 3=connect.
  */
object ProvGen {

  final case class ProvEdge(graph_id: String, src: Long, dst: Long,
      src_type: Int, dst_type: Int, edge_type: Int)

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** A normal instance: chain of stages, each stage a process reading the
    * previous stage's file and writing a new one, with seed-varied fan-out.
    */
  def normal(graphId: String, seed: Long): Seq[ProvEdge] = {
    val r = rng(seed * 0x9E3779B97F4A7C15L + 1)
    // normal behavior is a *tight* family: fixed pipeline depth, small
    // fan-out jitter (FRAP's premise — normal runs cluster tightly,
    // cf. myapps/results.md single-cluster ruby-server profile)
    val stages = 10
    val edges = Vector.newBuilder[ProvEdge]
    var nextId = 0L
    def id(): Long = { nextId += 1; nextId }
    var prevFile = id() // initial input file
    for (s <- 1 to stages) {
      val proc = id()
      edges += ProvEdge(graphId, prevFile, proc, 2, 1, 1) // file -read-> process
      val outs = 1 + (if (s == stages) r.nextInt(2) else 0)
      var lastOut = prevFile
      for (_ <- 1 to outs) {
        val f = id()
        edges += ProvEdge(graphId, proc, f, 1, 2, 2)      // process -write-> file
        lastOut = f
      }
      prevFile = lastOut
    }
    edges.result()
  }

  /** An abnormal instance: the same pipeline plus a socket-exfiltration
    * star (one process connecting to many sockets).
    */
  def abnormal(graphId: String, seed: Long): Seq[ProvEdge] = {
    val base = normal(graphId, seed)
    val r = rng(seed * 0x9E3779B97F4A7C15L + 2)
    val maxId = base.map(e => math.max(e.src, e.dst)).max
    val badProc = maxId + 1
    val star = (1 to 12 + r.nextInt(4)).map { i =>
      ProvEdge(graphId, badProc, maxId + 1 + i, 1, 3, 3) // process -connect-> socket
    }
    // the bad process also reads every file (mass collection)
    val reads = base.collect {
      case e if e.dst_type == 2 => ProvEdge(graphId, e.dst, badProc, 2, 1, 1)
    }
    base ++ star ++ reads
  }

  /** A corpus of `nNormal` normal + `nAbnormal` abnormal graphs as one
    * typed-edge DataFrame.
    */
  def corpus(spark: SparkSession, nNormal: Int, nAbnormal: Int,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows =
      (0 until nNormal).flatMap(i => normal(f"normal-$i%03d", seed + i)) ++
        (0 until nAbnormal).flatMap(i => abnormal(f"bad-$i%03d", seed + 1000 + i))
    rows.toDF()
  }
}
