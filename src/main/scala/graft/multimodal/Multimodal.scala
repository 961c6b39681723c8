package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries exist in this container): `fakeDecode` parses a synthetic
  * header instead of invoking a real codec. Everything around it — the
  * schema contract, the binary column, partitioning, the per-partition
  * batched processing shape (Scala's analog of `mapInPandas`: typed
  * `mapPartitions` over an iterator of rows, amortizing per-batch setup) —
  * is real and tested, so swapping in a real codec is a one-function change.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, channels: Int,
      mean_q6: Long, frames_sampled: Int)

  /** Synthesize a deterministic media table from any id column: 1 row per
    * id, binary payload with a parseable fake header
    * [magic u8 | width u16 | height u16 | channels u8 | payload...].
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id")).as[Long].map { id =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = (64 + (id * 37) % 192).toInt
      val h = (64 + (id * 53) % 128).toInt
      val c = (1 + id % 4).toInt
      val payloadLen = 256 + (id % 512).toInt
      val header = Array[Byte](
        0x7F.toByte,
        (w >> 8).toByte, (w & 0xFF).toByte,
        (h >> 8).toByte, (h & 0xFF).toByte,
        c.toByte)
      val rnd = new java.util.Random(id)
      val payload = Array.fill[Byte](payloadLen)((rnd.nextInt(256) - 128).toByte)
      MediaRow(id, modality, header ++ payload)
    }
  }

  /** STUB decode: parse the synthetic header. A real deployment replaces
    * this one function with an actual codec call (e.g. JNI/ImageIO); it runs
    * once per row inside the partition batch loop below.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 6 && bytes(0) == 0x7F.toByte, "bad magic")
    val w = ((bytes(1) & 0xFF) << 8) | (bytes(2) & 0xFF)
    val h = ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
    val c = bytes(5) & 0xFF
    (w, h, c)
  }

  /** Decode + feature-extract + frame-sample, partition-batched. Features:
    * byte-mean of the payload (the stand-in for pixel statistics) and a
    * deterministic frame sample count (every `frameStep`-th 64-byte block).
    */
  def extractFeatures(media: Dataset[MediaRow], frameStep: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens once (codec init in a real pipeline)
      rows.map { m =>
        val (w, h, c) = fakeDecode(m.bytes)
        val payload = m.bytes.drop(6)
        val mean =
          if (payload.isEmpty) 0.0
          else payload.map(b => (b & 0xFF).toDouble).sum / payload.length
        val frames = payload.grouped(64).zipWithIndex
          .count { case (_, i) => i % frameStep == 0 }
        MediaFeatures(m.media_id, m.modality, m.bytes.length.toLong,
          w, h, c, math.floor(mean * 1e6 + 0.5).toLong, frames)
      }
    }
  }
}
