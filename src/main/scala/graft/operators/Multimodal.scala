package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 `mm_meta`).
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns
  * with typed metadata and run batched decode/feature-extract in a
  * vectorized UDF. The decode libraries aren't in this container, so the
  * DECODE STEP IS A DETERMINISTIC STUB — but the Spark-side plumbing is
  * real and tested: a typed `Dataset`, `mapPartitions` with explicit
  * batch shape (the Scala analogue of arrow-batched pandas UDFs),
  * and a schema that downstream operators can consume.
  */
object Multimodal {

  case class MMIn(doc_id: Long, payload: Array[Byte])
  case class MMMeta(doc_id: Long, byte_len: Long, magic: String,
      width: Long, height: Long, n_frames: Long, frame_digest: String,
      batch_size: Long)

  val BatchSize = 64

  /** STUB decoder — stands in for e.g. JPEG header parsing. Everything
    * it returns is a pure function of the payload bytes, so results are
    * reproducible across partitionings and engines.
    */
  private def decodeBatch(batch: Seq[MMIn]): Seq[MMMeta] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      val len = r.payload.length.toLong
      val magic = r.payload.take(4).map(b => f"$b%02x").mkString
      // "frame sampling": one frame per 32-byte stride, first 4 bytes of
      // each digested in place — the shape of a video keyframe sampler,
      // deterministic on payload, zero copies on the hot path
      digest.reset()
      var off = 0
      while (off < r.payload.length) {
        digest.update(r.payload, off, math.min(4, r.payload.length - off))
        off += 32
      }
      MMMeta(r.doc_id, len, magic,
        width = len % 640 + 1, height = len % 480 + 1,
        n_frames = (len + 31) / 32,
        frame_digest = digest.digest().map(b => f"$b%02x").mkString,
        batch_size = batch.size.toLong)
    }
  }

  private val opMeta = Op(
    "mm_meta",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        .as[MMIn]
        .mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
        .toDF()
    },
    None)

  val ops: Seq[Op] = Seq(opMeta)
}
