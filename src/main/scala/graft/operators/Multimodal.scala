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

  /** Batched decode over a typed Dataset — the op body, exposed so the
    * spec can drive it with a forced partition layout. `batch_size` in
    * [[MMMeta]] audits the batch machinery but is a function of the
    * PARTITION LAYOUT (the last batch per partition is a remainder), so
    * the op DROPS it from the output: every emitted column must be a
    * pure function of the payload for the rows-only determinism
    * contract to hold under repartitioning.
    */
  private[graft] def decode(ds: org.apache.spark.sql.Dataset[MMIn]) = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
  }

  private val opMeta = Op(
    "mm_meta",
    (s, dir) => {
      import s.implicits._
      decode(Tables(s, dir, "documents")
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        .as[MMIn])
        .toDF().drop("batch_size")
    },
    None)

  // ---- mm_embed: batched payload → embedding (encoder stand-in) ----

  case class MMEmb(doc_id: Long, dim: Long, embedding: Array[Float],
      norm: Double, batch_size: Long)

  val EmbDim = 64

  /** STUB encoder — stands in for a vision/audio tower forward pass.
    * Per-dim values come from an xorshift chain seeded by the payload
    * bytes, then L2-normalized: a pure function of the payload, so the
    * output is reproducible across partitionings, and UNIT-NORM floats
    * in the same shape the `embeddings` table uses — the bridge from
    * multimodal payloads into the ann, dedup_embed, and embed_quantize
    * operators.
    */
  private def encodeBatch(batch: Seq[MMIn]): Seq[MMEmb] = batch.map { r =>
    var seed = -7046029254386353131L // xxprime; mixed with every byte
    var p = 0
    while (p < r.payload.length) {
      seed = (seed ^ r.payload(p)) * 6364136223846793005L + 1442695040888963407L
      p += 1
    }
    val raw = new Array[Double](EmbDim)
    var x = if (seed == 0L) 1L else seed
    var i = 0
    while (i < EmbDim) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      raw(i) = (x >> 11).toDouble / (1L << 52).toDouble // ~[-1, 1)
      i += 1
    }
    val n = math.sqrt(raw.map(v => v * v).sum)
    MMEmb(r.doc_id, EmbDim.toLong,
      raw.map(v => (v / n).toFloat), 1.0, batch.size.toLong)
  }

  /** Batched encode — spec-drivable like [[decode]]; same reason for
    * the output dropping `batch_size` (partition-layout dependent).
    */
  private[graft] def encode(ds: org.apache.spark.sql.Dataset[MMIn]) = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it => it.grouped(BatchSize).flatMap(encodeBatch))
  }

  private val opEmbed = Op(
    "mm_embed",
    (s, dir) => {
      import s.implicits._
      encode(Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MMIn])
        .toDF()
        .select(col("doc_id"), col("dim"),
          md5(concat_ws(",", expr("transform(embedding, x -> cast(x AS string))")))
            .as("emb_digest"),
          round(col("norm"), 6).as("norm"))
    },
    None)

  val ops: Seq[Op] = Seq(opMeta, opEmbed)
}
