package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_hash_embed(array<string>) -> array<float>`: the signed
  * feature-hashing document vector (Weinberger et al. 2009, "Feature
  * Hashing for Large Scale Multitask Learning" — the hashing trick):
  * each token hashes to one of [[HashEmbed.Dim]] buckets with a ±1
  * sign drawn from the same hash, occurrences accumulate, the vector
  * L2-normalizes. The signed variant keeps collisions unbiased
  * (E[x·x'] is preserved), so cosine between hashed vectors estimates
  * the cosine of the true tf vectors.
  *
  * This is the BRIDGE from raw text to every embedding-space operator
  * in the library: dedup_embed / dedup_semantic / embed_cluster /
  * ann_* take an `embedding` column, and until this kernel the only
  * sources were the synthetic embeddings table and the multimodal
  * encoder stand-in. Hashing needs no training, no vocabulary, no
  * model store — the right first rung before a learned encoder, and
  * the standard one at 100 TB (one narrow pass, zero state).
  *
  * Same hash discipline as the signature kernels (Spark's own XXH64,
  * seed 42) so a vector is reproducible from any engine that can run
  * xxhash64. Per-row, allocation-light, codegen'd via the static
  * helper.
  */
case class HashEmbedExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override def nullSafeEval(a: Any): Any =
    HashEmbed.embed(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.HashEmbed.embed($a);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

object HashEmbed {
  /** Vector width — matches the embeddings table's 64 dims so hashed
    * text vectors drop into every ANN/cluster path unchanged. */
  val Dim = 64

  private def hashUtf8(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(),
      SignatureKernels.XxSeed)

  def embed(toks: ArrayData): ArrayData = {
    val acc = new Array[Double](Dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        val h = hashUtf8(t)
        // bucket from the bits ABOVE the sign bit ((h >>> 1) % Dim =
        // bits 1..6 for Dim=64), sign from bit 0 — disjoint bit
        // ranges so bucket and sign stay independent
        val b = ((h >>> 1) % Dim).toInt
        acc(b) += (if ((h & 1L) == 0L) 1.0 else -1.0)
      }
      i += 1
    }
    var norm = 0.0
    var d = 0
    while (d < Dim) { norm += acc(d) * acc(d); d += 1 }
    norm = math.sqrt(norm)
    val out = new Array[Float](Dim)
    if (norm > 0) {
      d = 0
      while (d < Dim) { out(d) = (acc(d) / norm).toFloat; d += 1 }
    }
    new GenericArrayData(out)
  }
}
