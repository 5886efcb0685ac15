package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_span_corrupt(toks, seed)` → array<array<string>> of
  * [corrupted input, target] — the T5 span-corruption objective
  * (Raffel et al. 2020 §3.1.4) as a deterministic per-row transform:
  * non-overlapping spans are replaced in the input by `<extra_id_k>`
  * sentinels and emitted in the target as sentinel-prefixed runs, so
  * `input ⊕ target` reconstructs the document losslessly (the spec
  * inverts it). "Randomness" is the repo's portable Lehmer hash over
  * (seed, position) — identical on every engine and run, the
  * mix_sample convention — with span starts where
  * h % [[SpanCorrupt.StartMod]] == 0 and fixed span length
  * [[SpanCorrupt.SpanLen]]: positions consumed INSIDE a span are never
  * tested for new starts, so with per-position start probability
  * p = 1/StartMod the expected mask ratio is 3p/(3p + (1−p)) = 3/22
  * ≈ 13.6 % — near (slightly under) T5's 15 % default. One
  * straight-line Java loop per row inside whole-stage codegen;
  * sentinel ids cap at [[SpanCorrupt.MaxSpans]] (the T5 vocabulary
  * reserves 100).
  */
case class SpanCorruptExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), LongType)

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def prettyName: String = "graft_span_corrupt"

  override def nullSafeEval(a: Any, b: Any): Any =
    SpanCorrupt.corrupt(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SpanCorrupt.corrupt($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorruptExpr =
    copy(left = newLeft, right = newRight)
}

object SpanCorrupt {
  /** Lehmer constants shared with the sampling family (portable
    * integer formula, no engine RNG).
    */
  val Mul = 48271L
  val Mod = 2147483647L
  /** Span starts where hash % StartMod == 0 → start probability
    * p = 1/StartMod per TESTED position; consumed in-span positions
    * are skipped, so the expected mask ratio is
    * SpanLen·p / (SpanLen·p + (1−p)) = 3/22 ≈ 13.6 %.
    */
  val StartMod = 20L
  val SpanLen = 3
  val MaxSpans = 100

  /** seed is reduced mod [[Mod]] before the multiply so the product
    * stays inside int64 for ANY doc_id (the raw (seed + pos + 1) · Mul
    * would wrap for seed ≳ 1.9e14, diverging across engines); for
    * seed < Mod the value is unchanged.
    */
  private[graft] def hash(seed: Long, pos: Int): Long =
    ((java.lang.Math.floorMod(seed, Mod) + pos + 1) * Mul) % Mod

  def corrupt(a: ArrayData, seed: Long): ArrayData = {
    val n = a.numElements()
    val input = new java.util.ArrayList[UTF8String](n)
    val target = new java.util.ArrayList[UTF8String](math.max(4, n / 4))
    var i = 0
    var k = 0
    while (i < n) {
      if (k < MaxSpans && hash(seed, i) % StartMod == 0L) {
        val sentinel = UTF8String.fromString(s"<extra_id_$k>")
        input.add(sentinel)
        target.add(sentinel)
        var j = 0
        while (j < SpanLen && i < n) {
          target.add(a.getUTF8String(i))
          i += 1
          j += 1
        }
        k += 1
      } else {
        input.add(a.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(Array[Any](
      new GenericArrayData(input.toArray().asInstanceOf[Array[Any]]),
      new GenericArrayData(target.toArray().asInstanceOf[Array[Any]])))
  }
}
