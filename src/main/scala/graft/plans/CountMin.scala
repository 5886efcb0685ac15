package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketches — the sketch family's POINT-FREQUENCY member,
  * completing its algebra (HLL = cardinality, KLL = quantiles,
  * Misra–Gries = heavy hitters, Bloom = membership, theta = set
  * expressions, CMS = per-item counts): "how often does THIS item
  * occur" for ANY queried item, from constant state, where Misra–Gries
  * answers only for items frequent enough to survive its map and exact
  * counting holds O(distinct) state. The implementation is Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch` (the engine ships it
  * for join-skew estimation — public API, elementwise-addition merge).
  *
  * Guarantees carried to read-out: estimates NEVER undercount
  * (est ≥ true, the one-sided CMS bound); overcount ≤ ε·N with
  * probability ≥ 1 − δ where ε ≈ 2/width and δ ≈ 2^−depth — with the
  * defaults ([[CountMin.DefaultWidth]]×[[CountMin.DefaultDepth]],
  * ~320 KB of longs per buffer) that is ≤ 0.025 % of the stream
  * length at 96.9 % confidence, constant at any corpus size. Merge is
  * counter-array addition — associative, commutative, and EXACT: the
  * merged sketch equals the one-shot sketch bit for bit regardless of
  * partitioning (no purge order, no random draws — stronger than the
  * MG/KLL twins, same class as theta's determinism but without even
  * an estimate-order caveat), which is why the streaming twin can
  * assert streamed == batch EQUALITY on estimates.
  *
  * `graft_cms_agg(token[, width])` → binary sketch;
  * `graft_cms_merge(bin[, width])` unions pre-built sketches (shard →
  * fleet rollup); `graft_cms_est(bin, token)` → the point estimate;
  * `graft_cms_total(bin)` → the stream length N the ε-bound scales
  * with. All sketches share [[CountMin.Seed]] — merge refuses
  * mismatched geometry, so width is a parameter, not per-row state.
  */
case class CmsAggExpr(
    child: Expression,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_agg"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(CountMin.DefaultDepth, width, CountMin.Seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.addString(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAggExpr =
    copy(child = newChild)
}

/** Union of serialized count-min sketches — exact counter addition,
  * so rollups lose nothing over the one-shot aggregation. */
case class CmsMergeAggExpr(
    child: Expression,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_merge"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(CountMin.DefaultDepth, width, CountMin.Seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeInPlace(CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.toByteArray

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAggExpr =
    copy(child = newChild)
}

/** `graft_cms_est(bin, token)` → the point estimate for one item:
  * ≥ the true count always, ≤ true + ε·N w.h.p. */
case class CmsEstExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_est"

  override def nullSafeEval(bin: Any, token: Any): Any =
    CountMinSketch.readFrom(bin.asInstanceOf[Array[Byte]])
      .estimateCount(token.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_cms_total(bin)` → the total update count N — the quantity
  * the ε·N overcount ceiling scales with, exposed so readers can
  * compute the bound they are entitled to. */
case class CmsTotalExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_total"

  override def nullSafeEval(bin: Any): Any =
    CountMinSketch.readFrom(bin.asInstanceOf[Array[Byte]]).totalCount()

  override protected def withNewChildInternal(newChild: Expression): CmsTotalExpr =
    copy(child = newChild)
}

object CountMin {
  /** ε ≈ 2/width = 0.0244 % of N per estimate; 8192 longs × depth
    * rows ≈ 320 KB per aggregation buffer — constant regardless of
    * corpus size. */
  val DefaultWidth = 8192

  /** δ ≈ 2^−5 ≈ 3.1 % failure probability on the ε bound. */
  val DefaultDepth = 5

  /** Shared hash seed: sketches merge only when geometry and seed
    * agree, so every graft CMS uses this one. */
  val Seed = 42
}
