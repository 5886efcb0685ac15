package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketch, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}

/** Mergeable distinct-SET sketches (theta family; Apache DataSketches,
  * already on the classpath for HLL/KLL/Misra-Gries). HLL answers "how
  * many distinct" but cannot intersect two estimates; the theta sketch
  * keeps a uniform SAMPLE of the distinct hash space (the k smallest
  * hashes), so set EXPRESSIONS — |A∩B|, |A∪B|, Jaccard — evaluate
  * directly on two sketches (Dasgupta et al., "Theta-Sketch
  * Framework", 2016). That is the piece the repo's sketch family was
  * missing: HLL = cardinality, KLL = quantiles, Misra-Gries = heavy
  * hitters, Bloom = membership, theta = set algebra.
  *
  * Why it matters at 100 TB: pairwise overlap between S corpus slices
  * is S²/2 joins on the exploded unit table when exact — and every
  * unit shared by many slices fans out quadratically in the join. With
  * theta, ONE scan builds S constant-size sketches (map-side partial
  * combine, ≤ 2^lgK entries each) and all S²/2 intersections evaluate
  * on kilobyte-sized operands. Relative standard error at lgK=12 is
  * ~1/√4096 ≈ 1.6 % on the union; intersection error grows as overlap
  * shrinks (the published bound) — specs assert a 5 % band on the
  * fixture's vocabulary overlaps, not bit-equality.
  *
  * `graft_theta_agg(x[, lgK])` → binary compact sketch;
  * `graft_theta_merge(bin)` unions pre-built sketches (shard → fleet
  * rollup); `graft_theta_est(bin)` reads the distinct estimate;
  * `graft_theta_inter_est(a, b)` / `graft_theta_union_est(a, b)`
  * evaluate the pairwise set expressions.
  */
case class ThetaAggExpr(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaAggExpr =
    copy(child = newChild)
}

/** Union of serialized theta sketches — shard → fleet rollup: per-shard
  * sketches come in as binary, leave as one merged binary. */
case class ThetaMergeAggExpr(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_merge"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(Sketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAggExpr =
    copy(child = newChild)
}

/** `graft_theta_est(bin)` → the distinct-count estimate. */
case class ThetaEstExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theta_est"

  override def nullSafeEval(bin: Any): Any =
    Sketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstExpr =
    copy(child = newChild)
}

/** `graft_theta_inter_est(a, b)` → estimated |A ∩ B|. */
case class ThetaInterEstExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theta_inter_est"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val inter: Intersection = SetOperation.builder().buildIntersection()
    inter.intersect(Sketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    inter.intersect(Sketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    inter.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaInterEstExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_union_est(a, b)` → estimated |A ∪ B|. */
case class ThetaUnionEstExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theta_union_est"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    u.union(Sketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    u.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionEstExpr =
    copy(left = newLeft, right = newRight)
}

object ThetaSketch {
  /** Default log2 nominal entries: 4096 retained hashes ≈ 1.6 % RSE. */
  val DefaultLgK = 12
}
