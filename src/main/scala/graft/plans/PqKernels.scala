package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels for the ann_pq serving path (Jégou,
  * Douze, Schmid, "Product quantization for nearest neighbor search",
  * TPAMI 2011 — the public PQ formulation):
  *
  *  - `graft_pq_encode(embedding, codebook, m, k)` → array<int>: the
  *    vector is split into m contiguous subvectors; each is replaced by
  *    the id of its nearest (L2) centroid among that subspace's k
  *    centroids — an m-byte code standing in for a 4·dim-byte float
  *    vector (32× smaller at dim=64, m=8).
  *  - `graft_pq_cos(q_emb, codes, codebook, m, k)` → double: ADC
  *    (asymmetric distance computation) — cosine of the FLOAT query
  *    against the code's reconstruction, evaluated straight from the
  *    codebook without materializing the reconstructed vector.
  *
  * The codebook is a FOLDABLE flat float-array literal (subspace-major
  * [j][centroid][dim]) evaluated once at plan time; generated code
  * reaches the shared [[PqTable]] (with precomputed per-centroid
  * squared norms) through one `addReferenceObj` handle, so both
  * kernels stay inside whole-stage codegen — the same pattern as
  * graft_bpe's merge table.
  */
case class PqEncodeExpr(child: Expression, codebook: Seq[Float],
    m: Int, k: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // a malformed (wrong-dimension) vector encodes to NULL even when the
  // input column is non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val table = new PqTable(codebook.toArray, m, k)

  override def nullSafeEval(a: Any): Any =
    table.encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", table, classOf[PqTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.encode($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

case class PqCosineExpr(left: Expression, right: Expression,
    codebook: Seq[Float], m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_cos"

  @transient private lazy val table = new PqTable(codebook.toArray, m, k)

  override def nullSafeEval(a: Any, b: Any): Any =
    table.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", table, classOf[PqTable].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        Object $r = $ref.cosine($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCosineExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_table(q_emb, codebook, m, k)` → array<double>(m·k + 1):
  * the classic ADC LOOKUP TABLE (Jégou 2011 §: per query, precompute
  * dot(q_j, centroid_c) for every (subspace j, centroid c) once, plus
  * the query's squared norm in the last slot). Computed on the
  * broadcast QUERY side — the hash relation materializes the column
  * once per query — so the per-candidate ADC drops from m·dsub fused
  * multiply-adds to m table adds ([[PqCosineTableExpr]]).
  */
case class PqTableExpr(child: Expression, codebook: Seq[Float],
    m: Int, k: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_table"

  @transient private lazy val table = new PqTable(codebook.toArray, m, k)

  override def nullSafeEval(a: Any): Any =
    table.queryTable(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", table, classOf[PqTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.queryTable($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqTableExpr =
    copy(child = newChild)
}

/** `graft_pq_cos_t(query_table, codes)` → double: ADC cosine from the
  * precomputed per-query table — m adds + m norm lookups per
  * candidate. Numerically this groups the dot product by subspace
  * (each table entry is an i-ordered partial), where the direct
  * kernel accumulates all m·dsub terms in one running sum — a
  * last-ulp float difference; fine for the rows-only PQ ops (their
  * contracts are recall bounds, and stream/store twins share this
  * same kernel), NOT for a hash-compared op.
  */
case class PqCosineTableExpr(left: Expression, right: Expression,
    codebook: Seq[Float], m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_cos_t"

  @transient private lazy val table = new PqTable(codebook.toArray, m, k)

  override def nullSafeEval(a: Any, b: Any): Any =
    table.cosineFromTable(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", table, classOf[PqTable].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        Object $r = $ref.cosineFromTable($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCosineTableExpr =
    copy(left = newLeft, right = newRight)
}

/** Flat codebook (subspace-major) + the encode/ADC loops. One instance
  * per plan, shared across an executor's tasks.
  */
final class PqTable(val cb: Array[Float], val m: Int, val k: Int)
    extends Serializable {

  require(m > 0 && k > 0 && cb.length % (m * k) == 0,
    s"codebook length ${cb.length} not divisible by m*k = ${m * k}")
  val dsub: Int = cb.length / (m * k)

  // squared L2 norm of each centroid: the reconstruction norm in ADC
  // cosine is sqrt(Σ_j |c_j(code_j)|²) — subvectors are orthogonal
  // coordinate blocks, so norms add with no cross terms
  private val cnorm2: Array[Double] = {
    val out = new Array[Double](m * k)
    var c = 0
    while (c < m * k) {
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val v = cb(c * dsub + i).toDouble
        s += v * v
        i += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  /** Nearest-centroid code per subspace; ties → smaller id. NULL on a
    * dimension mismatch (a corrupt vector must not encode plausibly).
    */
  def encode(a: ArrayData): ArrayData = {
    val x = a.toFloatArray()
    if (x.length != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var i = 0
        val base = (j * k + c) * dsub
        while (i < dsub) {
          val diff = x(j * dsub + i).toDouble - cb(base + i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC table: [j·k + c] = dot(q_j, centroid_c) (i-ordered
    * partials), last slot = |q|². NULL on dimension mismatch.
    */
  def queryTable(qa: ArrayData): ArrayData = {
    val q = qa.toFloatArray()
    if (q.length != m * dsub) return null
    val out = new Array[Double](m * k + 1)
    var qn = 0.0
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val base = (j * k + c) * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          d += q(j * dsub + i).toDouble * cb(base + i).toDouble
          i += 1
        }
        out(j * k + c) = d
        c += 1
      }
      var i = 0
      while (i < dsub) {
        val qi = q(j * dsub + i).toDouble
        qn += qi * qi
        i += 1
      }
      j += 1
    }
    out(m * k) = qn
    new GenericArrayData(out)
  }

  /** ADC cosine from a precomputed [[queryTable]]: m adds + m norm
    * lookups per candidate.
    */
  def cosineFromTable(ta: ArrayData, ca: ArrayData): Any = {
    if (ta.numElements() != m * k + 1 || ca.numElements() != m) return null
    var dot = 0.0
    var rn = 0.0
    var j = 0
    while (j < m) {
      val code = ca.getInt(j)
      if (code < 0 || code >= k) return null
      dot += ta.getDouble(j * k + code)
      rn += cnorm2(j * k + code)
      j += 1
    }
    val denom = math.sqrt(ta.getDouble(m * k)) * math.sqrt(rn)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** cos(q, reconstruction(codes)) without materializing the
    * reconstruction; 0.0 when either norm is zero.
    */
  def cosine(qa: ArrayData, ca: ArrayData): Any = {
    val q = qa.toFloatArray()
    if (q.length != m * dsub || ca.numElements() != m) return null
    var dot = 0.0
    var qn = 0.0
    var rn = 0.0
    var j = 0
    while (j < m) {
      val code = ca.getInt(j)
      if (code < 0 || code >= k) return null
      val base = (j * k + code) * dsub
      var i = 0
      while (i < dsub) {
        val qi = q(j * dsub + i).toDouble
        dot += qi * cb(base + i).toDouble
        qn += qi * qi
        i += 1
      }
      rn += cnorm2(j * k + code)
      j += 1
    }
    val denom = math.sqrt(qn) * math.sqrt(rn)
    if (denom == 0.0) 0.0 else dot / denom
  }
}
