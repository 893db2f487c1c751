package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full T-table hyperplane-LSH signature as ONE native expression:
  * `array("0:" + P sign bits, ..., "T-1:" + P sign bits)`.
  *
  * The composed form — T·P `CASE WHEN vector_dot(emb, ±1-literal) > 0`
  * columns concatenated per table — is semantically identical but
  * generates a whole-stage-codegen method embedding T·P 64-element
  * literal arrays. For the 8×8 search geometry that method is far past
  * HotSpot's JIT method-size ceiling, so the hottest per-row loop of
  * the LSH family ran in the BYTECODE INTERPRETER (q41's signature
  * stage measured as a single 1.3 s task at sf0.1 — ~8M multiplies
  * that compile to ~10 ms). Here the generated code is one virtual
  * call into this compiled class; the sign matrix is a flat
  * `Array[Double]` reference and the T·P·D loop JITs like any Scala
  * hot loop.
  *
  * Bit/bucket semantics mirror the composed chain EXACTLY (the DuckDB
  * oracle is generated from the same sign matrix and is unchanged):
  * bit p of table t is '1' iff vector_dot(emb, signs(t)(p)) is
  * non-null AND > 0.0 — i.e. a null emb, a length-mismatched emb, or
  * a null element yields '0' (vector_dot → NULL → CASE otherwise),
  * never a null bucket; the output array is therefore never null and
  * always has T elements, exactly like the `array(concat(...))` form.
  * Dot accumulation is the same ascending-index `s += a(i) * b(i)`
  * fold as [[VectorDot]], so the IEEE result is bit-identical. */
case class LshBucketsExpr(child: Expression,
    signs: IndexedSeq[IndexedSeq[Array[Double]]]) extends UnaryExpression {

  override def prettyName: String = "lsh_buckets"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  private val tables = signs.length
  private val planes = signs.head.length
  private val dim = signs.head.head.length
  // flat (t, p, i) sign matrix — one reference object in codegen
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        System.arraycopy(signs(t)(p), 0, a, (t * planes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  /** Bit p of table t over a PRE-VALIDATED primitive copy of the
    * vector — [[VectorDot]]'s exact ascending-index fold. */
  private def dotPositive(v: Array[Double], t: Int, p: Int): Boolean = {
    val f = flat
    val base = (t * planes + p) * dim
    var s = 0.0
    var i = 0
    while (i < dim) {
      s += v(i) * f(base + i)
      i += 1
    }
    s > 0.0
  }

  def compute(emb: ArrayData): ArrayData = {
    // Null/length validation hoisted OUT of the T·P dot loops (r21
    // ADVICE): the per-(table, plane) form re-ran the null-vector/
    // length check and a per-element isNullAt scan for every plane —
    // T·P·D redundant branch tests per row in the expression that
    // exists purely for speed. An invalid vector (null, wrong length,
    // any null element) yields the all-'0' bit rows for EVERY (t, p) —
    // exactly what the per-plane checks produced, since every dot saw
    // the same defect (semantics pinned by VectorExpressionsSpec) —
    // and a valid one is copied once to a primitive array so the dot
    // loops run check-free.
    val v: Array[Double] =
      if (emb == null || emb.numElements() != dim) null
      else {
        var i = 0
        var ok = true
        while (ok && i < dim) { if (emb.isNullAt(i)) ok = false; i += 1 }
        if (ok) emb.toDoubleArray() else null
      }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val sb = new java.lang.StringBuilder(4 + planes)
      sb.append(t).append(':')
      var p = 0
      while (p < planes) {
        sb.append(if (v != null && dotPositive(v, t, p)) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBucketsExpr].getName)
    val ad = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${c.code}
      $ad ${ev.value} = $ref.compute(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {
  /** Column API: the T bucket strings of `emb` under `signs`. */
  def lsh_buckets(emb: Column,
      signs: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    ColumnBridge.column(LshBucketsExpr(ColumnBridge.expression(emb), signs))
}
