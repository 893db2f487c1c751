package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0D, _+_)` materializes an
  * intermediate product array per row and walks three lambda closures;
  * [[VectorDot]] fuses the whole thing into one codegen'd loop over the
  * two `ArrayData` buffers — no allocation, stays inside whole-stage
  * codegen. Semantics match the fold EXACTLY, including its null
  * behavior: mismatched lengths (zip_with pads with null → fold yields
  * NULL) and null elements both produce NULL, and accumulation order is
  * ascending-index, IEEE-identical to the left fold. Swapping
  * implementations therefore cannot change results on ANY input (and
  * the DuckDB oracle keeps matching bit-for-bit).
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY.md §7.2):
  * compose built-ins first, promote to an `Expression` when the bench
  * says the fold is hot, reach for a physical operator never (Catalyst
  * plans these fine).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vector_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // the per-element null check is only emitted when the schema says
      // elements can be null — the clean-schema loop stays branch-free
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm as a fused loop: sqrt(dot(v, v)) without duplicating the
  * array traversal through two expression trees. Null elements produce
  * NULL (matching sqrt over the null-propagating fold). */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vector_norm"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          double $v = $a.getDouble($i);
          $s += $v * $v;
        }
        if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Nearest + runner-up squared-L2 distance of a double vector against
  * a FLATTENED centroid matrix, in ONE fused loop — the double-tier
  * twin of [[graft.functions.PqCode]] for the k-means family (q90/
  * q106/q164 assignment + silhouette): `vec` is array<double> (length
  * d), `flat` k concatenated centroids [c0[0..d), c1[0..d), ...].
  * Returns struct(i1, d1, i2, d2): the index and distance of the
  * closest centroid and of the runner-up, ordered by (dist asc, index
  * asc) — exactly the window formulation's rn = 1 / rn = 2 rows over
  * the unrolled n·k candidate set, without materializing them. i2/d2
  * are NULL when k = 1.
  *
  * Exactness: each distance is the ascending-index fold
  * s += (x−y)·(x−y) — IEEE-identical to
  * `aggregate(zip_with(vec, ce, (x,y) -> (x−y)*(x−y)), 0D, (a,v) -> a+v)`
  * — and comparisons use java.lang.Double.compare (the sums are never
  * −0.0, and fixture vectors are finite, so this is the window sort's
  * double order). NULL on: null/empty inputs, layout mismatch
  * (flat length not a multiple of d), or any null element — the
  * [[graft.functions.PqCode]] convention, pinned by
  * VectorExpressionsSpec. */
case class SqDistTop2(vec: Expression, flat: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sqdist_top2"
  override def dataType: DataType = StructType(Seq(
    StructField("i1", IntegerType, nullable = false),
    StructField("d1", DoubleType, nullable = false),
    StructField("i2", IntegerType, nullable = true),
    StructField("d2", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def left: Expression = vec
  override def right: Expression = flat

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(vec.dataType) && ok(flat.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${vec.dataType.sql} and ${flat.dataType.sql}")
  }

  private def elementsNullable: Boolean = Seq(vec, flat).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  /** Null-tolerant core the generated code calls through one reference
    * object (the [[LshBucketsExpr]] pattern — a struct-typed result has
    * no scalar codegen template, and one virtual call per row is noise
    * next to the k·d fused multiply-adds). */
  def compute(a: ArrayData, b: ArrayData): InternalRow = {
    if (a == null || b == null) return null
    val d = a.numElements()
    val total = b.numElements()
    if (d == 0 || total == 0 || total % d != 0) return null
    if (elementsNullable) {
      var i = 0
      while (i < d) { if (a.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < total) { if (b.isNullAt(i)) return null; i += 1 }
    }
    val v = a.toDoubleArray()
    val f = b.toDoubleArray()
    val k = total / d
    var bi = -1; var si = -1
    var best = 0.0; var second = 0.0
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      val off = c * d
      while (i < d) {
        val diff = v(i) - f(off + i)
        s += diff * diff
        i += 1
      }
      if (bi < 0 || java.lang.Double.compare(s, best) < 0) {
        second = best; si = bi
        best = s; bi = c
      } else if (si < 0 || java.lang.Double.compare(s, second) < 0) {
        second = s; si = c
      }
      c += 1
    }
    InternalRow(bi, best,
      if (si < 0) null else si,
      if (si < 0) null else second)
  }

  override def eval(input: InternalRow): Any =
    compute(vec.eval(input).asInstanceOf[ArrayData],
      flat.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = vec.genCode(ctx)
    val r = flat.genCode(ctx)
    val ref = ctx.addReferenceObj("sqdistTop2", this, classOf[SqDistTop2].getName)
    val ir = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      $ir ${ev.value} = $ref.compute(
        ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
      boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistTop2 =
    copy(vec = newLeft, flat = newRight)
}

/** Column-level API over the native expressions. */
object VectorFunctions {
  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sqdist_top2(vec: Column, flat: Column): Column =
    ColumnBridge.column(SqDistTop2(
      ColumnBridge.expression(vec), ColumnBridge.expression(flat)))

  def vector_norm(a: Column): Column =
    ColumnBridge.column(VectorNorm(ColumnBridge.expression(a)))

  def cosine_similarity(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    vector_dot(a, b) / (aNorm * bNorm)
}
