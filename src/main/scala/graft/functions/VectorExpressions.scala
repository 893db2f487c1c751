package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

/** Column-level API over the native expressions. */
object VectorFunctions {
  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vector_norm(a: Column): Column =
    ColumnBridge.column(VectorNorm(ColumnBridge.expression(a)))

  def cosine_similarity(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    vector_dot(a, b) / (aNorm * bNorm)
}
