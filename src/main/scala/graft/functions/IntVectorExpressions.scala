package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the INTEGER vector tier (q126 PQ).
  *
  * The quantized similarity path works on `array<int>` grids where
  * every distance is a sum of squared integer differences — exact in
  * any engine. The composable form
  * (`aggregate(zip_with(...))`) walks interpreted lambda closures AND
  * breaks whole-stage codegen for the enclosing stage; these fuse the
  * loops into codegen'd scalar code (the same (b)-tier promotion as
  * [[VectorDot]], driven by the same bench evidence: q126's encode
  * measured 9.1 s through interpreted folds).
  *
  * Semantics match the folds exactly: length mismatch → NULL, null
  * element → NULL, ascending-index accumulation (integer adds —
  * order-insensitive anyway).
  */
case class IntSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int_sqdist"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, " +
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
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = (x.getInt(i) - y.getInt(i)).toLong
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $nullCheck
            long $d = (long) ($a.getInt($i) - $b.getInt($i));
            $s += $d * $d;
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqDist =
    copy(left = newLeft, right = newRight)
}

/** PQ encode argmin in ONE fused loop: `sub` is a subvector
  * (array<int>, length d), `cb` a flattened codebook of k codewords
  * laid out [c0[0..d), c1[0..d), ...]. Returns the INDEX of the
  * codeword minimizing the integer squared L2 distance, ties to the
  * SMALLEST index — exactly `arg_min(idx, (dist, idx))` over the
  * unrolled candidate rows, without materializing n·k join rows.
  * NULL on: null/mismatched inputs (cb length not a multiple of d) or
  * empty sub/cb. */
case class PqCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_code"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val d = sub.numElements()
    val total = cb.numElements()
    if (d == 0 || total == 0 || total % d != 0) return null
    if (elementsNullable) {
      var i = 0
      while (i < d) { if (sub.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < total) { if (cb.isNullAt(i)) return null; i += 1 }
    }
    val k = total / d
    var best = Long.MaxValue
    var bestIdx = 0
    var c = 0
    while (c < k) {
      var s = 0L
      var i = 0
      val off = c * d
      while (i < d) {
        val diff = (sub.getInt(i) - cb.getInt(off + i)).toLong
        s += diff * diff
        i += 1
      }
      if (s < best) { best = s; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val total = ctx.freshName("total")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val nc = ctx.freshName("nc")
      val nullScan =
        if (elementsNullable)
          s"""for (int $nc = 0; $nc < $d && !${ev.isNull}; $nc++)
                if ($a.isNullAt($nc)) ${ev.isNull} = true;
              for (int $nc = 0; $nc < $total && !${ev.isNull}; $nc++)
                if ($b.isNullAt($nc)) ${ev.isNull} = true;"""
        else ""
      s"""
        int $d = $a.numElements();
        int $total = $b.numElements();
        if ($d == 0 || $total == 0 || $total % $d != 0) {
          ${ev.isNull} = true;
        } else {
          $nullScan
          if (!${ev.isNull}) {
          int $k = $total / $d;
          long $best = Long.MAX_VALUE;
          int $bestIdx = 0;
          for (int $c = 0; $c < $k; $c++) {
            long $s = 0L;
            int $off = $c * $d;
            for (int $i = 0; $i < $d; $i++) {
              long $diff = (long) ($a.getInt($i) - $b.getInt($off + $i));
              $s += $diff * $diff;
            }
            if ($s < $best) { $best = $s; $bestIdx = $c; }
          }
          ${ev.value} = $bestIdx;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCode =
    copy(left = newLeft, right = newRight)
}

/** Column-level API over the native integer-vector expressions. */
object IntVectorFunctions {
  def int_sqdist(a: Column, b: Column): Column =
    ColumnBridge.column(IntSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def pq_code(sub: Column, flatCodebook: Column): Column =
    ColumnBridge.column(PqCode(
      ColumnBridge.expression(sub), ColumnBridge.expression(flatCodebook)))
}
