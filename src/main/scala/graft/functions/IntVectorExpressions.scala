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

/** Full per-query ADC lookup table in ONE fused loop: `qv` is a
  * gridded query vector (array<int>, length m·d), `cb` the FULLY
  * flattened codebook laid out subspace-major
  * [j0c0[0..d), j0c1[0..d), ..., j1c0[0..d), ...] (m·k·d ints).
  * `subDim` is d. Returns array<int> of length m·k where
  * out[j·k + c] = Σ_i (qv[j·d+i] − cb[(j·k+c)·d+i])² — the partial
  * distances [[PqAdc]] sums per stored code vector. Each partial is
  * ≤ d·255² (int-safe). The join formulation (queries×m subvectors ⋈
  * m·k codewords → per-pair IntSqDist) materializes q·m·k rows through
  * join machinery for the same arithmetic; this is one codegen'd loop
  * per query row. NULL on null input, empty/mismatched layout
  * (cb length not a multiple of qv length / subDim). */
case class PqLut(qvec: Expression, cb: Expression, sub: Expression)
    extends TernaryExpression {

  override def first: Expression = qvec
  override def second: Expression = cb
  override def third: Expression = sub

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (arr(qvec.dataType) && arr(cb.dataType) && sub.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<int>, int), got " +
        s"${qvec.dataType.sql}, ${cb.dataType.sql}, ${sub.dataType.sql}")
  }

  private def elementsNullable: Boolean = Seq(qvec, cb).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val flat = b.asInstanceOf[ArrayData]
    val d = c.asInstanceOf[Int]
    val vd = qv.numElements()
    val total = flat.numElements()
    if (d <= 0 || vd == 0 || vd % d != 0 || total == 0 || total % vd != 0) return null
    if (elementsNullable) {
      var i = 0
      while (i < vd) { if (qv.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < total) { if (flat.isNullAt(i)) return null; i += 1 }
    }
    val m = vd / d
    val k = total / vd // total = m*k*d
    val out = new Array[Int](m * k)
    var j = 0
    while (j < m) {
      var cc = 0
      while (cc < k) {
        var s = 0
        var i = 0
        val qoff = j * d
        val coff = (j * k + cc) * d
        while (i < d) {
          val diff = qv.getInt(qoff + i) - flat.getInt(coff + i)
          s += diff * diff
          i += 1
        }
        out(j * k + cc) = s
        cc += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val vd = ctx.freshName("vd"); val total = ctx.freshName("total")
      val m = ctx.freshName("m"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val cc = ctx.freshName("cc")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val qoff = ctx.freshName("qoff"); val coff = ctx.freshName("coff")
      val diff = ctx.freshName("diff"); val out = ctx.freshName("out")
      val nc = ctx.freshName("nc")
      val nullScan =
        if (elementsNullable)
          s"""for (int $nc = 0; $nc < $vd && !${ev.isNull}; $nc++)
                if ($a.isNullAt($nc)) ${ev.isNull} = true;
              for (int $nc = 0; $nc < $total && !${ev.isNull}; $nc++)
                if ($b.isNullAt($nc)) ${ev.isNull} = true;"""
        else ""
      s"""
        int $vd = $a.numElements();
        int $total = $b.numElements();
        if ($c <= 0 || $vd == 0 || $vd % $c != 0 || $total == 0 || $total % $vd != 0) {
          ${ev.isNull} = true;
        } else {
          $nullScan
          if (!${ev.isNull}) {
            int $m = $vd / $c;
            int $k = $total / $vd;
            int[] $out = new int[$m * $k];
            for (int $j = 0; $j < $m; $j++) {
              for (int $cc = 0; $cc < $k; $cc++) {
                int $s = 0;
                int $qoff = $j * $c;
                int $coff = ($j * $k + $cc) * $c;
                for (int $i = 0; $i < $c; $i++) {
                  int $diff = $a.getInt($qoff + $i) - $b.getInt($coff + $i);
                  $s += $diff * $diff;
                }
                $out[$j * $k + $cc] = $s;
              }
            }
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqLut =
    copy(qvec = f, cb = s, sub = t)
}

/** ADC distance of one stored code vector against a [[PqLut]] table:
  * `codes` is the vector's m positional codes (array<int>, each in
  * [0, k)), `lut` the m·k partial-distance table. Returns
  * Σ_j lut[j·k + codes[j]] as BIGINT — exactly the `sum(pd)` the
  * (subspace, code) equi-join + aggregation computes, without
  * materializing the n·m·q joined rows. NULL on layout mismatch or an
  * out-of-range code. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_adc"
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
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val total = lut.numElements()
    if (m == 0 || total == 0 || total % m != 0) return null
    val k = total / m
    var s = 0L
    var j = 0
    while (j < m) {
      if (elementsNullable && (codes.isNullAt(j))) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      if (elementsNullable && lut.isNullAt(j * k + c)) return null
      s += lut.getInt(j * k + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val total = ctx.freshName("total")
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val s = ctx.freshName("s")
      s"""
        int $m = $a.numElements();
        int $total = $b.numElements();
        if ($m == 0 || $total == 0 || $total % $m != 0) {
          ${ev.isNull} = true;
        } else {
          int $k = $total / $m;
          long $s = 0L;
          for (int $j = 0; $j < $m; $j++) {
            ${if (elementsNullable) s"if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }" else ""}
            int $c = $a.getInt($j);
            if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
            ${if (elementsNullable) s"if ($b.isNullAt($j * $k + $c)) { ${ev.isNull} = true; break; }" else ""}
            $s += $b.getInt($j * $k + $c);
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
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

  def pq_lut(qv: Column, flatCodebook: Column, subDim: Int): Column =
    ColumnBridge.column(PqLut(
      ColumnBridge.expression(qv), ColumnBridge.expression(flatCodebook),
      org.apache.spark.sql.catalyst.expressions.Literal(subDim)))

  def pq_adc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
