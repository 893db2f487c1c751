package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the text-quality hot path.
  *
  * `size(array_distinct(ts))` — the type-token-ratio / repetition
  * numerator in q31/q32/q88/q91/q100 — materializes the deduplicated
  * array per row just to read its length. [[ArrayDistinctCount]] fuses
  * the pair into one codegen'd hash-probe loop over the `ArrayData`
  * buffer: no output array allocation, stays inside whole-stage
  * codegen. Semantics match `size(array_distinct(x))` exactly on every
  * input: binary (UTF8) string equality, a null ELEMENT counts as one
  * distinct value (array_distinct keeps it), and a null ARRAY yields
  * NULL (`size` under the non-legacy default). The optimizer rule only
  * rewrites the non-legacy `Size`, so `spark.sql.legacy.sizeOfNull`
  * sessions keep their -1 semantics untouched.
  *
  * Same custom-operator ladder tier as [[VectorDot]] (SURVEY.md §7.2):
  * built-ins first, a fused `Expression` where the per-row loop is the
  * measured hot path.
  */
case class ArrayDistinctCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "array_distinct_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.HashSet[Any]()
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else seen.add(arr.getUTF8String(i))
      i += 1
    }
    seen.size + (if (hasNull) 1 else 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val set = ctx.freshName("seen")
      val hasNull = ctx.freshName("hasNull")
      s"""
        int $n = $a.numElements();
        java.util.HashSet<Object> $set = new java.util.HashSet<Object>();
        boolean $hasNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $hasNull = true; }
          else { $set.add($a.getUTF8String($i)); }
        }
        ${ev.value} = $set.size() + ($hasNull ? 1 : 0);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayDistinctCount =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen expression — the
  * canonical-composition pass every web-scale text pipeline runs
  * before hashing/dedup (the same visible string arrives as composed
  * U+00E9 or decomposed e+U+0301; un-normalized, they fingerprint as
  * different documents). Spark has no built-in normalizer; a Scala
  * UDF would break whole-stage codegen — this stays inside it, with
  * an `isNormalized` fast path so the dominant already-NFC case
  * allocates nothing beyond the UTF-8 decode. Backed by
  * `java.text.Normalizer` (Unicode Standard Annex #15), identical to
  * DuckDB's `nfc_normalize` by both implementing UAX #15 NFC. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
        String $s = $a.toString();
        if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
          ${ev.value} = $a;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for the fused distinct-cardinality count. */
  def array_distinct_count(a: Column): Column =
    ColumnBridge.column(ArrayDistinctCount(ColumnBridge.expression(a)))

  /** Column API for native Unicode NFC normalization. */
  def nfc_normalize(a: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(a)))
}
