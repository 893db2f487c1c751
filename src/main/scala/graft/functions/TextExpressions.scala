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

object TextFunctions {
  /** Column API for the fused distinct-cardinality count. */
  def array_distinct_count(a: Column): Column =
    ColumnBridge.column(ArrayDistinctCount(ColumnBridge.expression(a)))
}
