package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a codegen'd Catalyst expression — the
  * missing user-level handle on Spark's own runtime-filtering idea
  * (`spark.sql.optimizer.runtime.bloomFilter.*` injects these only
  * when Catalyst infers them; neither `might_contain` nor
  * `bloom_filter_agg` is registered for users in Spark 4.1).
  *
  * The serialized sketch travels as part of the expression (a few
  * hundred KB per million keys at 1% fpp — an order of magnitude under
  * the hash relation a broadcast join would ship) and is deserialized
  * once per TASK via a transient lazy (readFrom over ~1 MB is noise
  * next to a task's scan work; a per-executor cache would have to key
  * by content and pay the same O(bytes) hash). Generated code calls
  * [[test]] directly, staying inside whole-stage codegen.
  *
  * equals/hashCode are content-based over the sketch bytes — the
  * case-class default would compare the Array by identity, silently
  * breaking semanticEquals/canonicalization (two references to the
  * same pruned column would never dedup).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT or STRING key, got ${t.sql}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Called from both eval and the generated code. */
  def test(v: Long): Boolean = filter.mightContainLong(v)
  /** String keys probe as their UTF-8 bytes — the exact representation
    * `DataFrameStatFunctions.bloomFilter` inserts for string columns
    * (putString == putBinary(utf8 bytes)), so build and probe agree. */
  def test(v: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContainBinary(v.getBytes)

  override def nullSafeEval(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => test(s)
    case l => test(l.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.test($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Bloom-pruned joins: cut the fact side BEFORE its shuffle with a
  * compact sketch of the dim keys.
  *
  * Where this wins at 100 TB: the dim side is too big to broadcast as
  * a hash relation (so the join is a sort-merge over two shuffles) but
  * its KEY SET still fits a sketch — 1M keys ≈ 1.2 MB at 1% fpp,
  * ~20× under the broadcast threshold the hash relation would blow.
  * Pre-filtering the fact at the scan cuts the big shuffle by the
  * join's selectivity; the exact join afterwards removes the fpp
  * false positives, so results are EXACT — the sketch only prunes.
  *
  * The sketch build is one driver-side tree-aggregation over the dim
  * keys (fixed-size result, the same shape every engine's runtime
  * filter uses).
  */
object BloomJoin {

  def might_contain(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloomBytes))

  /** Serialize a dim column's key set into a sketch. */
  def keySketch(dim: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, math.max(1L, expectedItems), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact` rows whose `factKey` is PROBABLY in `dim.keyCol` — the
    * pre-shuffle prune. Follow with the exact join; never use alone
    * (false positives pass at rate ~fpp). */
  def bloomPrune(fact: DataFrame, factKey: Column, dim: DataFrame,
      keyCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame =
    fact.filter(might_contain(factKey, keySketch(dim, keyCol, expectedItems, fpp)))
}
