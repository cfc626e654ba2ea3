package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst Bloom-filter membership count: how many elements of
  * an `array<string>` column MIGHT be in a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * The scale companion to [[SetMemberCount]]: an exact probe set costs
  * the full string bytes per member (a real benchmark suite's n-gram
  * set is easily GBs on the wire and on every executor heap), while a
  * Bloom filter at 1% false-positive rate costs ~9.6 BITS per member —
  * a ~50× smaller broadcast for typical shingle lengths. The price is
  * false positives, so callers use this as a row-local PRE-filter and
  * confirm survivors with an exact key-equality join (d15): no false
  * negatives means the confirm join sees every true match, and the
  * bloom pass means the vast majority of clean documents never reach
  * the explode/join at all.
  *
  * Probes use `mightContainBinary` over the element's UTF-8 bytes —
  * the same bytes `BloomFilter.putString` hashes, so build-side
  * `putString`/`stat.bloomFilter` and probe-side agree exactly.
  *
  * Null semantics match [[SetMemberCount]]: null array → null, null
  * elements skipped.
  */
case class BloomMemberCount(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_member_count expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_member_count"

  /** Per-row probe loop — also the codegen entry point (the generated
    * stage calls it through an `addReferenceObj` handle to this
    * expression instance). The filter object itself is the broadcast
    * value: unlike [[SetMemberOps]] there is nothing to re-index per
    * JVM, `mightContainBinary` probes the shared bit array directly. */
  def count(a: ArrayData): Long = {
    val f = bloom.value
    var hits = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && f.mightContainBinary(a.getUTF8String(i).getBytes)) {
        hits += 1
      }
      i += 1
    }
    hits
  }

  override def nullSafeEval(a: Any): Any = count(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomCount", this,
      classOf[BloomMemberCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMemberCount = copy(child = newChild)
}

object BloomMemberCount {
  /** Column API wrapper. */
  def countIn(arr: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftExpressionBridge.column(
      BloomMemberCount(GraftExpressionBridge.expression(arr), bloom))
}
