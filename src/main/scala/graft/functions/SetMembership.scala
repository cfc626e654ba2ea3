package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst membership count: how many elements of an
  * `array<string>` column are present in a broadcast reference set.
  * This is the row-local kernel that lets the streaming contamination
  * flags (st5 exact n-grams, st7 LSH band keys) run STATELESS: instead
  * of `explode → stream-static join → groupBy(doc_id)` — whose final
  * aggregation keeps one state-store row per flagged doc forever and
  * forces `complete` output mode — the count happens inside the row
  * that already holds the whole array, so the query is a pure
  * projection + filter in `append` mode (no state store, no
  * per-trigger re-emission).
  *
  * Why native rather than `size(array_intersect(col, lit(keys)))`:
  * Catalyst's ArrayIntersect rebuilds its lookup hash set from the
  * literal side on EVERY row evaluation — O(|set|) per row, a
  * scale-killer once the reference set is a real benchmark suite
  * (~10^6 n-grams). Here the set is an executor-wide singleton built
  * once per broadcast (keyed by broadcast id) and probed at O(|array|)
  * per row, and the loop compiles into whole-stage codegen via the
  * same reference-object pattern as [[MinHashSignature]].
  *
  * Null semantics: null input array → null; null elements are skipped
  * (they can never match a set member).
  */
case class SetMemberCount(child: Expression, keys: Broadcast[Array[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_set_member_count expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_set_member_count"

  /** Per-row probe loop — also the codegen entry point (the generated
    * stage calls it through an `addReferenceObj` handle to this
    * expression instance). */
  def count(a: ArrayData): Long = {
    val set = SetMemberOps.setFor(keys)
    var hits = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(a: Any): Any = count(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSetCount", this,
      classOf[SetMemberCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SetMemberCount = copy(child = newChild)
}

object SetMemberCount {
  /** Column API wrapper. */
  def countIn(arr: Column, keys: Broadcast[Array[String]]): Column =
    GraftExpressionBridge.column(
      SetMemberCount(GraftExpressionBridge.expression(arr), keys))
}

/** Executor-wide probe-set cache for [[SetMemberCount]]: the UTF8String
  * hash set is built ONCE per (JVM, broadcast) — tasks deserialize their
  * own expression copies, so a per-instance lazy val would rebuild the
  * set per task. Entries live for the JVM's lifetime, matching Spark's
  * own broadcast-block retention on executors (both are reclaimed when
  * the app — or in production the broadcast — is torn down). */
object SetMemberOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.util.HashSet[UTF8String]]()

  def setFor(keys: Broadcast[Array[String]]): java.util.HashSet[UTF8String] =
    cache.computeIfAbsent(keys.id, _ => {
      val arr = keys.value
      val s = new java.util.HashSet[UTF8String](math.max(16, arr.length * 2))
      arr.foreach(k => s.add(UTF8String.fromString(k)))
      s
    })
}
