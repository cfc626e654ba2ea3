package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingles over an `array<string>` token
  * column — the set-semantics shingle step of d2/d7/d15/d19/e1 and the
  * st5/st7/st8/st12/st14 streams, in ONE tight per-row loop.
  *
  * Why native: the higher-order-function formulation
  * (`array_distinct(transform(sequence(0, size(w)-n), j ->
  * array_join(slice(w, j+1, n), " ")))`) pays four interpreted
  * expression trees PER TOKEN — sequence materializes an index array,
  * each lambda hop binds a NamedLambdaVariable, slice copies an
  * n-element ArrayData, array_join walks it, and array_distinct
  * re-walks the whole result — and HOFs keep the projection out of
  * whole-stage codegen. Profiled at sf10 the shingle step alone was
  * 12 s of the 16 s tokenize+shingle pass (PROF stage split,
  * OPTIMIZATION_r16.md). This expression emits the identical distinct
  * gram array from one compiled loop.
  *
  * Value contract (byte-identical to the HOF form and the DuckDB
  * twins' shinglesSqlDuck):
  *   - grams are the n consecutive tokens joined with a single space,
  *     for every start position 0..size(w)-n;
  *   - null tokens are skipped WITHOUT a delimiter (array_join's
  *     null-filtering semantics; token arrays from regexp_extract_all
  *     never contain nulls, but the contract is mirrored anyway);
  *   - distinct keeps the FIRST occurrence order (array_distinct's
  *     order);
  *   - inputs with fewer than n tokens yield the EMPTY array here;
  *     callers ([[graft.text.Text.wordShingles]]) keep the original
  *     `when(size(w) >= n, ...)` scaffold so the null-input →
  *     empty-array coercion is literally the same expression as
  *     before.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(a: Any): Any =
    WordShinglesOps.compute(a.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesOps.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {
  /** Column API wrapper (bare expression — callers keep the
    * `when(size(w) >= n, ...)` null/short-input scaffold). */
  def shingles(w: Column, n: Int): Column =
    GraftExpressionBridge.column(
      WordShingles(GraftExpressionBridge.expression(w), n, distinct = true))

  /** Occurrence-keeping variant ([[graft.text.Text.wordShinglesAll]]'s
    * kernel — t11/t9/t13's frequency grams): every position's gram in
    * position order, duplicates preserved. */
  def shinglesAll(w: Column, n: Int): Column =
    GraftExpressionBridge.column(
      WordShingles(GraftExpressionBridge.expression(w), n, distinct = false))
}

object WordShinglesOps {
  private val Space = UTF8String.fromString(" ")

  /** n-gram join of consecutive tokens, distinct (first-occurrence
    * order, array_distinct's) or occurrence-keeping — see the value
    * contract on [[WordShingles]]. */
  def compute(w: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = w.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j <= len - n) {
      var i = 0
      var k = 0
      while (i < n) {
        // null tokens are dropped without a delimiter — concatWs
        // below skips null inputs, mirroring array_join
        val t = if (w.isNullAt(j + i)) null
          else w.getUTF8String(j + i)
        if (t != null) { parts(k) = t; k += 1 }
        i += 1
      }
      val gram =
        if (k == n) UTF8String.concatWs(Space, parts: _*)
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOf(parts, k): _*)
      seen.add(gram)
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
