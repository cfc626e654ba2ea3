package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment over an embedding column against
  * a small centroid table held as expression state — the O(K) codegen'd
  * replacement for st6's interpreted O(K²) `when`-chain (K−1 nested
  * conditionals, each re-evaluating `aggregate(zip_with(...))` distance
  * folds that never enter whole-stage codegen; fine at K=4, a
  * compile-sized expression tree at a production K=1024).
  *
  * Returns `struct(cluster: bigint, cos: double)` computed with the
  * exact arithmetic of the batch k-means index (s4/d11) and its DuckDB
  * oracle twin, so the stream flag stays byte-identical to the batch
  * resolver:
  *   x6_i  = floor(x_i * 1e6 + 0.5) as long   (half-up micro quantization)
  *   dist_k = Σ (x6_i − c6_{k,i})²            (exact Long; |x6| ≤ ~2e6,
  *                                             64 dims → < 2^63)
  *   cluster = smallest k minimizing dist_k    (the oracle's
  *                                             ORDER BY dist, k tie-break)
  *   cos    = sxc / (sqrt(sxx) * sqrt(scc))    (each Long sum cast to
  *                                             double first, like the
  *                                             oracle's CAST(… AS DOUBLE))
  *
  * Null semantics: null array → null; any null element → null (the HOF
  * formulation's null poisoning). Accepts array<float> or array<double>
  * (floats widen exactly).
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  require(cents.nonEmpty, "centroid table must be non-empty")

  // lazy: the child is unresolved at construction (copy/withNewChild
  // run during analysis), so dataType is only safe to ask at eval time
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "graft_nearest_centroid"

  /** Σ c6² per centroid — exact in Long (≤ 64 · (2e6)² < 2^63), then
    * exact again as Double (< 2^53), so the cosine denominator is a
    * constant, same as the batch side's driver-computed literal. */
  @transient private lazy val sccs: Array[Double] =
    cents.map(_.map(v => v * v).sum.toDouble)

  /** Per-row kernel — also the codegen entry point. Returns null on a
    * null element (callers get a null struct). */
  def compute(a: ArrayData): GenericInternalRow = {
    val n = a.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      x(i) = java.lang.Math.floor(v * 1e6 + 0.5).toLong
      i += 1
    }
    var bestK = 0
    var bestD = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val m = math.min(n, c.length)
      var d = 0L
      i = 0
      while (i < m) { val t = x(i) - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; bestK = k }
      k += 1
    }
    val c = cents(bestK)
    val m = math.min(n, c.length)
    var sxc = 0L
    var sxx = 0L
    i = 0
    while (i < m) { sxc += x(i) * c(i); sxx += x(i) * x(i); i += 1 }
    val cos = sxc.toDouble /
      (java.lang.Math.sqrt(sxx.toDouble) * java.lang.Math.sqrt(sccs(bestK)))
    new GenericInternalRow(Array[Any](bestK.toLong, cos))
  }

  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null else compute(a.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNearestCentroid", this,
      classOf[NearestCentroid].getName)
    // nullSafeCodeGen declares ev.value (InternalRow, default null) and
    // ev.isNull as mutable locals; compute() returning null (a null
    // element) flips isNull back on
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {
  /** Column API wrapper: `assign(embedding, centroids)` →
    * struct(cluster, cos). `cents(k)(d)` = micro-quantized centroid
    * component c6. */
  def assign(emb: Column, cents: Array[Array[Long]]): Column =
    GraftExpressionBridge.column(
      NearestCentroid(GraftExpressionBridge.expression(emb), cents))
}
