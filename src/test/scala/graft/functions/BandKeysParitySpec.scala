package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Text

/** Pins the native [[HyperplaneBandKeys]] expression to the composite
  * form it replaced in the d5/d9 signature build: for every vector,
  * every band key string must be BYTE-identical to
  * `concat_ws(":", lit(b), Text.hyperplaneBandKey(v, b, bits, dims,
  * center))` — same plane family, same multiply-add order, same
  * driver-computed center offsets, same rendering. Covered geometries:
  * the sf0.1 production point (bits 4 × 12 bands), the sf10 point the
  * scaling law produces (bits 11 × 15 bands), centered and uncentered,
  * plus ragged/edge vectors. */
class BandKeysParitySpec extends SparkSpec {

  private val dims = 64

  // deterministic pseudo-random corpus, incl. edge shapes: a zero
  // vector (every dot exactly 0.0 → the >= 0 boundary), a short vector
  // (ragged min(len, dims) semantics), constant vectors
  private def vectors: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(20260818L)
    val random = (1 to 50).map(_ => Seq.fill(dims)(rnd.nextGaussian()))
    random ++ Seq(
      Seq.fill(dims)(0.0),
      Seq.fill(7)(1.5),
      Seq.fill(dims)(1.0),
      Seq.fill(dims)(-0.25))
  }

  private def compare(bands: Int, bits: Int, center: Seq[Double]): Unit = {
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
    val composite = df.select(col("vec_id"),
      array((0 until bands).map(b => concat_ws(":", lit(b),
        Text.hyperplaneBandKey(col("v"), b, bits, dims, center))): _*)
        .as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = df.select(col("vec_id"),
      HyperplaneBandKeys.keys(col("v"), bands, bits, dims, center).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.keySet === composite.keySet)
    native.foreach { case (id, ks) =>
      assert(ks === composite(id), s"vec $id, bands=$bands bits=$bits " +
        s"centered=${center.nonEmpty}")
    }
  }

  private def someCenter: Seq[Double] = {
    val rnd = new scala.util.Random(42L)
    Seq.fill(dims)(rnd.nextGaussian() * 0.3)
  }

  test("native band keys == composite, sf0.1 geometry (4 bits x 12 bands)") {
    compare(bands = 12, bits = 4, center = Nil)
    compare(bands = 12, bits = 4, center = someCenter)
  }

  test("native band keys == composite, sf10 geometry (11 bits x 15 bands)") {
    compare(bands = 15, bits = 11, center = someCenter)
  }

  test("interpreted eval matches codegen (compute entry point)") {
    // the codegen path calls compute() directly; exercise it without a
    // plan to pin the kernel itself
    val bands = 3; val bits = 5
    val expr = {
      val c = HyperplaneBandKeys.keys(lit(null).cast("array<double>"),
        bands, bits, dims, someCenter)
      org.apache.spark.sql.GraftExpressionBridge.expression(c)
        .asInstanceOf[HyperplaneBandKeys]
    }
    vectors.foreach { v =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.toArray)
      val out = expr.compute(a)
      assert(out.numElements() === bands)
      (0 until bands).foreach { b =>
        val s = out.getUTF8String(b).toString
        assert(s.startsWith(s"$b:"))
        val key = s.substring(s.indexOf(':') + 1).toLong
        assert(key >= 0L && key < (1L << bits))
      }
    }
  }
}
