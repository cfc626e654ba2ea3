package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Law battery for the remaining native codegen'd kernels (MinHash has
  * its own — [[MinHashPropSpec]]). Both kernels are exercised through
  * the SAME per-row entry points the interpreted and generated paths
  * call, so the laws pin production behavior without a SparkSession:
  *
  *  - [[DotProduct]]: bit-identical to the sequential fold it
  *    documents as its FP contract (same multiply-add order), symmetric
  *    (double multiply commutes), non-negative on x·x, and zip_with's
  *    shorter-length semantics on ragged inputs.
  *  - [[NearestCentroid]]: the chosen cluster is the EXACT argmin of
  *    the micro-quantized squared distance (verified against a BigInt
  *    reference — no Long overflow shortcuts), ties break to the lower
  *    k (the batch `ORDER BY dist, k` contract), the cosine obeys
  *    Cauchy-Schwarz within FP rounding, and a null element nulls the
  *    whole row.
  */
object NativeExprPropSpec extends Properties("NativeExpr") {

  // ---- DotProduct ------------------------------------------------

  private val vec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)

  private def dotEval(x: Array[Double], y: Array[Double]): Double = {
    val e = DotProduct(
      Literal.create(null, ArrayType(DoubleType)),
      Literal.create(null, ArrayType(DoubleType)))
    e.nullSafeEval(new GenericArrayData(x), new GenericArrayData(y))
      .asInstanceOf[Double]
  }

  property("dot: bit-identical to the sequential fold") =
    forAll(vec, vec) { (x, y) =>
      val ref = {
        var s = 0.0; var i = 0
        while (i < math.min(x.length, y.length)) { s += x(i) * y(i); i += 1 }
        s
      }
      java.lang.Double.doubleToLongBits(dotEval(x, y)) ==
        java.lang.Double.doubleToLongBits(ref)
    }

  property("dot: symmetric, and x·x >= 0") =
    forAll(vec, vec) { (x, y) =>
      dotEval(x, y) == dotEval(y, x) && dotEval(x, x) >= 0.0
    }

  property("dot: ragged inputs use the shorter length (zip_with)") =
    forAll(vec, vec, Gen.choose(0, 8)) { (x, y, n) =>
      dotEval(x.take(n), y) == dotEval(x.take(n), y.take(n))
    }

  // ---- MinHashMatchCount -------------------------------------------

  private val sig: Gen[Array[java.lang.Long]] =
    Gen.listOfN(8, Gen.oneOf(
      Gen.const(null: java.lang.Long),
      Gen.chooseNum(0L, 5L).map(java.lang.Long.valueOf)))
      .map(_.toArray)

  private def mcEval(x: Array[java.lang.Long],
      y: Array[java.lang.Long]): Int =
    MinHashOps.matchCount(
      new GenericArrayData(x.asInstanceOf[Array[Any]]),
      new GenericArrayData(y.asInstanceOf[Array[Any]]))

  property("matchCount: equals the zip_with/when reference") =
    forAll(sig, sig, Gen.choose(0, 8)) { (x, y, n) =>
      val xs = x.take(n)
      // reference: zip_with pads with nulls; when(a===b,1).otherwise(0)
      // is 0 under any null operand — so count equal non-null pairs
      // over min length
      val ref = xs.zip(y).count { case (a, b) =>
        a != null && b != null && a.longValue == b.longValue }
      mcEval(xs, y) == ref && mcEval(y, xs) == mcEval(xs, y)
    }

  // ---- NearestCentroid -------------------------------------------

  private val Dims = 6
  private val centroids: Gen[Array[Array[Long]]] =
    Gen.listOfN(4,
      Gen.listOfN(Dims, Gen.chooseNum(-2000000L, 2000000L)).map(_.toArray))
      .map(_.toArray)

  private val embedding: Gen[Array[Double]] =
    Gen.listOfN(Dims, Gen.chooseNum(-2.0, 2.0)).map(_.toArray)

  private def assign(cents: Array[Array[Long]], emb: Array[Double]) = {
    val e = NearestCentroid(
      Literal.create(null, ArrayType(DoubleType)), cents)
    e.compute(new GenericArrayData(emb))
  }

  private def q6(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong

  property("cluster is the exact argmin (BigInt reference), ties to lower k") =
    forAll(centroids, embedding) { (cents, emb) =>
      val row = assign(cents, emb)
      val x = emb.map(q6)
      val dists = cents.map { c =>
        x.zip(c).map { case (a, b) =>
          val t = BigInt(a) - BigInt(b); t * t }.sum
      }
      val best = dists.zipWithIndex.minBy { case (d, k) => (d, k) }._2
      row.getLong(0) == best.toLong
    }

  property("cosine obeys Cauchy-Schwarz within FP rounding") =
    forAll(centroids, embedding) { (cents, emb) =>
      val row = assign(cents, emb)
      val cos = row.getDouble(1)
      cos.isNaN || (cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }

  property("identical centroid => cluster cosine is 1 (within FP)") =
    forAll(embedding) { emb =>
      val self = Array(emb.map(q6))
      val row = assign(self, emb)
      val cos = row.getDouble(1)
      // a zero vector has an undefined cosine (0/0) — NaN is correct
      emb.forall(v => q6(v) == 0L) == cos.isNaN &&
        (cos.isNaN || math.abs(cos - 1.0) < 1e-9)
    }

  property("null element nulls the whole assignment row") =
    forAll(centroids) { cents =>
      val e = NearestCentroid(
        Literal.create(null, ArrayType(DoubleType)), cents)
      e.compute(new GenericArrayData(
        Array[Any](1.0, null, 0.5, 0.0, 0.0, 0.0))) == null
    }
}
