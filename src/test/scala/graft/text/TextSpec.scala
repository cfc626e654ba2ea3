package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")
  }

  test("words tokenizes lowercased alphanumerics") {
    assert(one[collection.Seq[String]](Text.words(lit("Hello, World-42!")))
      === Seq("hello", "world", "42"))
  }

  test("bpe token count splits letters, digits, punctuation") {
    // "ab 12!" -> [ab] [1] [2] [!] = 4
    assert(one[Int](Text.bpeTokenCount(lit("ab 12!"))) === 4)
  }

  test("word shingles are distinct in-order n-grams") {
    val sh = one[collection.Seq[String]](
      Text.wordShingles(Text.words(lit("a b c a b c")), 2))
    assert(sh.toSet === Set("a b", "b c", "c a"))
    // shorter than n -> empty
    assert(one[collection.Seq[String]](Text.wordShingles(Text.words(lit("a")), 2)) === collection.Seq.empty[String])
  }

  test("char shingles") {
    assert(one[collection.Seq[String]](Text.charShingles(lit("abcd"), 3))
      === Seq("abc", "bcd"))
  }

  test("jaccard of arrays") {
    assert(one[Double](Text.jaccard(array(lit("a"), lit("b"), lit("c")),
      array(lit("b"), lit("c"), lit("d")))) === 0.5)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val a = array(lit(1.0), lit(2.0))
    val b = array(lit(-2.0), lit(1.0))
    assert(math.abs(one[Double](Text.cosine(a, a)) - 1.0) < 1e-12)
    assert(math.abs(one[Double](Text.cosine(a, b))) < 1e-12)
  }

  test("minhash: identical sets get identical signatures; banded keys collide") {
    val sh = array(lit("x y"), lit("y z"), lit("z w"))
    val m1 = one[collection.Seq[Long]](Text.minhash(sh, 16))
    val m2 = one[collection.Seq[Long]](Text.minhash(sh, 16))
    assert(m1 === m2 && m1.size === 16)
    assert(m1.forall(h => h >= 0 && h < Text.MinhashP))
  }
}
