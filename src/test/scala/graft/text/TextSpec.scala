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

  test("pii scrub redacts emails, phones and IPv4s, leaves the rest") {
    val in = "mail bob.smith+x@corp.example.org call 555-123-4567 " +
      "from 192.168.0.1 at five o'clock"
    assert(one[String](Text.piiScrub(lit(in)))
      === "mail [EMAIL] call [PHONE] from [IP] at five o'clock")
    // version-ish dotted numbers shorter than 4 octets survive
    assert(one[String](Text.piiScrub(lit("v1.2.3 is out"))) === "v1.2.3 is out")
    // digits that are not phone-shaped survive
    assert(one[String](Text.piiScrub(lit("order 555-12345"))) === "order 555-12345")
  }

  test("t5/t6 run end-to-end with expected shapes") {
    val sf = "/root/testdata/sf0.001"
    val t5 = graft.SparkEntry.queries("t5_pii_scrub")(spark, sf).collect()
    assert(t5.nonEmpty)
    assert(t5.forall(r => !r.getAs[String]("scrubbed").contains("@")))
    val evens = t5.filter(_.getAs[Long]("c_custkey") % 2 == 0)
    assert(evens.forall(_.getAs[Long]("n_emails") == 1L))
    assert(evens.forall(_.getAs[String]("scrubbed").contains("[EMAIL]")))
    val t6 = graft.SparkEntry.queries("t6_repetition")(spark, sf).collect()
    assert(t6.nonEmpty)
    assert(t6.forall { r =>
      val d = r.getAs[Double]("distinct_ratio")
      d > 0.0 && d <= 1.0 && r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_words")
    })
  }

  test("t7 mixture sampling: en kept fully, others near their target rate") {
    val sf = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("t7_mixture_sample")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("kept_frac")))
      .toMap
    assert(out("en")._3 === 1.0, "rate-1.0 language must keep everything")
    val rates = graft.text.TextQueries.MixtureRates.toMap
    out.foreach { case (lang, (total, kept, frac)) =>
      val target = rates.getOrElse(lang, graft.text.TextQueries.MixtureDefaultRate)
      assert(kept <= total)
      assert(math.abs(frac - target) < 0.15,
        s"$lang kept_frac $frac too far from target $target")
    }
    // determinism: the coin is content-independent md5(doc_id)
    val again = graft.SparkEntry.queries("t7_mixture_sample")(spark, sf).collect()
    assert(again.length === out.size)
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
