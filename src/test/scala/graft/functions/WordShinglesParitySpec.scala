package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Text

/** Pins the native [[WordShingles]] kernel against the HOF form it
  * replaced (r16): `array_distinct(transform(sequence(0, size(w)-n),
  * j -> array_join(slice(w, j+1, n), " ")))` under the same
  * `when(size(w) >= n, ...).otherwise(array())` scaffold — element
  * values AND order (array_distinct keeps first occurrence), across
  * the engine's two gram widths (2 for d2/st7, 5 for decontam) plus
  * 4 (t6's window grams), on edge inputs: empty, single word,
  * duplicate-heavy, non-ASCII, null text, and width-boundary docs. */
class WordShinglesParitySpec extends SparkSpec {

  private def hofShingles(w: org.apache.spark.sql.Column, n: Int) =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        j => array_join(slice(w, j + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  private def fixture: Seq[(Long, String)] = Seq(
    (1L, "alpha bravo charlie delta echo"),
    (2L, "alpha alpha alpha alpha"), // duplicate grams collapse
    (3L, "solo"), // below every width
    (4L, ""), // empty tokenization
    (5L, null.asInstanceOf[String]), // null text
    (6L, "a b a b a b a b"), // alternating duplicates
    (7L, "Grüße von München straße café 42"),
    (8L, "one two"), // exactly width 2
    (9L, "one two three four five"), // exactly width 5
    (10L, (1 to 60).map(i => s"w${i % 7}").mkString(" ")) // long, cyclic
  )

  test("native == HOF form: values and order, widths 2/4/5") {
    import spark.implicits._
    val base = fixture.toDF("doc_id", "text")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
    Seq(2, 4, 5).foreach { n =>
      val rows = base
        .select(col("doc_id"),
          Text.wordShingles(col("w"), n).as("native"),
          hofShingles(col("w"), n).as("hof"))
        .collect()
      assert(rows.length === fixture.length)
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"width $n diverged for doc ${r.getLong(0)}")
      }
    }
  }

  private def hofShinglesAll(w: org.apache.spark.sql.Column, n: Int) =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        j => array_join(slice(w, j + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  test("occurrence-keeping variant == HOF form: values and order, widths 2/3") {
    import spark.implicits._
    val base = fixture.toDF("doc_id", "text")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
    Seq(2, 3).foreach { n =>
      val rows = base
        .select(col("doc_id"),
          Text.wordShinglesAll(col("w"), n).as("native"),
          hofShinglesAll(col("w"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"all-variant width $n diverged for doc ${r.getLong(0)}")
      }
    }
  }

  test("null-token contract mirrors array_join (skipped, no delimiter)") {
    import spark.implicits._
    // hand-built token arrays WITH nulls — unreachable from
    // regexp_extract_all but part of the declared contract
    val df = Seq(
      (1L, Seq("a", null, "b", "c")),
      (2L, Seq(null, null, "x")),
      (3L, Seq[String](null, null))
    ).toDF("doc_id", "w")
    val rows = df.select(col("doc_id"),
        Text.wordShingles(col("w"), 2).as("native"),
        hofShingles(col("w"), 2).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"null-token handling diverged for doc ${r.getLong(0)}")
    }
  }
}
