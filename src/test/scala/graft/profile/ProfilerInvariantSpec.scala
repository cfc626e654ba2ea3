package graft.profile

import graft.SparkSpec

/** Randomized invariant battery over the column profiler — the A1–A21
  * feature families feed the matcher's RF verbatim, so every ratio
  * must stay inside its documented range on ARBITRARY data, not just
  * the curated fixtures. A seeded generator builds a melted frame of
  * archetypal columns (ints, floats, emails, phones, dates, unicode,
  * junk, all-null, all-blank, huge strings) with nulls and blanks
  * injected, and every profile row is checked against the contracts:
  * proportions in [0,1] (or the -1 degenerate sentinel), discrete
  * entropy bounded by ln(n), length stats ordered min <= median/mode
  * <= max, one profile row and one type-share row per column. */
class ProfilerInvariantSpec extends SparkSpec {

  private def melted() = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def maybeNull(s: String): String =
      if (rnd.nextInt(10) == 0) null
      else if (rnd.nextInt(10) == 0) "  " else s
    val rows = Seq.tabulate(50) { i =>
      Seq(
        "ints" -> maybeNull((rnd.nextInt(2000) - 1000).toString),
        "floats" -> maybeNull(f"${rnd.nextGaussian() * 100}%.4f"),
        "emails" -> maybeNull(s"user$i@ex${rnd.nextInt(5)}.com"),
        "phones" -> maybeNull(
          f"${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(900) + 100}%03d-${rnd.nextInt(9000) + 1000}%04d"),
        "dates" -> maybeNull(
          f"${2000 + rnd.nextInt(26)}%04d-${rnd.nextInt(12) + 1}%02d-${rnd.nextInt(28) + 1}%02d"),
        "unicode" -> maybeNull(
          Seq("héllo", "日本語", "🎉🎊", "naïve").apply(rnd.nextInt(4)) + i),
        "junk" -> maybeNull(rnd.nextString(1 + rnd.nextInt(20))),
        "allnull" -> null,
        "allblank" -> " ",
        "huge" -> maybeNull("x" * (100 + rnd.nextInt(400))),
        "discrete" -> maybeNull(Seq("a", "b", "c").apply(rnd.nextInt(3))))
    }.flatten
    rows.toDF("col_name", "value")
  }

  test("profile ratios stay in range on arbitrary data") {
    val df = melted()
    val out = ColumnProfiler.profile(df).collect()
    assert(out.length === 11, "one row per column")
    def in01orSentinel(v: Double) = v == -1.0 || (v >= 0.0 && v <= 1.0 + 1e-9)
    for (r <- out) {
      val name = r.getString(0)
      val n = r.getLong(1)
      assert(n === 50L, s"$name n_values")
      val props = Seq("prop_unique_vals", "prop_missing_vals",
        "ratio_alpha_chars", "prop_at_sign", "prop_currency",
        "prop_hyphen", "prop_paren", "prop_range_format",
        "prop_numerical_chars", "prop_whitespace_chars")
      for (p <- props) {
        val v = r.getAs[Double](p)
        assert(in01orSentinel(v), s"$name.$p = $v out of [0,1] / -1")
      }
      for (p <- Seq("mean_commas_per_entry", "mean_slashes_per_entry")) {
        val v = r.getAs[Double](p)
        assert(v >= -1.0, s"$name.$p = $v")
      }
      val isDiscrete = r.getAs[Long]("is_discrete")
      assert(isDiscrete == 0L || isDiscrete == 1L)
      val ent = r.getAs[Double]("entropy_discrete")
      assert(ent == -1.0 || (ent >= -1e-9 && ent <= math.log(n.toDouble) + 1e-6),
        s"$name discrete entropy $ent outside [0, ln n]")
      assert(r.getAs[Double]("shannon_entropy") >= -1.0 - 1e-9)
      val (mn, md, mo, mx) = (r.getAs[Long]("min_len"),
        r.getAs[Long]("median_len"), r.getAs[Long]("mode_len"),
        r.getAs[Long]("max_len"))
      if (mn >= 0) { // -1 = all-null column
        assert(mn <= md && md <= mx, s"$name median_len order: $mn $md $mx")
        assert(mn <= mo && mo <= mx, s"$name mode_len order: $mn $mo $mx")
      }
    }
  }

  test("type shares are proportions (or null on all-blank) per column") {
    val df = melted()
    val shares = ColumnProfiler.typeShares(df).collect()
    assert(shares.length === 11)
    for (r <- shares; i <- 1 until r.length) {
      if (!r.isNullAt(i)) {
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0 + 1e-9,
          s"${r.getString(0)} share($i) = $v")
      }
    }
  }

  test("inferred types resolve to the documented vocabulary") {
    val allowed = Set("integer", "float", "long", "boolean", "date",
      "time", "datetime", "string", "unknown")
    val out = ColumnProfiler.inferredTypeOneHots(melted()).collect()
    assert(out.length === 11)
    for (r <- out)
      assert(allowed.contains(r.getString(1)),
        s"${r.getString(0)} inferred '${r.getString(1)}'")
  }
}
