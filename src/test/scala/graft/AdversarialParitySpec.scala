package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Committed regression gate for the adversarial null/unicode corpus.
  *
  * Round 8's fuzz pass (tools/make_adversarial.py → Verify → DuckDB
  * compare) caught five real latent bugs: d15's `stat.bloomFilter` over
  * zero rows NPEs on probe, d16 classifying a null-text doc present in
  * both snapshots as "added" (md5(NULL) is NULL), mm* NPE on null
  * payloads, t2/quality divide-by-zero + NULL ratios on empty docs
  * under ANSI, and two-empty-set Jaccard 0/0. The proof previously
  * lived only in /tmp artifacts; this spec rebuilds the SAME 30-doc
  * fixture in-JVM and pins the judge-verified (DuckDB-parity) rows, so
  * each fix is regression-gated by `sbt test`.
  *
  * Reference posture mirrored: committed edge-case fixtures driven by
  * specs (/root/reference/core/src/test/resources/malformed.csv +
  * DatasetRestAPISpec.scala:167-208). Expected values below were
  * captured from a fresh Verify run oracle-compared 17/17 PASS against
  * DuckDB on 2026-08-14; they are parity pins, not aspirations.
  *
  * Round-9 extension: the FULL portfolio (now 110 queries with e3) was
  * run against this corpus end-to-end — 106/110 DuckDB hash-exact; the
  * only four mismatches are m4/m7/m8/q21, whose oracles are pinned
  * VALUES constants valid only at the driver's sf0.01 by documented
  * design. The round-9 queries are each pinned as committed rows
  * below, not just swept: st10 (pin 6 — pathological delta admission),
  * e2 (pin 7 — dup/contamination rates over null/whitespace/CJK
  * fingerprint folds), e3 (pin 8 — the null-text survivor's
  * coalesce-to-zero-token manifest entry). Round-10: e4 pinned as
  * pin 9 (τ-smoothing saturates the 10-token source, damps the big
  * one; DuckDB parity re-verified on this corpus 2026-08-15), st11 as
  * pin 10 (the streaming sampler applies pin 9's exact plan to the 7
  * delta docs) and d17 as pin 11 (the no-eval-docs empty-report edge).
  * Round-10 full-portfolio sweep on the round-end binary
  * (2026-08-15): 111/115 DuckDB hash-exact, the 4 mismatches the same
  * documented sf0.01-pinned VALUES oracles (m4/m7/m8/q21).
  * Round-11: the six new operators pinned as pins 12-17 (d18
  * containment on the dup/near-dup cluster, d19's cross-source fox
  * shingles, t14's giant-token pair counts, t15 conservation + the
  * one truncating doc, t16 per-source OOV, e6's exact epoch order);
  * full-portfolio sweep at 121 queries: 117/121 hash-exact, same 4
  * documented mismatches (2026-08-15). The second round-11 batch (s9
  * recall report, d20 threshold sweep, p14 embedding profile) pinned
  * as pins 18-19 + the EmbeddingProfileSpec battery; all three
  * DuckDB-parity on this corpus (2026-08-15). The round-11 third wave
  * (t17 readability, e7 effective tokens, e8 release manifest, e9
  * curriculum buckets, s10 range search, s11 cluster report, s12 pq
  * recall, d21 lsh recall, st13 quality monitor) pinned as pins
  * 20-28; full-portfolio sweep at 134 queries: 130/134 hash-exact,
  * same 4 documented sf0.01-pinned VALUES mismatches (2026-08-15).
  * Round-12: the seven new operators (q33 funnel, q34 retention
  * cohorts, s13 matryoshka recall, t18 tokenizer fertility, d23 block
  * scrub, e10 resume manifest, st14 block-scrub admission, s14 SQ8
  * recall) pinned as pins 29-36, each DuckDB hash-exact on this
  * corpus on day one (2026-08-15).
  * Round-13: d24 (substring-recall audit) pinned as pin 38
  * (planted-length W-boundary grade) and hash-exact in the sweep on
  * day one; t20 (BPE vocab induction) joins the sf-pin class (VALUES
  * oracle from the independent tools/bpe_reference.py); p16
  * (approximate FDs) sweep-covered on day one. Full-portfolio sweep
  * at 154 queries: 148/154 hash-exact, the 6 mismatches exactly the
  * documented sf0.01-pinned VALUES oracles (m4/m7/m8/q21/g4/t20)
  * (2026-08-16). The r13 sf1 ORACLE leg (PERF.md) additionally found
  * and fixed the d18/d22 "[1:0]" init-order oracle bug the sweep
  * could not see (band channel masks it below sf1).
  * Re-run the whole sweep with:
  *   python3 tools/make_adversarial.py
  *   sbt "runMain graft.Verify /tmp/adversarial /tmp/v_adv"
  *   python3 tools/check_oracle.py /tmp/adversarial /tmp/v_adv
  */
class AdversarialParitySpec extends SparkSpec {

  /** The 30 pathological docs, byte-identical to
    * tools/make_adversarial.py's literals (UTF-8 literals verified
    * codepoint-equal to the python fixture; control chars as \u
    * escapes so the source stays text). */
  // format: off
  private val docs: Seq[(Long, String, String, String)] = Seq(
    (1L,  null,                                                  "en", "webA"), // null text
    (2L,  "",                                                    "en", "webA"), // empty string
    (3L,  "   \t\n  ",                                           "en", "webA"), // whitespace only
    (4L,  "word",                                                "en", "webA"), // 1-word doc
    (5L,  "word",                                                "en", "webB"), // exact dup, other source
    (6L,  "héllo wörld naïve café",          "fr", "webA"), // latin diacritics
    (7L,  "日本語のテキストです 完全に", "ja", "webA"), // CJK, no ascii tokens
    (8L,  "🎉🎊 emoji only 🚀",    "en", "webB"), // emoji + 2 words
    (9L,  "MiXeD CaSe TEXT with UPPER lower",                    "en", "webA"),
    (10L, "a b c d e f g h i j k l m n o p q r s t",             "en", "webA"), // 1-char words
    (11L, "x" * 5000,                                            "en", "webB"), // one huge token
    (12L, ("repeat me " * 50).trim,                              "en", "webA"), // pathological repetition
    (13L, "1234 5678 90 42 1234",                                "en", "webB"), // digit tokens
    (14L, "the quick brown fox jumps over the lazy dog",         "en", "webA"),
    (15L, "the quick brown fox jumps over the lazy dog",         "en", "webB"), // dup of 14
    (16L, "the quick brown fox leaps over the lazy dog",         "en", "webA"), // near-dup
    (17L, "tab\tseparated\nnewline\rcarriage",                   "en", "webA"),
    (18L, "punctuation!!! ??? ... ;;; ---",                      "en", "webB"),
    (19L, "Ünïcödé wîth số 123 mixed", "vi", "webA"),
    (20L, "\u0000hidden\u0001control\u0002chars",                "en", "webB"), // control chars
    (21L, "ZERO​WIDTH​SPACE joined",                   "en", "webA"), // zero-width space
    (22L, "é combining accent vs é precomposed",      "fr", "webB"),
    (23L, "word " * 200,                                         "en", "webA"), // long doc, tiny vocab
    (24L, "singleton",                                           "en", "webB"),
    (25L, "𝕞𝕒𝕥𝕙 𝖇𝖔𝖑𝖉 unicode letters", "en", "webA"), // non-BMP letters
    (26L, "mixed ascii and 中文 words here",             "zh", "webB"),
    (27L, "aaa bbbbbbb normal words too",                        "en", "webA"),
    (28L, "  leading and trailing  ",                            "en", "webB"),
    (29L, "UPPER ONLY SHOUTING DOC",                             "en", "webA"),
    (30L, "final doc with enough words to be ordinary text",     "en", "webA"))
  // format: on

  private val srcDir = "/root/testdata/sf0.001"

  /** Fixture dir: the adversarial documents table plus the other
    * sf0.001 tables (so every query's inputs resolve). Built once. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-adversarial").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings"))
      Files.copy(Paths.get(s"$srcDir/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val rows = docs.map { case (id, text, lang, source) =>
      // code POINTS, matching the python fixture's len() (an emoji is
      // one char there, two UTF-16 units here)
      val n = if (text == null) 0L
        else text.codePointCount(0, text.length).toLong
      Row(id, text, lang, source, n)
    }
    // single FILE named documents.parquet (the driver's layout) — the
    // streaming file source glob-filters on that exact file name, so a
    // directory-shaped table would stream zero rows
    val scratch = Files.createTempDirectory("graft-adv-docs").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$d/documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ---- pin 1: t2/quality NULL semantics on null/empty/whitespace docs
  //      (TextQueries.qualityFrame's nullif guards; the pre-fix code
  //      threw DIVIDE_BY_ZERO under ANSI on doc 2 and returned 0.0
  //      instead of NULL mean_word_len)
  test("t2 quality: null/empty/whitespace docs get NULL ratios, defined scores") {
    val rows = run("t2_quality_scores").collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = rows(1L) // null text
    assert(d1.isNullAt(1) && d1.isNullAt(2) && d1.isNullAt(4),
      "null text -> NULL n_words/punct_ratio/mean_word_len")
    assert(d1.getDouble(5) === 0.7)
    val d2 = rows(2L) // empty string
    assert(d2.getLong(1) === 0L)
    assert(d2.isNullAt(2), "length-0 text -> NULL punct_ratio (DuckDB 0/0)")
    assert(d2.isNullAt(4), "zero words -> NULL mean_word_len")
    assert(d2.getDouble(5) === 0.0)
    val d3 = rows(3L) // whitespace only: length > 0, zero words
    assert(d3.getDouble(2) === 0.0, "whitespace is not punctuation")
    assert(d3.isNullAt(4))
    assert(d3.getDouble(5) === 0.3)
    assert(rows(4L).getDouble(4) === 4.0)
    assert(rows(11L).getDouble(4) === 5000.0, "one huge token")
  }

  // ---- pin 2: d16 presence-flag classification (pre-fix: md5(NULL)
  //      made a null-text doc present in BOTH snapshots read "added")
  test("d16 diff: null-text doc present in both snapshots is unchanged") {
    val rows = run("d16_corpus_diff").collect()
    val byId = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) === "unchanged", "null text, both sides -> unchanged")
    val counts = rows.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    assert(counts === Map(
      "unchanged" -> 24, "changed" -> 3, "added" -> 2, "removed" -> 1))
  }

  // ---- pin 3: d15 zero-eval-docs fast path (no doc_id in 1..30 is
  //      divisible by DecontamEvalMod=50, so the eval gram set is
  //      EMPTY; pre-fix, stat.bloomFilter over zero rows returned a
  //      null-buffer filter that NPE'd on probe)
  test("d15 bloom: empty eval set takes the fast path, zero contamination") {
    val rows = run("d15_bloom_decontamination").collect()
    assert(rows.length === 30)
    assert(rows.forall(_.getLong(1) === 0L), "no shared n-grams")
    assert(rows.forall(_.getLong(2) === 0L), "nothing contaminated")
  }

  // ---- pin 4: mm null payloads (pre-fix: codec NPE'd on null text;
  //      now a zero-byte media file, as real ingests have)
  test("mm: null-text doc is a zero-byte media file, not an NPE") {
    val feats = run("mm1_media_features").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size === 30)
    assert(feats(1L).getLong(2) === 0L, "null text -> 0 bytes")
    assert(feats(1L).getDouble(5) === 0.0, "zero-byte entropy is 0")
    assert(feats(2L).getLong(2) === 0L, "empty text -> 0 bytes")
    val frames = run("mm2_frame_samples").collect()
    assert(frames.length === 36, "9 non-empty videos x 4 frames")
    assert(!frames.exists(_.getLong(0) === 2L),
      "zero-byte video yields no frames (doc 2 is mime video/mp4)")
    assert(run("mm4_media_dedup").count() === 30,
      "phash zero-divisor guard holds on zero-byte payloads")
  }

  // ---- pin 5: two-empty-set Jaccard (pre-fix: 0/0 threw under ANSI;
  //      now NULL, failing the >= threshold gate as in DuckDB)
  test("d4 jaccard: two empty shingle sets compare NULL, not an error") {
    val pairs = run("d4_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(pairs.contains((1L, 2L)), "null-text vs empty-text pair blocked together")
    assert(pairs((1L, 2L)).isNullAt(2), "0/0 union -> NULL similarity")
    assert(pairs((1L, 3L)).getDouble(2) === 0.0,
      "empty vs non-empty set -> plain 0.0")
    assert(pairs.size === 119)
  }

  // ---- pin 6: st10 streaming admission over pathological delta docs
  //      (null/emoji/1-word texts flow through quality+dedup+decontam
  //      without throwing; the exact-dup probe sees cross-source dups)
  test("st10 admission: pathological delta docs admit deterministically") {
    val rows = run("st10_stream_pipeline_admission").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(4L, 8L, 12L, 16L, 24L, 28L),
      "delta non-eval docs of the 30-doc corpus")
    assert(rows(4L).getLong(3) === 1L,
      "doc 4 ('word') is an exact dup of corpus doc 5 ('word', webB)")
    assert(rows(4L).getLong(6) === 0L, "dup -> not admitted")
    assert(rows(8L).getLong(2) === 0L && rows(8L).getLong(6) === 0L,
      "emoji doc fails the quality gate")
    assert(rows(12L).getLong(6) === 1L, "repetition doc passes (quality only)")
    // admit == passed && !dup && !contaminated, row for row
    rows.values.foreach { r =>
      assert(r.getLong(6) === (if (r.getLong(2) == 1L && r.getLong(3) == 0L &&
        r.getLong(4) == 0L) 1L else 0L))
    }
  }

  // ---- pin 7: e2's corpus card over the pathological corpus — the
  //      null-text doc drops out of the fingerprint base (29 of 30),
  //      and the whitespace-only, empty, AND all-CJK docs (2, 3, 7)
  //      NORMALIZE TO THE SAME EMPTY fingerprint, joining 'word'x2 and
  //      the fox pair as the corpus's 4 exact dups (4/29 = .137931)
  test("e2 corpus card: null/whitespace docs fold into the right rates") {
    val card = run("e2_corpus_card").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") === 30.0)
    assert(card("n_sources") === 2.0 && card("n_langs") === 5.0)
    assert(card("exact_dup_rate") === 0.137931)
    assert(card("contamination_rate") === 0.0)
    assert(card("total_words") === 424.0)
  }

  // ---- pin 8: e3's shard manifest over the pathological corpus — the
  //      admitted null-text doc (doc 1, split test) must become a
  //      ZERO-token manifest entry, not a NULL that poisons the
  //      prefix-sum window (the coalesce guard); the train survivors
  //      pack into one under-budget shard with an exact token count
  test("e3 shard manifest: null-text survivor is a zero-token shard entry") {
    val shards = run("e3_shard_manifest").collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r).toMap
    assert(shards.size === 2, "test + train, one shard each (under budget)")
    val t = shards(("test", 0L))
    assert(t.getLong(3) === 1L && t.getLong(4) === 0L,
      "null-text doc 1 -> one doc, zero tokens (not NULL)")
    assert(t.getLong(5) === 1L && t.getLong(6) === 1L)
    val tr = shards(("train", 0L))
    assert(tr.getLong(3) === 8L && tr.getLong(4) === 357L)
    assert(tr.getLong(5) === 10L && tr.getLong(6) === 30L)
  }

  // ---- pin 9: e4's mixture manifest over the pathological corpus —
  //      the train pool is pin 8's 8 survivors (347 webA + 10 webB
  //      tokens); τ=2 smoothing must SATURATE the tiny source (webB
  //      target 10 ≥ its 10-token pool → frac_micro = 1e6, both docs
  //      selected) while damping the big one (webA frac ≈ 17.3%,
  //      and deterministically 0 of its 6 doc hashes fall under it)
  test("e4 mixture manifest: tiny source saturates, big source damps") {
    val rows = run("e4_mixture_manifest").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("webA", "webB"))
    val a = rows("webA")
    assert(a.getLong(1) === 6L && a.getLong(2) === 347L)
    assert(a.getLong(3) === 18L && a.getLong(4) === 60L)
    assert(a.getLong(5) === 172910L)
    assert(a.getLong(6) === 0L && a.getLong(7) === 0L,
      "no webA doc hash < 172910 — deterministic small-n outcome")
    val b = rows("webB")
    assert(b.getLong(1) === 2L && b.getLong(2) === 10L)
    assert(b.getLong(3) === 3L && b.getLong(4) === 10L)
    assert(b.getLong(5) === 1000000L, "target covers the pool -> saturated")
    assert(b.getLong(6) === 2L && b.getLong(7) === 10L,
      "saturated frac selects every doc")
  }

  // ---- pin 10: st11's streaming sampler over the pathological corpus
  //      — the 7 delta docs (doc_id % 4 = 0) sampled under e4's plan
  //      (pin 9's frac_micro values, the SAME broadcast plan): webB's
  //      saturated 1e6 samples all 4 webB deltas, webA's damped 172910
  //      admits none of the 3 webA delta hashes. DuckDB parity
  //      re-verified on this corpus 2026-08-15.
  test("st11 mixture sampler: applies e4's plan to the delta stream") {
    val rows = run("st11_stream_mixture_sampler").collect()
    assert(rows.length === 7)
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    assert(byDoc.keySet === Set(4L, 8L, 12L, 16L, 20L, 24L, 28L))
    for ((id, frac) <- Seq(4L -> 172910L, 12L -> 172910L, 16L -> 172910L))
      assert(byDoc(id).getString(1) === "webA" &&
        byDoc(id).getLong(4) === frac && byDoc(id).getLong(5) === 0L,
        s"webA delta $id must stay unsampled under the damped frac")
    for (id <- Seq(8L, 20L, 24L, 28L))
      assert(byDoc(id).getString(1) === "webB" &&
        byDoc(id).getLong(4) === 1000000L && byDoc(id).getLong(5) === 1L,
        s"webB delta $id must be sampled under the saturated frac")
    // the h column is the e4 selection hash — spot-pin one value so a
    // salt drift between e4 and st11 cannot pass silently
    assert(byDoc(4L).getLong(3) === 188365L)
  }

  // ---- pin 11: d17 on a corpus with NO eval docs (no doc_id is a
  //      multiple of DecontamEvalMod=50 among ids 1..30) must return
  //      an EMPTY report — not throw, not fabricate rows (the
  //      bloom-of-zero-grams and empty-shared-set paths)
  test("d17 contamination report: no eval docs -> empty report, no throw") {
    assert(run("d17_contamination_report").count() === 0L)
  }

  // ---- pin 12: d18's containment on the dup/near-dup cluster —
  //      the EXACT dup pair (14,15) is fully mutually contained
  //      (c12 = c21 = 1.0, contained = lower id on the size tie) and
  //      the near-dup 16 ("leaps" for "jumps") intersects 6 of 8
  //      shingles with each (0.75 ≥ the 0.6 threshold); nothing else
  //      in the corpus may pair
  test("d18 containment: dup pair fully contained, near-dup at 6/8") {
    val rows = run("d18_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(rows.keySet === Set((14L, 15L), (14L, 16L), (15L, 16L)))
    val dup = rows((14L, 15L))
    assert(dup.getDouble(5) === 1.0 && dup.getDouble(6) === 1.0)
    assert(dup.getLong(7) === 14L, "size tie -> lower id is contained")
    for (p <- Seq((14L, 16L), (15L, 16L))) {
      assert(rows(p).getLong(4) === 6L && rows(p).getLong(2) === 8L)
      assert(rows(p).getDouble(5) === 0.75 && rows(p).getDouble(6) === 0.75)
    }
  }

  test("d22 containment recall: every pathological true pair recovered") {
    val rows = run("d22_containment_recall").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    rows.foreach { case (b, t) => info(s"bucket $b: $t") }
    // the only containment pairs in the corpus are the 14/15/16
    // dup/near-dup triangle (same-size: ratio bucket 1); both channels
    // and the exact truth agree — recall 1.0, nothing missed
    assert(rows === Map(1L -> (3L, 3L, 0L, 1000000L)))
    // internal consistency with d18: found == the live containment set
    assert(rows.values.map(_._2).sum === run("d18_containment").count())
  }

  // ---- pin 13: d19's overlap matrix — webA and webB share exactly
  //      the fox-sentence 5-gram shingles (the dup pair 14/15 spans
  //      the sources): 5 shared of 44 vs 8 distinct shingles,
  //      Jaccard-micro 5e6 div 47 = 106382
  test("d19 source overlap: the fox shingles bridge webA and webB") {
    val rows = run("d19_source_overlap").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "webA" && r.getString(1) === "webB")
    assert(r.getLong(2) === 5L && r.getLong(3) === 44L &&
      r.getLong(4) === 8L)
    assert(r.getLong(5) === 106382L)
  }

  // ---- pin 14: t14's pair counts under the counting trick — the
  //      5000-char single word contributes 4999 (x,x) pairs from ONE
  //      vocabulary row (freq 1), rank 1 by a mile; (o,r) from the
  //      repeated word/world/words family is rank 2 at 207
  test("t14 bpe pairs: the giant token dominates via one vocab row") {
    val rows = run("t14_bpe_pairs").collect()
      .map(r => r.getInt(3) -> r).toMap
    val top = rows(1)
    assert(top.getString(0) === "x" && top.getString(1) === "x" &&
      top.getLong(2) === 4999L)
    val second = rows(2)
    assert(second.getString(0) === "o" && second.getString(1) === "r" &&
      second.getLong(2) === 207L)
  }

  // ---- pin 15: t15's fit sweep — token conservation holds on the
  //      pathological corpus (495 total at every len; the null doc is
  //      a zero-token fit, never NULL), and at len 128 exactly one
  //      doc truncates (doc 23's 200 "word" tokens, losing 72)
  test("t15 context fit: conservation + the one long doc truncates") {
    val rows = run("t15_context_fit").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(128L, 512L, 2048L, 8192L))
    rows.values.foreach(r =>
      assert(r.getLong(3) + r.getLong(4) === 495L, "token conservation"))
    val l128 = rows(128L)
    assert(l128.getLong(1) === 29L && l128.getLong(2) === 1L)
    assert(l128.getLong(4) === 72L && l128.getLong(5) === 3417L)
    assert(rows(512L).getLong(2) === 0L, "every doc fits at 512")
  }

  // ---- pin 16: t16's OOV report — the 16-word head covers most of
  //      webA (16.2% OOV of 388 words) but the small webB source is
  //      58.3% OOV (its digits and singletons miss the head); the
  //      micro shares are exact integer division
  test("t16 oov rate: per-source OOV shares are exact") {
    val rows = run("t16_oov_rate").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("webA")
    assert(a.getLong(1) === 388L && a.getLong(2) === 63L &&
      a.getLong(3) === 162371L)
    val b = rows("webB")
    assert(b.getLong(1) === 36L && b.getLong(2) === 21L &&
      b.getLong(3) === 583333L)
  }

  // ---- pin 17: e6's training order over pin 8's 8 train survivors —
  //      the full (h, doc_id) rank is pinned (salt drift, hash-width
  //      drift, or a bucket-arithmetic bug all break the sequence),
  //      one h value spot-pinned, all 8 in chunk 0 at chunkDocs=100
  test("e6 training order: the admitted pool's exact epoch order") {
    val rows = run("e6_training_order").collect()
    assert(rows.map(r => r.getLong(0)).toSeq ===
      Seq(26L, 30L, 23L, 16L, 12L, 10L, 14L, 28L),
      "epoch order must be the pinned salted-hash rank")
    assert(rows.map(r => r.getLong(3)).toSeq === (0L to 7L),
      "positions are the contiguous global rank")
    assert(rows.forall(_.getLong(4) === 0L), "one chunk at chunkDocs=100")
    assert(rows.head.getLong(2) === 182739794328090593L,
      "ord-salt hash spot pin (doc 26)")
  }

  // ---- pin 18: d20's sweep over the planted dup cluster — at cuts
  //      up to 600000 all three pairs qualify (the near-dups sit at
  //      jaccard exactly 0.6) and docs {15, 16} are droppable; from
  //      700000 only the exact dup (14,15) survives, dropping doc 15
  test("d20 sweep: the dup cluster's threshold response is exact") {
    val rows = run("d20_threshold_sweep")
      .collect().map(r => r.getAs[Long]("threshold_micro") -> r).toMap
    assert(rows.keySet ===
      graft.dedup.DedupQueries.SweepThresholdsMicro.toSet)
    for (t <- Seq(300000L, 400000L, 500000L, 600000L)) {
      assert(rows(t).getAs[Long]("n_pairs") === 3L, s"cut $t pairs")
      assert(rows(t).getAs[Long]("n_docs_droppable") === 2L)
      assert(rows(t).getAs[Long]("drop_share_micro") === 66666L)
    }
    for (t <- Seq(700000L, 800000L, 900000L)) {
      assert(rows(t).getAs[Long]("n_pairs") === 1L,
        s"cut $t must keep only the exact dup")
      assert(rows(t).getAs[Long]("n_docs_droppable") === 1L)
      assert(rows(t).getAs[Long]("drop_share_micro") === 33333L)
    }
  }

  // ---- pin 19: s9's recall report on the fixture embeddings — a
  //      committed regression gate on BOTH approximate indexes' actual
  //      quality (a silently degraded banding or probe selection moves
  //      these numbers before any oracle notices)
  test("s9 ann recall: index quality pinned") {
    val rows = run("s9_ann_recall").collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    // 35 -> 43 hits when the degenerate 7-plane family was replaced
    // with independent md5 planes (r14, the d25 finding): the 16-bit
    // signature previously carried only 7 informative bits
    assert(rows("lsh").getAs[Long]("n_hits") === 43L)
    assert(rows("lsh").getAs[Long]("recall_micro") === 430000L)
    assert(rows("ivf").getAs[Long]("n_hits") === 31L)
    assert(rows("ivf").getAs[Long]("recall_micro") === 310000L)
    rows.values.foreach(r => assert(r.getAs[Long]("n_truth") === 100L &&
      r.getAs[Long]("n_returned") === 100L))
  }

  // ---- pin 20: t17's readability on the pathological corpus — webA
  //      scores only 15 of 19 docs (null/empty/whitespace/CJK docs
  //      have zero [a-z0-9] words → NULL, counted-never-averaged) and
  //      both mins are NEGATIVE (run-on docs), pinning the
  //      truncating-div-on-negatives parity (DuckDB // vs Spark div)
  test("t17 readability: null-word docs excluded, negative mins exact") {
    val rows = run("t17_readability").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("webA")
    assert(a.getLong(1) === 19L && a.getLong(2) === 15L)
    assert(a.getLong(3) === 65309488L)
    assert(a.getLong(4) === -80765000L && a.getLong(5) === 177565000L)
    val b = rows("webB")
    assert(b.getLong(1) === 11L && b.getLong(2) === 11L)
    assert(b.getLong(3) === 67795125L)
    assert(b.getLong(4) === -47980000L && b.getLong(5) === 205820000L)
  }

  // ---- pin 21: e7's effective-token accounting — each source carries
  //      exactly one non-canonical near-dup (docs 4/5 exact "word"
  //      twins land in one d6 cluster; 14/15/16 fox docs in another;
  //      d13's quality+id tiebreak drops one per source), and the
  //      dup-token arithmetic survives the null/zero-token docs
  test("e7 effective tokens: cluster-droppee accounting exact") {
    val rows = run("e7_effective_tokens").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("webA")
    assert(a.getLong(1) === 19L && a.getLong(2) === 423L)
    assert(a.getLong(3) === 1L && a.getLong(4) === 9L)
    assert(a.getLong(5) === 414L && a.getLong(6) === 21276L)
    val b = rows("webB")
    assert(b.getLong(1) === 11L && b.getLong(2) === 72L)
    assert(b.getLong(3) === 1L && b.getLong(4) === 9L)
    assert(b.getLong(5) === 63L && b.getLong(6) === 125000L)
  }

  // ---- pin 22: e8's release manifest — the null-text doc is COUNTED
  //      (n_null_text=1, hashed as md5('')) and the '__total__' row's
  //      order-invariant checksum folds the per-source residues
  test("e8 release manifest: null payload counted, checksum pinned") {
    val rows = run("e8_release_manifest").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("__total__").getLong(1) === 30L)
    assert(rows("__total__").getLong(2) === 1L)
    assert(rows("__total__").getLong(3) === 495L)
    assert(rows("__total__").getLong(6) === 702234031156558236L)
    assert(rows("webA").getLong(6) === 268371713530711705L)
    assert(rows("webB").getLong(6) === 433862317625846531L)
  }

  // ---- pin 23: st13's streaming quality monitor — the emoji doc (8)
  //      and the control-chars doc (20) sit >0.15 under their source
  //      baseline and flag is_low; the delta's zero-word docs stay
  //      in-frame unflagged (conservative NULL posture)
  test("st13 stream quality monitor: outlier flags pinned") {
    val rows = run("st13_stream_quality_monitor").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(4L, 8L, 12L, 16L, 20L, 24L, 28L))
    assert(rows(8L).getLong(2) === 8000L &&
      rows(8L).getLong(3) === 303902L && rows(8L).getLong(4) === 1L)
    assert(rows(20L).getLong(2) === 97714L && rows(20L).getLong(4) === 1L)
    assert(Seq(4L, 12L, 16L, 24L, 28L)
      .forall(id => rows(id).getLong(4) === 0L))
  }

  // ---- pin 24: d21's recall audit — the pathological corpus's three
  //      true pairs (the fox triangle: 14-15 exact dups plus both
  //      near-dup edges to 16; the 1-word "word" twins have no 2-word
  //      shingles and fall out of base, as in d2) are ALL recovered by
  //      the banded index (recall 1.0, NULL mean missed — the
  //      no-misses null posture)
  test("d21 lsh recall: all pathological true pairs recovered") {
    val r = run("d21_lsh_recall").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 1000000L)
    assert(r.isNullAt(4))
  }

  // ---- pin 25: e9's quality-stratified buckets — the admitted webA
  //      pool's one long doc (23: "word " x 200) dominates decile 7
  //      (300 of 347 tokens, cum-from-top = its own bucket) and the
  //      per-source shares fold within truncation of 1e6
  test("e9 curriculum buckets: pathological pool's decile layout exact") {
    val rows = run("e9_curriculum_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(rows.keySet === Set(("webA", 4L), ("webA", 5L), ("webA", 6L),
      ("webA", 7L), ("webB", 5L), ("webB", 6L)))
    val top = rows(("webA", 7L))
    assert(top.getLong(2) === 2L && top.getLong(3) === 300L)
    assert(top.getLong(4) === 300L && top.getLong(5) === 864553L)
    assert(rows(("webB", 5L)).getLong(5) === 700000L)
  }

  // ---- pin 26: s11's cluster report survives the fixture embeddings
  //      (one cluster's worst member sits at NEGATIVE cohesion — the
  //      report must carry it, not clamp it)
  test("s11 cluster report: negative worst-cohesion carried exactly") {
    val rows = run("s11_cluster_report").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    assert(rows.values.map(_.getLong(1)).sum === 500L)
    assert(rows(2L).getLong(3) === -9130L, "negative min cohesion")
    assert(rows(0L).getLong(4) === 3L &&
      rows(0L).getLong(5) === -166371L)
  }

  // ---- pin 27: s12's compressed-index recall — the PQ/IVFADC misses
  //      are code-DISTORTION misses (s9's are candidate starvation);
  //      a silently degraded codebook build moves these before any
  //      oracle notices
  test("s12 pq recall: compressed-index quality pinned") {
    val rows = run("s12_pq_recall").collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows("pq").getAs[Long]("n_hits") === 32L)
    assert(rows("pq").getAs[Long]("recall_micro") === 320000L)
    assert(rows("ivfadc").getAs[Long]("n_hits") === 31L)
    assert(rows("ivfadc").getAs[Long]("recall_micro") === 310000L)
    rows.values.foreach(r => assert(r.getAs[Long]("n_truth") === 100L &&
      r.getAs[Long]("n_returned") === 100L))
  }

  // ---- pin 28: s10's range search on the fixture embeddings — every
  //      query's 0.5/0.8 shells are EMPTY (random 64-dim cosines) and
  //      stay in-frame as zero rows with NULL max / -1 nearest, while
  //      the 0.2 shell counts the LSH-candidate noise tail exactly
  test("s10 range search: empty shells in-frame, noise shell pinned") {
    val rows = run("s10_range_search").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(rows.size === 30)
    for (((_, radius), r) <- rows if radius >= 500000L) {
      assert(r.getLong(2) === 0L && r.isNullAt(3) && r.getLong(4) === -1L)
    }
    // 79 -> 105 candidate-tail neighbors under the independent md5
    // plane family (r14): more genuine buckets -> more low-cos
    // candidates surviving into the 0.2 shell
    assert(rows.values.map(_.getLong(2)).sum === 105L)
    val q0 = rows((0L, 200000L))
    assert(q0.getLong(2) === 14L && q0.getDouble(3) === 0.315127 &&
      q0.getLong(4) === 225L)
  }

  // ---- pin 29: q33's funnel on the fixture events — every one of the
  //      15 users converts at every step (conv_*_micro saturate at 1e6,
  //      step-1 lag is NULL), and the mean-gap second-truncation
  //      arithmetic is exact
  test("q33 funnel: full-conversion fixture pinned") {
    val rows = run("q33_funnel").collect()
      .map(r => r.getAs[String]("step") -> r).toMap
    assert(rows.size === 3)
    rows.values.foreach(r => assert(r.getAs[Long]("n_users") === 15L &&
      r.getAs[Long]("conv_first_micro") === 1000000L))
    assert(rows("1_view").isNullAt(2) && rows("1_view").isNullAt(4))
    assert(rows("2_click").getAs[Long]("conv_prev_micro") === 1000000L)
    assert(rows("2_click").getAs[Long]("mean_gap_sec_micro")
      === 159863866666L)
    assert(rows("3_purchase").getAs[Long]("mean_gap_sec_micro")
      === 169561000000L)
  }

  // ---- pin 30: q34's retention matrix — the day-0 diagonal is always
  //      a full cohort by construction, later offsets decay exactly
  test("q34 retention: cohort day-0 full, decay exact") {
    val rows = run("q34_retention_cohorts").collect()
    assert(rows.length === 30)
    assert(rows.map(_.getAs[Long]("n_active")).sum === 397L)
    val byKey = rows.map(r =>
      (r.getAs[java.sql.Date]("cohort_date").toString,
        r.getAs[Long]("day_offset")) -> r).toMap
    val d0 = byKey(("2024-01-01", 0L))
    assert(d0.getAs[Long]("n_active") === 15L &&
      d0.getAs[Long]("cohort_n") === 15L &&
      d0.getAs[Long]("retention_micro") === 1000000L)
    assert(byKey(("2024-01-01", 1L)).getAs[Long]("retention_micro")
      === 933333L)
  }

  // ---- pin 31: s13's truncated-dim recall on the clustered fixture —
  //      recall is MONOTONE in prefix width and collapses hard at
  //      8/64ths (the fixture's discriminating dims live in the tail)
  test("s13 matryoshka recall: monotone in width, exact counts") {
    val rows = run("s13_matryoshka_recall").collect()
      .map(r => r.getAs[Long]("trunc_dims") -> r).toMap
    assert(rows.keySet === Set(8L, 16L, 32L))
    rows.values.foreach(r => assert(r.getAs[Long]("n_truth") === 100L &&
      r.getAs[Long]("n_returned") === 100L))
    assert(rows(8L).getAs[Long]("n_hits") === 10L)
    assert(rows(16L).getAs[Long]("n_hits") === 22L)
    assert(rows(32L).getAs[Long]("n_hits") === 30L)
  }

  // ---- pin 32: t18's fertility — the zero-word CJK doc yields NULL
  //      fertility (never a divide-by-zero throw) with its 13 BPE-ish
  //      tokens intact, multi-byte chars split bytes from chars
  //      (ja: 40 bytes over 14 chars), and webB/en's 5000-char token
  //      monster blows chars_per_token to ~89
  test("t18 fertility: zero-word NULL, multibyte + monster-token exact") {
    val rows = run("t18_tokenizer_fertility").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r)
      .toMap
    assert(rows.size === 7)
    val ja = rows(("webA", "ja"))
    assert(ja.getAs[Long]("n_words") === 0L &&
      ja.isNullAt(ja.fieldIndex("fertility_micro")) &&
      ja.getAs[Long]("n_tokens") === 13L &&
      ja.getAs[Long]("n_chars") === 14L && ja.getAs[Long]("n_bytes") === 40L)
    val en = rows(("webB", "en"))
    assert(en.getAs[Long]("chars_per_token_micro") === 89068965L &&
      en.getAs[Long]("fertility_micro") === 2230769L)
  }

  // ---- pin 33: d23's block scrub — the cross-source exact twins
  //      (docs 4/5) and the repeated fox docs (14/15) are scrubbed to
  //      retained=0; null/empty/whitespace docs stay in-frame with 0
  //      blocks and NULL retained share; corpus totals exact
  test("d23 block scrub: twins scrubbed, null docs in-frame, totals") {
    val rows = run("d23_block_scrub").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size === 30)
    assert(rows.values.map(_.getAs[Long]("n_dup_blocks")).sum === 4L)
    assert(rows.values.map(_.getAs[Long]("removed_words")).sum === 20L)
    for (id <- Seq(4L, 5L)) {
      val r = rows(id)
      assert(r.getAs[Long]("n_blocks") === 1L &&
        r.getAs[Long]("removed_words") === 1L &&
        r.getAs[Long]("retained_micro") === 0L)
    }
    for (id <- Seq(14L, 15L))
      assert(rows(id).getAs[Long]("removed_words") === 9L &&
        rows(id).getAs[Long]("retained_micro") === 0L)
    val nullDoc = rows(1L)
    assert(nullDoc.getAs[Long]("n_blocks") === 0L &&
      nullDoc.isNullAt(nullDoc.fieldIndex("retained_micro")))
  }

  // ---- pin 34: e10's resume manifest — the 357-token fixture pool
  //      fits in ONE shard, so every checkpoint lands in (0,0) with
  //      zero shards/docs behind and tokens_into_shard = the target
  //      itself (the inside-first-shard edge); grid exact
  test("e10 resume manifest: single-shard pool, cursor arithmetic") {
    val rows = run("e10_resume_manifest").collect()
      .map(r => r.getAs[Long]("checkpoint_pct") -> r).toMap
    assert(rows.keySet === Set(10L, 25L, 50L, 75L, 90L))
    for ((pct, r) <- rows) {
      assert(r.getAs[Long]("macro_shard") === 0L &&
        r.getAs[Long]("shard_seq") === 0L &&
        r.getAs[Long]("shards_done") === 0L &&
        r.getAs[Long]("docs_done") === 0L &&
        r.getAs[Long]("cum_start") === 0L)
      assert(r.getAs[Long]("token_target") === 357L * pct / 100L &&
        r.getAs[Long]("tokens_into_shard") ===
          r.getAs[Long]("token_target"))
    }
  }

  // ---- pin 35: st14's block admissions — only the 16 blocks of the
  //      delta docs emit (empty/short docs emit nothing), and exactly
  //      one block is a cross-corpus repeat: delta doc 4's lone "word"
  //      block already lives in static doc 5
  test("st14 block admissions: one cross-corpus repeat pinned") {
    val rows = run("st14_stream_block_scrub").collect()
    assert(rows.length === 16)
    assert(rows.map(_.getAs[Long]("nw")).sum === 119L)
    val dups = rows.filter(_.getAs[Long]("is_dup") === 1L)
    assert(dups.length === 1)
    assert(dups.head.getAs[Long]("doc_id") === 4L &&
      dups.head.getAs[Long]("block_idx") === 0L &&
      dups.head.getAs[Long]("nw") === 1L)
  }

  // ---- pin 36: s14's SQ8 grade — the clustered fixture survives
  //      byte quantization with PERFECT recall (contrast pin 31: the
  //      same corpus loses 90% under 8-dim truncation — compression
  //      by precision beats compression by dimension here)
  test("s14 sq8 recall: perfect on the clustered fixture") {
    val rows = run("s14_sq_recall").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("method") === "sq8" &&
      r.getAs[Long]("n_truth") === 100L &&
      r.getAs[Long]("n_returned") === 100L &&
      r.getAs[Long]("n_hits") === 100L &&
      r.getAs[Long]("recall_micro") === 1000000L)
  }

  // ---- pin 37: q35's attribution on the fixture events (copied from
  //      sf0.001) — a zero-attribution day must carry NULL mean lag
  //      (not 0), a fully-attributed day pins the decimal value sum,
  //      and the totals pin the whole last-touch replay
  test("q35 attribution: zero-day NULL mean, full-day pinned, totals") {
    val rows = run("q35_attribution").collect()
    assert(rows.length === 30)
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === 202L)
    assert(rows.map(_.getAs[Long]("n_attributed")).sum === 173L)
    val byDay = rows.map(r => r.getDate(0).toString -> r).toMap
    val d1 = byDay("2024-01-01")
    assert(d1.getAs[Long]("n_attributed") === 0L &&
      d1.getAs[Long]("attr_share_micro") === 0L &&
      d1.getAs[Double]("attr_value") === 0.0 &&
      d1.isNullAt(d1.fieldIndex("mean_lag_sec_micro")))
    val d8 = byDay("2024-01-08")
    assert(d8.getAs[Long]("n_purchases") === 5L &&
      d8.getAs[Long]("attr_share_micro") === 1000000L &&
      d8.getAs[Double]("attr_value") === 441.09)
  }

  // ---- pin 38: t19's label-noise audit — the unicode/null corpus is
  //      marker-poor (most docs predict 'und', which must NOT count as
  //      disagreement), and webB's single real mislabel lands in the
  //      disagree share with the und-excluded denominator
  test("t19 label noise: und excluded from disagreement, webB mislabel") {
    val rows = run("t19_lang_label_noise").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet === Set("webA", "webB"))
    val a = rows("webA")
    assert(a.getAs[Long]("n_docs") === 19L &&
      a.getAs[Long]("n_und") === 15L &&
      a.getAs[Long]("n_disagree") === 0L &&
      a.getAs[Long]("und_share_micro") === 789473L &&
      a.getAs[Long]("disagree_share_micro") === 0L)
    val b = rows("webB")
    assert(b.getAs[Long]("n_docs") === 11L &&
      b.getAs[Long]("n_und") === 8L &&
      b.getAs[Long]("n_disagree") === 1L &&
      b.getAs[Long]("disagree_share_micro") === 333333L,
      "1 of 3 evidence-bearing webB docs disagrees with its label")
  }

  // ---- pin 39: s15's multi-probe grade — the 1-bit-flip probes lift
  //      recall 43% -> 95% at 3.4x the candidates on the fixture
  //      embeddings (the report's reason to exist: the knob works and
  //      its cost is visible). Under the r14 independent-plane fix the
  //      probe lift is dramatically larger than under the degenerate
  //      family (35%->61% before): with only 7 real planes, flipping a
  //      bit often reproduced an existing bucket; with 16 independent
  //      bits every probe reaches genuinely new candidates.
  test("s15 multiprobe: probes buy 52 points of recall at 3.4x pairs") {
    val rows = run("s15_multiprobe_recall").collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    val band = rows("lsh_band")
    assert(band.getAs[Long]("n_hits") === 43L &&
      band.getAs[Long]("recall_micro") === 430000L &&
      band.getAs[Long]("n_cand_pairs") === 1119L)
    val multi = rows("lsh_multiprobe")
    assert(multi.getAs[Long]("n_hits") === 95L &&
      multi.getAs[Long]("recall_micro") === 950000L &&
      multi.getAs[Long]("n_cand_pairs") === 3842L)
    rows.values.foreach(r => assert(r.getAs[Long]("n_truth") === 100L &&
      r.getAs[Long]("n_returned") === 100L))
  }

  // ---- pin 40: q36's SCD2 reconstruction on the fixture events —
  //      the island collapse is pinned by total interval count (802
  //      intervals over 1000 events = 198 collapsed same-type runs)
  //      and the partition contract (one open interval per user)
  test("q36 scd2: island collapse and open-interval contract pinned") {
    val rows = run("q36_scd2_history").collect()
    assert(rows.length === 802)
    assert(rows.map(_.getAs[Long]("n_events")).sum === 1000L)
    assert(rows.count(_.getAs[Long]("is_current") == 1L) === 15,
      "one open interval per user, 15 users")
    assert(rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap ===
      Map("click" -> 165, "error" -> 165, "purchase" -> 157,
        "signup" -> 155, "view" -> 160))
  }

  // ---- breadth: the full judge-re-run battery completes with the
  //      pinned cardinalities (an NPE/ANSI throw anywhere fails here)
  test("adversarial corpus: full family battery row counts") {
    val expected = Map(
      "t1_token_stats" -> 7L, "t4_fingerprints" -> 30L,
      "t5_pii_scrub" -> 150L, "t6_repetition" -> 26L,
      "d1_exact_dedup" -> 30L, "mm3_resized" -> 30L,
      "st4_stream_quality_scrub" -> 30L,
      "st5_stream_decontaminate" -> 0L,
      "st7_stream_fuzzy_flag" -> 0L)
    for ((name, n) <- expected)
      assert(run(name).count() === n, s"$name cardinality")
  }

  // ---- coverage invariant: every registered query is CLASSIFIED for
  //      adversarial coverage, so a future round can't add operators
  //      the null/unicode sweep silently never sees. Three disjoint
  //      classes, together exactly the registry:
  //      1. value-pinned here (a test above runs the query on this
  //         corpus and asserts judge-verified rows / cardinalities);
  //      2. sf0.01-pinned VALUES oracles — their oracle is a constant
  //         valid only at the driver's sf, so an adversarial-corpus
  //         hash compare is mismatched BY DESIGN (the 4 documented
  //         sweep mismatches + g4, same contract);
  //      3. sweep-covered: DuckDB hash-exact in the offline
  //         full-portfolio adversarial sweep (tools/make_adversarial.py
  //         -> Verify -> check_oracle; last full run 2026-08-16,
  //         146/151 — the 5 mismatches are exactly class 2), with no
  //         committed per-value pin.
  //      Adding a query without classifying it fails this test.

  /** Queries a test above runs against this corpus (mirror of the
    * `run(...)` calls + the family-battery map). */
  private val pinnedHere: Set[String] = Set(
    "t2_quality_scores", "d16_corpus_diff", "d15_bloom_decontamination",
    "mm1_media_features", "mm2_frame_samples", "mm4_media_dedup",
    "d4_ngram_jaccard", "st10_stream_pipeline_admission",
    "e2_corpus_card", "e3_shard_manifest", "e4_mixture_manifest",
    "st11_stream_mixture_sampler", "d17_contamination_report",
    "d18_containment", "d19_source_overlap", "t14_bpe_pairs",
    "t15_context_fit", "t16_oov_rate", "e6_training_order",
    "d20_threshold_sweep", "s9_ann_recall", "t17_readability",
    "e7_effective_tokens", "e8_release_manifest",
    "st13_stream_quality_monitor", "d21_lsh_recall",
    "d22_containment_recall",
    "q33_funnel", "q34_retention_cohorts", "s13_matryoshka_recall",
    "t18_tokenizer_fertility", "d23_block_scrub", "e10_resume_manifest",
    "st14_stream_block_scrub", "s14_sq_recall",
    "q35_attribution", "t19_lang_label_noise", "s15_multiprobe_recall",
    "q36_scd2_history", "d24_substring_recall",
    "d25_embedding_lsh_recall", "d26_lsh_geometry_sweep",
    "e9_curriculum_buckets", "s11_cluster_report", "s12_pq_recall",
    "s10_range_search",
    // family battery (row-count pins)
    "t1_token_stats", "t4_fingerprints", "t5_pii_scrub", "t6_repetition",
    "d1_exact_dedup", "mm3_resized", "st4_stream_quality_scrub",
    "st5_stream_decontaminate", "st7_stream_fuzzy_flag")

  /** sf0.01-pinned VALUES oracles (documented exemptions). */
  private val sfPinnedOracles: Set[String] = Set(
    "m4_semantic_type_predictions", "m7_pairwise_features",
    "m8_bagged_predictions", "q21_approx_distinct", "g4_learned_types",
    // t20/t21: iterative global-argmax induction (and its application)
    // is not one DuckDB statement (recursive CTEs cannot aggregate over
    // their own recursive reference); the oracles are sf0.01 VALUES
    // pins generated by the INDEPENDENT tools/bpe_reference.py
    // (--sql / --apply), and BpeSpec pins a hand-computed fixture
    // merge list + tokenize round-trip
    "t20_bpe_vocab", "t21_bpe_tokenize")

  /** Hash-exact in the offline sweep, no committed per-value pin. */
  private val sweepCovered: Set[String] = Set(
    // d27: hash-exact at sf0.001/0.01/0.1 and at sf1 (r15 sweep) — the
    // geometry-in-SQL twin (ndGeometrySqlCase) tracks the engine at
    // any corpus size, so no sf pin and no brute bound; the planted
    // value grade (exact + cos-0.97 dups across the delta/index
    // boundary, tie-break, background admission) is DeltaAdmissionSpec
    "d27_delta_admission",
    "p16_approx_fds",
    "p15_heavy_hitters", "mm5_modality_manifest", "e11_shard_integrity",
    "d10_substring_windows", "d11_semantic_dedup", "d12_fuzzy_decontamination",
    "d13_cluster_canonical", "d14_incremental_dedup", "d2_minhash_lsh",
    "d3_simhash", "d5_embedding_neardup", "d6_dup_clusters",
    "d7_decontamination", "d8_leakage_safe_split", "d9_embedding_clusters",
    "e1_training_pipeline", "e5_epoch_plan", "g1_semantic_models",
    "g2_alignment_graph", "g3_model_evaluation", "m10_lexical_features",
    "m1_knn_name_features", "m2_min_class_distance", "m3_char_cosine_features",
    "m5_resample_counts", "m6_matcher_eval", "m9_word_tf",
    "p10_column_correlation", "p11_quantile_profile", "p12_key_discovery",
    "p13_profile_drift", "p14_embedding_profile", "p1_profile_customer",
    "p2_profile_documents", "p3_profile_orders", "p4_numeric_stats",
    "p5_inferred_types", "p6_profile_part", "p7_inclusion_deps",
    "p8_inclusion_deps_approx", "p9_functional_deps", "q10_customers_without_final_orders",
    "q11_nations_cust_and_supp", "q12_events_daily", "q13_events_props",
    "q14_orders_by_month", "q15_part_type_volume", "q16_event_deltas",
    "q17_moving_avg", "q18_priority_count", "q19_rollup_revenue",
    "q1_pricing_summary", "q20_salted_agg", "q22_asof_join",
    "q23_range_join", "q24_sessionize", "q25_bucketed_join",
    "q26_partition_pruned", "q27_percentiles", "q28_pivot",
    "q29_latest_snapshot", "q2_filter_project", "q30_cube",
    "q31_grouping_sets", "q32_skyline", "q3_top_customers",
    "q5_nation_revenue", "q6_revenue_delta", "q7_distinct_parts",
    "q8_window_top_orders", "q9_customers_with_open_orders", "s1_ann_bruteforce",
    "s2_ann_lsh", "s3_ann_ivf", "s4_kmeans_embeddings",
    "s5_ann_ivf_kmeans", "s6_ann_pq", "s7_ann_ivfadc",
    "s8_knn_graph", "st12_stream_oov_monitor", "st1_stream_event_rollup",
    "st2_stream_sessions", "st3_stream_distinct_docs", "st6_stream_semantic_flag",
    "st8_stream_incremental_dedup", "st9_stream_drift_monitor", "t10_word_rarity",
    "t11_importance_weights", "t12_lm_perplexity", "t13_boilerplate",
    "t3_lang_id", "t7_mixture_sample", "t8_sequence_pack",
    "t9_gopher_rules")

  test("every registered query has an adversarial-coverage classification") {
    val all = SparkEntry.queries.keySet
    val classes = Seq(
      "pinnedHere" -> pinnedHere,
      "sfPinnedOracles" -> sfPinnedOracles,
      "sweepCovered" -> sweepCovered)
    for {
      ((na, a), i) <- classes.zipWithIndex
      (nb, b) <- classes.drop(i + 1)
    } assert((a & b).isEmpty, s"$na and $nb overlap: ${a & b}")
    val classified = classes.map(_._2).reduce(_ ++ _)
    assert((all -- classified).isEmpty,
      "new queries need a pin here, a documented sf-pin exemption, or a " +
        s"sweep run + listing: ${(all -- classified).toSeq.sorted}")
    assert((classified -- all).isEmpty,
      s"stale classification entries: ${(classified -- all).toSeq.sorted}")
  }

  // ---- SCALE-behavior register (the r13 verdict's "name the sf-pin
  //      class in one place"): at corpus scales ABOVE the driver's
  //      correctness sf (the PERF.md sf1 oracle legs), every query is
  //      either SCALE-STABLE (its oracle twin recomputes from the data,
  //      so hash-exact at any sf — 141/150 measured hash-exact at sf1
  //      in r13) or an EXPECTED MISMATCH with a documented reason.
  //      The register below holds the second class; everything not in
  //      it claims scale-stability, and the invariant test forces any
  //      NEW sf-pinned oracle to classify its scale behavior here
  //      before it can ship.
  private val sfExpectedMismatch: Map[String, String] = Map(
    "m4_semantic_type_predictions" -> ("RF model + bounded sample are " +
      "corpus-dependent; the oracle pins the sf0.01 predictions"),
    "m6_matcher_eval" -> ("evaluates the sf-trained model — accuracy " +
      "rows pinned at the driver sf"),
    "m7_pairwise_features" -> ("pairwise features of the sf-trained " +
      "model's sample — VALUES pin at the driver sf"),
    "m8_bagged_predictions" -> ("bag scores of the sf-trained model — " +
      "VALUES pin at the driver sf"),
    "q21_approx_distinct" -> ("HLL estimates are sketch-exact but " +
      "data-dependent; the oracle pins the sf0.01 estimates (DuckDB's " +
      "HLL differs structurally)"),
    "g4_learned_types" -> ("learned candidates of the sf-trained " +
      "matcher — VALUES pin at the driver sf"),
    "t20_bpe_vocab" -> ("merge list induced from the sf0.01 dict — " +
      "VALUES pin from tools/bpe_reference.py"),
    "t21_bpe_tokenize" -> ("per-source fertility under the sf0.01 " +
      "vocab — VALUES pin from tools/bpe_reference.py --apply"),
    "d5_embedding_neardup" -> ("brute-force twin DECLARED valid only " +
      "<= NearDupBruteMax vectors; above the gate the engine is " +
      "approximate by design (graded by d25 + EmbeddingLshRecallSpec)"),
    "s8_knn_graph" -> ("same declared brute bound as d5 — the shared " +
      "embedding pair channel is approximate above the gate"),
    "d9_embedding_clusters" -> ("same declared brute bound as d5 (the " +
      "cluster twin enumerates brute pairs, valid only <= " +
      "NearDupBruteMax); at scale the executed replacements are " +
      "graft.Check d9_consistency plus the d25-graded pair channel"))

  /** Machine-checkable register reasons (the r14 verdict #7): every
    * replacement check a reason CITES is named here and resolved —
    * `query:` against SparkEntry.queries, `spec:` via Class.forName on
    * the test classpath, `check:` against [[graft.Check.KnownChecks]],
    * `file:` against the repo tree — so a renamed audit, spec, check
    * or tool cannot silently orphan the reason that points at it. */
  private val registerArtifacts: Map[String, Seq[String]] = Map(
    "d5_embedding_neardup" -> Seq("query:d25_embedding_lsh_recall",
      "spec:graft.dedup.EmbeddingLshRecallSpec"),
    "s8_knn_graph" -> Seq("query:d25_embedding_lsh_recall",
      "spec:graft.dedup.EmbeddingLshRecallSpec"),
    "d9_embedding_clusters" -> Seq("check:d9_consistency",
      "query:d25_embedding_lsh_recall"),
    "t20_bpe_vocab" -> Seq("file:tools/bpe_reference.py"),
    "t21_bpe_tokenize" -> Seq("file:tools/bpe_reference.py"))

  test("every sf-pinned oracle classifies its scale behavior in the " +
      "sfExpectedMismatch register") {
    val all = SparkEntry.queries.keySet
    assert((sfExpectedMismatch.keySet -- all).isEmpty,
      s"stale register entries: ${(sfExpectedMismatch.keySet -- all).toSeq.sorted}")
    // every VALUES-pinned oracle MUST declare its scale class — an
    // sf-pinned oracle that silently claims scale-stability would turn
    // the next sf1 leg's mismatch into an undiagnosed failure
    val unclassifiedPins = sfPinnedOracles -- sfExpectedMismatch.keySet
    assert(unclassifiedPins.isEmpty,
      s"sf-pinned oracles with no scale classification: $unclassifiedPins")
    // reasons are real sentences, not placeholders
    sfExpectedMismatch.values.foreach(r => assert(r.length > 20))
    // BRUTE-BOUND scan (the r14 verdict #2): any twin that DECLARES a
    // validity bound in its SQL ("valid [only] while ...") is by
    // definition out of contract above that bound, so it must be in
    // the register — a bounded twin that silently claimed
    // scale-stability would turn the next sf1 leg's mismatch into an
    // undiagnosed failure. The scan keys off the literal marker the
    // three bounded twins carry (d5/d9/s8), so a NEW bounded twin is
    // forced here the moment its SQL documents its bound.
    val bruteBounded = SparkEntry.oracleSql.collect {
      // [\s-]+ so the marker matches across a SQL-comment line break
      // ("... valid\n      -- while count(...)", d9's form)
      case (name, sql)
          if "valid[\\s-]+(only[\\s-]+)?(while|under|<=)".r
            .findFirstIn(sql.toLowerCase).isDefined => name
    }.toSet
    assert(bruteBounded.nonEmpty,
      "the brute-bound marker scan found NOTHING — the d5/d9/s8 twins " +
        "carry 'valid ... while' markers; if the marker wording " +
        "changed, update this scan with it")
    val unregisteredBounds = bruteBounded -- sfExpectedMismatch.keySet
    assert(unregisteredBounds.isEmpty,
      "oracle twins declaring a validity bound but not registered in " +
        s"sfExpectedMismatch: ${unregisteredBounds.toSeq.sorted}")
  }

  test("register reasons' cited replacement checks resolve (r14 #7)") {
    assert((registerArtifacts.keySet -- sfExpectedMismatch.keySet).isEmpty,
      "registerArtifacts names entries absent from the register: " +
        s"${(registerArtifacts.keySet -- sfExpectedMismatch.keySet).toSeq.sorted}")
    for ((entry, arts) <- registerArtifacts; a <- arts) a.split(":", 2) match {
      case Array("query", q) =>
        assert(SparkEntry.queries.contains(q),
          s"$entry cites query '$q' which no longer exists")
      case Array("spec", c) =>
        try Class.forName(c)
        catch { case _: ClassNotFoundException =>
          fail(s"$entry cites spec class '$c' which no longer exists") }
      case Array("check", c) =>
        assert(Check.KnownChecks.contains(c),
          s"$entry cites graft.Check '$c' which no longer exists " +
            s"(known: ${Check.KnownChecks.toSeq.sorted})")
      case Array("file", f) =>
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f)),
          s"$entry cites file '$f' which no longer exists")
      case other =>
        fail(s"$entry has malformed artifact '${other.mkString(":")}'")
    }
  }

  // ---- pin 38: d24's W-boundary grade on PLANTED duplicate lengths —
  //      the bench corpus has no shared runs in the 5..15 band
  //      (measured sf0.01 buckets: 2/3/4/16+), so the critical
  //      SubstringWindow boundary is probed here: pairs sharing
  //      exactly 5/6/7 words are INVISIBLE to the stride-1 W=8 window
  //      kernel (recall 0 — the declared fidelity bound), pairs at
  //      8/9/20 are caught with recall exactly 1000000 (a shared run
  //      >= W always contains an aligned W-window in both docs; 20
  //      clips into the 16 truth bucket).
  test("d24 substring recall: planted lengths grade the W boundary") {
    import org.apache.spark.sql.functions.{col => c}
    val lens = Seq(5, 6, 7, 8, 9, 20)
    val pairDocs = lens.zipWithIndex.flatMap { case (l, k) =>
      val run = (0 until l).map(i => s"p${k}s$i").mkString(" ")
      Seq(
        (100L + 2 * k, s"a${k}f0 a${k}f1 a${k}f2 $run a${k}f3 a${k}f4"),
        (101L + 2 * k, s"b${k}f0 b${k}f1 $run b${k}f2 b${k}f3 b${k}f4"))
    }
    val singles = Seq(
      (200L, "lone0 lone1 lone2 lone3 lone4 lone5 lone6 lone7 lone8"),
      (201L, "solo0 solo1 solo2 solo3 solo4 solo5 solo6 solo7 solo8"),
      (202L, "only0 only1 only2 only3 only4 only5 only6 only7 only8"))
    val d = Files.createTempDirectory("graft-d24").toString
    val sparkS = spark
    import sparkS.implicits._
    (pairDocs ++ singles).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("web"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(c("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("d24_substring_recall")(spark, d)
      .collect().map(r => r.getAs[Long]("max_shared") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_detected"),
          r.getAs[Long]("recall_micro"))).toMap
    assert(rows === Map(
      0L -> ((3L, 0L, 0L)),
      5L -> ((2L, 0L, 0L)), 6L -> ((2L, 0L, 0L)), 7L -> ((2L, 0L, 0L)),
      8L -> ((2L, 2L, 1000000L)), 9L -> ((2L, 2L, 1000000L)),
      16L -> ((2L, 2L, 1000000L))))
  }

  // ---- pin 41: d25's top-band recall on PLANTED exact-duplicate
  //      vectors — the bench embeddings corpus has no pairs above
  //      cos 0.6 (measured sf0.01: bands 6..10 empty), so the band
  //      where near-dup targets actually live is probed here: ten
  //      anchor/copy pairs (cos exactly 1.0 after 6dp rounding ->
  //      band 10) MUST all be found (identical vectors share every
  //      sign bit, so candidacy is structural, not probabilistic),
  //      while the random cross pairs stay in the low bands.
  test("d25 embedding-LSH recall: planted exact duplicates are " +
      "fully recalled in the top band") {
    val rnd = new scala.util.Random(7)
    val dims = 64
    val anchors = (0 until 10).map(_ =>
      Array.fill(dims)(rnd.nextGaussian().toFloat))
    val singles = (0 until 30).map(_ =>
      Array.fill(dims)(rnd.nextGaussian().toFloat))
    val rows =
      anchors.zipWithIndex.flatMap { case (v, i) =>
        Seq((i.toLong, v.toSeq, 0), (100L + i, v.toSeq, 0)) } ++
      singles.zipWithIndex.map { case (v, i) => (200L + i, v.toSeq, 1) }
    val d = Files.createTempDirectory("graft-d25").toString
    val sparkS = spark
    import sparkS.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("d25_embedding_lsh_recall")(spark, d)
      .collect().map(r => r.getAs[Long]("cos_band") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_found"))).toMap
    assert(out(10L) === ((10L, 10L)),
      s"planted duplicate pairs not fully recalled: $out")
    // found is truth-joined by construction: n_found <= n_truth per band
    out.values.foreach { case (nt, nf) => assert(nf <= nt) }

    // ---- pin 42: d26 on the SAME planted corpus — exact duplicates
    //      share every sign bit under EVERY geometry, so all 7
    //      (bits, bands) rows must recall the 10 planted pairs fully
    //      at band 10; and within a bits tier the scaled-band found
    //      count can never drop below the fixed-band one at any band
    //      (scaling only appends bands to the same plane family).
    val sweep = SparkEntry.queries("d26_lsh_geometry_sweep")(spark, d)
      .collect().map(r => (r.getAs[Long]("bits"), r.getAs[Long]("bands"),
        r.getAs[Long]("cos_band")) ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_found"))).toMap
    val geoms = graft.dedup.DedupQueries.D26Geometries
    assert(sweep.keySet.map(k => (k._1, k._2)) ===
      geoms.map { case (b, bd) => (b.toLong, bd.toLong) }.toSet)
    geoms.foreach { case (b, bd) =>
      assert(sweep((b.toLong, bd.toLong, 10L)) === ((10L, 10L)),
        s"d26 geometry ($b,$bd) missed planted exact duplicates: " +
          s"${sweep((b.toLong, bd.toLong, 10L))}")
    }
    for (bits <- geoms.map(_._1).distinct;
         bd = geoms.filter(_._1 == bits).map(_._2);
         if bd.size == 2; band <- 4L to 10L)
      assert(sweep((bits.toLong, bd.max.toLong, band))._2 >=
        sweep((bits.toLong, bd.min.toLong, band))._2,
        s"d26 bits=$bits band=$band: scaled found < fixed found")
  }

  override def afterAll(): Unit = {
    graft.core.Caches.release(spark)
    super.afterAll()
  }
}
