package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text-expression builders shared by the text-analysis and
  * dedup operators. Every builder has an exact DuckDB twin (same md5-based
  * hashing, same shingling) in the module's oracle SQL — all hashing is
  * md5-hex so Spark results and the DuckDB oracle agree byte-for-byte on
  * any engine. Everything here is a codegen-friendly Catalyst expression
  * tree (no UDFs): whole-stage codegen applies and the work distributes
  * row-wise with zero driver state.
  */
object Text {

  /** Lowercased alphanumeric word tokens. */
  def words(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** GPT-style coarse token count: letter runs, single digits, or single
    * non-alphanumeric non-space chars. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct word n-gram shingles of a word array. */
  def wordShingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        j => array_join(slice(w, j + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character n-gram shingles of a string. */
  def charShingles(c: Column, n: Int): Column = {
    val s = lower(c)
    when(length(s) >= n,
      array_distinct(transform(sequence(lit(0), length(s) - n),
        j => s.substr(j + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k md5-keyed minima over the shingle set.
    * Hash h_i(s) = md5(i ++ ":" ++ s); the minimum is taken
    * lexicographically on the hex string — portable across engines. */
  def minhash(sh: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)),
      i => array_min(transform(sh, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band keys: md5 over `rows` consecutive signature entries. A pair
    * of docs is a candidate iff any band key collides. */
  def bandKeys(mh: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => {
      val parts = (1 to rows).map(r => element_at(mh, b * lit(rows) + lit(r)))
      md5(concat_ws("|", (b.cast("string") +: parts): _*))
    })

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** First 8 md5 hex chars of a token as an unsigned 32-bit value —
    * the per-word hash feeding SimHash. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Cosine similarity of two double arrays (sequential fold — order is
    * the array order, so the result is partition-independent). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Cast a float array column to double (exact widening). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
