package graft.matcher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Example-based (class-conditioned) features: distances from a query
  * column to the labelled example pool (reference
  * RfKnnFeatureExtractor.scala:42-99,
  * MinEditDistFromClassExamplesFeatureExtractor.scala:32-84,
  * MeanCharacterCosineSimilarityFeatureExtractor.scala:36-139).
  *
  * The pool is #labelled-columns sized (tiny), so the cross join
  * broadcasts the pool and the per-class reduction is a map-side-combined
  * groupBy — O(queries x pool) work distributed row-wise. */
object ExampleFeatures {

  /** Short (unqualified) column name from a `table.column` id; a `#bag`
    * suffix (BaggedPrediction's per-bag ids) is stripped first so every
    * bag inherits its base column's name features. */
  private def shortName(c: org.apache.spark.sql.Column) =
    substring_index(substring_index(c, "#", 1), ".", -1)

  /** Build the per-class aggregation columns (shared helper). */
  private def classAggs(classes: Seq[String], k: Int) = classes.map { c =>
    round(sum(when(col("label") === c, 1L).otherwise(0L))
      .cast("double") / k, 6).as(s"prop_$c")
  }

  /** k-NN proportions, implemented cleanly. */
  def knn(queries: DataFrame, pool: DataFrame, k: Int,
      classes: Seq[String]): DataFrame = {
    val q = queries.select(col("col_name").as("query_col"))
      .withColumn("qname", shortName(col("query_col")))
    val p = broadcast(pool.select(col("col_name").as("pool_col"), col("label"))
      .withColumn("pname", shortName(col("pool_col"))))
    val w = Window.partitionBy(col("query_col"))
      .orderBy(col("dist"), col("pool_col"))
    val ranked = q.join(p)
      .withColumn("dist", levenshtein(lower(col("qname")), lower(col("pname"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    val aggs = classAggs(classes, k)
    ranked.groupBy(col("query_col")).agg(aggs.head, aggs.tail: _*)
      .orderBy(col("query_col"))
  }

  /** Min edit distance from each class's example names
    * (reference J2): query_col, min_dist_<class>... */
  def minClassDistance(queries: DataFrame, pool: DataFrame,
      classes: Seq[String]): DataFrame = {
    val q = queries.select(col("col_name").as("query_col"))
      .withColumn("qname", shortName(col("query_col")))
    val p = broadcast(pool.select(col("col_name").as("pool_col"), col("label"))
      .withColumn("pname", shortName(col("pool_col"))))
    val joined = q.join(p)
      .withColumn("dist", levenshtein(lower(col("qname")), lower(col("pname"))))
    val aggs = classes.map(c =>
      min(when(col("label") === c, col("dist"))).cast("long")
        .as(s"min_dist_$c"))
    joined.groupBy(col("query_col")).agg(aggs.head, aggs.tail: _*)
      .orderBy(col("query_col"))
  }

  /** Mean cosine similarity between the query column's character
    * distribution and each class's example distributions (reference J3).
    * `charHist`: (col_name, c, cnt) histograms for query+pool columns.
    *
    * Determinism: the per-pair cosine and the per-class mean accumulate
    * in DECIMAL(30,15) (not double), so results are independent of
    * partition/aggregation order and reproduce exactly in the DuckDB
    * oracle; final values floor-round half-up at 6 decimals (engine
    * round() rules differ at exact .5e-6 boundaries). */
  def meanCharCosinePerClass(charHist: DataFrame, queryCols: DataFrame,
      pool: DataFrame, classes: Seq[String]): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(30, 15)
    val norms = charHist.groupBy(col("col_name"))
      .agg(sqrt(sum(col("cnt") * col("cnt"))).as("norm"))
    val h = charHist.join(norms, "col_name")
      .select(col("col_name"), col("c"),
        (col("cnt") / col("norm")).as("w"))
    val q = queryCols.select(col("col_name").as("query_col"))
    val p = pool.select(col("col_name").as("pool_col"), col("label"))
    val qh = h.join(q, h("col_name") === q("query_col"))
      .select(col("query_col"), col("c"), col("w").as("qw"))
    val ph = h.join(p, h("col_name") === p("pool_col"))
      .select(col("pool_col"), col("label"), col("c"), col("w").as("pw"))
    val cosPairs = qh.join(ph, Seq("c"))
      .groupBy(col("query_col"), col("pool_col"), col("label"))
      .agg(sum((col("qw") * col("pw")).cast(dec)).cast("double").as("cos"))
    val aggs = classes.map { c =>
      val cnt = sum(when(col("label") === c, 1L).otherwise(0L))
      val s = sum(when(col("label") === c, col("cos").cast(dec)))
      (floor((s.cast("double") / when(cnt > 0, cnt)) * 1e6 + 0.5) / 1e6)
        .as(s"mean_cos_$c")
    }
    cosPairs.groupBy(col("query_col")).agg(aggs.head, aggs.tail: _*)
      .orderBy(col("query_col"))
  }

  /** Character histogram (col_name, c, cnt) for a melted frame. */
  def charHistogram(melted: DataFrame): DataFrame = {
    val v = col("value")
    melted.filter(v.isNotNull && length(v) > 0)
      .select(col("col_name"), explode(split(lower(v), "")).as("c"))
      .groupBy(col("col_name"), col("c"))
      .agg(count(lit(1)).cast("double").as("cnt"))
  }

  /** Lexical (WordNet-family) min distance from each class's example
    * headers (reference J4/A25:
    * MinWordNetDistFromClassExamplesFeatureExtractor.scala:35-266) —
    * JCN / LIN / WUP over the pluggable [[graft.functions.Lexical]]
    * taxonomy. Same broadcast-pool shape as [[knn]]; the pair metric is
    * a name-level UDF (tiny cardinality, the sanctioned exception).
    * Output long-format: (query_col, class_name, jcn_dist, lin_dist,
    * wup_dist), min over each class's examples. */
  def lexicalMinDistPerClass(queries: DataFrame, pool: DataFrame): DataFrame = {
    val pair = udf { (q: String, p: String) =>
      val t = graft.functions.Lexical.Taxonomy.builtin
      val qt = graft.functions.StringFunctions.tokenize(q)
      val pt = graft.functions.StringFunctions.tokenize(p)
      if (qt.isEmpty || pt.isEmpty) (-1.0, -1.0, -1.0)
      else t.compoundDistance(qt, pt)
    }
    val q = queries.select(col("col_name").as("query_col"))
      .withColumn("qname", shortName(col("query_col")))
    val p = broadcast(pool.select(col("col_name").as("pool_col"), col("label"))
      .withColumn("pname", shortName(col("pool_col"))))
    q.join(p)
      .withColumn("d", pair(col("qname"), col("pname")))
      .groupBy(col("query_col"), col("label").as("class_name"))
      .agg(min(col("d._1")).as("jcn_dist"),
        min(col("d._2")).as("lin_dist"),
        min(col("d._3")).as("wup_dist"))
      .orderBy(col("query_col"), col("class_name"))
  }

  /** A26: L2-normalized word-level term-frequency vector per column
    * (reference AttributeContentTermFrequency,
    * DataPreprocessor.scala:79-130: lowercase, split on newline/space/
    * comma, strip [.,!?;:], count, divide by the L2 norm of the count
    * vector). Two-level aggregation — (col, term) counts map-side
    * combine, then an O(vocabulary) norm per column — so no reducer
    * ever holds a column's values. Norm arithmetic is exact-integer in
    * double (sums of squared counts), so tf values are bit-identical
    * across engines; the final value floor-rounds half-up at 6
    * decimals. Returns (col_name, term, tf). */
  def wordTfVector(melted: DataFrame): DataFrame = {
    val v = col("value")
    val terms = melted.filter(v.isNotNull && length(v) > 0)
      .select(col("col_name"),
        explode(split(lower(v), "[\n ,]")).as("t0"))
      // translate, not regexp_replace: same strip-chars semantics but a
      // char-map lookup per token instead of a regex engine pass —
      // this runs once per token (~10^6 x per 5k docs)
      .withColumn("term", translate(trim(col("t0")), ".,!?;:", ""))
      .filter(length(col("term")) > 0)
    val counts = terms.groupBy(col("col_name"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val norms = counts.groupBy(col("col_name"))
      .agg(sqrt(sum(col("cnt") * col("cnt")).cast("double")).as("nrm"))
    counts.join(norms, "col_name")
      .select(col("col_name"), col("term"),
        (floor((col("cnt") / col("nrm")) * 1e6 + 0.5) / 1e6).as("tf"))
  }
}
