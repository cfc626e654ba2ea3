package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryDef
import graft.sources.Tables
import graft.text.Text

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * s1 is the exact brute-force baseline (restricted query set x full
  * corpus, broadcast the small side). s2/s3 are the 100-TB scale paths:
  * candidate generation by key-equality join (random-hyperplane LSH
  * buckets / IVF cells) so the per-query work is a bucket, not the
  * corpus. s2/s3 are verified by recall-vs-brute-force specs rather
  * than a SQL oracle (the bucketing is not reasonably expressible in
  * ANSI SQL).
  */
object SimilarityQueries {

  val TopK = 10
  val NumQueries = 10

  /** 16 deterministic pseudo-random +/-1 hyperplanes over 64 dims. */
  val Planes = 16
  val Dims = 64

  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), Text.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Text.norm(col("v")))

  /** LSH signature column: sign bits of v . plane_p packed into an int. */
  private def sigCol(v: Column): Column = Text.hyperplaneSig(v, Planes, Dims)

  val defs: Map[String, QueryDef] = Map(

    // ---- s1: exact brute-force cosine top-k for a query set
    "s1_ann_bruteforce" -> QueryDef(
      (s, dir) => {
        val e = corpus(s, dir)
        val q = broadcast(e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        q.join(e, col("query_id") =!= col("vec_id"))
          .withColumn("cos", round(Text.dot(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 6))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cos"), col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NumQueries
      ), scored AS (
        SELECT query_id, vec_id AS neighbor_id,
          round(
            list_sum(list_transform(list_zip(qv, v), x -> x[1] * x[2])) /
            (sqrt(list_sum(list_transform(qv, x -> x*x))) *
             sqrt(list_sum(list_transform(v, x -> x*x)))), 6) AS cos
        FROM q JOIN e ON query_id <> vec_id
      ), ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      )
      SELECT query_id, neighbor_id, cos, rank FROM ranked
      WHERE rank <= $TopK ORDER BY query_id, rank""")),

    // ---- s2: random-hyperplane LSH candidate generation + exact rerank
    "s2_ann_lsh" -> QueryDef(
      (s, dir) => {
        val e = corpus(s, dir).withColumn("sig", sigCol(col("v")))
        // 4 bands of 4 signature bits; candidates share any band value
        val bandE = e.select(col("vec_id"), col("v"), col("nrm"),
            explode(array((0 until 4).map(b =>
              concat_ws(":", lit(b),
                expr(s"shiftright(sig, ${4 * b}) & 15"))): _*)).as("bk"))
          .persist()
        val q = bandE.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"), col("bk"))
        val cands = q.join(bandE, Seq("bk"))
          .filter(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("qv"), col("qnrm"), col("vec_id"),
            col("v"), col("nrm"))
          .dropDuplicates("query_id", "vec_id")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        cands
          .withColumn("cos", round(Text.dot(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 6))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cos"), col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ---- s3: IVF with per-label centroid cells, nprobe=2 + exact rerank
    "s3_ann_ivf" -> QueryDef(
      (s, dir) => {
        val e = corpus(s, dir)
        // centroids: decimal-mean per (label, dim), tiny result -> broadcast
        val cent = e
          .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos"))
          .agg((sum(col("x").cast("decimal(30,15)")) / count(lit(1)))
            .cast("double").as("m"))
          .groupBy(col("label"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("label").as("cell"),
            expr("transform(pm, s -> s.m)").as("cv"))
        val qs = e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"))
        // probe the 2 nearest cells per query
        val wProbe = Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("cell"))
        val probes = qs.join(broadcast(cent))
          .withColumn("ccos", Text.cosine(col("qv"), col("cv")))
          .withColumn("crk", row_number().over(wProbe))
          .filter(col("crk") <= 2)
          .select(col("query_id"), col("qv"), col("qnrm"), col("cell"))
        // search only vectors in probed cells (key-equality join)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        probes.join(e, col("cell") === col("label"))
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("cos", round(Text.dot(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 6))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= TopK)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cos"), col("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      None)
  )
}
