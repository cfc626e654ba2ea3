package graft.pipeline

import graft.SparkSpec

/** Randomized battery for [[PipelineQueries.shardManifest]] — the
  * training-export layout must be bit-identical to the spec'd cut rule
  * on ARBITRARY corpora, because a divergent shard map silently
  * re-mixes training data between runs. Each trial draws a random doc
  * set (sparse ids across several macro shards, zero-token docs,
  * uneven splits) and random budget/macro widths, then compares the
  * full manifest against an independent driver-side fold of the rule:
  * within (split, doc_id div macroDocs) ordered by doc_id, a doc joins
  * shard floor(prefix_before / budget). Also pins the empty-corpus
  * case (empty manifest, no throw). */
class ShardManifestPropSpec extends SparkSpec {

  private def model(docs: Seq[(Long, String, Long)], budget: Long,
      macroDocs: Long): Map[(String, Long, Long), (Long, Long, Long, Long)] = {
    val m = scala.collection.mutable.Map
      .empty[(String, Long, Long), (Long, Long, Long, Long)]
    for ((split, ds) <- docs.groupBy(_._2);
         (mac, ids) <- ds.groupBy(_._1 / macroDocs)) {
      var cum = 0L
      for ((id, _, n) <- ids.sortBy(_._1)) {
        val k = (split, mac, cum / budget)
        cum += n
        m(k) = m.get(k) match {
          case None => (1L, n, id, id)
          case Some((nd, nt, lo, hi)) =>
            (nd + 1L, nt + n, math.min(lo, id), math.max(hi, id))
        }
      }
    }
    m.toMap
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("split"),
      r.getAs[Long]("macro_shard"), r.getAs[Long]("shard_seq")) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("min_doc_id"), r.getAs[Long]("max_doc_id"))).toMap

  test("random corpora: manifest equals the driver-side fold of the cut rule") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val splits = Array("train", "val", "test")
    for (trial <- 1 to 8) {
      val budget = 1L + rnd.nextInt(100)
      val macroDocs = 1L + rnd.nextInt(50)
      val nDocs = rnd.nextInt(120)
      // sparse, distinct ids spread over ~4 macro widths
      val ids = rnd.shuffle((0L until macroDocs * 4)
        .toVector).take(nDocs)
      val docs = ids.map(id => (id, splits(rnd.nextInt(3)),
        rnd.nextInt(51).toLong))
      val got = collect(PipelineQueries.shardManifest(
        docs.toDF("doc_id", "split", "n_tokens"), budget, macroDocs))
      assert(got === model(docs, budget, macroDocs),
        s"trial $trial (budget=$budget macroDocs=$macroDocs n=$nDocs)")
      // every shard stays under budget + its own largest doc
      if (docs.nonEmpty) {
        val maxDoc = docs.map(_._3).max
        got.values.foreach { case (_, nt, _, _) =>
          assert(nt < budget + math.max(maxDoc, 1L)) }
      }
    }
  }

  test("empty corpus yields an empty manifest") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "split", "n_tokens")
    assert(PipelineQueries.shardManifest(empty, 10L, 10L).count() === 0L)
  }
}
