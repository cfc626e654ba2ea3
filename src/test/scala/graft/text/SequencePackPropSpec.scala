package graft.text

import graft.SparkSpec

/** Randomized battery for [[TextQueries.sequencePack]] (t8's packing
  * rule) — [[graft.pipeline.ShardManifestPropSpec]]'s generator style
  * one level up, per the round-9 review: a divergent pack layout
  * silently re-mixes training sequences between runs, so the rule is
  * pinned against an independent driver-side fold on ARBITRARY
  * corpora (sparse ids, multiple sources and shards, zero-token and
  * NULL-token docs, random context sizes).
  *
  * Invariants beyond fold-equality: offsets live in [0, context);
  * pack_id is non-decreasing in doc_id within (source, shard) and the
  * first tokened doc of a partition starts at (0, 0); a NULL-token doc
  * packs as NULL and contributes nothing to the prefix (both engines'
  * window-sum null semantics — the same contract t8's DuckDB twin
  * exercises at the driver's sf).
  */
class SequencePackPropSpec extends SparkSpec {

  /** Driver-side fold of the rule: per (source, shard) in doc_id
    * order, a doc with n tokens starts at the running prefix —
    * (prefix div context, prefix mod context) — and advances it by n;
    * NULL-token docs emit None and leave the prefix alone. */
  private def model(docs: Seq[(Long, String, Long, Option[Long])],
      context: Long): Map[Long, Option[(Long, Long)]] = {
    val m = scala.collection.mutable.Map.empty[Long, Option[(Long, Long)]]
    for ((_, group) <- docs.groupBy(d => (d._2, d._3))) {
      var prefix = 0L
      for ((id, _, _, n) <- group.sortBy(_._1)) n match {
        case Some(t) =>
          m(id) = Some((prefix / context, prefix % context))
          prefix += t
        case None => m(id) = None
      }
    }
    m.toMap
  }

  test("random corpora: pack layout equals the driver-side fold") {
    val rnd = new scala.util.Random(20260815L)
    val sources = Array("webA", "webB", "webC")
    for (trial <- 1 to 8) {
      val context = 1L + rnd.nextInt(200)
      val nDocs = rnd.nextInt(150)
      val ids = rnd.shuffle((0L until 400L).toVector).take(nDocs)
      val docs = ids.map { id =>
        val n = if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(120).toLong)
        (id, sources(rnd.nextInt(3)), rnd.nextInt(3).toLong, n)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = true)))
      val rows = docs.map { case (id, src, sh, n) =>
        org.apache.spark.sql.Row(id, src, sh,
          n.map(Long.box).orNull)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      val got = TextQueries.sequencePack(df, context).collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(4)) None
          else Some((r.getLong(4), r.getLong(5))))
      }.toMap
      val want = model(docs, context)
      assert(got === want, s"trial $trial (context=$context n=$nDocs)")
      // structural invariants on the engine output
      got.values.flatten.foreach { case (pid, off) =>
        assert(pid >= 0L && off >= 0L && off < context,
          s"trial $trial: offset outside [0, $context)")
      }
      for ((key, group) <- docs.groupBy(d => (d._2, d._3))) {
        val packs = group.sortBy(_._1).flatMap(d => got(d._1)).map(_._1)
        assert(packs == packs.sorted,
          s"trial $trial $key: pack_id not monotone in doc_id")
        group.sortBy(_._1).find(_._4.isDefined).foreach { first =>
          assert(got(first._1).contains((0L, 0L)),
            s"trial $trial $key: first tokened doc must start at (0, 0)")
        }
      }
    }
  }

  test("empty corpus packs to an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long, Long)]
      .toDF("doc_id", "source", "shard", "n_tokens")
    assert(TextQueries.sequencePack(empty, 10L).count() === 0L)
  }
}
