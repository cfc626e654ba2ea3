package graft.pipeline

import graft.SparkSpec

/** Randomized battery for [[PipelineQueries.orderPositions]] — the
  * deterministic global shuffle must equal the plain global rank it
  * replaces, for ANY bucket count, or epoch order silently depends on
  * physical tuning. Each trial draws a random sparse doc-id set and
  * checks:
  *
  *  1. positions are a permutation 0..n-1 assigned in ascending
  *     (h, doc_id) order — the exact contract of
  *     `row_number() OVER (ORDER BY h, doc_id) - 1`;
  *  2. B-INVARIANCE: buckets = 1, 4 and 64 produce the identical
  *     (doc_id -> position) map — the bucket count is physical only;
  *  3. chunk = position div chunkDocs;
  *  4. h is the documented salted hash (driver-side MessageDigest
  *     recompute of md5("ord|" + doc_id) first 15 hex digits);
  *  5. the empty corpus yields an empty frame, no throw.
  */
class TrainingOrderPropSpec extends SparkSpec {

  private def refHash(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ord|$docId".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def run(ids: Seq[Long], buckets: Int, chunkDocs: Long) = {
    import spark.implicits._
    PipelineQueries.orderPositions(
      ids.map(id => (id, "src")).toDF("doc_id", "source"),
      buckets, chunkDocs)
      .select("doc_id", "h", "position", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("random id sets: positions equal the global (h, doc_id) rank at any B") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(200)
      val ids = rnd.shuffle((0L until 100000L).toVector).take(n)
      val chunkDocs = 1L + rnd.nextInt(17)
      val base = run(ids, 64, chunkDocs)
      // 1. permutation in (h, doc_id) order
      val sorted = base.sortBy(t => (t._2, t._1))
      assert(sorted.map(_._3).toSeq == (0L until n.toLong),
        s"trial $trial: positions are not the (h, doc_id) rank")
      // 3. chunk rule
      assert(base.forall(t => t._4 == t._3 / chunkDocs))
      // 4. hash contract
      base.take(5).foreach { case (id, h, _, _) =>
        assert(h == refHash(id), s"hash mismatch for doc $id")
      }
      // 2. B-invariance
      val posOf = base.map(t => t._1 -> t._3).toMap
      for (b <- Seq(1, 4)) {
        val alt = run(ids, b, chunkDocs).map(t => t._1 -> t._3).toMap
        assert(alt == posOf, s"trial $trial: B=$b diverged from B=64")
      }
    }
  }

  test("empty corpus: empty frame, no throw") {
    assert(run(Seq.empty, 64, 10L).isEmpty)
  }
}
