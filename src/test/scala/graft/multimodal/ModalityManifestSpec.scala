package graft.multimodal

import graft.SparkSpec

/** mm5 modality manifest: byte totals must equal a driver-side recount
  * of the synthesized payload lengths, shares must sum to ~1e6 (within
  * one truncation unit per modality), and the DECIMAL(38,0) micro
  * numerators must match the documented formulas. */
class ModalityManifestSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("mm5 reconciles with a driver-side payload recount") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        length(encode(coalesce(col("text"), lit("")), "UTF-8"))
          .cast("long").as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mimes = Seq("image/png", "audio/wav", "video/mp4")
    val byMime = docs.groupBy { case (id, _) => mimes((id % 3).toInt) }
    val grand = docs.map(_._2).sum
    val rows = graft.SparkEntry.queries("mm5_modality_manifest")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === byMime.keySet)
    for ((mime, members) <- byMime) {
      val r = rows(mime)
      val tot = members.map(_._2).sum
      assert(r.getAs[Long]("n_assets") === members.length.toLong)
      assert(r.getAs[Long]("n_empty") === members.count(_._2 == 0L).toLong)
      assert(r.getAs[Long]("total_bytes") === tot)
      assert(r.getAs[Long]("max_bytes") === members.map(_._2).max)
      assert(r.getAs[Long]("mean_bytes_micro") ===
        (BigInt(tot) * 1000000 / members.length).toLong)
      assert(r.getAs[Long]("byte_share_micro") ===
        (BigInt(tot) * 1000000 / grand).toLong)
    }
    val shareSum = rows.values.map(_.getAs[Long]("byte_share_micro")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.size,
      "shares sum to 1e6 within truncation")
  }
}
