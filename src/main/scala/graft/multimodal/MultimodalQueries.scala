package graft.multimodal

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Multimodal pipeline queries (rows-only: the stub codec is not
  * SQL-expressible; MultimodalSpec asserts the semantics). */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    // ---- mm1: media feature extraction over binary payloads
    "mm1_media_features" -> QueryDef(
      (s, dir) => {
        Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_bytes"),
            col("width"), col("height"), col("byte_entropy"))
          .orderBy(col("media_id"))
      },
      None),

    // ---- mm2: video frame sampling (one row per sampled frame)
    "mm2_frame_samples" -> QueryDef(
      (s, dir) => {
        Multimodal.frameSample(Multimodal.mediaTable(s, dir), 4)
          .toDF()
          .select(col("media_id"), col("frame_no"),
            length(col("payload")).cast("long").as("frame_bytes"))
          .orderBy(col("media_id"), col("frame_no"))
      },
      None)
  )
}
