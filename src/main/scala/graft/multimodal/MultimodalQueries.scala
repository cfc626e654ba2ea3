package graft.multimodal

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Multimodal pipeline queries. The stub codec is deterministic pure
  * byte arithmetic (Java Arrays.hashCode + nibble histogram), so both
  * queries have full value-exact DuckDB oracle twins that re-derive the
  * same features from the UTF-8 payload bytes — the oracle checks the
  * whole Spark plumbing (schema, mapPartitions batch shape, frame
  * explode) end to end. MultimodalSpec asserts the batch semantics. */
object MultimodalQueries {

  /** DuckDB: UTF-8 payload bytes as signed ints via the hex string
    * (byte i = hex chars 2i+1..2i+2). */
  private val bytesSql =
    """list_transform(range(0, n),
         i -> CASE WHEN CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS BIGINT) >= 128
              THEN CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS BIGINT) - 256
              ELSE CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS BIGINT) END)"""

  /** THE one DuckDB rendering of [[Multimodal.mediaTable]]'s synthesis
    * (doc_id -> media_id, the 3-way mime rotation, payload =
    * encode(coalesce(text,''))), interpolated into every mm oracle so
    * a change to the synthesis cannot drift one oracle silently — the
    * same single-rendering posture as the text family's
    * langPredSqlCtes (r12 ADVICE item). Must-change-together partner:
    * [[Multimodal.mediaTable]]. */
  private def mediaSqlCte: String = """media AS (
        SELECT doc_id AS media_id,
          ['image/png','audio/wav','video/mp4']
            [CAST(doc_id % 3 + 1 AS INT)] AS mime,
          encode(coalesce(text, '')) AS payload
        FROM documents
      )"""

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
      // oracle re-derives the stub decode: Java Arrays.hashCode is the
      // 31-based rolling hash over signed bytes in 32-bit wraparound;
      // entropy is over the 16 high-nibble classes of the payload bytes
      Some(s"""WITH $mediaSqlCte, m AS (
        SELECT media_id, mime, hex(payload) AS hx,
          octet_length(payload) AS n
        FROM media
      ), hashed AS (
        SELECT media_id, mime, hx, n,
          list_reduce(list_prepend(CAST(1 AS BIGINT), $bytesSql),
            (acc, b) -> ((31*acc + b) % 4294967296 + 4294967296) % 4294967296) AS u
        FROM m
      ), dims AS (
        SELECT media_id, mime, hx, n,
          ((CASE WHEN u >= 2147483648 THEN u - 4294967296 ELSE u END % 480)
            + 480) % 480 + 16 AS height
        FROM hashed
      ), wh AS (
        SELECT media_id, mime, hx, n, height,
          ((height * 31 + n) % 640 + 640) % 640 + 16 AS width
        FROM dims
      ), nib AS (
        SELECT media_id,
          unnest(list_transform(range(0, n),
            i -> substr(hx, CAST(2*i+1 AS INT), 1))) AS c
        FROM wh
      ), cnt AS (
        SELECT media_id, c, count(*) AS k FROM nib GROUP BY 1, 2
      ), ent AS (
        SELECT cnt.media_id,
          -sum((CAST(k AS DOUBLE) / n) * ln(CAST(k AS DOUBLE) / n)) AS e
        FROM cnt JOIN wh ON cnt.media_id = wh.media_id
        GROUP BY 1
      )
      SELECT wh.media_id, mime, CAST(n AS BIGINT) AS n_bytes,
        CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        floor(coalesce(e, 0.0) * 1e6 + 0.5) / 1e6 AS byte_entropy
      FROM wh LEFT JOIN ent ON wh.media_id = ent.media_id
      ORDER BY wh.media_id""")),

    // ---- mm2: video frame sampling (one row per sampled frame)
    "mm2_frame_samples" -> QueryDef(
      (s, dir) => {
        Multimodal.frameSample(Multimodal.mediaTable(s, dir), 4)
          .toDF()
          .select(col("media_id"), col("frame_no"),
            length(col("payload")).cast("long").as("frame_bytes"))
          .orderBy(col("media_id"), col("frame_no"))
      },
      // oracle re-derives the byte-window frame sampler: video payloads
      // are doc_id % 3 == 2 (mime array index 3), frame i spans
      // [len*i/4, min(len, len*i/4 + max(1, len/4))) in integer division
      // video payloads are mime = 'video/mp4' (the rotation's index 3)
      Some(s"""WITH $mediaSqlCte, v AS (
        SELECT media_id, octet_length(payload) AS len
        FROM media WHERE mime = 'video/mp4'
      ), f AS (
        SELECT media_id, unnest(range(0, 4)) AS i, len
        FROM v WHERE len > 0
      )
      SELECT media_id, CAST(i AS INT) AS frame_no,
        CAST(least(len, (len * i) // 4 + greatest(1, len // 4))
          - (len * i) // 4 AS BIGINT) AS frame_bytes
      FROM f ORDER BY media_id, frame_no""")),

    // ---- mm3: batched resize pass over binary payloads — the schema-
    //      preserving transform stage of a media pipeline (decode ->
    //      resize -> re-encode), stub-codec'd like mm1/mm2 but with the
    //      mapPartitions batch shape and payload round-trip real. The
    //      oracle re-derives the stub's byte contract: resized payload =
    //      first min(len, 224*224/64) bytes, fingerprinted via
    //      md5(hex(prefix)) (DuckDB md5 is VARCHAR-only, so both
    //      engines hash the identical uppercase-hex string).
    "mm3_resized" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Multimodal.resizeAll(Multimodal.mediaTable(s, dir), 224, 224)
          .toDF()
          .select(col("media_id"), col("mime"),
            col("width").cast("int").as("width"),
            col("height").cast("int").as("height"),
            length(col("payload")).cast("long").as("n_bytes_resized"),
            md5(hex(col("payload"))).as("fp"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH $mediaSqlCte, m AS (
        SELECT media_id, mime, payload AS p FROM media
      )
      SELECT media_id, mime,
        CAST(224 AS INT) AS width, CAST(224 AS INT) AS height,
        CAST(least(octet_length(p), 784) AS BIGINT) AS n_bytes_resized,
        md5(substr(hex(p), 1, CAST(2 * least(octet_length(p), 784) AS INT))) AS fp
      FROM m ORDER BY media_id""")),

    // ---- mm4: media dedup — exact (payload fingerprint) AND
    //      perceptual (quantized byte-class histogram, the pHash role
    //      with the stub codec: two media whose byte distributions
    //      quantize identically share a phash, tolerating small edits
    //      that leave the distribution's 1/16-resolution shape alone).
    //      Fully declarative — no mapPartitions: the high nibble of
    //      every payload byte is extracted with one regex over the hex
    //      string ('(.).' -> '$1' keeps odd positions), per-class
    //      counts are 16 codegen'd length(replace(...)) folds, and the
    //      quantization (count*16 div n) is exact integer arithmetic,
    //      so the phash is engine-portable with no double rounding.
    //      Clustering is d1's window pattern on each fingerprint.
    //      Scale: row-local fingerprints + two key-equality windows —
    //      O(corpus) at any size, no pairwise comparison.
    "mm4_media_dedup" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val m = Multimodal.mediaTable(s, dir).toDF()
          .select(col("media_id"), col("mime"), hex(col("payload")).as("hx"))
          .withColumn("hi", regexp_replace(col("hx"), "(.).", "$1"))
        val digits = "0123456789ABCDEF"
        // exact integer quantization: (count * 16) div n — `div` keeps
        // both engines in integer arithmetic (a double floor() can land
        // one below at exact multiples)
        // greatest(n, 1) guards the zero-length payload: real ingests
        // carry zero-byte media files, and under ANSI mode a 0 divisor
        // would fail the whole query; empty payloads quantize to all
        // zeros and dedup together, which is the behavior you want.
        val quant = concat_ws(",", digits.map(d => expr(
          s"CAST(CAST(length(hi) - length(replace(hi, '$d', '')) AS BIGINT)" +
            s" * 16 div greatest(length(hi), 1) AS BIGINT)")): _*)
        val fp = m.select(col("media_id"), col("mime"),
          md5(col("hx")).as("exact_fp"), md5(quant).as("phash"))
        val we = Window.partitionBy(col("exact_fp"))
        val wp = Window.partitionBy(col("phash"))
        fp.withColumn("exact_canonical", min(col("media_id")).over(we))
          .withColumn("exact_size", count(lit(1)).over(we))
          .withColumn("percep_canonical", min(col("media_id")).over(wp))
          .withColumn("percep_size", count(lit(1)).over(wp))
          .select(col("media_id"), col("mime"), col("exact_fp"),
            col("phash"), col("exact_canonical"), col("exact_size"),
            col("percep_canonical"), col("percep_size"),
            (col("media_id") =!= col("exact_canonical")).cast("long")
              .as("is_exact_dup"),
            (col("media_id") =!= col("percep_canonical")).cast("long")
              .as("is_percep_dup"))
          .orderBy(col("media_id"))
      },
      Some {
        val digits = "0123456789ABCDEF"
        val counts = digits.map(d =>
          s"(length(hi) - length(replace(hi, '$d', ''))) * 16" +
            s" // greatest(length(hi), 1)")
          .mkString(", ")
        s"""WITH $mediaSqlCte, m AS (
        SELECT media_id, mime, hex(payload) AS hx FROM media
      ), hi AS (
        SELECT media_id, mime, hx,
          regexp_replace(hx, '(.).', '\\1', 'g') AS hi
        FROM m
      ), fp AS (
        SELECT media_id, mime, md5(hx) AS exact_fp,
          md5(concat_ws(',', $counts)) AS phash
        FROM hi
      )
      SELECT media_id, mime, exact_fp, phash,
        min(media_id) OVER (PARTITION BY exact_fp) AS exact_canonical,
        count(*) OVER (PARTITION BY exact_fp) AS exact_size,
        min(media_id) OVER (PARTITION BY phash) AS percep_canonical,
        count(*) OVER (PARTITION BY phash) AS percep_size,
        CAST(media_id <> min(media_id) OVER (PARTITION BY exact_fp)
          AS BIGINT) AS is_exact_dup,
        CAST(media_id <> min(media_id) OVER (PARTITION BY phash)
          AS BIGINT) AS is_percep_dup
      FROM fp ORDER BY media_id"""
      }),

    // ---- mm5: modality manifest — the storage-budget datasheet per
    //      media type: asset counts, zero-byte (corrupt/truncated-
    //      ingest) counts, byte volume, and each modality's share of
    //      the release's total bytes. e8's release-manifest posture
    //      for the multimodal side: one payload scan, a groupBy on the
    //      BOUNDED mime key (output = #modalities rows at any corpus
    //      size), and the share window runs over that tiny grouped
    //      frame. total_bytes·1e6 overflows BIGINT at ~9 TB of media —
    //      exactly the scale this report targets — so both micro
    //      numerators accumulate in DECIMAL(38,0)/HUGEINT before the
    //      truncating div (the e8-checksum posture).
    "mm5_modality_manifest" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val m = Multimodal.mediaTable(s, dir).toDF()
          .select(col("mime"), length(col("payload")).cast("long").as("nb"))
        m.groupBy(col("mime"))
          .agg(
            count(lit(1)).as("n_assets"),
            sum(when(col("nb") === 0L, 1L).otherwise(0L)).as("n_empty"),
            sum(col("nb")).as("total_bytes"),
            max(col("nb")).as("max_bytes"))
          .withColumn("grand",
            sum(col("total_bytes")).over(Window.partitionBy()))
          .withColumn("mean_bytes_micro", expr(
            "CAST(CAST(total_bytes AS DECIMAL(38,0)) * 1000000 " +
              "div n_assets AS LONG)"))
          .withColumn("byte_share_micro", expr(
            "CAST(CAST(total_bytes AS DECIMAL(38,0)) * 1000000 " +
              "div nullif(grand, 0L) AS LONG)"))
          .select(col("mime"), col("n_assets"), col("n_empty"),
            col("total_bytes"), col("max_bytes"),
            col("mean_bytes_micro"), col("byte_share_micro"))
          .orderBy(col("mime"))
      },
      Some(s"""WITH $mediaSqlCte, m AS (
        SELECT mime, octet_length(payload) AS nb FROM media
      ), g AS (
        SELECT mime, count(*) AS n_assets,
          CAST(sum(CASE WHEN nb = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_empty,
          CAST(sum(nb) AS BIGINT) AS total_bytes,
          CAST(max(nb) AS BIGINT) AS max_bytes
        FROM m GROUP BY mime
      )
      SELECT mime, n_assets, n_empty, total_bytes, max_bytes,
        CAST(CAST(total_bytes AS HUGEINT) * 1000000 // n_assets
          AS BIGINT) AS mean_bytes_micro,
        CAST(CAST(total_bytes AS HUGEINT) * 1000000 //
          nullif(sum(total_bytes) OVER (), 0) AS BIGINT)
          AS byte_share_micro
      FROM g ORDER BY mime"""))
  )
}
