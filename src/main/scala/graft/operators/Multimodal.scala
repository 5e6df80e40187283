package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (§2 m1–m2): media as opaque `binary`
  * columns + typed metadata, with the decode step stubbed (no media
  * libs in this container — a real deployment swaps the stub for
  * batched decode inside `mapPartitions`, the plan shape is
  * identical: map-only, no shuffle, explode for frames).
  */
object Multimodal {

  /** m1: synthesize a deterministic blob from text (stand-in for an
    * image payload) and extract binary metadata. */
  def blobMetadata(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .select(col("doc_id"),
        octet_length(col("blob")).as("blob_len"),
        lower(hex(substring(col("blob"), 1, 4))).as("magic_hex"),
        md5(col("blob")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  // magic_hex: take 4 BYTES, not 4 chars-then-encode — substring the
  // hex of the full encoding so a multi-byte utf-8 first char can't
  // diverge from the Spark side's byte substring (latent while the
  // corpus is ASCII, wrong the day it isn't)
  def blobMetadataSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS blob_len,
      |  lower(substring(hex(encode(text)), 1, 8)) AS magic_hex,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m2: deterministic frame-sampling stub — each "video" doc explodes
    * into `1 + n_chars % 7` frame rows with a per-frame content key.
    * The real decoder would replace the md5 with pixel bytes; the
    * schema, explode plan and partitioning are the production shape. */
  def frameSample(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), (col("n_chars") % 7).cast("int"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string")))
          .as("frame_key"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  def frameSampleSql: String =
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      |  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS frame_key
      |FROM (SELECT doc_id, unnest(range(0, n_chars % 7 + 1)) AS i FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** m4: typed metadata from binary headers — synthesize a PNG-shaped
    * header (magic + big-endian width/height words) and parse it back
    * from the binary column, the schema-on-read step for an image
    * corpus. Hex-string outputs keep the oracle engine-neutral. */
  def mediaHeader(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val widthHex = lpad(hex((col("n_chars") % 1024 + 16).cast("int")), 8, "0")
    val heightHex = lpad(hex(((col("n_chars") * 7) % 768 + 16).cast("int")), 8, "0")
    val blob = unhex(concat(lit("89504e47"), widthHex, heightHex))
    docs.select(col("doc_id"), blob.as("header"))
      .select(col("doc_id"),
        lower(hex(substring(col("header"), 1, 4))).as("magic"),
        lower(hex(substring(col("header"), 5, 4))).as("width_hex"),
        lower(hex(substring(col("header"), 9, 4))).as("height_hex"),
        (lower(hex(substring(col("header"), 1, 4))) === "89504e47").as("is_png"))
      .orderBy(col("doc_id"))
  }

  /** the oracle builds the same header as a hex STRING (DuckDB can't
    * substring blobs) — byte-identical content, engine-neutral compare */
  def mediaHeaderSql: String =
    """SELECT doc_id,
      |  lower(substring(header_hex, 1, 8)) AS magic,
      |  lower(substring(header_hex, 9, 8)) AS width_hex,
      |  lower(substring(header_hex, 17, 8)) AS height_hex,
      |  lower(substring(header_hex, 1, 8)) = '89504e47' AS is_png
      |FROM (
      |  SELECT doc_id, '89504e47' ||
      |    lpad(hex(CAST(n_chars % 1024 + 16 AS INTEGER)), 8, '0') ||
      |    lpad(hex(CAST((n_chars * 7) % 768 + 16 AS INTEGER)), 8, '0') AS header_hex
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** m5: modality routing — a mixed binary corpus (images / audio /
    * video share one blob column) dispatched by magic bytes to
    * per-modality metadata parsers in ONE pass (a `when` chain over
    * the decoded magic, not one scan per type). This is the fan-out
    * step in front of per-modality decoders like [[decodeBatched]];
    * unknown magics survive as 'unknown' instead of being dropped.
    * Blobs are synthesized deterministically (doc_id % 3 picks
    * PNG/RIFF-WAV/JPEG); the oracle rebuilds the same headers as hex
    * strings (DuckDB cannot substring blobs). */
  def modalityRoute(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val magicHex = when(col("doc_id") % 3 === 0, lit("89504e47")) // PNG
      .when(col("doc_id") % 3 === 1, lit("52494646"))             // RIFF/WAV
      .otherwise(lit("ffd8ffe0"))                                 // JPEG
    val payloadHex = lpad(hex((col("n_chars") % 4096).cast("int")), 8, "0")
    val withBlob = docs.select(col("doc_id"),
      unhex(concat(magicHex, payloadHex)).as("blob"))
    val magic = lower(hex(substring(col("blob"), 1, 4)))
    val payload = conv(lower(hex(substring(col("blob"), 5, 4))), 16, 10).cast("long")
    withBlob.select(col("doc_id"), magic.as("magic"),
        when(magic === "89504e47", "image/png")
          .when(magic === "52494646", "audio/wav")
          .when(magic === "ffd8ffe0", "image/jpeg")
          .otherwise("unknown").as("modality"),
        payload.as("payload"))
      .orderBy(col("doc_id"))
  }

  def modalityRouteSql: String =
    """SELECT doc_id, magic,
      |  CASE magic WHEN '89504e47' THEN 'image/png'
      |             WHEN '52494646' THEN 'audio/wav'
      |             WHEN 'ffd8ffe0' THEN 'image/jpeg'
      |             ELSE 'unknown' END AS modality,
      |  CAST(n_chars % 4096 AS BIGINT) AS payload
      |FROM (
      |  SELECT doc_id, n_chars,
      |    lower(CASE doc_id % 3 WHEN 0 THEN '89504e47'
      |                          WHEN 1 THEN '52494646'
      |                          ELSE 'ffd8ffe0' END) AS magic
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** m6: resize planning — the ML-preprocessing step that decides each
    * image's target geometry before the (stubbed) pixel resample.
    * Aspect-preserving fit into 224×224 in pure INTEGER arithmetic
    * (`floor(short·224 / long)`) so both engines agree exactly — a
    * float scale factor could round 223.9999 differently. Also emits
    * the ViT-style 16px patch-grid count the training pipeline packs
    * by. Map-only at any scale; the real resampler slots into the
    * same row shape via [[decodeBatched]]'s mapPartitions pattern. */
  def resizePlan(spark: SparkSession, d: String, fit: Int = 224,
                 patch: Int = 16): DataFrame = {
    val docs = Tables.documents(spark, d)
    val w = (col("n_chars") % 1024 + 16).cast("long")
    val h = ((col("n_chars") * 7) % 768 + 16).cast("long")
    val outW = when(w >= h, lit(fit.toLong)).otherwise(floor(w * fit / h).cast("long"))
    val outH = when(w >= h, floor(h * fit / w).cast("long")).otherwise(lit(fit.toLong))
    docs.select(col("doc_id"), w.as("src_w"), h.as("src_h"),
        outW.as("out_w"), outH.as("out_h"))
      .withColumn("n_patches",
        (ceil(col("out_w").cast("double") / patch) *
          ceil(col("out_h").cast("double") / patch)).cast("long"))
      .orderBy(col("doc_id"))
  }

  def resizePlanSql(fit: Int = 224, patch: Int = 16): String =
    s"""SELECT doc_id, src_w, src_h, out_w, out_h,
       |  CAST(ceil(CAST(out_w AS DOUBLE) / $patch) *
       |       ceil(CAST(out_h AS DOUBLE) / $patch) AS BIGINT) AS n_patches
       |FROM (
       |  SELECT doc_id, src_w, src_h,
       |    CASE WHEN src_w >= src_h THEN $fit
       |         ELSE CAST(src_w * $fit // src_h AS BIGINT) END AS out_w,
       |    CASE WHEN src_w >= src_h THEN CAST(src_h * $fit // src_w AS BIGINT)
       |         ELSE $fit END AS out_h
       |  FROM (
       |    SELECT doc_id,
       |      CAST(n_chars % 1024 + 16 AS BIGINT) AS src_w,
       |      CAST((n_chars * 7) % 768 + 16 AS BIGINT) AS src_h
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** m7: audio chunking — fixed-window segmentation with overlap (the
    * Whisper-style 30s-window prep, scaled down): each synthesized
    * clip (duration keyed off n_chars) explodes into rows of
    * [start, end) windows stepping `windowMs − overlapMs`, with the
    * per-chunk sample count at 16 kHz. All integer arithmetic; the
    * explode is map-side (sequence over a computed range), so 100 TB
    * of audio chunks without a shuffle until someone aggregates. */
  def audioChunk(spark: SparkSession, d: String, windowMs: Int = 10000,
                 overlapMs: Int = 1000, rateHz: Int = 16000): DataFrame = {
    val step = windowMs - overlapMs
    val docs = Tables.documents(spark, d)
    val dur = (col("n_chars") * 37 % 60000 + 1000).cast("long")
    docs.select(col("doc_id"), dur.as("duration_ms"))
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          greatest(ceil((col("duration_ms") - windowMs).cast("double") / step), lit(0))
            .cast("long"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * step).as("start_ms"),
        least(col("chunk_idx") * step + windowMs, col("duration_ms")).as("end_ms"))
      .withColumn("n_samples",
        ((col("end_ms") - col("start_ms")) * rateHz / 1000).cast("long"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def audioChunkSql(windowMs: Int = 10000, overlapMs: Int = 1000,
                    rateHz: Int = 16000): String = {
    val step = windowMs - overlapMs
    s"""SELECT doc_id, chunk_idx,
       |  chunk_idx * $step AS start_ms,
       |  least(chunk_idx * $step + $windowMs, duration_ms) AS end_ms,
       |  CAST((least(chunk_idx * $step + $windowMs, duration_ms) - chunk_idx * $step)
       |    * $rateHz // 1000 AS BIGINT) AS n_samples
       |FROM (
       |  SELECT doc_id, duration_ms,
       |    unnest(range(0, CAST(greatest(
       |      ceil(CAST(duration_ms - $windowMs AS DOUBLE) / $step), 0) AS BIGINT) + 1)) AS chunk_idx
       |  FROM (SELECT doc_id, CAST(n_chars * 37 % 60000 + 1000 AS BIGINT) AS duration_ms
       |        FROM documents))
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  case class MediaRow(doc_id: Long, blob: Array[Byte])
  case class MediaFeature(doc_id: Long, n_bytes: Int,
                          c0: Int, c1: Int, c2: Int, c3: Int,
                          c4: Int, c5: Int, c6: Int, c7: Int)

  /** The batched-inference stub: the real system would decode images /
    * run a vision encoder per batch inside `mapPartitions` (the Scala
    * analogue of `mapInPandas`) — amortizing model setup over a
    * partition and keeping the plan map-only. Here `decodeBatch` is a
    * deterministic fake (byte histogram → 8-dim feature); the
    * batching, schema, and partitioning are the production shape.
    */
  def decodeBatched(spark: SparkSession, d: String, batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[MediaRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch — the expensive-setup boundary
        decodeBatch(batch)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** `queries()` surface for the batched decoder — already flat scalar
    * columns (the driver's row-hash compare cannot sort array cells). */
  def decodeBatchedFlat(spark: SparkSession, d: String): DataFrame =
    decodeBatched(spark, d)

  /** deterministic fake decoder (stands in for image/audio libs not
    * present in this container): 8-bucket byte histogram as integer
    * counts — exact, so the whole batched path is oracle-checkable */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeature] =
    batch.map { m =>
      val f = new Array[Int](8)
      var i = 0
      while (i < m.blob.length) { f(m.blob(i) & 7) += 1; i += 1 }
      MediaFeature(m.doc_id, m.blob.length,
        f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
    }

  /** DuckDB twin of the fake decoder, computed over BYTES (hex-pair
    * decode of the utf-8 blob), not codepoints — `unicode(ch) % 8`
    * would equal `byte & 7` only for pure-ASCII text, and that latent
    * assumption would silently break oracle parity on the first
    * non-ASCII doc. `byte & 7` = low-3-bits of the low hex nibble. */
  def decodeBatchSql: String = {
    val cs = (0 until 8).map(i =>
      s"CAST(len(list_filter(codes, x -> x = $i)) AS INTEGER) AS c$i").mkString(",\n      |  ")
    s"""SELECT doc_id, CAST(len(codes) AS INTEGER) AS n_bytes,
      |  $cs
      |FROM (SELECT doc_id,
      |        list_transform(regexp_extract_all(hex(encode(text)), '..'),
      |          p -> (strpos('0123456789ABCDEF', p[2]) - 1) % 8) AS codes
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin
  }

  /** m8: cross-video near-dup by shared frame fingerprints — the
    * standard video-dedup pipeline (sample keyframes, fingerprint
    * each, pair videos whose fingerprint SETS overlap). The
    * fingerprint itself is the stubbed decode step (here: md5 of the
    * frame's content chunk — a real deployment swaps in a pHash over
    * decoded pixels, same 128-bit column); everything around it is
    * the production shape and the 100 TB story:
    *
    *  - each "video" yields ≤ [[FrameMax]] distinct fingerprints
    *    (bounded per doc — fingerprints, never frames, ride the
    *    shuffle: 16 bytes × ≤16 rows per video at ANY payload size);
    *  - a fingerprint bucket contributes pairs only if ≤ `maxBucket`
    *    videos share it (a ubiquitous intro/outro frame would
    *    otherwise emit a quadratic bucket — d2's cap, same rationale);
    *  - candidate pairs aggregate `shared` counts in one shuffle and
    *    verify by frame-set Jaccard ≥ via `minShared` + the emitted
    *    ratio — no all-pairs stage anywhere.
    *
    * Frame content key: md5 of the fi-th `chunk`-char slice of the
    * text payload (content-based, so near-dup payloads share keys —
    * m2's positional key is unique per doc and would make every
    * overlap vacuously zero). */
  val FrameChunk = 32
  val FrameMax = 16

  def frameDedup(spark: SparkSession, d: String, minShared: Int = 2,
                 maxBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d).filter(length(col("text")) >= 1)
    val frames = docs.select(col("doc_id"),
        explode(sequence(lit(0),
          least(lit(FrameMax - 1),
            ((length(col("text")) - 1) / FrameChunk)).cast("int"))).as("fi"),
        col("text"))
      .select(col("doc_id"),
        md5(expr(s"substring(text, fi * $FrameChunk + 1, $FrameChunk)")).as("fk"))
      .distinct()
    val nf = frames.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val capped = frames
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("fk"))))
      .filter(col("bn") <= maxBucket).drop("bn")
    val a = capped.select(col("fk"), col("doc_id").as("id_a"))
    val b = capped.select(col("fk"), col("doc_id").as("id_b"))
    val pairs = a.join(b, Seq("fk"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
    pairs
      .join(nf.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(nf.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared_frames"),
        round(col("shared_frames").cast("double") /
          (col("na") + col("nb") - col("shared_frames")), 4).as("overlap"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB twin of [[frameDedup]] — substr/len count codepoints in
    * both engines on BMP text (the corpus assert d2's spec owns), and
    * md5-of-substring hashes the same utf-8 bytes (the d1 precedent). */
  def frameDedupSql(minShared: Int = 2, maxBucket: Int = 64): String =
    s"""WITH fr AS (SELECT DISTINCT doc_id,
       |    md5(substr(text, fi * $FrameChunk + 1, $FrameChunk)) AS fk
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, least($FrameMax, (len(text) + ${FrameChunk - 1}) // $FrameChunk))) AS fi
       |        FROM documents WHERE len(text) >= 1)),
       |nf AS (SELECT doc_id, count(*) AS n FROM fr GROUP BY doc_id),
       |capped AS (SELECT doc_id, fk FROM (
       |    SELECT doc_id, fk, count(*) OVER (PARTITION BY fk) AS bn FROM fr)
       |  WHERE bn <= $maxBucket),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |  FROM capped a JOIN capped b ON a.fk = b.fk AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.id_a, p.id_b, CAST(p.shared AS BIGINT) AS shared_frames,
       |  round(CAST(p.shared AS DOUBLE) / (na.n + nb.n - p.shared), 4) AS overlap
       |FROM pairs p
       |JOIN nf na ON p.id_a = na.doc_id
       |JOIN nf nb ON p.id_b = nb.doc_id
       |WHERE p.shared >= $minShared
       |ORDER BY id_a, id_b""".stripMargin
}
