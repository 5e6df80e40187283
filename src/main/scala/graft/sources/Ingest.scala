package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Embedder, FakeEmbedder}

/** Document ingestion — the Spark batch form of the reference's
  * schema + seed + embed flow (sql/02_schema.sql, 03_seed_data.sql,
  * 04_embeddings.sql): land raw records, normalize, embed, store
  * columnar.
  *
  * Reads CSV or JSONL (schema inferred or supplied), computes the
  * embedding column with the native `embed_text` expression (a real
  * model swaps in behind the same map-only plan), and writes parquet.
  * Everything is one narrow pipeline — ingestion of N TB is a single
  * scan+write with no shuffle unless `bucketCount` asks for a
  * bucketed layout.
  */
object Ingest {

  /** normalize + embed raw documents (expects a `text` column and the
    * named id column; extra metadata columns pass through). Rows
    * without an id are dropped — a keyless record can never be
    * upserted or looked up downstream.
    *
    * `embedder` is the model seam ([[graft.functions.Embedder]] — the
    * reference's `embedding('text-embedding-005', $1)` slot,
    * tools.yaml:23): the default deterministic [[FakeEmbedder]] keeps
    * the pipeline oracle-checkable; a real deployment passes its own
    * implementation and nothing downstream changes. */
  def embedDocuments(raw: DataFrame, idCol: String,
                     embedder: Embedder = FakeEmbedder): DataFrame = {
    require(raw.columns.contains(idCol),
      s"embedDocuments: id column '$idCol' not in ${raw.columns.mkString(",")}")
    raw
      .filter(col(idCol).isNotNull)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("text", regexp_replace(col("text"), "\\s+", " "))
      .withColumn("n_chars", length(col("text")))
      .transform(df => embedder.embedFrame(df, "text"))
  }

  def fromCsv(spark: SparkSession, path: String, idCol: String = "doc_id",
              embedder: Embedder = FakeEmbedder): DataFrame =
    embedDocuments(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path),
      idCol, embedder)

  def fromJsonl(spark: SparkSession, path: String, idCol: String = "doc_id",
                embedder: Embedder = FakeEmbedder): DataFrame =
    embedDocuments(spark.read.json(path), idCol, embedder)

  /** write the embedded store; optionally bucketed by id for
    * shuffle-free point lookups and co-located joins downstream */
  def write(df: DataFrame, outDir: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(outDir)
    // cached scans hold the pre-overwrite file listing — refresh them
    graft.Tables.invalidate(outDir)
  }

  /** Hive-style partitioned layout: one directory per value of the
    * partition columns. At 100 TB this is the first pruning tier —
    * a reader filtering on the partition column never lists, let
    * alone scans, the other directories (`PartitionFilters` in the
    * plan, vs `PushedFilters` which still opens every file). Choose
    * low-cardinality columns (lang, source, date); high-cardinality
    * partitioning explodes the file count and kills the driver's
    * file index. */
  def writePartitioned(df: DataFrame, outDir: String, partitionCols: String*): Unit = {
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(outDir)
    graft.Tables.invalidate(outDir)
  }

  /** v9: oracle-checkable digest of the embed-ingest path.
    *
    * [[graft.functions.FakeEmbedder]] is char-trigram FNV-1a feature
    * hashing (integer ±1 bucket votes) followed by L2 normalization —
    * so the PRE-normalization state is pure integer arithmetic that a
    * SQL engine can replicate exactly: per-doc bucket weights and
    * their squared norm. This query emits
    *   (doc_id, feature_md5, sq_norm, dim, consistent)
    * where feature_md5 fingerprints the 64 integer weights,
    * sq_norm = Σw², and `consistent` is the Spark-side check that the
    * ACTUAL embedding column (the codegen'd `embed_text` expression)
    * equals weights/√sq_norm componentwise. The oracle recomputes the
    * integer side in DuckDB and emits `TRUE AS consistent` — if
    * `embed_text` ever drifts from the portable formula, the Spark
    * side flips to false and the hash compare fails loudly. No float
    * ever reaches the compared columns.
    *
    * The JVM kernel iterates UTF-16 code units (`charAt`) while SQL
    * `substr`/`ascii` are codepoint-based — identical only below
    * U+10000. Both twins therefore decompose codepoints into UTF-16
    * units (surrogate pairs for astral chars) BEFORE the trigram
    * walk, so the digest is exact for ANY text, not just ASCII. */
  def embedIngestDigest(spark: SparkSession, d: String): DataFrame = {
    val fnv = {
      def step(h: String, c: String) = s"((($h) ^ ($c)) * 16777619) % 4294967296"
      step(step(step("2166136261", "a"), "b"), "c")
    }
    // FakeEmbedder brackets the lowercased text with STX/ETX
    // sentinels (U+0002/U+0003 — hidden as raw control chars in its
    // seemingly-empty source literals; visible in the bytecode), so
    // boundary trigrams vote too. Whitespace-normalize first, exactly
    // like embedDocuments does before embedding.
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"),
        concat(lit("\u0002"),
          lower(regexp_replace(col("text"), "\\s+", " ")), lit("\u0003")).as("s"))
    // codepoints → UTF-16 code units (exactly what charAt yields)
    val units = docs
      .select(col("doc_id"), expr(
        """flatten(transform(
          |  transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))),
          |  cp -> if(cp < 65536, array(cp),
          |           array(55296 + shiftright(cp - 65536, 10),
          |                 56320 + ((cp - 65536) % 1024)))))""".stripMargin.replaceAll("\\n\\s*\\|", " ")).as("u"))
    val tri = units.filter(size(col("u")) >= 3)
      .select(col("doc_id"), col("u"),
        explode(expr("sequence(1, size(u) - 2)")).as("i"))
      .select(col("doc_id"),
        expr("element_at(u, i)").as("a"),
        expr("element_at(u, i + 1)").as("b"),
        expr("element_at(u, i + 2)").as("c"))
      .select(col("doc_id"), expr(fnv).as("h3"))
    val wb = tri
      .select(col("doc_id"), expr("(h3 & 2147483647) % 64").as("bucket"),
        expr("case when (shiftright(h3, 31) & 1) = 0 then 1 else -1 end").as("sgn"))
      .groupBy(col("doc_id"), col("bucket")).agg(sum(col("sgn")).as("w"))
    // dense 64-bucket grid so absent buckets digest as explicit zeros
    val grid = docs.select(col("doc_id"), explode(expr("sequence(0, 63)")).as("bucket"))
    val wfull = grid.join(wb, Seq("doc_id", "bucket"), "left").na.fill(0L, Seq("w"))
    val dig = wfull.groupBy(col("doc_id")).agg(
      sort_array(collect_list(struct(col("bucket"), col("w")))).as("bw"),
      sum(col("w") * col("w")).as("sq_norm"))
    val emb = embedDocuments(
      graft.Tables.documents(spark, d).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("embedding"))
    dig.join(emb, Seq("doc_id"))
      .select(col("doc_id"),
        md5(concat_ws(",", expr("transform(bw, x -> cast(x.w as string))"))).as("feature_md5"),
        col("sq_norm"),
        size(col("embedding")).as("dim"),
        when(col("sq_norm") === 0,
          expr("forall(embedding, x -> x = cast(0 as float))"))
          .otherwise(expr(
            "forall(zip_with(embedding, transform(bw, x -> x.w), " +
              "(e, w) -> abs(e - w / sqrt(cast(sq_norm as double))) < 1e-5), p -> p)"))
          .as("consistent"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[embedIngestDigest]]'s integer side. */
  def embedIngestDigestSql: String = {
    def step(h: String, c: String) = s"(xor(($h), ($c)) * 16777619) % 4294967296"
    val fnv = step(step(step("2166136261", "a"), "b"), "c")
    s"""WITH t AS (SELECT doc_id, chr(2) || lower(regexp_replace(text, '\\s+', ' ', 'g')) || chr(3) AS s FROM documents
       |           WHERE text IS NOT NULL AND len(text) > 0 AND doc_id IS NOT NULL),
       |un AS (SELECT doc_id, flatten(list_transform(
       |          list_transform(range(1, len(s) + 1), i -> ascii(substr(s, i, 1))),
       |          cp -> CASE WHEN cp < 65536 THEN [cp]
       |                ELSE [55296 + (cp - 65536) // 1024, 56320 + (cp - 65536) % 1024] END)) AS u
       |        FROM t),
       |pos AS (SELECT doc_id, u, unnest(range(1, len(u) - 1)) AS i FROM un WHERE len(u) >= 3),
       |tri AS (SELECT doc_id, u[i] AS a, u[i + 1] AS b, u[i + 2] AS c FROM pos),
       |h AS (SELECT doc_id, $fnv AS h3 FROM tri),
       |wb AS (SELECT doc_id, (h3 & 2147483647) % 64 AS bucket,
       |         CAST(SUM(CASE WHEN ((h3 >> 31) & 1) = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w
       |       FROM h GROUP BY 1, 2),
       |grid AS (SELECT t.doc_id, g.bucket
       |         FROM t, (SELECT unnest(range(0, 64)) AS bucket) g),
       |wfull AS (SELECT grid.doc_id, grid.bucket, COALESCE(wb.w, 0) AS w
       |          FROM grid LEFT JOIN wb ON grid.doc_id = wb.doc_id AND grid.bucket = wb.bucket),
       |dig AS (SELECT doc_id,
       |          md5(string_agg(CAST(w AS VARCHAR), ',' ORDER BY bucket)) AS feature_md5,
       |          CAST(SUM(w * w) AS BIGINT) AS sq_norm
       |        FROM wfull GROUP BY doc_id)
       |SELECT doc_id, feature_md5, sq_norm, 64 AS dim, TRUE AS consistent
       |FROM dig ORDER BY doc_id""".stripMargin
  }

  /** ORC interchange — the other columnar format warehouses hand
    * around. Same pushdown/pruning machinery as parquet (verified in
    * spec via PushedFilters); raw text still enters via CSV/JSONL. */
  def writeOrc(df: DataFrame, outDir: String): Unit = {
    df.write.mode(SaveMode.Overwrite).orc(outDir)
    graft.Tables.invalidate(outDir)
  }

  def fromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Streaming ingestion with merge-on-read semantics: each
    * micro-batch of raw JSONL docs is embedded and APPENDED to a
    * staging dir stamped with a monotonically increasing version
    * (append is the only safe idempotent-ish streaming file sink);
    * readers resolve the current state with [[currentView]] —
    * latest version per id wins. Same write/read split Hudi/Delta
    * call merge-on-read; compaction = rewrite `currentView` as the
    * new base. */
  def streamIngest(spark: SparkSession, rawDir: String, stagingDir: String,
                   checkpointDir: String,
                   embedder: Embedder = FakeEmbedder): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(rawDir)
      .transform(embedDocuments(_, "doc_id", embedder))
      .writeStream
      .option("checkpointLocation", checkpointDir) // file-source progress
      // tracking: restarts resume from the last committed batch, so a
      // re-run ingests only NEW files and version numbers keep rising
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("__version", lit(batchId))
          .write.mode(SaveMode.Append).parquet(stagingDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** merge-on-read view over the staging dir: latest version per id.
    * Tie-break within a version on every remaining column so
    * same-batch duplicates resolve deterministically across runs and
    * partitionings (not by shuffle arrival order). */
  def currentView(spark: SparkSession, stagingDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.parquet(stagingDir)
    val tieCols = raw.columns.filterNot(c => c == "doc_id" || c == "__version")
      .sorted.map(c => col(c).asc_nulls_last)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("__version").desc +: tieCols: _*)
    raw
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__version", "__rn")
  }

  /** Upsert freshly-embedded records into an existing store — the
    * reference's "as soon as a new policy is added it is immediately
    * searchable" flow (README.md:68). Updates win over existing rows
    * with the same id; one union + one key shuffle. */
  def upsert(store: DataFrame, updates: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tagged = updates.withColumn("__pri", lit(1))
      .unionByName(store.withColumn("__pri", lit(0)), allowMissingColumns = true)
    // tie-break beyond __pri on every remaining column so duplicate
    // ids WITHIN updates resolve deterministically (not by shuffle
    // arrival order)
    val tieCols = tagged.columns.filterNot(c => c == idCol || c == "__pri")
      .sorted.map(c => col(c).asc_nulls_last)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__pri").desc +: tieCols: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__pri", "__rn")
  }
}
