package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.vectors

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
    * upserted or looked up downstream. */
  def embedDocuments(raw: DataFrame, idCol: String): DataFrame = {
    require(raw.columns.contains(idCol),
      s"embedDocuments: id column '$idCol' not in ${raw.columns.mkString(",")}")
    raw
      .filter(col(idCol).isNotNull)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("text", regexp_replace(col("text"), "\\s+", " "))
      .withColumn("n_chars", length(col("text")))
      .withColumn("embedding", vectors.embed_text(col("text")))
  }

  def fromCsv(spark: SparkSession, path: String, idCol: String = "doc_id"): DataFrame =
    embedDocuments(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path), idCol)

  def fromJsonl(spark: SparkSession, path: String, idCol: String = "doc_id"): DataFrame =
    embedDocuments(spark.read.json(path), idCol)

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
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(rawDir)
      .transform(embedDocuments(_, "doc_id"))
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
