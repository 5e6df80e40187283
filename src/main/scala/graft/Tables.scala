package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Each loader is a bare parquet scan — projection and predicates are
  * left to the caller so Catalyst pushes them into the scan
  * (`PushedFilters` / `ReadSchema`). At cluster scale these paths
  * would be partitioned directories; the API shape is unchanged.
  */
object Tables {
  // Memoize the analyzed scan per (session, dir, table): a fresh
  // `spark.read.parquet` re-lists files and re-reads the footer schema
  // on EVERY call, a fixed ~50-100 ms tax on each of the ~70 inventory
  // queries. The DataFrame handle is lazy (no data pinned) and is
  // bound to its session, so entries of stopped sessions are dropped
  // on lookup. On a real deployment this role is played by the
  // catalog/metastore, which caches listings the same way.
  private val scanCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    scanCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    // isStopped only fires when the whole context dies; a long-lived
    // driver churning through newSession() instances would otherwise
    // grow this map forever. Handles are cheap to rebuild — just drop
    // everything past a generous bound.
    if (scanCache.size > 512) scanCache.clear()
    scanCache.getOrElseUpdate((spark, sfDir, name),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and floor-convert to the
    * engine's micros timestamp (`div` stays in exact integer
    * arithmetic — ns epochs overflow double precision). */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** normalize a raw events frame: nanos-long ts → micros timestamp */
  def eventsNormalize(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }

  def events(s: SparkSession, d: String): DataFrame =
    eventsNormalize(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
