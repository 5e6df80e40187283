package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{HammingIndex, SrpBanded}

/** Persisted binary-code store — the on-disk artifact for the
  * compact-code scan family ([[graft.operators.HammingIndex]], v36):
  * a FRESH session answers queries from this store with zero coding
  * work and ZERO corpus access at query time (the v28/v32 contract,
  * extended to the code-scan family).
  *
  * Layout: `<dir>/codes/pb=<p>/` — rows `(vec_id, keys, embedding)`,
  * partitioned by `pb = pmod(vec_id, Partitions)`. One artifact
  * serves BOTH stages of the serve path, each reading only what it
  * needs:
  *
  *  - the SHORTLIST stage selects (vec_id, keys) — parquet's column
  *    projection never reads the embedding column, so the linear
  *    scan is the 8-byte-per-row scan the family exists for;
  *  - the RERANK stage point-fetches (vec_id, embedding) for the
  *    ≤ shortlist winners with a pb-pruned read (PartitionFilters
  *    decided in the file index before any IO) — the embeddings
  *    live in the SAME rows, so no stage joins the corpus table.
  *
  * Write-once artifact (codes are a pure function of the pinned
  * hyperplanes and the corpus): refresh goes through a full
  * [[write]] — the incremental path for this family is the banding
  * upsert ([[SrpStore.upsert]]), since the banding IS these keys in
  * exploded form.
  */
object CodeStore {

  /** pb buckets — matches [[EdgeStore.EdgePartitions]] so a fetch of
    * `shortlist` ids prunes to at most that many partitions */
  val Partitions = 64

  def write(spark: SparkSession, d: String, dir: String): Unit = {
    HammingIndex.coded(spark, d)
      .withColumn("pb", pmod(col("vec_id"), lit(Partitions.toLong)))
      .repartition(col("pb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pb")
      .parquet(s"$dir/codes")
    graft.Tables.invalidate(dir)
  }

  private val frameCache = new graft.SessionCache[String, DataFrame](8)
  graft.Tables.onInvalidate { p =>
    frameCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }

  /** The code columns only — the embedding column is projected away
    * here so the shortlist scan never reads it (ReadSchema is the
    * spec hook). */
  private def codesFrame(spark: SparkSession, dir: String): DataFrame =
    frameCache.getOrElseUpdate(spark, dir)(
      spark.read.parquet(s"$dir/codes")
        .select(col("vec_id"), col("keys"), col("pb").cast("long").as("pb")))

  /** executed plans of the last serve — spec hooks */
  @volatile var lastScanPlan: String = ""
  @volatile var lastFetchPlan: String = ""

  /** v37: v36 served entirely from the store — code scan over the
    * 8-byte rows, pb-pruned embedding point-fetch for the shortlist,
    * exact rerank. No corpus dir in the signature. Identical rows to
    * [[HammingIndex.search]] (same keys, same IEEE cosine), so it
    * shares v36's oracle. */
  def search(spark: SparkSession, dir: String, queryVec: Array[Float],
             k: Int = 10, shortlist: Int = HammingIndex.Shortlist): DataFrame = {
    val qk = SrpBanded.queryBandKeys(queryVec).map(_._2)
    val scan = codesFrame(spark, dir)
      .select(col("vec_id"), HammingIndex.hammingCol(qk).as("ham"))
    lastScanPlan = scan.queryExecution.executedPlan.toString
    // bounded driver state: the shortlist ids (≤ shortlist rows) —
    // the same O(k) license every single-query serve here documents
    val ids = scan.orderBy(col("ham").asc, col("vec_id").asc)
      .limit(shortlist).collect().map(_.getLong(0)).toSeq
    val pbs = ids.map(Math.floorMod(_, Partitions.toLong)).distinct
    val fetch = spark.read.parquet(s"$dir/codes")
      .filter(col("pb").isin(pbs: _*) && col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding"))
    lastFetchPlan = fetch.queryExecution.executedPlan.toString
    HammingIndex.rerank(fetch, queryVec, k)
  }

  // one code store per corpus dir, built lazily for the queries()
  // entry — a real deployment writes it at ingest time
  private val storeCache = new graft.SessionCache[String, String](
    4, (_: String) => ())
  graft.Tables.onInvalidate { p =>
    storeCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def storeFor(spark: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(spark, d) {
      val dir = java.nio.file.Files.createTempDirectory("codestore").toString
      write(spark, d, dir)
      dir
    }
}
