package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.CodeStore
import graft.functions.FakeEmbedder

/** Streaming compact-code serving against the persisted [[CodeStore]]
  * — the code-scan twin of [[SrpProbeStream]]/[[IvfProbeStream]],
  * completing the streaming-probe matrix across all four index
  * families. Each micro-batch:
  *
  *   1. embeds its queries driver-side (batch query set is bounded);
  *   2. Hamming-shortlists each query with ONE 8-byte-per-row scan of
  *      the committed code rows (the embedding column is never read —
  *      parquet column projection, [[CodeStore.search]]'s scan);
  *   3. reranks the ≤ shortlist winners from the store's own in-row
  *      embeddings via a pb-pruned point fetch.
  *
  * At 100 TB a micro-batch therefore costs |batch| code scans of
  * 8 B/row (embarrassingly parallel, no seed-quality failure mode)
  * plus |batch|·shortlist pruned embedding reads — never a corpus
  * scan, never a bucket-recall miss. `foreachBatch` is the supported
  * seam, as in the other probe streams. */
object CodeProbeStream {

  /** One batch of queries against the store: the shared kernel of the
    * stream and its batch twin ([[CodeStore.search]] per query). */
  def probeBatch(spark: SparkSession, storeDir: String,
                 queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    import spark.implicits._
    val perQuery = queries.map { case (qid, qv) =>
      CodeStore.search(spark, storeDir, qv, k)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          col("rk"), col("sim"))
    }
    if (perQuery.isEmpty)
      Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "neighbor_id", "rk", "sim")
    else perQuery.reduce(_ unionAll _)
  }

  /** Drain a query-text stream through the store once (AvailableNow),
    * returning all emitted (query, neighbor, rk, sim) rows. `embedder`
    * is the model seam — queries embed driver-side per micro-batch
    * (bounded by the trigger), [[FakeEmbedder]] by default. */
  def runOnce(spark: SparkSession, queriesDir: String, storeDir: String,
              k: Int = 10,
              embedder: graft.functions.Embedder = FakeEmbedder): DataFrame = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val queries = spark.readStream
      .schema("query_id LONG, query_text STRING")
      .json(queriesDir)
    val q = queries.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val qs = batch.collect()
          .map(r => (r.getLong(0), embedder.embed(r.getString(1)))).toSeq
        if (qs.nonEmpty) {
          val rows = probeBatch(spark, storeDir, qs, k).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          out.synchronized { out ++= rows: Unit }
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // read under the same lock the streaming thread appended under —
    // awaitTermination alone gives no formal happens-before edge
    out.synchronized(out.toSeq).toDF("query_id", "neighbor_id", "rk", "sim")
  }
}
