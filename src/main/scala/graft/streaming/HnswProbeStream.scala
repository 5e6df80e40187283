package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.HnswStore
import graft.functions.FakeEmbedder

/** Streaming serving against the persisted HNSW hierarchy — the
  * hierarchical twin of [[SrpProbeStream]]/[[IvfProbeStream]],
  * completing the streaming path for every index family. Each
  * micro-batch embeds its queries driver-side (batch query set is
  * bounded) and walks the stored hierarchy per query: the descent
  * reads pruned (layer, pb) partitions, the layer-0 tail hops the
  * stored edge table — no bucket probing, no training, no graph
  * construction anywhere in the stream.
  *
  * `foreachBatch` is the supported seam for the per-batch dynamic
  * walk — the partitions a descent touches depend on the query, so a
  * static stream-static join shape would scan every layer partition
  * each batch. */
object HnswProbeStream {

  /** One batch of queries against the store: the shared kernel of the
    * stream and its batch twin ([[HnswStore.search]] per query).
    * Store-only serving — no corpus dir anywhere in the stream. */
  def probeBatch(spark: SparkSession, storeDir: String,
                 queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    import spark.implicits._
    val perQuery = queries.map { case (qid, qv) =>
      HnswStore.search(spark, storeDir, qv, k)
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
  def runOnce(spark: SparkSession, queriesDir: String,
              storeDir: String, k: Int = 10,
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
    // read under the appender's lock — awaitTermination alone gives no
    // formal happens-before edge for the buffer
    out.synchronized(out.toSeq).toDF("query_id", "neighbor_id", "rk", "sim")
  }
}
