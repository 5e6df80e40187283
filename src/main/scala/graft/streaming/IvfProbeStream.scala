package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.IvfIndex
import graft.sources.IvfStore
import graft.functions.{vectors, FakeEmbedder}

/** Streaming ANN serving against the persisted IVF store — the
  * streaming upgrade of [[EventStream.knnStream]], which scores every
  * query against the WHOLE corpus. Here each micro-batch:
  *
  *   1. embeds its queries (driver-side: a batch's query set is
  *      bounded, like every collected model state in this repo);
  *   2. ranks centroids per query (tiny matrix, memoized per store);
  *   3. scans ONLY the union of probed list partitions — the same
  *      `PartitionFilters` pruning the batch probe gets, re-planned
  *      per batch because the probed set depends on the batch;
  *   4. broadcast-joins (query, list) pairs to the pruned lists and
  *      keeps per-query top-k via the TopKPairs aggregate.
  *
  * At 100 TB the store is thousands of list partitions on a
  * distributed FS; a micro-batch of q queries × nprobe lists touches
  * q·nprobe of them, independent of corpus size. `foreachBatch` is
  * the supported seam for per-batch dynamic pruning — a plain
  * stream-static join would scan every list partition each batch. */
object IvfProbeStream {

  /** last probe's physical plan, for pruning assertions in specs */
  @volatile private[graft] var lastProbePlanThunk: () => String = () => ""
  private[graft] def lastProbePlan: String = lastProbePlanThunk()

  /** One batch of queries against the store: the shared kernel of the
    * stream and its batch twin. */
  def probeBatch(spark: SparkSession, storeDir: String,
                 queries: Seq[(Long, Array[Float])], k: Int, nprobe: Int,
                 vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import spark.implicits._
    val model = IvfStore.readCentroids(spark, storeDir)
    val pairs = queries.flatMap { case (qid, qv) =>
      IvfIndex.rankLists(model, qv, nprobe).map(l => (qid, l, qv))
    }
    val qdf = pairs.toDF("query_id", "list_id", "q_vec")
    val probedLists = pairs.map(_._2).distinct
    val lists = spark.read.parquet(s"$storeDir/lists")
      .filter(col("list_id").isin(probedLists: _*)) // partition-pruned
    val res = lists.join(broadcast(qdf), Seq("list_id"))
      .select(col("query_id"),
        col(idCol).as("neighbor_id"),
        round(vectors.cosine_sim(col(vecCol), col("q_vec")), 6).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(
        col("neighbor_id"), col("score"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.score").as("score"))
    lastProbePlanThunk = () => res.queryExecution.executedPlan.toString
    res
  }

  /** Drain a query-text stream through the store once
    * (AvailableNow), returning all emitted (query, neighbor, score)
    * rows. */
  def runOnce(spark: SparkSession, queriesDir: String, storeDir: String,
              k: Int = 5, nprobe: Int = 2,
              embedder: graft.functions.Embedder = FakeEmbedder): DataFrame = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val queries = spark.readStream
      .schema("query_id LONG, query_text STRING")
      .json(queriesDir)
    val q = queries.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val qs = batch.collect()
          .map(r => (r.getLong(0), embedder.embed(r.getString(1)))).toSeq
        if (qs.nonEmpty) {
          val rows = probeBatch(spark, storeDir, qs, k, nprobe).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          out.synchronized { out ++= rows: Unit }
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // read under the appender's lock — awaitTermination alone gives no
    // formal happens-before edge for the buffer
    out.synchronized(out.toSeq).toDF("query_id", "neighbor_id", "score")
  }
}
