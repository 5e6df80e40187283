package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.SigStore

/** Streaming incremental dedup against the persisted [[SigStore]] —
  * the continuous-ingest form of d13: documents arrive as a stream,
  * each micro-batch is near-duped against the store's band-signature
  * index (probed buckets only — the corpus is never re-banded), and
  * with `upsertEach` the batch is then committed into the store so
  * LATER batches dedup against it too. That closes the pipeline loop
  * a crawl ingest needs: a pair between documents of DIFFERENT
  * micro-batches is found exactly once, by the later batch's probe
  * (the earlier side is "stored", never "new").
  *
  * Contract vs the one-shot serve (spec-asserted): the union of all
  * micro-batch emissions is a SUPERSET of the one-shot d13 pair set
  * over the same arrivals, with equality unless a bucket crosses
  * [[SigStore.MaxBucket]] MID-stream — bucket occupancy only grows,
  * so any pair the one-shot run keeps (final bucket ≤ cap) was also
  * under the cap when its later side arrived; a bucket that ends
  * OVER the cap may still have yielded verified pairs while small.
  * Every emitted pair is exact-Jaccard-verified either way, so the
  * divergence is extra TRUE near-dups, never noise.
  *
  * `foreachBatch` is the supported seam, as in the other probe
  * streams; per micro-batch cost is the d13 contract — O(batch)
  * banding + pruned bucket reads + verified pairs — never O(corpus).
  */
object SigProbeStream {

  /** Drain a `{doc_id, text}` JSON stream once (AvailableNow),
    * returning every (id_a, id_b, jaccard) near-dup pair emitted
    * across micro-batches. */
  def runOnce(spark: SparkSession, docsDir: String, storeDir: String,
              upsertEach: Boolean = true,
              maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(docsDir)
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // micro-batches re-enter the serve after the previous upsert
        // commit, so the store each batch probes already holds every
        // earlier batch — the ordering that makes cross-batch pairs
        // exactly-once (the earlier side is "stored", never "new")
        val b = batch.select(col("doc_id"), col("text")).localCheckpoint(true)
        if (b.count() > 0) {
          val rows = SigStore.incrementalNearDup(spark, storeDir, b).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          out.synchronized { out ++= rows: Unit }
          if (upsertEach) SigStore.upsert(spark, storeDir, b)
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    out.synchronized(out.toSeq).toDF("id_a", "id_b", "jaccard")
  }
}
