package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.Tables

/** Structured Streaming surface (§2 s1): the events table as a
  * stream — file source → watermark → tumbling-window aggregate →
  * sink. The batch twin (`dailyCountsBatch`) has identical semantics
  * and is what the oracle checks; the spec runs the streaming form
  * over the same files and asserts it converges to the batch answer.
  */
object EventStream {

  /** watermarked windowed aggregation as a streaming DataFrame */
  def dailyCountsStream(spark: SparkSession, d: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, d).schema
    Tables.eventsNormalize(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
  }

  /** run the stream to completion against the static files (memory sink) */
  def runOnce(spark: SparkSession, d: String, name: String = "graft_s1"): DataFrame = {
    val q: StreamingQuery = dailyCountsStream(spark, d)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** batch twin — same grain, oracle-checkable */
  def dailyCountsBatch(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"), col("event_type"))

  def dailyCountsSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  event_type, count(*) AS n
      |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin
}
