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
  /** NOTE: `window(ts, '1 day')` buckets on UTC-epoch-aligned day
    * boundaries while the batch twin's `date_trunc('day')` truncates
    * in the session timezone — the two agree only when
    * `spark.sql.session.timeZone` is UTC (every entry point in this
    * repo pins it). A non-UTC deployment must align the two. */
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

  /** Streaming similarity search — a stream of query texts scored
    * against the static embedding corpus (stream-static join): each
    * micro-batch embeds its queries with the native expression,
    * broadcast-joins the static side, and emits per-query top-k via
    * the TopKPairs aggregate. The serving-adjacent shape the
    * reference's find_similar tool would take on Spark. */
  def knnStream(spark: SparkSession, queriesDir: String, corpusDir: String,
                k: Int = 5): DataFrame = {
    import graft.functions.vectors
    val queries = spark.readStream
      .schema("query_id LONG, query_text STRING")
      .json(queriesDir)
      .select(col("query_id"), vectors.embed_text(col("query_text")).as("q_vec"))
    val corpus = Tables.embeddings(spark, corpusDir)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    queries.join(corpus) // stream-static cross: corpus broadcast per batch
      .select(col("query_id"), col("neighbor_id"),
        round(vectors.cosine_sim(col("embedding"), col("q_vec")), 6).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(col("neighbor_id"), col("score"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"), col("p.score").as("score"))
  }

  def runKnnStreamOnce(spark: SparkSession, queriesDir: String, corpusDir: String,
                       k: Int = 5, name: String = "graft_s4"): DataFrame = {
    val q = knnStream(spark, queriesDir, corpusDir, k)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Stream-stream join — clicks joined to the same user's purchases
    * within the next 30 minutes. Watermarks + the time-range predicate
    * bound both join states; without them a stream-stream join buffers
    * forever. Batch twin below is the oracle-checked semantics. */
  def clickPurchaseJoinStream(spark: SparkSession, d: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, d).schema
    def src() = Tables.eventsNormalize(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purch_ts"))
      .withWatermark("purch_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purch_ts") >= col("click_ts") &&
        col("purch_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"))
  }

  def runClickPurchaseJoinOnce(spark: SparkSession, d: String,
                               name: String = "graft_s5"): DataFrame = {
    val q = clickPurchaseJoinStream(spark, d)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** batch twin of the stream-stream join (oracle-checked as s2) */
  def clickPurchaseJoinBatch(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        expr("unix_millis(ts)").as("click_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        expr("unix_millis(ts)").as("purch_ms"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purch_ms") >= col("click_ms") &&
        col("purch_ms") <= col("click_ms") + 1800000L)
      .select(col("click_id"), col("purchase_id"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  def clickPurchaseJoinSql: String =
    """SELECT c.click_id, p.purchase_id FROM
      |  (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
      |   FROM events WHERE event_type = 'click') c
      |JOIN
      |  (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS purch_ms
      |   FROM events WHERE event_type = 'purchase') p
      |ON c.user_id = p.user_id
      |  AND p.purch_ms >= c.click_ms AND p.purch_ms <= c.click_ms + 1800000
      |ORDER BY click_id, purchase_id""".stripMargin

  /** Streaming dedup — `dropDuplicatesWithinWatermark` bounds the
    * dedup state to the watermark horizon: the streaming-ingest guard
    * against replayed/duplicated events (at 100 TB/day the state
    * store only ever holds one horizon's worth of keys). Plain
    * `dropDuplicates("event_id")` would never evict state, because the
    * event-time column is not part of the key subset.
    *
    * Keeper semantics: the FIRST-arriving row per event_id survives —
    * exact-duplicate replays (the streaming-ingest case this guards)
    * are keeper-independent; duplicates with DIVERGENT payloads would
    * make the survivor arrival-order-dependent (the batch twin below
    * pins min(event_type) instead; the spec asserts the corpus has no
    * divergent duplicates so the two stay comparable). A chained
    * min-normalization before the dedup is not expressible here:
    * complete-mode queries reject a second stateful operator. */
  def dedupStream(spark: SparkSession, d: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, d).schema
    Tables.eventsNormalize(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Append-mode hourly counts over an arbitrary event directory —
    * the late-data contract made testable: a window is emitted exactly
    * once, when the watermark passes its end, and events arriving
    * after that are DROPPED (not silently merged into a corrected
    * result). This is the at-scale trade: bounded state + exactly-one
    * emission per window, in exchange for discarding stragglers older
    * than the lateness bound. Pair with `maxFilesPerTrigger` to
    * control micro-batch granularity. */
  def hourlyCountsAppendStream(spark: SparkSession, dir: String,
                               lateness: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"))
  }

  /** Batch twin of [[dedupStream]] for the oracle gate. The keeper is
    * DETERMINISTIC — min(event_type) per event_id — because Spark's
    * dropDuplicates and DuckDB's any_value both keep an arbitrary row,
    * which agree only while the data happens to have no duplicate ids;
    * a min-keeper stays gate-stable if replayed events ever differ. */
  def dedupBatch(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .groupBy(col("event_id"))
      .agg(min(col("event_type")).as("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  def dedupBatchSql: String =
    """SELECT event_type, count(*) AS n FROM (
      |  SELECT event_id, min(event_type) AS event_type
      |  FROM events GROUP BY event_id)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  def runDedupOnce(spark: SparkSession, d: String,
                   name: String = "graft_s3"): DataFrame = {
    val q = dedupStream(spark, d)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class SessionState(lastMs: Long, sessions: Long, events: Long)
  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom-state streaming sessionization: per-user 30-min-gap
    * session counting via `flatMapGroupsWithState`. Semantically the
    * batch q12 (CoreQueries.q12Sessionize); the spec asserts they
    * agree on the same files. State is O(1) per user — the shape that
    * survives unbounded streams.
    *
    * Ordering assumption: events for one user arrive in event-time
    * order ACROSS micro-batches (within a batch they are sorted here).
    * That holds for replaying time-ordered files (this harness) and
    * for log-ordered sources; for genuinely out-of-order streams,
    * buffer per-user events behind a watermark (see dedupStream) and
    * fold only below the horizon — at the cost of O(horizon) state.
    */
  def sessionizeStream(spark: SparkSession, d: String, gapMs: Long = 1800000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = Tables.eventsRaw(spark, d).schema
    val events = Tables.eventsNormalize(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
      .select(col("user_id"), expr("unix_millis(ts)").as("ms"))
      .as[(Long, Long)]

    def update(userId: Long, rows: Iterator[(Long, Long)],
               state: GroupState[SessionState]): Iterator[SessionSummary] = {
      // within one micro-batch the iterator is not time-ordered; sort
      // (bounded by batch size, not stream size)
      val sorted = rows.map(_._2).toArray.sorted
      var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
      sorted.foreach { ms =>
        val newSession = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
        st = SessionState(ms, st.sessions + (if (newSession) 1 else 0), st.events + 1)
      }
      state.update(st)
      Iterator.single(SessionSummary(userId, st.sessions, st.events))
    }

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }

  /** run the sessionization stream to completion over the static files */
  def runSessionizeOnce(spark: SparkSession, d: String,
                        name: String = "graft_s2"): DataFrame = {
    val q = sessionizeStream(spark, d)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // memory sink in update mode appends updated rows; last row per
    // user is the final state
    val t = spark.table(name)
    import org.apache.spark.sql.expressions.Window
    t.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
  }

  /** s4: streaming trending — per-hour top-3 event types by count.
    * The stream side is the watermarked windowed count (the only
    * stateful operator; ranking a stream INSIDE the query would need
    * a second stateful op, which complete-mode rejects), and the
    * top-3 cut runs over the sink — the standard serve-side trim for
    * a trending board. Batch twin below carries identical semantics
    * end-to-end and is the oracle-checked entry; the spec asserts
    * stream == batch over the same files. */
  def trendingStream(spark: SparkSession, d: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, d).schema
    Tables.eventsNormalize(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("hour_ts"),
        col("event_type"), col("n"))
  }

  /** rank-and-trim a counts table to the top-3 per hour (deterministic
    * tie-break on event_type) — applied to the memory sink by the
    * stream path and inline by the batch twin */
  def trendingTop3(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("hour_ts")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("hour_ts"), col("rk"))
  }

  def runTrendingOnce(spark: SparkSession, d: String,
                      name: String = "graft_s5"): DataFrame = {
    val q = trendingStream(spark, d)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    trendingTop3(spark.table(name))
  }

  /** batch twin — the oracle-checked s4 entry */
  def trendingBatch(spark: SparkSession, d: String): DataFrame =
    trendingTop3(
      Tables.events(spark, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n")))

  def trendingSql: String =
    """SELECT hour_ts, event_type, n, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT hour_ts, event_type, n,
      |    row_number() OVER (PARTITION BY hour_ts ORDER BY n DESC, event_type) AS rk
      |  FROM (
      |    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_ts,
      |      event_type, count(*) AS n
      |    FROM events GROUP BY hour_ts, event_type))
      |WHERE rk <= 3 ORDER BY hour_ts, rk""".stripMargin
}
