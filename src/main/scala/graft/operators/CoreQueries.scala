package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** General SQL/analytics surface (§2 q1–q14) — the Postgres
  * capability class behind the reference's tool layer, re-expressed
  * as declarative DataFrame plans so Catalyst drives pushdown,
  * partial aggregation, and join strategy.
  *
  * Oracle-parity conventions (see SURVEY.md §5):
  * - money sums go through `decimal(18,2)` (exact) then one final
  *   cast to double — identical bits in Spark and DuckDB;
  * - integer-valued doubles (quantities) sum exactly in binary;
  * - ratios stay raw double divisions (IEEE-identical both engines);
  * - timestamps never appear raw in output — epoch millis or
  *   formatted strings.
  */
object CoreQueries {
  private val dec = "decimal(18,2)"

  /** q1: pricing summary — groupBy multi-aggregate over lineitem. */
  def q1PricingSummary(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val price = col("l_extendedprice").cast(dec)
    val disc = col("l_discount").cast(dec)
    val tax = col("l_tax").cast(dec)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast(dec) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1).cast(dec) - disc) * (lit(1).cast(dec) + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: per-row score + global top-N (plans as TakeOrderedAndProject —
    * per-partition heap, no global sort even at 100 TB). */
  def q2TopNRevenue(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)
  }

  def q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin

  /** q3: customer⋈orders⋈lineitem, revenue per order, top 10.
    * Customer side is broadcast (dimension-sized after the segment
    * filter); the lineitem fact never shuffles for the join. */
  def q3CustOrderRevenue(spark: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("timestamp")
    val cust = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
    li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  def q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q4: EXISTS → left-semi join; order-priority histogram. */
  def q4SemiJoin(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
    val bigLines = Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 45).select("l_orderkey")
    ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  def q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q5: fact⋈4 dims — all dimension joins broadcast. Revenue by
    * supplier nation within one region. */
  def q5RegionNation(spark: SparkSession, d: String): DataFrame = {
    val reg = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, d)
    val sup = Tables.supplier(spark, d)
    val li = Tables.lineitem(spark, d).select(col("l_suppkey"),
      (col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
    val dims = sup
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    li.join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q6: tight filter + single agg — the predicate-pushdown showcase. */
  def q6SelectiveFilter(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  def q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** q7: per-group top-3 by window rank. */
  def q7WindowRank(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    p.select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("price_rank", row_number().over(w))
      .filter(col("price_rank") <= 3)
      .orderBy(col("p_brand"), col("price_rank"))
  }

  def q7Sql: String =
    """SELECT p_brand, p_partkey, p_retailprice,
      |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank
      |FROM part
      |QUALIFY price_rank <= 3
      |ORDER BY p_brand, price_rank""".stripMargin

  /** q8: hierarchical ROLLUP over nation × segment. */
  def q8Rollup(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
      .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("nation"), col("segment"))
  }

  def q8Sql: String =
    """SELECT coalesce(n_name, '(all)') AS nation, coalesce(c_mktsegment, '(all)') AS segment,
      |  count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, c_mktsegment)
      |ORDER BY nation, segment""".stripMargin

  /** q9: NOT EXISTS → left-anti join (customers with no 1995 order). */
  def q9AntiJoin(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o95 = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_custkey")
    c.join(o95, c("c_custkey") === o95("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy(col("c_mktsegment"))
  }

  def q9Sql: String =
    """SELECT c_mktsegment, count(*) AS n_inactive FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q10: exact distinct aggregates (approx variant covered in spec —
    * HLL estimates are engine-specific so not oracle-comparable). */
  def q10DistinctAgg(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  def q10Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q11: tumbling 1-hour event-time window aggregate. */
  def q11EventWindow(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_ts"), col("event_type"))
  }

  def q11Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_ts,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hour_ts, event_type ORDER BY hour_ts, event_type""".stripMargin

  /** q12: 30-min-gap sessionization via lag + conditional count.
    * Batch analogue of streaming session windows; one shuffle on
    * user_id serves both the lag window and the final aggregate. */
  def q12Sessionize(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
    ev.select(col("user_id"), expr("unix_millis(ts)").as("ms"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  def q12Sql: String =
    """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_sess
      |  FROM (
      |    SELECT user_id, epoch_ms(ts) AS ms,
      |      lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev_ms
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q13: JSON property extraction + aggregate over events.props. */
  def q13JsonExtract(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        (sum(col("k")).cast("double") / count(lit(1))).as("k_avg"))
      .orderBy(col("event_type"))
  }

  def q13Sql: String =
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
      |  CAST(sum(k) AS DOUBLE) / count(*) AS k_avg
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q14: view→click→purchase funnel — users whose first view precedes
    * first click precedes first purchase. */
  def q14Funnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.select(col("user_id"), col("event_type"), expr("unix_millis(ts)").as("ms"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ms"))).as("ms_view"),
        min(when(col("event_type") === "click", col("ms"))).as("ms_click"),
        min(when(col("event_type") === "purchase", col("ms"))).as("ms_purchase"))
      .filter(col("ms_view") < col("ms_click") && col("ms_click") < col("ms_purchase"))
      .orderBy(col("user_id"))
  }

  def q14Sql: String =
    """SELECT user_id,
      |  min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS ms_view,
      |  min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS ms_click,
      |  min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS ms_purchase
      |FROM events GROUP BY user_id
      |HAVING ms_view < ms_click AND ms_click < ms_purchase
      |ORDER BY user_id""".stripMargin

  /** q16: exact interpolated percentiles per event type — both engines
    * define the continuous quantile as linear interpolation between
    * closest ranks, so the doubles match bit-for-bit. */
  def q16Percentiles(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  def q16Sql: String =
    """SELECT event_type, quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q17: set operations — INTERSECT / EXCEPT over derived key sets
    * (parts that ship in both halves of 1997 vs only the first). */
  def q17SetOps(spark: SparkSession, d: String): DataFrame = {
    // INTERSECT/EXCEPT as literal set ops would scan lineitem six
    // times and run three wide shuffles. Same semantics in ONE scan +
    // ONE shuffle: tag each partkey with the halves it shipped in
    // (map-side partial max), then bucket by the (h1, h2) flag pair.
    val li = Tables.lineitem(spark, d)
    def half(from: String, until: String) =
      col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp")
    val in1 = half("1997-01-01", "1997-07-01")
    val in2 = half("1997-07-01", "1998-01-01")
    val counts = li.filter(in1 || in2)
      .select(col("l_partkey"),
        when(in1, 1).otherwise(0).as("h1"),
        when(in2, 1).otherwise(0).as("h2"))
      .groupBy(col("l_partkey"))
      .agg(max(col("h1")).as("h1"), max(col("h2")).as("h2"))
      .select(when(col("h1") === 1 && col("h2") === 1, "both_halves")
        .when(col("h1") === 1, "h1_only").otherwise("h2_only").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    // set-op semantics emit a row per bucket even when it's empty —
    // groupBy alone would drop it; pin the bucket list
    import spark.implicits._
    Seq("both_halves", "h1_only", "h2_only").toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bucket"))
  }

  def q17Sql: String =
    """WITH h1 AS (SELECT DISTINCT l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'),
      |h2 AS (SELECT DISTINCT l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT 'both_halves' AS bucket, count(*) AS n FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
      |UNION ALL
      |SELECT 'h1_only' AS bucket, count(*) AS n FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
      |UNION ALL
      |SELECT 'h2_only' AS bucket, count(*) AS n FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1)
      |ORDER BY bucket""".stripMargin

  /** q18: latest-record-per-key compaction (CDC/upsert semantics) —
    * each user's most recent event wins. Deterministic tie-break on
    * (ms desc, event_id desc). */
  def q18LatestPerKey(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ms").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ms"))
      .orderBy(col("user_id"))
  }

  def q18Sql: String =
    """SELECT user_id, event_id, event_type, ms FROM (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q19: correlated-subquery shape — orders priced above their own
    * customer's average. Window form: ONE shuffle on o_custkey, then a
    * whole-partition average frame. The decorrelated-join alternative
    * (aggregate + join back) scans twice, and its "broadcast the
    * per-customer averages" variant dies at scale — the averages table
    * has one row per customer, which at 100 TB is billions of rows. */
  def q19AboveCustomerAvg(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val w = Window.partitionBy(col("o_custkey"))
    o.select(col("o_orderpriority"), col("o_totalprice"),
        (sum(col("o_totalprice").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w)).as("cust_avg"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("o_orderpriority"))
  }

  def q19Sql: String =
    """SELECT o_orderpriority, count(*) AS n_above FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q20: CUBE over two dimensions — all four grouping sets in one
    * pass (partial aggregation expands grouping ids map-side). */
  def q20Cube(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))
  }

  def q20Sql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |  coalesce(o_orderpriority, '(all)') AS priority,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** q21: RANGE-frame sliding window — per event, how many events and
    * how much value this user produced in the preceding hour
    * (inclusive). Exact counts + decimal sums keep the frame
    * aggregation oracle-parity-safe. */
  def q21SlidingWindow(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), expr("unix_millis(ts)").as("ms"),
        col("value").cast(dec).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-3600000L, 0L)
    ev.select(col("user_id"), col("event_id"), col("ms"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("v")).over(w).cast("double").as("sum_last_hour"))
      .orderBy(col("user_id"), col("ms"), col("event_id"))
  }

  def q21Sql: String =
    """SELECT user_id, event_id, ms,
      |  count(*) OVER w AS n_last_hour,
      |  CAST(sum(v) OVER w AS DOUBLE) AS sum_last_hour
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |        CAST(value AS DECIMAL(18,2)) AS v FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ms
      |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ms, event_id""".stripMargin

  /** q15: as-of join via the custom operator (graft.plans.AsOfJoin) —
    * every event annotated with the user's most recent prior-or-equal
    * purchase. Oracle: DuckDB's native ASOF LEFT JOIN. */
  def q15AsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_millis(ts)").as("ms"), col("event_type"))
    val purchases = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), expr("unix_millis(ts)").as("p_ms"), col("value"))
      .groupBy(col("pu"), col("p_ms"))
      .agg(max(col("value")).as("p_value"))
    graft.plans.AsOfJoinOps.asofJoin(ev, purchases, "user_id", "pu", "ms", "p_ms")
      .select(col("user_id"), col("ms"), col("event_type"), col("p_ms"), col("p_value"))
      .orderBy(col("user_id"), col("ms"), col("event_type"))
  }

  def q15Sql: String =
    """SELECT e.user_id, e.ms, e.event_type, p.p_ms, p.p_value
      |FROM (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events) e
      |ASOF LEFT JOIN (
      |  SELECT user_id AS pu, epoch_ms(ts) AS p_ms, max(value) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY pu, p_ms) p
      |ON e.user_id = p.pu AND e.ms >= p.p_ms
      |ORDER BY user_id, ms, event_type""".stripMargin

  /** q22: PIVOT — order counts by status × priority, priorities as
    * columns. The value list is given explicitly: pivot without it
    * needs an extra distinct-discovery pass over the fact table. */
  def q22Pivot(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val renames = Map("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
      "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
      "5-LOW" -> "p5_low")
    val piv = o.groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
    // PivotFirst leaves NULL cells for (status, priority) combos with
    // no rows; the oracle's count(CASE ...) yields 0 — coalesce AFTER
    // the pivot (a coalesce inside the aggregate never sees the
    // missing combos)
    val renamed = renames.foldLeft(piv) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    renamed.select(col("o_orderstatus") +:
        prios.map(renames).map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy(col("o_orderstatus"))
  }

  def q22Sql: String =
    """SELECT o_orderstatus,
      |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
      |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high,
      |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3_medium,
      |  count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4_not_specified,
      |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q23: running total — per-user cumulative event value in time
    * order (ROWS UNBOUNDED PRECEDING; decimal accumulation for
    * cross-engine exactness, deterministic (ms, event_id) order). */
  def q23RunningTotal(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), expr("unix_millis(ts)").as("ms"),
        col("value").cast(dec).as("v"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"), col("ms"),
        sum(col("v")).over(w).cast("double").as("run_total"))
      .orderBy(col("user_id"), col("ms"), col("event_id"))
  }

  def q23Sql: String =
    """SELECT user_id, event_id, ms,
      |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |        CAST(value AS DECIMAL(18,2)) AS v FROM events)
      |ORDER BY user_id, ms, event_id""".stripMargin

  /** q24: interval/range join — for every purchase, how many views the
    * same user made in the preceding hour. Equi key (user_id) drives
    * the shuffle; the time-range predicate is applied inside the
    * joined stream, so the plan is an ordinary sort-merge join (no
    * cartesian) and scales with the per-user event volume. */
  def q24RangeJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), expr("unix_millis(ts)").as("v_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("unix_millis(ts)").as("ms"))
    purchases.join(views,
        purchases("user_id") === views("vu") &&
          views("v_ms") >= purchases("ms") - 3600000L &&
          views("v_ms") <= purchases("ms"), "left")
      .groupBy(col("user_id"), col("event_id"), col("ms"))
      .agg(count(col("vu")).as("n_views_prior_hour"))
      .orderBy(col("user_id"), col("ms"), col("event_id"))
  }

  def q24Sql: String =
    """SELECT p.user_id, p.event_id, p.ms, count(v.vu) AS n_views_prior_hour
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
      |      WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id AS vu, epoch_ms(ts) AS v_ms FROM events
      |      WHERE event_type = 'view') v
      |  ON p.user_id = v.vu AND v.v_ms >= p.ms - 3600000 AND v.v_ms <= p.ms
      |GROUP BY p.user_id, p.event_id, p.ms
      |ORDER BY p.user_id, p.ms, p.event_id""".stripMargin

  /** q25: explicit GROUPING SETS — (status), (priority), and grand
    * total in one pass, distinct from q8's ROLLUP / q20's CUBE. */
  def q25GroupingSets(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))
  }

  def q25Sql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      |  coalesce(o_orderpriority, '(all)') AS priority,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  /** q26: NTILE decile profile — price deciles WITHIN each order
    * priority (per-bucket stats). The window is partitioned, so the
    * sort shuffles by priority instead of funneling the whole table
    * through one reducer — a global NTILE at 100 TB should instead
    * bucket against precomputed percentile boundaries. Ties break on
    * o_orderkey so both engines bucket identically. */
  def q26Ntile(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_totalprice").cast(dec).as("p"),
        ntile(10).over(w).as("decile"))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("p")).cast("double").as("min_price"),
        max(col("p")).cast("double").as("max_price"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"), col("decile"))
  }

  def q26Sql: String =
    """SELECT o_orderpriority, CAST(decile AS INTEGER) AS decile, count(*) AS n,
      |  CAST(min(p) AS DOUBLE) AS min_price,
      |  CAST(max(p) AS DOUBLE) AS max_price,
      |  CAST(sum(p) AS DOUBLE) AS sum_price
      |FROM (SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |        ntile(10) OVER (PARTITION BY o_orderpriority
      |          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS decile
      |      FROM orders)
      |GROUP BY o_orderpriority, decile ORDER BY o_orderpriority, decile""".stripMargin

  /** q27: FULL OUTER join — per-nation customer/supplier counts where
    * either side may be absent (the join type q3/q4/q9 don't cover). */
  def q27FullOuter(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, d).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, c("ck") === s("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  def q27Sql: String =
    """SELECT coalesce(c.ck, s.sk) AS nationkey,
      |  coalesce(c.n_cust, 0) AS n_cust,
      |  coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |  ON c.ck = s.sk
      |ORDER BY nationkey""".stripMargin

  /** q29: several COUNT(DISTINCT ...) over different columns in ONE
    * aggregation — Catalyst compiles this to a single Expand + two
    * aggregate levels, not one scan per distinct column. */
  def q29MultiDistinct(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(expr("date_trunc('day', ts)")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  def q29Sql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT date_trunc('day', ts)) AS n_days,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q30: relative-rank windows — PERCENT_RANK and CUME_DIST of each
    * order's price within its priority (partitioned, so the sort
    * shuffles by priority like q26). Both are rank-derived ratios of
    * exact integers — bit-identical across engines. */
  def q30PercentRank(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .filter(col("pr") >= 0.99)
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  def q30Sql: String =
    """SELECT o_orderkey, o_orderpriority, pr, cd FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
      |WHERE pr >= 0.99
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** q31: text-pattern filtering — the Postgres LIKE / regex surface
    * the reference's tool layer sits on. The `contains` predicate
    * reaches the parquet scan as a StringContains pushed filter; the
    * regexp runs post-scan (not pushable) on the survivors only. */
  def q31TextSearch(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.filter(col("text").contains("filter"))
      .select(col("doc_id"), col("lang"),
        col("text").rlike("filter (sort|scan|join)").as("phrase_hit"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_match"),
        sum(when(col("phrase_hit"), 1L).otherwise(0L)).as("n_phrase"))
      .orderBy(col("lang"))
  }

  def q31Sql: String =
    """SELECT lang, count(*) AS n_match,
      |  CAST(sum(CASE WHEN regexp_matches(text, 'filter (sort|scan|join)')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_phrase
      |FROM documents WHERE text LIKE '%filter%'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** q32: keyset-free pagination — ORDER BY + LIMIT/OFFSET, the plain
    * tool-layer listing endpoint. A fully-specified sort keeps pages
    * deterministic; at scale prefer keyset (WHERE key > last) since
    * OFFSET still sorts-and-skips. */
  def q32Pagination(spark: SparkSession, d: String, page: Int = 3,
                    pageSize: Int = 25): DataFrame = {
    val o = Tables.orders(spark, d)
    o.select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice").cast(dec).cast("double").as("price"))
      .orderBy(col("o_orderkey"))
      .offset(page * pageSize)
      .limit(pageSize)
  }

  def q32Sql(page: Int = 3, pageSize: Int = 25): String =
    s"""SELECT o_orderkey, o_custkey, o_orderpriority,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
       |FROM orders ORDER BY o_orderkey
       |LIMIT $pageSize OFFSET ${page * pageSize}""".stripMargin

  /** q33: GLOBAL deciles of order price with NO global sort — the
    * variant q26's partitioned NTILE deliberately deferred. Exact (not
    * approx_percentile), via distributed order statistics:
    *
    *   1. per-value counts — an ordinary shuffle on the value;
    *   2. cumulative counts by the t5 two-pass trick: value-RANGE
    *      blocks (monotone in the value), per-block subtotals
    *      prefix-scanned on the driver, then a window PARTITIONED by
    *      block — nothing ever funnels through one reducer;
    *   3. the 9 boundary values (smallest value whose cumulative count
    *      reaches ceil(i·N/10)) — 9 rows, collected;
    *   4. bucketing is a map-only broadcast compare, final agg is 10
    *      groups.
    *
    * Value-based deciles (ties land in one bucket, so bucket sizes are
    * N/10 only up to tie mass) — the definition both engines compute
    * deterministically; NTILE's rank-split of ties would depend on row
    * order. */
  /** set by [[q33GlobalDecile]]: unpartitioned-Window count of its
    * internal cumulative-count stage (spec hook — the returned frame
    * is a LocalRelation whose plan can't witness the internals) */
  @volatile private[graft] var q33UnpartitionedWindows: Int = -1

  def q33GlobalDecile(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val v = Tables.orders(spark, d).select(col("o_totalprice").cast(dec).as("p"))
    // ONE scan of the fact: every later job (stats, block subtotals,
    // boundaries, final weighted agg) runs over the cached per-value
    // counts — a frame bounded by the value-domain cardinality, not
    // the row count
    val cnt = v.groupBy(col("p")).agg(count(lit(1)).as("c")).cache()
    try {
      val stats = cnt.agg(coalesce(sum(col("c")), lit(0L)),
        min(col("p").cast("double")), max(col("p").cast("double"))).head()
      val n = stats.getLong(0)
      if (n == 0) return spark.emptyDataFrame
        .select(lit(1).as("decile"), lit(0L).as("n"), lit(0.0).as("min_price"),
          lit(0.0).as("max_price"), lit(0.0).as("sum_price"))
      val (lo, hi) = (stats.getDouble(1), stats.getDouble(2))
      val targetBlocks = spark.conf.get("spark.sql.shuffle.partitions").toLong * 8
      val width = math.max((hi - lo) / targetBlocks, 1e-9)
      val blkCol = least(floor((col("p").cast("double") - lit(lo)) / lit(width)),
        lit(targetBlocks - 1)).cast("long")
      val blocked = cnt.withColumn("blk", blkCol)
      // subtotals are ≤ targetBlocks rows — sort them on the driver
      // instead of paying a range-partitioning exchange (plus its
      // sampling job) for a 256-row orderBy (r16)
      val totals = blocked.groupBy(col("blk")).agg(sum(col("c")).as("blk_c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      var acc = 0L
      val prefix = totals.map { case (blk, c) =>
        val o = (blk, acc); acc += c; o
      }
      // Only the ≤ 9 blocks CONTAINING a decile threshold can hold a
      // boundary value (row cc = blk_before + local_cc, so t ∈
      // (cc−c, cc] forces blk_before < t ≤ blk_before + blk_c): the
      // block membership is decided here from the already-collected
      // subtotals, and the cumulative-count window below runs over
      // just those blocks' values — ~9·(values/block) rows instead of
      // every distinct value (r16; the boundary row set is unchanged).
      val thresholdsSeq = (1 to 9).map(i => (i, (i * n + 9) / 10))
      val cumBefore = prefix.toMap
      val boundaryBlks = thresholdsSeq.map { case (_, t) =>
        totals.find { case (blk, c) => cumBefore(blk) < t && t <= cumBefore(blk) + c }
          .map(_._1).getOrElse(totals.last._1)
      }.distinct
      val offsets = prefix.filter(p => boundaryBlks.contains(p._1))
        .toDF("blk", "blk_before")
      val wLocal = Window.partitionBy(col("blk")).orderBy(col("p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = blocked
        .filter(col("blk").isin(boundaryBlks: _*))
        .withColumn("local_cc", sum(col("c")).over(wLocal))
        .join(broadcast(offsets), Seq("blk"))
        .withColumn("cc", col("blk_before") + col("local_cc"))
      // the result below is an eagerly-collected LocalRelation, so a
      // spec can't see THIS plan — record the internal cumsum stage's
      // window shape for the no-single-reducer assertion
      q33UnpartitionedWindows = cum.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.size
      // thresholds t_i = ceil(i*N/10); row (p, cc) is boundary i iff
      // t_i lands in (cc - c, cc] — each i matched by exactly one row
      val thresholds = thresholdsSeq.toDF("i", "t")
      val bounds = cum.join(broadcast(thresholds),
          col("t") > col("cc") - col("c") && col("t") <= col("cc"))
        .select(col("i"), col("p").cast("double").as("bp"))
        .collect().map(r => r.getDouble(1)).sorted
      val bArr = typedLit(bounds.toSeq)
      // weighted final agg over the distinct values: sum(p·c) in
      // decimal equals the row-level sum the oracle computes. The
      // 10-row result is materialized EAGERLY (local relation) so the
      // cache can be released here instead of leaking past return.
      val agg = cnt.select(col("p"), col("c"),
          (lit(1) + size(filter(bArr, b => col("p").cast("double") > b))).as("decile"))
        .groupBy(col("decile"))
        .agg(sum(col("c")).as("n"),
          min(col("p")).cast("double").as("min_price"),
          max(col("p")).cast("double").as("max_price"),
          sum(col("p") * col("c")).cast("double").as("sum_price"))
        .orderBy(col("decile"))
      spark.createDataFrame(
        java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally cnt.unpersist(blocking = false)
  }

  def q33Sql: String =
    """WITH v AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      |nn AS (SELECT count(*) AS n FROM v),
      |cum AS (SELECT p, c, sum(c) OVER (ORDER BY p) AS cc
      |        FROM (SELECT p, count(*) AS c FROM v GROUP BY p)),
      |b AS (SELECT i, min(CAST(p AS DOUBLE)) AS bp
      |      FROM cum, (SELECT unnest(range(1, 10)) AS i) ii, nn
      |      WHERE (i * nn.n + 9) // 10 > cc - c AND (i * nn.n + 9) // 10 <= cc
      |      GROUP BY i)
      |SELECT CAST(decile AS INTEGER) AS decile, count(*) AS n,
      |  CAST(min(p) AS DOUBLE) AS min_price,
      |  CAST(max(p) AS DOUBLE) AS max_price,
      |  CAST(sum(p) AS DOUBLE) AS sum_price
      |FROM (SELECT p,
      |        1 + (SELECT count(*) FROM b WHERE CAST(v.p AS DOUBLE) > b.bp) AS decile
      |      FROM v)
      |GROUP BY decile ORDER BY decile""".stripMargin
}
