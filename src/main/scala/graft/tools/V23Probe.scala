package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Isolated A/B of the graph-build bucket cap (VERDICT r9 item 3):
  * replays v23's build — stored banding → capped banded self-join →
  * scored per-source top-k — under three cap forms: the shipped
  * bounded top-k AGGREGATE (map-side partial cap, zero extra
  * exchanges), the r9 WINDOW form it replaced (the regression's
  * cause: row_number over (band, bk) forced an extra exchange of
  * every banded row), and uncapped. Prints timings + exchange counts. */
object V23Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // typed top-k partial aggregates (TopKPairs) must stay on the hash
      // path: the 128-key default fallback re-SORTS (and at scale, spills)
      // the candidate stream the aggregate exists to avoid sorting
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val k = 5
    val cap = graft.operators.SrpBanded.BucketCap
    val emb = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === graft.operators.SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val banded = graft.sources.SrpStore.bandingFrame(spark,
      graft.sources.SrpStore.storeFor(spark, d))
    def build(mode: String): DataFrame = {
      val a = banded.select(col("band"), col("bk"), col("vec_id").as("src"))
      val b0 = banded.select(col("band"), col("bk"), col("vec_id").as("dst"))
      val b = mode match {
        case "uncapped" => b0
        case "window" => b0.withColumn("__bi", row_number().over(
            Window.partitionBy(col("band"), col("bk")).orderBy(col("dst"))))
          .filter(col("__bi") <= cap).drop("__bi")
        case "aggregate" => b0
          .groupBy(col("band"), col("bk"))
          .agg(graft.functions.TopKPairs.top_k_pairs(
            col("dst"), col("dst").cast("double"), cap, asc = true).as("__tk"))
          .select(col("band"), col("bk"),
            explode(col("__tk").getField("neighbor_id")).as("dst"))
      }
      val cand = a.join(b, Seq("band", "bk"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
      cand
        .join(emb.select(col("vec_id").as("src"), col("embedding").as("emb_s")), Seq("src"))
        .join(emb.select(col("vec_id").as("dst"), col("embedding").as("emb_d")), Seq("dst"))
        .select(col("src"), col("dst"),
          graft.functions.vectors.cosine_sim(col("emb_s"), col("emb_d")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
    }
    val modes = Seq("aggregate", "window", "uncapped")
    modes.foreach(m => build(m).count()) // warmup
    (1 to 2).foreach { _ => modes.foreach(m => time(m)(build(m).count())) }
    modes.foreach { m =>
      val plan = build(m).queryExecution.executedPlan.toString
      val nx = "Exchange".r.findAllIn(plan).size
      println(s"$m exchanges: $nx")
    }
  }
}
