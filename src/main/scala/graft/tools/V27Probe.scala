package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis of the v27 seed-read cost: how many distinct
  * buckets does the batch probe union actually touch, and what does
  * each banding source cost to scan at that saturation? */
object V27Probe {
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
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val dir = graft.sources.SrpStore.storeFor(spark, d)
    // replicate the batch probe-key union for queryMod = 50, radius 2
    val emb = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === graft.operators.SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val probes = graft.operators.SrpBanded.bandedOf(queries)
      .withColumn("f", explode(typedLit(graft.operators.SrpBanded.probeFlips(2))))
      .select(col("band"), col("bk").bitwiseXOR(col("f")).as("bk"))
      .distinct()
    val keys = time("probe-key collect")(
      probes.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted)
    println(s"distinct probed buckets: ${keys.size}")
    (1 to 3).foreach { i =>
      time(s"prunedBanding pass$i")(
        graft.sources.SrpStore.prunedBanding(spark, dir, keys).count())
      time(s"bandingFrame pass$i")(
        graft.sources.SrpStore.bandingFrame(spark, dir)
          .join(broadcast(probes), Seq("band", "bk"), "left_semi").count())
    }
    spark.stop()
  }
}
