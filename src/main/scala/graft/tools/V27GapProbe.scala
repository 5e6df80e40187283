package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level A/B of the batched graph serve's two banding sources
  * (v26 in-memory recompute vs v27 stored artifact) at a scale dir:
  * which stage carries the stored path's extra cost? */
object V27GapProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      println(f"$tag%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    import graft.operators.SrpBanded
    val dir = time("srp_store build/open")(graft.sources.SrpStore.storeFor(spark, d))
    time("knn_graph build")(SrpBanded.materializedGraph(spark, d, 5).count())
    val stored = Some((keys: Seq[(Int, Long)]) =>
      graft.sources.SrpStore.batchBanding(spark, dir, keys))
    // micro-stages of the stored seed
    val emb = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def probesDf = SrpBanded.bandedOf(
        queries.select(col("vec_id"), col("embedding")))
      .withColumn("f", explode(typedLit(SrpBanded.probeFlips(2))))
      .select(col("vec_id").as("query_id"), col("band"),
        col("bk").bitwiseXOR(col("f")).as("bk"),
        bit_count(col("f")).cast("int").as("pr"))
      .groupBy(col("query_id"), col("band"), col("bk"))
      .agg(min(col("pr")).as("pr"))
    (1 to 2).foreach { p =>
      val keys = time(s"keys collect pass$p")(
        probesDf.select(col("band"), col("bk")).distinct()
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted)
      val bStored = graft.sources.SrpStore.batchBanding(spark, dir, keys)
      time(s"stored banding count pass$p")(bStored.count())
      time(s"pool join stored pass$p")(
        probesDf.join(bStored, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      time(s"pool join stored SHJ pass$p")(
        probesDf.join(bStored.hint("shuffle_hash"), Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      time(s"pool join stored Bprobes pass$p")(
        probesDf.hint("broadcast").join(bStored, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      time(s"pool join stored SHJprobes pass$p")(
        probesDf.hint("shuffle_hash").join(bStored, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      time(s"pool join in-mem SHJprobes pass$p")(
        probesDf.hint("shuffle_hash")
          .join(SrpBanded.bandedOf(emb).select(col("vec_id"), col("band"), col("bk")),
            Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      val S = 32
      val saltedProbes = probesDf
        .withColumn("salt", explode(typedLit((0 until S).toArray)))
      val saltedStored = bStored
        .withColumn("salt", pmod(hash(col("vec_id")), lit(S)).cast("int"))
      time(s"pool join stored salted pass$p")(
        saltedProbes.join(saltedStored.hint("shuffle_hash"), Seq("band", "bk", "salt"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      val bMem = SrpBanded.bandedOf(emb).select(col("vec_id"), col("band"), col("bk"))
      time(s"pool join in-mem pass$p")(
        probesDf.join(bMem, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt")).count())
      if (p == 2 && sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        val js = probesDf.join(bStored, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt"))
        js.count()
        println("=== STORED pool join (final adaptive plan) ===")
        println(js.queryExecution.executedPlan.toString.take(5000))
        val jm = probesDf.join(bMem, Seq("band", "bk"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(min(col("pr")).as("pr"), count(lit(1)).as("cnt"))
        jm.count()
        println("=== IN-MEM pool join (final adaptive plan) ===")
        println(jm.queryExecution.executedPlan.toString.take(5000))
      }
      time(s"seed in-memory pass$p")(
        SrpBanded.batchSeedScored(spark, d, 50).count())
      time(s"seed stored pass$p")(
        SrpBanded.batchSeedScored(spark, d, 50, bandedSource = stored).count())
    }
    spark.stop()
  }
}
