package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sizing probe for the graph-batch SEED pool: per query, how
  * many distinct corpus candidates fall in the multi-probe bucket
  * union (the rows the seed stage cosine-scores). Drives the choice
  * of SeedBudget — the cap must sit above the max observed pool at
  * the oracle SFs (so it never binds there) while bounding the
  * scored set at corpus scale. */
object SeedPoolProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
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
    dirs.foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === graft.operators.SrpBanded.Dim)
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") % graft.SparkEntry.JoinQueryFilter === 0)
      val probes = graft.operators.SrpBanded.bandedOf(queries)
        .withColumn("f", explode(typedLit(graft.operators.SrpBanded.probeFlips(2))))
        .select(col("vec_id").as("query_id"), col("band"),
          col("bk").bitwiseXOR(col("f")).as("bk"))
        .distinct()
      val banded = graft.operators.SrpBanded.bandedOf(emb)
        .select(col("vec_id"), col("band"), col("bk"))
      val pool = probes.join(banded, Seq("band", "bk"))
        .select(col("query_id"), col("vec_id")).distinct()
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      val stats = pool.agg(
        count(lit(1)).as("queries"), min(col("n")).as("min"),
        expr("percentile_approx(n, 0.5)").as("p50"),
        expr("percentile_approx(n, 0.99)").as("p99"),
        max(col("n")).as("max"), sum(col("n")).as("total")).first()
      println(s"$d -> queries=${stats.getLong(0)} min=${stats.getLong(1)} " +
        s"p50=${stats.getLong(2)} p99=${stats.getLong(3)} " +
        s"max=${stats.getLong(4)} total=${stats.getLong(5)}")
    }
    spark.stop()
  }
}
