package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces the 1000×-decade whole-stage-codegen blowup ("Code grows
  * beyond 64 KB" → interpreted fallback, v26s/v27s). Two modes:
  *
  *  - default: lazily plans [[graft.operators.SrpBanded.batchSeedScored]]
  *    with the large-batch shape (salted SHJ, wide keyspace) and dumps
  *    per-subtree generated-method sizes via
  *    `queryExecution.debug.codegen()`.
  *  - SPARK_GRAFT_FULL=1: executes the whole batched graph serve at
  *    the target dir with the codegen logger at INFO and
  *    `spark.sql.codegen.logging.maxLines` raised, so a failing
  *    compile dumps its full generated source into the log — the
  *    hop/final stages only materialize under execution, so the lazy
  *    mode cannot see them. */
object CodegenSizeProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rpb = sys.env.getOrElse("SPARK_GRAFT_RPB", "15").toInt
    val full = sys.env.get("SPARK_GRAFT_FULL").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      // AQE off in lazy mode so debug.codegen sees the WSCG subtrees;
      // on in full mode to mirror the ScaleBench session
      .config("spark.sql.adaptive.enabled", full.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.codegen.logging.maxLines", "20000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (full) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.INFO)
      val t0 = System.nanoTime()
      val n = graft.operators.SrpBanded.graphSearchBatch(
        spark, d, graft.SparkEntry.JoinQueryFilter, rowsPerBand = rpb).count()
      println(f"v26s rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else {
      val seed = graft.operators.SrpBanded.batchSeedScored(
        spark, d, graft.SparkEntry.JoinQueryFilter,
        probeBroadcastMax = 0L, // force the salted-SHJ large-batch shape
        rowsPerBand = rpb)
      println(s"=== batchSeedScored rpb=$rpb, salted shape ===")
      seed.queryExecution.debug.codegen()
    }
    spark.stop()
  }
}
