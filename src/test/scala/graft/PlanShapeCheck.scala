package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contract for the batched-walk step kernel
  * ([[graft.operators.Hnsw.searchBatch]]'s dedupRank): one hash
  * repartition on query_id must serve BOTH the (query_id, vec_id)
  * dedup window and the per-query rank window — a window's
  * ClusteredDistribution is satisfied by any partitioning on a
  * subset of its keys, so the planner must not insert a second
  * exchange. Guards the one-exchange-per-step property v33 relies
  * on (a regression here doubles the walk's shuffle count). */
class PlanShapeCheck extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dedup+rank over one repartition plans a single exchange") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 10L, 0.5), (1L, 11L, 0.7), (2L, 10L, 0.1))
      .toDF("query_id", "vec_id", "sim")
    val wd = Window.partitionBy(col("query_id"), col("vec_id")).orderBy(col("sim"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    val out = df.repartition(col("query_id"))
      .withColumn("__dup", row_number().over(wd))
      .filter(col("__dup") === 1).drop("__dup")
      .withColumn("rn", row_number().over(wq))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    info(s"exchanges: $exchanges")
    info(plan)
    assert(exchanges == 1)
  }
}
