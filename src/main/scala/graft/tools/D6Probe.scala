package graft.tools
import org.apache.spark.sql.SparkSession
object D6Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.dupComponents(spark, "/root/testdata/sf0.1").count()
    println(s"d6 rows=$n took ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
