package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Where does the single-query stored-HNSW serve's ~1.4 s steady
  * state go? (ServeGateway measured the end-to-end request latency;
  * this attributes it.) Runs v32 repeatedly with a job listener,
  * printing each Spark job's duration plus the driver-side gaps
  * between jobs (Catalyst planning / codegen / scheduling) — the
  * per-request job-count budget for the walk: entry read + per-layer
  * descent steps (early-exit ≤ MaxSteps each) + layer-0 beam hops +
  * the final assembly. The serve is point-read IO by design, so the
  * floor is jobs × (plan + schedule) overhead, not data. */
object V32Probe {
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
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, (js.time, desc)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, t0, je.time, desc)): Unit
        }
      }
    })
    def run(tag: String, detail: Boolean): Unit = {
      done.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("v32_hnsw_stored")(spark, d).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(500) // let listener drain
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._2)
      val jobMs = js.map(j => j._3 - j._2).sum
      println(f"== $tag: wall ${wallMs}%.0f ms, jobs ${js.size}, sum(job) $jobMs ms, driver-gap ${wallMs - jobMs}%.0f ms (rows $n)")
      if (detail) {
        var prevEnd = 0L
        js.foreach { case (id, s, e, desc) =>
          val gap = if (prevEnd == 0) 0 else s - prevEnd
          prevEnd = math.max(prevEnd, e)
          println(f"  job $id%3d  ${e - s}%5d ms  gap-before $gap%5d ms  ${desc.take(80)}")
        }
      }
    }
    run("cold", detail = false)
    (1 to 5).foreach(i => run(s"warm$i", detail = i == 5))
    spark.stop()
  }
}
