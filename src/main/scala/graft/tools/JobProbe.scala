package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Where does a query's warm wall time go? [[V33Probe]] generalized to
  * any `SparkEntry.queries` entry: runs each named query once cold +
  * twice warm with a job listener, printing every Spark job's duration
  * and description, plus the driver-side gaps between jobs (Catalyst
  * planning / codegen / scheduling — wall time that is not job time).
  *
  *   sbt "runMain graft.tools.JobProbe v33_hnsw_batch q33_global_decile"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ad-hoc conf overrides for A/B: SPARK_GRAFT_PROBE_CONF="k=v,k=v"
    sys.env.getOrElse("SPARK_GRAFT_PROBE_CONF", "").split(",")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val stages = js.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '(')}:${si.numTasks}").mkString(" ")
        jobs.put(js.jobId, (js.time, s"$desc | $stages")): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, t0, je.time, desc)): Unit
        }
      }
    })
    def run(name: String, tag: String, detail: Boolean): Unit = {
      done.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._2)
      val jobMs = js.map(j => j._3 - j._2).sum
      println(f"== $name $tag: wall ${wallMs}%.0f ms, jobs ${js.size}, sum(job) $jobMs ms, driver-gap ${wallMs - jobMs}%.0f ms (rows $n)")
      if (detail) {
        var prevEnd = 0L
        js.foreach { case (id, s, e, desc) =>
          val gap = if (prevEnd == 0) 0 else s - prevEnd
          prevEnd = math.max(prevEnd, e)
          println(f"  job $id%3d  ${e - s}%5d ms  gap-before $gap%5d ms  ${desc.take(80)}")
        }
      }
    }
    args.foreach { name =>
      run(name, "cold", detail = false)
      run(name, "warm1", detail = false)
      run(name, "warm2", detail = true)
    }
    spark.stop()
  }
}
