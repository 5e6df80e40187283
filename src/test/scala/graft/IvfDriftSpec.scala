package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex
import graft.sources.IvfStore

/** IVF centroid-drift maintenance: upserts assign to frozen centroids
  * forever, so a shifted corpus must TRIP the drift metric, and
  * [[IvfStore.retrain]] must restore probe recall by publishing a
  * re-clustered generation under the store's commit contract. */
class IvfDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // three well-separated synthetic clusters, dim 4, deterministic:
  // A=(1,0,eps,0), B=(0,1,eps,0) interleaved by id (so k-means' first-k
  // init sees both), C=(0.9,0,1,0) arriving later by UPSERT
  private def baseRows = (1 to 40).map { i =>
    val eps = 0.001f * (i % 7)
    if (i % 2 == 1) (i.toLong, Array(1f, 0f, eps, 0f))
    else (i.toLong, Array(0f, 1f, eps, 0f))
  }
  private def shiftRows = (101 to 140).map { i =>
    (i.toLong, Array(0.9f, 0f, 1f, 0.001f * (i % 5)))
  }
  // true nearest of q are the C rows (3rd axis dominates), but q's
  // closest FROZEN centroid is B while C's rows sit in A's list — the
  // nprobe=1 probe misses every true neighbor until retrain
  private val q = Array(0f, 0.08f, 1f, 0f)

  private def freshStore(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    val emb = baseRows.toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb, "embedding", "vec_id", k = 2, iters = 5)
    IvfStore.write(spark, emb, "embedding", model, dir)
    dir
  }

  private def recallAtNprobe1(dir: String): Double = {
    val got = IvfStore.search(spark, dir, "embedding", "vec_id", q,
      topK = 5, nprobe = 1).collect().map(_.getLong(0)).toSet
    val truth = shiftRows.map(_._1).toSet // all C rows beat A/B on cosine
    got.count(truth) / 5.0
  }

  test("drift metric on an empty store answers 'not tripped' instead of throwing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift_empty").toString
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val model = IvfIndex.Model(Array(Array(0.0, 0.0, 0.0, 0.0)))
    IvfStore.write(spark, emb, "embedding", model, dir)
    val d = IvfStore.driftMetric(spark, dir, "embedding")
    assert(!d.tripped, s"fresh empty store reported drift: $d")
    assert(d.nLists == 0)
  }

  test("drift metric: quiet at write, trips after a shifted-distribution upsert") {
    import spark.implicits._
    val dir = freshStore()
    val before = IvfStore.driftMetric(spark, dir, "embedding")
    assert(!before.tripped,
      s"fresh store tripped: $before")
    assert(math.abs(before.distRatio - 1.0) < 1e-9 && before.nLists == 2)
    IvfStore.upsert(spark, dir, shiftRows.toDF("vec_id", "embedding"),
      "embedding", "vec_id")
    val after = IvfStore.driftMetric(spark, dir, "embedding")
    info(s"drift after shifted upsert: distRatio=${after.distRatio} skew=${after.skewNow}")
    assert(after.tripped, s"shifted upsert did not trip: $after")
    assert(after.distRatio > IvfStore.DriftDistFactor)
  }

  test("retrain restores probe recall and publishes a committed generation; crash contract holds") {
    import spark.implicits._
    val dir = freshStore()
    IvfStore.upsert(spark, dir, shiftRows.toDF("vec_id", "embedding"),
      "embedding", "vec_id")
    val degraded = recallAtNprobe1(dir)
    info(s"recall@5 nprobe=1 before retrain: $degraded")
    assert(degraded == 0.0, "construction should make the frozen probe miss C")

    // crash simulation: a torn retrain attempt (data, NO marker) must
    // be invisible to readers and cleared by the retry
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/v=1/lists"))
    f.create(new org.apache.hadoop.fs.Path(s"$dir/v=1/lists/garbage"), true).close()
    assert(IvfStore.currentRoot(spark, dir) == dir,
      "uncommitted generation leaked into the read path")
    assert(recallAtNprobe1(dir) == degraded)

    IvfStore.retrain(spark, dir, "embedding", "vec_id", k = 3, iters = 5)
    assert(IvfStore.currentRoot(spark, dir) == s"$dir/v=1")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/v=1/lists/garbage")),
      "torn attempt not cleared by the retry")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/lists")),
      "superseded generation-zero lists not GC'd")
    val restored = recallAtNprobe1(dir)
    info(s"recall@5 nprobe=1 after retrain: $restored")
    assert(restored == 1.0, s"retrain did not restore recall: $restored")
    val drift = IvfStore.driftMetric(spark, dir, "embedding")
    assert(!drift.tripped, s"retrained store still tripped: $drift")
    // row set preserved across the generation switch
    val n = spark.read.parquet(s"$dir/v=1/lists").count()
    assert(n == 80, s"retrain lost rows: $n")
  }

  test("upserts after a retrain land in the new generation") {
    import spark.implicits._
    val dir = freshStore()
    IvfStore.upsert(spark, dir, shiftRows.toDF("vec_id", "embedding"),
      "embedding", "vec_id")
    IvfStore.retrain(spark, dir, "embedding", "vec_id", k = 3, iters = 5)
    // a direction no existing row shares, so the top hit is unambiguous
    val extra = Seq((500L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    IvfStore.upsert(spark, dir, extra, "embedding", "vec_id")
    val got = IvfStore.search(spark, dir, "embedding", "vec_id",
      Array(0f, 0f, 0f, 1f), topK = 1, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(500L), s"post-retrain upsert not searchable: $got")
    assert(spark.read.parquet(s"$dir/v=1/lists")
      .filter(col("vec_id") === 500L).count() == 1)
  }
}
