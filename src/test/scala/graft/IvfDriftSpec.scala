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

  test("nlistsFor: √N policy anchored at the oracle width, monotone, floored") {
    // the pinned oracle corpus keeps the pinned width
    assert(IvfIndex.nlistsFor(IvfIndex.BaseRows) == IvfIndex.BaseNlists)
    // small corpora floor at the oracle width, never shrink below it
    assert(IvfIndex.nlistsFor(1L) == IvfIndex.BaseNlists)
    assert(IvfIndex.nlistsFor(2000L) == IvfIndex.BaseNlists)
    // the measured decades: 2M rows → 160, the width IvfScaleProbe
    // hand-picked before the policy existed (16·√100)
    assert(IvfIndex.nlistsFor(2000000L) == 160)
    assert(IvfIndex.nlistsFor(200000L) == 51) // 16·√10
    // √N: 100× the rows ⇒ 10× the lists, at any anchor
    assert(IvfIndex.nlistsFor(200000000L) == 1600)
    // monotone across decades
    val widths = Seq(1L, 20000L, 200000L, 2000000L, 20000000L).map(IvfIndex.nlistsFor)
    assert(widths == widths.sorted, s"nlistsFor not monotone: $widths")
  }

  test("a policy-width store serves correctly and retrain's maintenance default keeps the store's width") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_policy").toString
    // 200 rows spread over 8 well-separated axis directions (dim 8) —
    // enough structure that a width-8 policy store has non-trivial lists
    val rows = (1 to 200).map { i =>
      val v = new Array[Float](8)
      v(i % 8) = 1f
      v((i + 1) % 8) = 0.001f * (i % 11)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    // pretend this corpus sits at a bigger decade so the policy width
    // exceeds the pinned floor; fit + store at that width
    val width = IvfIndex.nlistsFor(IvfIndex.BaseRows * 4) // = 32
    assert(width == 32)
    val model = IvfIndex.fit(emb, "embedding", "vec_id", k = width, iters = 5)
    IvfStore.write(spark, emb, "embedding", model, dir)
    assert(IvfStore.readCentroids(spark, dir).k == width)
    // correctness at the policy width: probing ALL lists is the exact
    // corpus ranking — the store must reproduce brute-force top-k
    val q2 = { val v = new Array[Float](8); v(3) = 1f; v }
    val got = IvfStore.search(spark, dir, "embedding", "vec_id", q2,
      topK = 5, nprobe = width).collect().map(_.getLong(0)).toSeq
    val brute = emb.select(col("vec_id"),
        round(graft.functions.vectors.cosine_sim(col("embedding"),
          typedLit(q2)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute, s"policy-width store diverged from brute force: $got vs $brute")
    // drift respects the policy store: baseline is the width-32 stats
    val d0 = IvfStore.driftMetric(spark, dir, "embedding")
    assert(d0.nLists == width && !d0.tripped, s"fresh policy store drifted: $d0")
    // the maintenance-default retrain re-clusters at the STORE's width
    // (no silent re-size back to a caller-side default)
    IvfStore.retrain(spark, dir, "embedding", "vec_id")
    assert(IvfStore.readCentroids(spark, dir).k == width,
      "maintenance retrain re-sized the index")
    val d1 = IvfStore.driftMetric(spark, dir, "embedding")
    assert(d1.nLists == width && !d1.tripped, s"retrained policy store tripped: $d1")
    // and still serves the exact ranking
    val got2 = IvfStore.search(spark, dir, "embedding", "vec_id", q2,
      topK = 5, nprobe = width).collect().map(_.getLong(0)).toSeq
    assert(got2 == brute, s"post-retrain policy store diverged: $got2 vs $brute")
  }
}
