package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FakeEmbedder
import graft.operators.{IvfIndex, PqIndex, SimilaritySearch, SqIndex, SrpBanded}

/** Parity fixture at the reference's ACTUAL dimensionality —
  * `vector(768)` (reference sql/02_schema.sql:20, embedding model
  * text-embedding-005 in tools.yaml:24). The corpus tables are 64-dim,
  * so every kernel default is exercised there; this spec proves the
  * same kernels, quantized index math, PQ subspacing (dsub = 96) and
  * SRP banding hold end-to-end when a user swaps in a real 768-dim
  * embedder on day one. */
class Dim768ParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val D = 768

  // deterministic synthetic 768-dim corpus: 100 unit gaussians + 20
  // planted near-twins of the first 20 (cos ≈ 0.999)
  private lazy val (corpusDf, corpus) = {
    val rng = new scala.util.Random(768L)
    def unit(): Array[Float] = {
      val v = Array.fill(D)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 100).map(i => (i.toLong, unit()))
    val twins = (0 until 20).map { i =>
      val v = base(i)._2.map(x => x + (rng.nextGaussian() * 0.01).toFloat)
      ((100 + i).toLong, v)
    }
    val all = base ++ twins
    val df = all.toDF("vec_id", "embedding")
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    (Tables.embeddings(spark, tmp), all.toMap)
  }
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("dim768").toString

  // a noisy copy of corpus vector 0 (cos ≈ 0.995): the query has a
  // REAL neighborhood (0, its twin 100, …), so pruned-probe recall is
  // meaningful — a random-direction query on a random corpus has no
  // structure for IVF/PQ to find
  private lazy val query: Array[Float] = {
    val rng = new scala.util.Random(42L)
    val v = corpus(0L).map(x => x + (rng.nextGaussian() * 0.004).toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(x => (x / n).toFloat)
  }

  private def cos(x: Array[Float], y: Array[Float]): Double = {
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      d += x(i).toDouble * y(i).toDouble
      nx += x(i).toDouble * x(i).toDouble
      ny += y(i).toDouble * y(i).toDouble
      i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }
  private def l2(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) {
      val d = x(i).toDouble - y(i).toDouble; s += d * d; i += 1
    }
    math.sqrt(s)
  }
  private lazy val exactTop10: Seq[Long] = corpus.toSeq
    .map { case (id, v) => (id, cos(v, query)) }
    .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)

  test("768-dim embedder output is unit-norm and deterministic") {
    val e = FakeEmbedder.embed("fast vector search over spark tables", D)
    assert(e.length == D)
    val n = math.sqrt(e.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(e.toSeq == FakeEmbedder.embed("fast vector search over spark tables", D).toSeq)
  }

  test("768-dim brute knn matches the driver-computed exact order") {
    val got = SimilaritySearch.knn(corpusDf, "embedding", "vec_id", query, 10, "cosine")
      .collect().map(_.getLong(0)).toSeq
    assert(got == exactTop10)
  }

  test("768-dim IVF: full probe equals exact, pruned probe keeps high recall") {
    val model = IvfIndex.fit(corpusDf, "embedding", "vec_id", k = 8, iters = 3)
    assert(model.centroids.forall(_.length == D))
    val full = IvfIndex.search(corpusDf, "embedding", "vec_id", model, query, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactTop10, "exhaustive IVF probe diverged from exact knn")
    val pruned = IvfIndex.search(corpusDf, "embedding", "vec_id", model, query, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = exactTop10.count(pruned) / 10.0
    info(s"IVF nprobe=3/8 recall@10 at dim=768: $recall")
    assert(recall >= 0.5)
  }

  test("768-dim PQ: dsub=96 codebooks, full rerank equals exact l2 order") {
    val model = PqIndex.fit(corpusDf, "embedding", "vec_id", m = 8, k = 16, iters = 2)
    assert(model.dsub == D / 8)
    val exactL2 = corpus.toSeq.map { case (id, v) => (id, l2(v, query)) }
      .sortBy { case (id, s) => (s, id) }.take(10).map(_._1)
    val full = PqIndex.search(corpusDf, "embedding", "vec_id", model, query,
        10, rerank = corpus.size / 10 + 1)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactL2, "full-rerank PQ diverged from exact l2")
    val approx = PqIndex.search(corpusDf, "embedding", "vec_id", model, query, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exactL2.count(approx) / 10.0
    info(s"PQ ADC rerank=4 recall@10 at dim=768: $recall")
    assert(recall >= 0.5)
  }

  test("768-dim SQ8: codes in byte range, full rerank equals exact l2 order") {
    val model = SqIndex.fit(corpusDf, "embedding")
    assert(model.dim == D)
    val codes = corpusDf.select(SqIndex.encode(col("embedding"), model).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == D && c.forall(x => x >= 0 && x <= 255)))
    val exactL2 = corpus.toSeq.map { case (id, v) => (id, l2(v, query)) }
      .sortBy { case (id, s) => (s, id) }.take(10).map(_._1)
    val full = SqIndex.search(corpusDf, "embedding", "vec_id", model, query,
        10, rerank = corpus.size / 10 + 1)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactL2)
    val approx = SqIndex.search(corpusDf, "embedding", "vec_id", model, query, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exactL2.count(approx) / 10.0
    info(s"SQ8 rerank=4 recall@10 at dim=768: $recall")
    assert(recall >= 0.8)
  }

  test("768-dim residual IVF-PQ: full rerank equals exact l2, residual codes beat raw PQ reconstruction") {
    corpusDf.count() // force the fixture write
    val res = graft.operators.IvfPqResidual.fit(spark, tmp,
      nlists = 8, ivfIters = 3, m = 8, k = 16, pqIters = 2)
    assert(res.rc.forall(_.length == D) && res.pq.dsub == D / 8)
    val exactL2 = corpus.toSeq.map { case (id, v) => (id, l2(v, query)) }
      .sortBy { case (id, s) => (s, id) }.take(10).map(_._1)
    // exhaustive probe + full rerank must reduce to exact l2 order
    val full = graft.operators.IvfPqResidual.search(corpusDf, "embedding", "vec_id",
        res, query, 10, nprobe = 8, rerank = corpus.size / 10 + 1)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactL2, "full-probe full-rerank residual IVF-PQ diverged from exact l2")
    val approx = graft.operators.IvfPqResidual.search(corpusDf, "embedding", "vec_id",
        res, query, 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = exactL2.count(approx) / 10.0
    info(s"residual IVF-PQ nprobe=3/8 rerank=4 recall@10 at dim=768: $recall")
    assert(recall >= 0.5)
    // the residual-encoding claim holds at 768 too
    val raw = PqIndex.fit(corpusDf, "embedding", "vec_id", m = 8, k = 16, iters = 2)
    val dsub = raw.dsub
    def subErr(v: Array[Long], off: Int, cen: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < cen.length) { val d = v(off + i).toDouble - cen(i); s += d * d; i += 1 }
      s
    }
    def encodeErr(v: Array[Long], books: Array[Array[Array[Double]]]): Double =
      books.indices.map(j => books(j).map(cen => subErr(v, j * dsub, cen)).min).sum
    def nearestList(q: Array[Long]): Int =
      res.ivf.centroids.zipWithIndex.minBy { case (c, i) =>
        (c.indices.map(x => { val d = q(x).toDouble - c(x); d * d }).sum, i)
      }._2
    val (rawErr, residErr) = corpus.values.foldLeft((0.0, 0.0)) { case ((er, es), v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      val rcl = res.rc(nearestList(q))
      val r = q.indices.map(i => q(i) - rcl(i)).toArray
      (er + encodeErr(q, raw.codebooks), es + encodeErr(r, res.pq.codebooks))
    }
    info(s"768-dim PQ reconstruction error: raw ${rawErr.toLong}, residual ${residErr.toLong}")
    assert(residErr < rawErr)
  }

  test("768-dim SRP banding: every planted twin pair surfaces") {
    corpusDf.count() // force the fixture write
    val pairs = SrpBanded.srpBandedNearDup(spark, tmp, tau = 0.9, dim = D)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)),
        s"planted twin pair ($i, ${100 + i}) missed at dim=768")
    }
    // the distributed codegen kernel and the driver-side query twin
    // must hash a vector into the SAME buckets — this is what makes
    // query probing meet its corpus copy at any dimensionality
    val fromKernel = SrpBanded.bandedOf(corpusDf, dim = D)
      .filter(col("vec_id") === 0L)
      .select(col("band"), col("bk"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val fromDriver = SrpBanded.queryBandKeys(corpus(0L), dim = D).toSet
    assert(fromKernel == fromDriver,
      s"codegen kernel buckets $fromKernel != driver twin $fromDriver")
  }
}
