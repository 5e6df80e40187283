package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Embedder, FakeEmbedder}
import graft.sources.Ingest

/** The embedding-model seam ([[graft.functions.Embedder]] — the
  * reference's `embedding(model, text)` slot, tools.yaml:23): a second
  * implementation must swap into ingest and the probe streams without
  * touching any operator code, and the default must remain the
  * oracle-pinned [[FakeEmbedder]]. */
class EmbedderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** A deliberately-different model: 8-dim, value = normalized counts
    * of 8 character classes. Column form built from builtins only —
    * the contract a real batched-inference embedder also satisfies
    * (map-only, embedCol ≡ embed row-wise). */
  private object ClassCountEmbedder extends Embedder {
    val classes: Seq[String] = Seq("[aeiou]", "[b-df-hj-np-tv-z]", "[0-9]",
      "[ ]", "[.,;:!?]", "[A-Z]", "[()\\[\\]{}]", "[^a-zA-Z0-9 .,;:!?()\\[\\]{}]")
    override def dim: Int = classes.length
    override def embed(text: String): Array[Float] = {
      val t = if (text == null) "" else text
      val counts = classes.map(c => t.count(ch => ch.toString.matches(c)).toDouble)
      val n = math.sqrt(counts.map(x => x * x).sum)
      counts.map(x => if (n == 0) 0f else (x / n).toFloat).toArray
    }
    override def embedCol(text: Column): Column = {
      val counts = classes.map(c =>
        (length(text) - length(regexp_replace(text, c, ""))).cast("double"))
      val n = sqrt(counts.map(c => c * c).reduce(_ + _))
      array(counts.map(c =>
        when(n === 0, lit(0f)).otherwise((c / n).cast("float"))): _*)
    }
  }

  private val docs = Seq(
    (1L, "Vector search over Spark tables, at scale."),
    (2L, "plain lowercase words only"),
    (3L, "MIXED Case with 123 digits (and brackets)!"),
    (4L, "  whitespace   collapses   before   embedding  ")
  ).toDF("doc_id", "text")

  test("a second Embedder swaps into embedDocuments without operator changes") {
    val out = Ingest.embedDocuments(docs, "doc_id", ClassCountEmbedder)
      .select("doc_id", "text", "embedding").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val got = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      assert(got.length == ClassCountEmbedder.dim, s"dim ${got.length}")
      // embedCol must equal embed row-wise — ON THE NORMALIZED text
      // (embedDocuments whitespace-collapses before embedding)
      val want = ClassCountEmbedder.embed(r.getAs[String]("text"))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-6f, s"doc ${r.getLong(0)}: $g vs $w")
      }
    }
  }

  test("default embedder stays the oracle-pinned FakeEmbedder") {
    val out = Ingest.embedDocuments(docs, "doc_id")
      .select("doc_id", "text", "embedding").collect()
    out.foreach { r =>
      val got = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      val want = FakeEmbedder.embed(r.getAs[String]("text"))
      assert(got.toSeq == want.toSeq, s"doc ${r.getLong(0)} drifted from FakeEmbedder")
    }
    // trait view and legacy two-arg form agree
    assert(FakeEmbedder.embed("spark").toSeq ==
      FakeEmbedder.embed("spark", FakeEmbedder.Dim).toSeq)
    assert(FakeEmbedder.dim == FakeEmbedder.Dim)
  }

  test("model-file-backed embedder: loads once per JVM, batches via mapPartitions, serves a probe stream") {
    import graft.functions.FileEmbedder
    val dir = java.nio.file.Files.createTempDirectory("femodel").toString
    val mPath = s"$dir/encoder.grft"
    // "training export": a deterministic weight artifact on disk
    FileEmbedder.writeModel(mPath, dim = 64, vocab = 1024, seed = 42L)
    FileEmbedder.dropCached(mPath)
    FileEmbedder.loads.set(0)
    val fe = FileEmbedder(mPath)
    // ingest through the seam: multi-partition input, so a per-
    // partition (or worse, per-row) model read would count > 1
    val out = Ingest.embedDocuments(docs.repartition(4), "doc_id", fe)
    // the batch hook must plan as partition-level inference (a
    // MapPartitions node), still map-only — no shuffle anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"file embedder did not take the mapPartitions batch path:\n$plan")
    // no shuffle introduced ABOVE the inference node (the test's own
    // repartition sits below it): embedding stays map-only
    assert(!plan.split("MapPartitions")(0).contains("Exchange"),
      s"embed ingest shuffles after inference:\n$plan")
    val rows = out.select("doc_id", "text", "embedding").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val got = r.getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val want = fe.embed(r.getAs[String]("text")).toSeq
      assert(got == want, s"doc ${r.getLong(0)}: frame path diverged from embed()")
      assert(got.length == 64)
    }
    assert(FileEmbedder.loads.get() == 1,
      s"model file read ${FileEmbedder.loads.get()} times — per-JVM memoization broken")
    // scalar column contract (embedCol) agrees with embed() too
    val viaCol = docs.select(fe.embedCol(col("text")).as("e")).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("e").toSeq)
    val direct = docs.collect().map(r => fe.embed(r.getString(1)).toSeq)
    assert(viaCol.toSeq == direct.toSeq)
    // and the heavyweight model serves a probe STREAM: queries embed
    // through the injected file-backed encoder per micro-batch
    val sf = "/root/testdata/sf0.001"
    val storeDir = graft.sources.CodeStore.storeFor(spark, sf)
    val qDir = java.nio.file.Files.createTempDirectory("feq").toString
    val qText = "fast vector search over spark tables"
    java.nio.file.Files.write(java.nio.file.Paths.get(qDir, "q.json"),
      s"""{"query_id": 11, "query_text": "$qText"}\n""".getBytes("UTF-8"))
    val viaStream = graft.streaming.CodeProbeStream
      .runOnce(spark, qDir, storeDir, k = 5, embedder = fe)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    val want = graft.sources.CodeStore
      .search(spark, storeDir, fe.embed(qText), 5)
      .orderBy("rk").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaStream == want,
      s"stream with file-backed embedder diverged: $viaStream vs $want")
    assert(FileEmbedder.loads.get() == 1, "stream re-read the model file")
  }

  test("probe stream embeds queries through the injected Embedder") {
    // a wrapper model that embeds the REVERSED text — distinguishable
    // from the default, but dim-compatible with the 64-dim store
    object ReversedEmbedder extends Embedder {
      override def dim: Int = FakeEmbedder.Dim
      override def embed(text: String): Array[Float] =
        FakeEmbedder.embed(if (text == null) "" else text.reverse)
      override def embedCol(text: Column): Column =
        FakeEmbedder.embedCol(reverse(text))
    }
    val sf = "/root/testdata/sf0.001"
    val storeDir = graft.sources.CodeStore.storeFor(spark, sf)
    val qDir = java.nio.file.Files.createTempDirectory("embedq").toString
    val qText = "fast vector search over spark tables"
    java.nio.file.Files.write(java.nio.file.Paths.get(qDir, "q.json"),
      s"""{"query_id": 7, "query_text": "$qText"}\n""".getBytes("UTF-8"))
    val viaStream = graft.streaming.CodeProbeStream
      .runOnce(spark, qDir, storeDir, k = 5, embedder = ReversedEmbedder)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    val direct = graft.sources.CodeStore
      .search(spark, storeDir, FakeEmbedder.embed(qText.reverse), 5)
      .orderBy("rk").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaStream == direct,
      s"stream with injected embedder diverged: $viaStream vs $direct")
  }
}
