package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeTokenizer, WhitespaceTokenizer}
import graft.operators.TextOps

/** The tokenizer seam: the whitespace default is oracle-pinned, and a
  * merges-file-backed BPE implementation swaps in through t3 and t5
  * with no operator change — loaded once per JVM, applied in batched
  * mapPartitions (the FileEmbedder plumbing contract). */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def mergesFixture(): String = {
    val p = java.nio.file.Files.createTempFile("graft-merges", ".txt").toString
    // rank order: 'th' first, then 'the', then 'is'
    BpeTokenizer.writeMerges(p, Seq(("t", "h"), ("th", "e"), ("i", "s")))
    p
  }

  test("BPE merge loop: greedy lowest-rank merges, rank priority respected") {
    val p = mergesFixture()
    val bpe = BpeTokenizer(p)
    assert(bpe.tokenize("the") == Seq("the"))
    assert(bpe.tokenize("this") == Seq("th", "is"))
    assert(bpe.tokenize("is this the") == Seq("is", "th", "is", "the"))
    // no applicable merges → character symbols
    assert(bpe.tokenize("ab") == Seq("a", "b"))
    // whitespace pre-split keeps empty tokens like split(text, ' ')
    assert(bpe.tokenize("a  b") == Seq("a", "", "b"))
    assert(bpe.tokenize("") == Seq(""))
  }

  test("merges file loads once per JVM across a multi-partition tokensFrame") {
    import spark.implicits._
    val p = mergesFixture()
    BpeTokenizer.dropCached(p)
    val before = BpeTokenizer.loads.get()
    val df = (1 to 1000).map(i => (i.toLong, "this is the text " + i))
      .toDF("doc_id", "text").repartition(4)
    val out = BpeTokenizer(p).tokensFrame(df, "text", "toks")
      .select(col("doc_id"), size(col("toks")).as("n")).collect()
    assert(out.length == 1000)
    assert(BpeTokenizer.loads.get() == before + 1,
      s"expected exactly one merges-file read, got ${BpeTokenizer.loads.get() - before}")
  }

  test("t3 swaps tokenizers with no operator change; default equals the pinned plan") {
    val p = mergesFixture()
    val dflt = TextOps.tokenCount(spark, sf).collect()
    val viaSeam = TextOps.tokenCount(spark, sf, WhitespaceTokenizer).collect()
    assert(dflt.map(_.toSeq).toSeq == viaSeam.map(_.toSeq).toSeq)
    val bpe = BpeTokenizer(p)
    val swapped = TextOps.tokenCount(spark, sf, bpe).collect()
    // same rows, same schema; ws_tokens now counts the BPE tokens —
    // verified against a driver-side replay of the same merges
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(swapped.length == dflt.length)
    swapped.foreach { r =>
      assert(r.getInt(1) == bpe.tokenize(texts(r.getLong(0))).length,
        s"BPE count mismatch for doc ${r.getLong(0)}")
    }
    // BPE merges characters, so its counts differ from whitespace
    // somewhere — the swap demonstrably reached the output
    assert(swapped.map(_.getInt(1)).toSeq != dflt.map(_.getInt(1)).toSeq)
  }

  test("t5 packs by the swapped tokenizer's counts, gate default unchanged") {
    val p = mergesFixture()
    val bpe = BpeTokenizer(p)
    val dflt = TextOps.sequencePack(spark, sf).collect()
    val viaSeam = TextOps.sequencePack(spark, sf,
      tok = WhitespaceTokenizer).collect()
    assert(dflt.map(_.toSeq).toSeq == viaSeam.map(_.toSeq).toSeq)
    val packed = TextOps.sequencePack(spark, sf, budget = 512, tok = bpe)
      .orderBy(col("doc_id")).collect()
    // driver replay of the greedy cumulative packing over BPE counts
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
    var acc = 0L
    val expect = texts.map { r =>
      val n = bpe.tokenize(r.getString(1)).length.toLong
      val pack = acc / 512
      acc += n
      (r.getLong(0), n, pack)
    }.toSeq
    assert(packed.map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq
      == expect, "BPE-count packing diverged from the driver replay")
  }

  test("t13 scores over the swapped tokenizer's token stream") {
    val p = mergesFixture()
    val bpe = BpeTokenizer(p)
    val viaSeam = TextOps.unigramLogprob(spark, sf, WhitespaceTokenizer).collect()
    val dflt = TextOps.unigramLogprob(spark, sf).collect()
    assert(dflt.map(_.toSeq).toSeq == viaSeam.map(_.toSeq).toSeq)
    val swapped = TextOps.unigramLogprob(spark, sf, bpe).collect()
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // n_toks follows the swapped tokenization exactly
    swapped.foreach { r =>
      assert(r.getLong(1) == bpe.tokenize(texts(r.getLong(0))).length.toLong,
        s"BPE token-stream length mismatch for doc ${r.getLong(0)}")
    }
  }
}
