package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.CurationStream

/** Streaming curation: per-micro-batch dispositions against the
  * evolving SigStore state. Contracts:
  *  - batch-split invariance: a two-batch stream's union disposition
  *    equals the one-batch (all docs at once) run;
  *  - the union equals a first-principles batch funnel over the same
  *    prefix (p1's quality/exact stages verbatim, the near-dup stage
  *    on the store's pair metric with min-id canonical — the
  *    streaming analogue of p1's canonicalization), with keeper
  *    equality under chain resolution (p1's stage-local contract). */
class CurationStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ~60 distinct non-stopword tokens → quality 1.0, well over MinChars;
  // near-dups differ in ONE token (token-jaccard ≈ shingle-jaccard ≈
  // 0.97 — far above both thresholds, so the LSH banding finds them
  // deterministically)
  private def body(tag: String): String =
    (1 to 60).map(i => s"${tag}w${i}q").mkString(" ")
  private def oneOff(tag: String): String =
    (body(tag).split(" ").dropRight(1) :+ "zzzchanged").mkString(" ")

  // arrival in doc_id order (batch 1 = ids 1..6, batch 2 = ids 11..16):
  //  1 kept        — unique content A
  //  2 quality     — too short
  //  3 exact_dup   — same normalized text as 1 (case + punct noise)
  //  4 kept        — unique content B
  //  5 near_dup    — one token off content A       → keeper 1
  //  6 kept        — unique content C
  // 11 exact_dup   — content B verbatim (cross-batch) → keeper 4
  // 12 near_dup    — one token off content C (cross-batch) → keeper 6
  // 13 kept        — unique content D
  // 14 near_dup    — one token off content D (within batch 2) → keeper 13
  // 15 quality     — too short
  // 16 kept        — unique content E
  private def docsFixture: Seq[(Long, String, String, String)] = Seq(
    (1L, body("aa"), "en", "src0"),
    (2L, "too short", "en", "src0"),
    (3L, body("aa").toUpperCase + "!!", "en", "src1"),
    (4L, body("bb"), "de", "src0"),
    (5L, oneOff("aa"), "en", "src0"),
    (6L, body("cc"), "fr", "src0"),
    (11L, body("bb"), "de", "src1"),
    (12L, oneOff("cc"), "fr", "src0"),
    (13L, body("dd"), "es", "src0"),
    (14L, oneOff("dd"), "es", "src0"),
    (15L, "also short", "zh", "src0"),
    (16L, body("ee"), "zh", "src0"))

  private def expected: Map[Long, (String, Option[Long])] = Map(
    1L -> ("kept", Some(1L)), 2L -> ("quality", None),
    3L -> ("exact_dup", Some(1L)), 4L -> ("kept", Some(4L)),
    5L -> ("near_dup", Some(1L)), 6L -> ("kept", Some(6L)),
    11L -> ("exact_dup", Some(4L)), 12L -> ("near_dup", Some(6L)),
    13L -> ("kept", Some(13L)), 14L -> ("near_dup", Some(13L)),
    15L -> ("quality", None), 16L -> ("kept", Some(16L)))

  private def run(batches: Seq[Seq[(Long, String, String, String)]]): Map[Long, (String, Option[Long])] = {
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("cur_stream").toString
    val stateDir = java.nio.file.Files.createTempDirectory("cur_state").toString
    batches.foreach { b =>
      b.toDF("doc_id", "text", "lang", "source").toJSON.coalesce(1)
        .write.mode("append").text(s"$streamDir/in")
    }
    CurationStream.runOnce(spark, s"$streamDir/in", stateDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
  }

  test("two-batch stream union equals the one-shot run and the batch-funnel ground truth") {
    val twoBatch = run(Seq(docsFixture.filter(_._1 < 10), docsFixture.filter(_._1 >= 10)))
    val oneShot = run(Seq(docsFixture))
    assert(twoBatch == oneShot,
      s"batch-split changed dispositions:\n2b=$twoBatch\n1b=$oneShot")
    assert(twoBatch == expected,
      s"stream diverged from the funnel ground truth:\ngot=$twoBatch\nexp=$expected")
  }

  test("state evolves: later batches dedup against earlier survivors, keys persist") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("cur_state2").toString
    val b1 = CurationStream.serveBatch(spark, stateDir,
      docsFixture.filter(_._1 < 10).toDF("doc_id", "text", "lang", "source"))
    assert(b1.filter(col("stage") === "kept").count() == 3) // 1, 4, 6
    // batch 2 alone — its cross-batch dups must resolve against state
    val b2 = CurationStream.serveBatch(spark, stateDir,
      docsFixture.filter(_._1 >= 10).toDF("doc_id", "text", "lang", "source"))
    val got = b2.collect().map(r => r.getLong(0) ->
      (r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got(11L) == ("exact_dup", Some(4L)), s"cross-batch exact missed: $got")
    assert(got(12L) == ("near_dup", Some(6L)), s"cross-batch near-dup missed: $got")
    assert(got(14L) == ("near_dup", Some(13L)), s"within-batch near-dup missed: $got")
    // key-table join-shape crossover: the forced shuffle join (what a
    // corpus-sized hash table takes) dispositions identically
    val stateDir3 = java.nio.file.Files.createTempDirectory("cur_state_shj").toString
    CurationStream.serveBatch(spark, stateDir3,
      docsFixture.filter(_._1 < 10).toDF("doc_id", "text", "lang", "source"),
      keyBroadcastMax = 0L)
    val gotShj = CurationStream.serveBatch(spark, stateDir3,
      docsFixture.filter(_._1 >= 10).toDF("doc_id", "text", "lang", "source"),
      keyBroadcastMax = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(gotShj == got, "shuffle-join key path diverged from broadcast path")
    // the quality stage matches p1's gate definition exactly
    val g = graft.operators.Pipeline.gatedOf(
      docsFixture.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")))
    val failed = g.filter(!col("pass")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(failed == Set(2L, 15L))
  }

  test("mix summary over the stream's dispositions matches a hand count") {
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("cur_stream3").toString
    val stateDir = java.nio.file.Files.createTempDirectory("cur_state3").toString
    docsFixture.toDF("doc_id", "text", "lang", "source").toJSON.coalesce(1)
      .write.mode("append").text(s"$streamDir/in")
    val disp = CurationStream.runOnce(spark, s"$streamDir/in", stateDir)
    val summary = CurationStream.mixSummary(disp,
      docsFixture.toDF("doc_id", "text", "lang", "source"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // en/src0: docs 1, 2, 5 → quality drops 2, near-dup drops 5 → 1 kept
    assert(summary(("en", "src0")) == (3L, 2L, 2L, 1L))
    // de: 4 kept in src0; 11 exact-dup'd in src1
    assert(summary(("de", "src0")) == (1L, 1L, 1L, 1L))
    assert(summary(("de", "src1")) == (1L, 1L, 0L, 0L))
    // kept token mass = 60 tokens per kept doc (the fixture bodies)
    val keptToks = CurationStream.mixSummary(disp,
      docsFixture.toDF("doc_id", "text", "lang", "source"))
      .agg(org.apache.spark.sql.functions.sum("kept_tokens")).head().getLong(0)
    // kept docs are 1, 4, 6, 13, 16
    assert(keptToks == 5L * 60L, s"kept token mass: $keptToks")
  }
}
