package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FilteredServe
import graft.functions.FakeEmbedder

/** Streaming METADATA-FILTERED serving against the persisted meta
  * artifacts (r13) — the filtered twin of the per-family probe
  * streams, extending the streaming matrix to the filtered surface.
  * Each stream record carries its own predicate value (the reference's
  * request shape: every find_similar call arrives with the caller's
  * `withdrawn/type` filter), so one stream exercises the whole
  * three-tier planner: a selective value takes the pruned exact scan,
  * a broad one the per-value code tier — decided per request from the
  * stats artifact, exactly as the batch serve does.
  *
  * At 100 TB a micro-batch costs |batch| pruned serves whose bytes are
  * keyed to each request's MATCHING set (never the corpus): the exact
  * tier reads one value partition, the code tier that partition's
  * 64 B/row code column plus a W-row rerank. `foreachBatch` is the
  * supported seam, as in the other probe streams. r15: records may
  * carry a TYPED comparison (`source_ge`) — the stream speaks the
  * same MetaTerm conjunctions as the batch surface. */
object FilteredProbeStream {

  /** One batch of filtered queries against the meta artifacts: the
    * shared kernel of the stream and its batch twin
    * ([[FilteredServe.searchFiltered]] per query). */
  def probeBatch(spark: SparkSession, d: String, srpDir: String,
                 edgeDir: String,
                 queries: Seq[(Long, Array[Float], Seq[(String, String)])],
                 k: Int): DataFrame =
    probeBatchTerms(spark, d, srpDir, edgeDir,
      queries.map { case (q, v, p) =>
        (q, v, graft.sources.MetaTerm.ofPairs(p)) }, k)

  /** [[probeBatch]] for TYPED-term requests (r15): the stream record
    * may carry a comparison (`source >= s1`), served per-request
    * through the typed three-tier planner. */
  def probeBatchTerms(spark: SparkSession, d: String, srpDir: String,
                 edgeDir: String,
                 queries: Seq[(Long, Array[Float], Seq[graft.sources.MetaTerm])],
                 k: Int,
                 exactScanMax: Long = FilteredServe.ExactScanMax,
                 codeScanMax: Long = FilteredServe.CodeScanMax): DataFrame = {
    import spark.implicits._
    val perQuery = queries.map { case (qid, qv, terms) =>
      FilteredServe.searchFilteredTerms(spark, d, srpDir, edgeDir, qv,
        terms, k = k, exactScanMax = exactScanMax, codeScanMax = codeScanMax)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          col("rk"), col("sim"))
    }
    if (perQuery.isEmpty)
      Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "neighbor_id", "rk", "sim")
    else perQuery.reduce(_ unionAll _)
  }

  /** [[probeBatch]] with SET-BASED amortization (r14): the micro-batch
    * is GROUPED BY PREDICATE VALUE — the reference's request shape has
    * many callers sharing a filter — and a group whose shortlist
    * policy COVERS its matching set (W ≥ matching, the regime where
    * the batched code tier IS the exact filtered ranking) serves
    * through ONE set-based plan ([[FilteredServe.searchFilteredBatchFrom]]:
    * one pruned code scan + per-query shortlist + rerank for the whole
    * group) instead of |group| single serves. Groups outside the
    * covering regime, and singletons (nothing to amortize), keep the
    * per-request three-tier serve. Rows are IDENTICAL to
    * [[probeBatch]] by construction — covering ⇒ both paths emit the
    * exact filtered per-query top-k with the same tie and rounding
    * contract — which the spec asserts on a mixed micro-batch. */
  def probeBatchGrouped(spark: SparkSession, d: String, srpDir: String,
                 edgeDir: String,
                 queries: Seq[(Long, Array[Float], Seq[(String, String)])],
                 k: Int): DataFrame =
    probeBatchGroupedTerms(spark, d, srpDir, edgeDir,
      queries.map { case (q, v, p) =>
        (q, v, graft.sources.MetaTerm.ofPairs(p)) }, k)

  /** [[probeBatchGrouped]] for TYPED-term requests (r15): grouping is
    * by the term conjunction itself (same-threshold callers share one
    * typed batch plan — the searchFilteredBatchMixedOps grouping, here
    * on the stream's micro-batch), the covering test rides an UPPER
    * BOUND of the matching count, and groups outside both set-based
    * regimes keep the per-request typed serve.
    *
    * r16: set-based serving extends past the covering regime — a
    * group whose PLANNER estimate lands in the CODE band (the regime
    * where the per-request serve itself runs the approximate code
    * tier) takes the batch plan too: both paths run the same tier at
    * the same coverage-keyed W policy, so amortizing is recall-neutral
    * by construction (and measured within 0.007 of single-query
    * recall at the 4M-matching decade,
    * docs/filtered_scale_r15b_10000x_final.json). Groups the
    * per-request planner would serve EXACTLY (below `exactScanMax`
    * and not covering) keep the per-request serve — batching them
    * would silently trade exact for approximate. The tier decision
    * uses the same [[FilteredServe.plannerCount]] the per-request
    * planner reads, so the two paths cannot disagree about the tier. */
  def probeBatchGroupedTerms(spark: SparkSession, d: String, srpDir: String,
                 edgeDir: String,
                 queries: Seq[(Long, Array[Float], Seq[graft.sources.MetaTerm])],
                 k: Int,
                 exactScanMax: Long = FilteredServe.ExactScanMax,
                 codeScanMax: Long = FilteredServe.CodeScanMax): DataFrame = {
    import spark.implicits._
    FilteredServe.ensureMeta(spark, d, srpDir)
    val partCols = FilteredServe.storeMetaCols(spark, srpDir).toSet
    val parts = queries.groupBy(_._3).toSeq
      .sortBy(_._1.map(_.toString).mkString(","))
      .map { case (terms, qs) =>
        // the covering decision must be conservative: the histogram
        // estimate can UNDER-count a range-class term (skew inside a
        // boundary bin), which would claim covering while W < actual
        // matching and silently trade the per-request exact serve for
        // an approximate batch. Bound matching from ABOVE by the
        // partition-class terms' exact combo sum (a range residual
        // only shrinks the set); with no partition term the bound is
        // the store total. The batch plan's W floor (CodeShortlist)
        // then covers the bound whenever the bound admits covering at
        // all, whatever the estimate says.
        val partTerms = terms.filter(t => partCols.contains(t.column))
        val matchingUb =
          if (partTerms.nonEmpty)
            FilteredServe.estimateCount(spark, srpDir, partTerms) // exact: no range terms
          else FilteredServe.totalCount(spark, srpDir)
        val covering = matchingUb > 0 &&
          FilteredServe.shortlistWidth(matchingUb) >= matchingUb
        // the code band rides the PLANNER estimate — the same number
        // the per-request tier dispatch reads, so a batched group runs
        // exactly the tier its members would have run per-request
        val est = FilteredServe.plannerCount(spark, srpDir, terms)
        val codeBand = est > exactScanMax && est <= codeScanMax
        if (qs.size >= 2 && (covering || codeBand)) {
          val qdf = qs.map { case (qid, qv, _) => (qid, qv) }
            .toDF("query_id", "q_vec")
          FilteredServe.searchFilteredBatchFrom(spark, srpDir, qdf, terms, k,
            codeScanMax = codeScanMax)
        } else probeBatchTerms(spark, d, srpDir, edgeDir, qs, k,
          exactScanMax, codeScanMax)
      }
    if (parts.isEmpty)
      Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "neighbor_id", "rk", "sim")
    else parts.map(_.toDF("query_id", "neighbor_id", "rk", "sim"))
      .reduce(_ unionAll _)
  }

  /** Drain a filtered-query stream through the meta artifacts once
    * (AvailableNow), returning all emitted rows. Records are
    * `{query_id, query_text, lang[, source]}` — the predicate rides
    * the request, `source` optional (a present value conjoins). */
  def runOnce(spark: SparkSession, queriesDir: String, d: String,
              srpDir: String, edgeDir: String, k: Int = 10,
              embedder: graft.functions.Embedder = FakeEmbedder): DataFrame = {
    import spark.implicits._
    FilteredServe.ensureMeta(spark, d, srpDir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val queries = spark.readStream
      .schema("query_id LONG, query_text STRING, lang STRING, source STRING, source_ge STRING")
      .json(queriesDir)
    val q = queries.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val qs = batch.collect()
          .map { r =>
            // lang is REQUIRED: a null would build ('lang', null),
            // match nothing, and the request would vanish from the
            // output indistinguishable from "no similar documents"
            require(!r.isNullAt(2),
              s"filtered query record ${r.getLong(0)} missing required 'lang'")
            val terms: Seq[graft.sources.MetaTerm] =
              Seq(graft.sources.MetaTerm.Eq("lang", r.getString(2))) ++
              (if (r.isNullAt(3)) Nil
               else Seq(graft.sources.MetaTerm.Eq("source", r.getString(3)))) ++
              // a present source_ge conjoins a typed comparison — the
              // reference's range-predicate request shape on the stream
              (if (r.isNullAt(4)) Nil
               else Seq(graft.sources.MetaTerm.Cmp("source", ">=", r.getString(4))))
            (r.getLong(0), embedder.embed(r.getString(1)), terms)
          }.toSeq
        if (qs.nonEmpty) {
          // grouped-by-predicate set-based serving — identical rows to
          // the per-request path (probeBatchGrouped doc), amortized
          val rows = probeBatchGroupedTerms(spark, d, srpDir, edgeDir, qs, k)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          out.synchronized { out ++= rows: Unit }
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // read under the same lock the streaming thread appended under —
    // awaitTermination alone gives no formal happens-before edge
    out.synchronized(out.toSeq).toDF("query_id", "neighbor_id", "rk", "sim")
  }
}
