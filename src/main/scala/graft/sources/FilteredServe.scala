package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SrpBanded
import graft.functions.vectors

/** v39: metadata-filtered ANN on the STORED serve path — the
  * reference's defining query pattern (`WHERE withdrawn = 0 AND
  * type = 'POLICY' ORDER BY embedding <=> q LIMIT k`, tools.yaml:22-27
  * composed with sql/02_schema.sql's metadata columns) served from
  * index artifacts instead of the exact corpus scan r1/v10 run.
  *
  * Strategy — a THREE-TIER cardinality planner (the catalog-statistics
  * decision pgvector-class systems make, extended with a per-value
  * code index), every tier reading only store files:
  *
  *  - '''selective predicate''' (matching rows ≤ [[ExactScanMax]]):
  *    exact top-k over a PARTITION-PRUNED read of the `meta/byval/`
  *    artifact — embeddings stored partitioned by the declared filter
  *    columns, so the scan touches only matching partitions (decided
  *    in the file index, zero IO elsewhere). Recall is 1.0 by
  *    construction: this is why selective predicates do NOT collapse
  *    recall here — few matching rows make the exact ranking cheap,
  *    and the partition layout makes "few" mean "few bytes read".
  *  - '''mid-selectivity''' (matching ≤ [[CodeScanMax]]): the
  *    PER-VALUE CODE tier ([[codeFiltered]]) — byval rows carry a
  *    [[CodeRpb]]-bit SRP sign sketch in-row (64 bytes vs ~3 KB of
  *    embedding), so the serve scans only the MATCHING partitions'
  *    code column, Hamming-shortlists W = matching/[[ShortlistRatio]]
  *    candidates, and exact-reranks them. Every candidate matches the
  *    predicate by construction — no post-filter, no escalation, and
  *    recall holds across corpus decades because W is keyed to the
  *    matching count, not a fixed walk budget (the r12 weakness this
  *    tier closes: walk+post-filter recall@10 decayed 0.93→0.52
  *    across 10×→1000× at fixed budget).
  *  - '''very broad predicate''': the stored graph walk (v28's serve —
  *    pruned SrpStore seed buckets + persisted EdgeStore hops),
  *    UNFILTERED so graph connectivity is preserved (filtering nodes
  *    mid-walk strands the beam — the standard filtered-HNSW result),
  *    then the walk's bounded visited set is post-filtered through a
  *    pruned point read of `meta/byid/` and cut to the best k matching
  *    candidates. The walk starts at the SELECTIVITY-KEYED factor
  *    ([[walkStartFactor]] from `meta/stats`) and escalates on the
  *    fixed schedule ([[EscalateFactors]] × maxEntries/beam —
  *    deterministic, so the whole serve stays replayable), finally
  *    falling back to the selective exact path, which cannot miss.
  *    Per-escalation cost is O(walk), never O(corpus).
  *
  * The tier decision reads the write-time `meta/stats/` value-count
  * artifact (one tiny memoized collect — the catalog-statistics role).
  *
  * Artifacts (written once per store, the ingest-time cost every
  * index here pays):
  * {{{
  *   <srpDir>/meta/byval/<c1>=<v1>/.../  (vec_id, embedding, keys) sorted by vec_id
  *   <srpDir>/meta/byid/mb=<m>/          (vec_id, c1, c2, ...)  mb = pmod(vec_id, 64)
  *   <srpDir>/meta/stats/                (c1, c2, ..., cnt)
  * }}}
  */
object FilteredServe {

  /** declared filter columns — the reference schema's metadata class
    * (lang/source play withdrawn/type's role on the synthetic corpus) */
  val MetaCols: Seq[String] = Seq("lang", "source")

  /** matching-row budget for the pruned exact path: below this, the
    * exact ranking over only-matching partitions is the cheapest AND
    * highest-recall plan (the Qdrant/pgvector cardinality crossover) */
  val ExactScanMax = 100000L

  /** byid partition count — the EdgeStore pb convention */
  val IdPartitions = 64

  /** deterministic walk-escalation schedule: multiplies maxEntries
    * (and, capped at 4, beam) until k matching candidates surface */
  val EscalateFactors: Seq[Int] = Seq(1, 4, 16)

  /** bits per band of the byval sign sketch (8 bands × 24 = 192
    * planes). The keys column is 8 int64s REGARDLESS of bits used, so
    * tripling the default 64-bit sketch costs zero storage and zero
    * scan bytes — it only sharpens the Hamming ordering (SRP angle
    * concentration ∝ 1/√bits), which is what lets the code tier hold
    * recall at corpus decades where the fixed-budget walk decays. */
  val CodeRpb = 24

  /** matching-row ceiling for the per-value CODE tier: above exact,
    * below this, the serve scans ONLY the matching partitions' 64-byte
    * code rows (embedding column never read — parquet projection),
    * Hamming-shortlists, and exact-reranks the shortlist. 50M codes
    * ≈ 3.2 GB — a sub-second distributed scan; past it the predicate
    * is so broad that the O(budget) walk + post-filter loses little
    * to the filter and costs corpus-independent IO. */
  val CodeScanMax = 50000000L

  /** code-tier shortlist floor — 2× the HammingIndex default: the
    * rerank cost (W embedding point-reads) is trivial next to the
    * code scan, and the hard near-random regime measured 0.88
    * recall@10 at 256 vs ~0.95 at 512 on the 10× replica corpus */
  val CodeShortlist = 512

  /** shortlist width grows with the matching count at this ratio
    * (W = matching/ratio, floored at [[CodeShortlist]]) so recall is
    * roughly scale-free across matching-set decades */
  val ShortlistRatio = 64L

  /** driver-side shortlist cap — the collect-then-InSet point fetch
    * stays O(k-ish); past ~1M matching rows the W/matching ratio
    * thins below 1/128 and code-tier recall decays slowly (logged in
    * PERF.md, never silent) */
  val MaxShortlist = 8192

  /** cap on the selectivity-keyed walk start factor */
  val MaxWalkFactor = 8

  /** which plan the last serve took ("exact" | "walk:<f>" |
    * "fallback") — spec hook */
  @volatile private[graft] var lastFilteredPath: String = ""
  /** executed plan of the last pruned byval read — spec hook */
  @volatile private[graft] var lastByValPlan: String = ""
  /** executed plan of the last pruned byid read — spec hook */
  @volatile private[graft] var lastByIdPlan: String = ""
  /** executed plan of the last code-tier shortlist scan — spec hook
    * (the column-pruning claim: no embedding bytes in ReadSchema) */
  @volatile private[graft] var lastCodeScanPlan: String = ""

  /** Write the meta artifacts under an existing SRP store dir. The
    * `stats/` write comes LAST and carries parquet's _SUCCESS marker,
    * so its presence commits the whole artifact set (a crash mid-write
    * leaves [[ensureMeta]] rebuilding — never serving a torn copy). */
  def writeMeta(spark: SparkSession, d: String, srpDir: String): Unit = {
    val f = Hfs.fs(spark, srpDir)
    f.delete(new org.apache.hadoop.fs.Path(s"$srpDir/meta"), true): Unit
    val docs = Tables.documents(spark, d)
      .select((col("doc_id").as("vec_id") +: MetaCols.map(col)): _*)
    val emb = Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val joined = emb.join(docs, Seq("vec_id"))
    // value-partitioned embedding copy: the selective path's pruned
    // exact scan (partition count = distinct value combinations — the
    // tenant/category layout a production corpus already has). Rows
    // carry the [[CodeRpb]]-bit sign sketch in-row (the per-value CODE
    // index — 64 bytes vs the embedding's ~3 KB, column-projected so
    // the code tier never reads embedding bytes) and are sorted by
    // vec_id within each value dir, so the shortlist's point fetch
    // prunes at parquet row-group min/max, not just partition dirs.
    joined
      .withColumn("keys",
        SrpBanded.bandKeysCol(col("embedding"), SrpBanded.Dim, CodeRpb))
      .repartition(MetaCols.map(col): _*)
      .sortWithinPartitions((MetaCols :+ "vec_id").map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(MetaCols: _*)
      .parquet(s"$srpDir/meta/byval")
    // id-keyed metadata rows: the walk path's bounded post-filter
    // point read (no embedding — a candidate's meta is a few bytes)
    docs
      .withColumn("mb", pmod(col("vec_id"), lit(IdPartitions.toLong)))
      .repartition(col("mb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("mb")
      .parquet(s"$srpDir/meta/byid")
    // value counts — the planner's statistics (written last: commit)
    joined.groupBy(MetaCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$srpDir/meta/stats")
    statsCache.remove(srpDir): Unit
    metaVerified.remove(srpDir): Unit
  }

  /** Incremental meta maintenance — the [[SrpStore.upsert]] contract
    * applied to the three meta artifacts, so a corpus upsert never
    * forces an O(corpus) meta rebuild:
    *
    *  - `updates` carries (vec_id, embedding, <MetaCols>) — metadata
    *    rides the update batch the way embeddings do (an ingest knows
    *    both); a re-ingested document may CHANGE its metadata values,
    *    which moves it across byval partitions;
    *  - byval: only the touched value partitions are rewritten via
    *    dynamic partition overwrite — partitions gaining rows plus
    *    partitions holding a stale copy of an updated id (located by
    *    the one unavoidable id-column-pruned store scan, the
    *    IvfStore.upsert adjudication); emptied value dirs deleted;
    *  - byid: `mb` is a pure function of vec_id, so stale and new
    *    rows share a partition — only the updated ids' mb partitions
    *    rewrite;
    *  - crash contract: the stats `_SUCCESS` marker is DELETED before
    *    the first rewrite and stats are rewritten LAST — it is the
    *    artifact [[ensureMeta]] gates on, so a crash anywhere
    *    mid-upsert leaves the store visibly uncommitted and the next
    *    serve's ensureMeta rebuilds it from the corpus; only a
    *    completed upsert re-commits. (Without the up-front delete,
    *    the PREVIOUS stats marker would vouch for a half-rewritten
    *    byval/byid set — a torn store served as consistent.)
    *
    * Returns the touched byval (value...) partitions (what the
    * rewrite-minimality spec asserts against). */
  def upsertMeta(spark: SparkSession, srpDir: String,
                 updates: DataFrame): Seq[Seq[String]] = {
    MetaCols.foreach(c => require(updates.columns.contains(c),
      s"upsertMeta updates must carry meta column '$c'"))
    val upd = updates
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select((Seq(col("vec_id"), col("embedding"),
        SrpBanded.bandKeysCol(col("embedding"), SrpBanded.Dim, CodeRpb)
          .as("keys")) ++ MetaCols.map(col)): _*)
      .localCheckpoint(true)
    val updIds = upd.select(col("vec_id")).distinct()
    val byvalRaw = spark.read.parquet(s"$srpDir/meta/byval")
    require(byvalRaw.columns.contains("keys"),
      s"byval at $srpDir predates the code-tier keys column — run " +
        "ensureMeta/writeMeta before upserting (a mixed-schema byval " +
        "would rank null-key rows first in the Hamming shortlist)")
    val byval = byvalRaw
      .select((Seq(col("vec_id"), col("embedding"), col("keys")) ++
        MetaCols.map(c => col(c).cast("string").as(c))): _*)
    val oldVals = byval.join(broadcast(updIds), Seq("vec_id"))
      .select(MetaCols.map(col): _*).distinct()
      .collect().map(r => MetaCols.indices.map(r.getString)).toSeq
    val newVals = upd.select(MetaCols.map(col): _*).distinct()
      .collect().map(r => MetaCols.indices.map(r.getString)).toSeq
    val touched = (oldVals ++ newVals).distinct
    if (touched.nonEmpty) {
      // uncommit FIRST: from here to the final stats write the store
      // is in-flux, and a crash must leave it rebuild-on-next-read,
      // never served-as-consistent
      Hfs.fs(spark, srpDir).delete(
        new org.apache.hadoop.fs.Path(s"$srpDir/meta/stats/_SUCCESS"), false): Unit
      statsCache.remove(srpDir): Unit
      // drop the ensureMeta memo too: if this upsert dies mid-flight
      // (exception, not JVM death), the next serve must re-check the
      // commit marker and rebuild, not trust a stale "verified"
      metaVerified.remove(srpDir): Unit
      val touchedPred = touched.map(vs =>
        MetaCols.zip(vs).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
        .reduce(_ || _)
      val survivors = byval.filter(touchedPred)
        .join(broadcast(updIds), Seq("vec_id"), "left_anti")
      val merged = survivors
        .unionByName(upd.select(byval.columns.map(col): _*))
        .repartition(MetaCols.map(col): _*)
        .localCheckpoint(true)
      try {
        // sort AFTER the checkpoint so the writer sees the ordering
        // (a checkpoint erases outputOrdering and the writer's own
        // partition-column re-sort would drop the vec_id sub-order
        // the shortlist point fetch row-group-prunes on)
        merged
          .sortWithinPartitions((MetaCols :+ "vec_id").map(col): _*)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(MetaCols: _*)
          .parquet(s"$srpDir/meta/byval")
        // a value partition emptied by a move survives dynamic
        // overwrite — delete it (the SrpStore.upsert emptied-bucket move)
        val present = merged.select(MetaCols.map(col): _*).distinct()
          .collect().map(r => MetaCols.indices.map(i => String.valueOf(r.get(i)))).toSet
        val f = Hfs.fs(spark, srpDir)
        touched.filterNot(present).foreach { vs =>
          // partition dirs on disk carry Spark's Hive-style escaping
          // (space, '/', '=', '%', …) — the delete path must use the
          // SAME escaping or an emptied partition with such a value
          // survives and keeps serving its stale rows
          val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
          val sub = MetaCols.zip(vs).map { case (c, v) => s"${esc(c)}=${esc(v)}" }.mkString("/")
          f.delete(new org.apache.hadoop.fs.Path(s"$srpDir/meta/byval/$sub"), true): Unit
        }
      } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(merged)
      // byid: rewrite the updated ids' mb partitions
      val mbs = updIds.collect().map(r =>
        Math.floorMod(r.getLong(0), IdPartitions.toLong)).distinct.toSeq
      val byid = spark.read.parquet(s"$srpDir/meta/byid")
        .select((Seq(col("vec_id")) ++ MetaCols.map(c => col(c).cast("string").as(c)) :+
          col("mb").cast("long").as("mb")): _*)
      val idSurvivors = byid.filter(col("mb").isin(mbs: _*))
        .join(broadcast(updIds), Seq("vec_id"), "left_anti")
      val idMerged = idSurvivors
        .unionByName(upd.select((Seq(col("vec_id")) ++ MetaCols.map(col)): _*)
          .withColumn("mb", pmod(col("vec_id"), lit(IdPartitions.toLong))))
        .repartition(col("mb"))
        .localCheckpoint(true)
      try idMerged.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("mb")
        .parquet(s"$srpDir/meta/byid")
      finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(idMerged)
      // stats last (the ensureMeta gate): partition-column-only scan
      spark.read.parquet(s"$srpDir/meta/byval")
        .groupBy(MetaCols.map(c => col(c).cast("string").as(c)): _*)
        .agg(count(lit(1)).as("cnt"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$srpDir/meta/stats")
      statsCache.remove(srpDir): Unit
    }
    org.apache.spark.sql.GraftBridge.unpersistPlanRdds(upd)
    touched
  }

  private def metaCommitted(spark: SparkSession, srpDir: String): Boolean =
    Hfs.fs(spark, srpDir)
      .exists(new org.apache.hadoop.fs.Path(s"$srpDir/meta/stats/_SUCCESS"))

  /** build-once guard, keyed by the store dir (the storeFor pattern).
    * Also a SCHEMA guard: a committed byval predating the code tier
    * (no `keys` column) is rebuilt, never served mixed-schema. The
    * footer read behind the check is memoized per store dir. */
  def ensureMeta(spark: SparkSession, d: String, srpDir: String): Unit =
    if (!metaVerified.contains(srpDir)) {
      val ok = metaCommitted(spark, srpDir) &&
        spark.read.parquet(s"$srpDir/meta/byval").columns.contains("keys")
      if (!ok) writeMeta(spark, d, srpDir)
      metaVerified.put(srpDir, true): Unit
    }

  // stats are a handful of rows per store — memoized like centroids
  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Map[String, String], Long)]]
  private val metaVerified =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  graft.Tables.onInvalidate { p =>
    statsCache.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k))
    metaVerified.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k))
  }

  private def stats(spark: SparkSession, srpDir: String): Seq[(Map[String, String], Long)] =
    statsCache.getOrElseUpdate(srpDir, {
      spark.read.parquet(s"$srpDir/meta/stats").collect().toSeq.map { r =>
        (MetaCols.map(c => c -> String.valueOf(r.getAs[Any](c))).toMap,
          r.getAs[Long]("cnt"))
      }
    })

  /** matching-row count for an equality conjunction over [[MetaCols]]
    * (subset allowed) — read from the write-time stats artifact */
  def matchCount(spark: SparkSession, srpDir: String,
                 pred: Seq[(String, String)]): Long = {
    requirePred(pred)
    stats(spark, srpDir)
      .filter { case (vals, _) => pred.forall { case (c, v) => vals(c) == v } }
      .map(_._2).sum
  }

  /** total indexed rows — the selectivity denominator, from the same
    * stats artifact (no store scan) */
  def totalCount(spark: SparkSession, srpDir: String): Long =
    stats(spark, srpDir).map(_._2).sum

  /** selectivity-keyed walk start factor: a predicate matching 1/s of
    * the corpus needs ~s× the visited set for the post-filter to keep
    * the unfiltered budget's worth of MATCHING candidates — capped so
    * the walk stays O(budget) (past the cap the code tier is the
    * planner's answer, not a deeper walk) */
  private[graft] def walkStartFactor(matching: Long, total: Long): Int =
    if (matching <= 0L) 1
    else math.min(MaxWalkFactor.toLong,
      math.max(1L, (total + matching - 1) / matching)).toInt

  private def requirePred(pred: Seq[(String, String)]): Unit = {
    require(pred.nonEmpty, "filtered search needs at least one predicate term")
    val bad = pred.map(_._1).filterNot(MetaCols.contains)
    require(bad.isEmpty,
      s"predicate columns ${bad.mkString(",")} not in declared meta columns ${MetaCols.mkString(",")}")
  }

  private def predCol(pred: Seq[(String, String)]): Column =
    pred.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)

  /** Pruned exact read: (vec_id, embedding) of the rows matching the
    * predicate — partition columns only, so the filter is static
    * file-index pruning. */
  def byValPruned(spark: SparkSession, srpDir: String,
                  pred: Seq[(String, String)]): DataFrame = {
    requirePred(pred)
    val pruned = spark.read.parquet(s"$srpDir/meta/byval")
      .filter(predCol(pred))
      .select(col("vec_id"), col("embedding"))
    lastByValPlan = pruned.queryExecution.executedPlan.toString
    pruned
  }

  /** Pruned point read of candidate ids' metadata, filtered by the
    * predicate — returns the id set that SATISFIES it. Bounded by the
    * walk's visited-set size (≤ maxEntries + iters·beam·graphK). */
  def matchingIds(spark: SparkSession, srpDir: String,
                  pred: Seq[(String, String)], ids: Seq[Long]): Set[Long] = {
    if (ids.isEmpty) return Set.empty
    val mbs = ids.map(Math.floorMod(_, IdPartitions.toLong)).distinct
    val read = spark.read.parquet(s"$srpDir/meta/byid")
      .filter(col("mb").isin(mbs: _*) && col("vec_id").isin(ids: _*) &&
        predCol(pred))
      .select(col("vec_id"))
    lastByIdPlan = read.queryExecution.executedPlan.toString
    read.collect().map(_.getLong(0)).toSet
  }

  private def topKDf(spark: SparkSession,
                     cands: Seq[(Long, Double)], k: Int): DataFrame =
    SrpBanded.topKCut(spark, cands, k) // the one emission contract

  /** exact filtered top-k over the pruned byval partitions — the
    * selective branch AND the escalation fallback (recall 1.0);
    * shared with the other families' filtered serves (CodeStore) */
  private[sources] def exactFiltered(spark: SparkSession, srpDir: String,
                            queryVec: Array[Float],
                            pred: Seq[(String, String)], k: Int): DataFrame = {
    val q = typedLit(queryVec)
    val cands = byValPruned(spark, srpDir, pred)
      .select(col("vec_id"), vectors.cosine_sim(col("embedding"), q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    topKDf(spark, cands, k)
  }

  /** The per-value CODE tier (the mid-selectivity branch): scan ONLY
    * the matching partitions' (vec_id, keys) rows — partition-pruned
    * by the predicate, column-projected so the ~3 KB embedding column
    * is never read — Hamming-shortlist against the query's
    * [[CodeRpb]]-bit sketch, then exact-cosine rerank of the
    * shortlist via the row-group-pruned point fetch. Every candidate
    * matches the predicate BY CONSTRUCTION (no post-filter, no
    * escalation, no recall cliff from filtering a walk): recall is
    * the sketch's, scale-keyed by growing W with the matching count.
    * When W ≥ matching the tier IS the exact ranking. */
  private[graft] def codeFiltered(spark: SparkSession, metaDir: String,
                                  queryVec: Array[Float],
                                  pred: Seq[(String, String)], k: Int,
                                  matching: Long): DataFrame = {
    val w = math.min(MaxShortlist.toLong,
      math.max(CodeShortlist.toLong, matching / ShortlistRatio)).toInt
    val qk = SrpBanded.queryBandKeys(queryVec, SrpBanded.Dim, CodeRpb).map(_._2)
    val scan = spark.read.parquet(s"$metaDir/meta/byval")
      .filter(predCol(pred))
      .select(col("vec_id"),
        graft.operators.HammingIndex.hammingCol(qk).as("ham"))
    lastCodeScanPlan = scan.queryExecution.executedPlan.toString
    // bounded driver state: W shortlist ids (≤ MaxShortlist) — the
    // same O(k-ish) license every single-query serve here documents
    val ids = scan.orderBy(col("ham").asc, col("vec_id").asc)
      .limit(w).collect().map(_.getLong(0)).toSeq
    val cands = byValPruned(spark, metaDir, pred)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"),
        vectors.cosine_sim(col("embedding"), typedLit(queryVec)).as("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    lastFilteredPath = s"code:$w"
    topKDf(spark, cands, k)
  }

  /** The family-generic filtered-serve core — a three-tier
    * cardinality planner (the catalog-statistics decision pgvector-
    * class systems make, extended with the per-value code index):
    *
    *  - matching ≤ `exactScanMax` → pruned exact scan (recall 1.0);
    *  - matching ≤ `codeScanMax` → [[codeFiltered]], the per-value
    *    code tier (candidates match by construction — the branch that
    *    holds recall at corpus decades where post-filtering a
    *    fixed-budget walk decays);
    *  - broader → the family's walk (`walkAt` at escalation factor f —
    *    a graph walk, a hierarchy descent, a code shortlist), started
    *    at the SELECTIVITY-KEYED factor from the stats artifact
    *    ([[walkStartFactor]] — a 1/s-selective predicate walks ~s× so
    *    the post-filter keeps an unfiltered budget's worth of matching
    *    candidates), escalating deterministically, with the pruned
    *    exact fallback that cannot miss.
    *
    * Meta artifacts must already be committed under `metaDir`
    * ([[ensureMeta]]). */
  def searchFilteredBy(spark: SparkSession, metaDir: String,
                       queryVec: Array[Float], pred: Seq[(String, String)],
                       k: Int, exactScanMax: Long = ExactScanMax,
                       codeScanMax: Long = CodeScanMax,
                       walkTag: String = "walk")
                      (walkAt: Int => Seq[(Long, Double)]): DataFrame = {
    val matching = matchCount(spark, metaDir, pred)
    if (matching <= exactScanMax) {
      lastFilteredPath = "exact"
      exactFiltered(spark, metaDir, queryVec, pred, k)
    } else if (matching <= codeScanMax) {
      codeFiltered(spark, metaDir, queryVec, pred, k, matching)
    } else {
      val f0 = walkStartFactor(matching, totalCount(spark, metaDir))
      val hit = EscalateFactors.iterator.map { e =>
        val f = math.min(e * f0, 64)
        val visited = walkAt(f)
        val ok = matchingIds(spark, metaDir, pred, visited.map(_._1))
        (f, visited.filter(v => ok(v._1)))
      }.find(_._2.size >= k)
      hit match {
        case Some((f, matched)) =>
          lastFilteredPath = s"$walkTag:$f"
          topKDf(spark, matched, k)
        case None =>
          // the schedule never surfaced k matching candidates: the
          // predicate is more selective than the stats suggested (or
          // the matches are far from the query's basin) — the pruned
          // exact path answers with full recall
          lastFilteredPath = "fallback"
          exactFiltered(spark, metaDir, queryVec, pred, k)
      }
    }
  }

  /** v39: metadata-filtered stored graph search. Same result schema as
    * v28 — (vec_id, rk, sim) — restricted to rows matching `pred`. */
  def searchFiltered(spark: SparkSession, d: String, srpDir: String,
                     edgeDir: String, queryVec: Array[Float],
                     pred: Seq[(String, String)], k: Int = 10,
                     beam: Int = 8, iters: Int = 2, maxEntries: Int = 64,
                     graphK: Int = 5, probeRadius: Int = 2,
                     exactScanMax: Long = ExactScanMax,
                     codeScanMax: Long = CodeScanMax): DataFrame = {
    ensureMeta(spark, d, srpDir)
    searchFilteredBy(spark, srpDir, queryVec, pred, k, exactScanMax,
      codeScanMax) { f =>
      SrpBanded.graphWalkVisited(spark, srpDir,
        SrpStore.scoredPool(spark, srpDir, queryVec, probeRadius),
        queryVec, beam * math.min(f, 4), iters, maxEntries * f, graphK,
        edgesFor = Some(fr => EdgeStore.edgesFor(spark, edgeDir, fr)))
    }
  }
}
