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

  /** THE code-tier shortlist policy — one definition, so the
    * single-query and batched serves cannot fork on W (the covering
    * contract "W ≥ matching ⇒ exact" must hold for both) */
  def shortlistWidth(matching: Long): Int =
    math.min(MaxShortlist.toLong,
      math.max(CodeShortlist.toLong, matching / ShortlistRatio)).toInt

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

  /** Write the meta artifacts under an existing SRP store dir with
    * the default corpus wiring ([[MetaCols]] over the documents
    * table). The `stats/` write comes LAST and carries parquet's
    * _SUCCESS marker, so its presence commits the whole artifact set
    * (a crash mid-write leaves [[ensureMeta]] rebuilding — never
    * serving a torn copy). */
  def writeMeta(spark: SparkSession, d: String, srpDir: String): Unit =
    writeMetaFrom(spark, srpDir,
      Tables.documents(spark, d)
        .select((col("doc_id").as("vec_id") +: MetaCols.map(col)): _*),
      MetaCols,
      Tables.embeddings(spark, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === SrpBanded.Dim)
        .select(col("vec_id"), col("embedding")))

  /** The generalized meta build: a deployment DECLARES its own filter
    * columns (the reference's are `withdrawn`/`type`,
    * sql/02_schema.sql) by handing the (vec_id, <metaCols...>) frame
    * and the embedding source directly — every read path afterwards
    * infers the declared columns from the store's own `stats/` schema
    * ([[storeMetaCols]]), so serves/upserts need no column
    * configuration. Same commit contract as [[writeMeta]]. */
  def writeMetaFrom(spark: SparkSession, srpDir: String, docs: DataFrame,
                    metaCols: Seq[String], emb: DataFrame): Unit = {
    require(metaCols.nonEmpty, "at least one declared meta column")
    metaCols.foreach(c => require(docs.columns.contains(c),
      s"docs frame must carry declared meta column '$c'"))
    val f = Hfs.fs(spark, srpDir)
    f.delete(new org.apache.hadoop.fs.Path(s"$srpDir/meta"), true): Unit
    // the store is STRING-canonical in its declared columns: partition
    // values are path strings anyway, every read path casts to string,
    // and upsertMeta reads update values as strings — an int-typed
    // declaration would build a store whose first upsert throws
    val docsS = docs.select((col("vec_id") +:
      metaCols.map(c => col(c).cast("string").as(c))): _*)
    val joined = emb.join(docsS, Seq("vec_id"))
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
      .repartition(metaCols.map(col): _*)
      .sortWithinPartitions((metaCols :+ "vec_id").map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(metaCols: _*)
      .parquet(s"$srpDir/meta/byval")
    // id-keyed metadata rows: the walk path's bounded post-filter
    // point read (no embedding — a candidate's meta is a few bytes)
    docsS
      .withColumn("mb", pmod(col("vec_id"), lit(IdPartitions.toLong)))
      .repartition(col("mb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("mb")
      .parquet(s"$srpDir/meta/byid")
    // value counts — the planner's statistics (written last: commit)
    joined.groupBy(metaCols.map(col): _*)
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
    // declared columns come from the store's own stats artifact —
    // read BEFORE the uncommit drops the cache entry
    val cols = storeMetaCols(spark, srpDir)
    cols.foreach(c => require(updates.columns.contains(c),
      s"upsertMeta updates must carry meta column '$c'"))
    val upd = updates
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select((Seq(col("vec_id"), col("embedding"),
        SrpBanded.bandKeysCol(col("embedding"), SrpBanded.Dim, CodeRpb)
          .as("keys")) ++
        // string-cast like the store itself (writeMetaFrom): an
        // int-typed updates frame must merge, not throw on getString
        cols.map(c => col(c).cast("string").as(c))): _*)
      .localCheckpoint(true)
    val updIds = upd.select(col("vec_id")).distinct()
    val byvalRaw = spark.read.parquet(s"$srpDir/meta/byval")
    require(byvalRaw.columns.contains("keys"),
      s"byval at $srpDir predates the code-tier keys column — run " +
        "ensureMeta/writeMeta before upserting (a mixed-schema byval " +
        "would rank null-key rows first in the Hamming shortlist)")
    val byval = byvalRaw
      .select((Seq(col("vec_id"), col("embedding"), col("keys")) ++
        cols.map(c => col(c).cast("string").as(c))): _*)
    val oldVals = byval.join(broadcast(updIds), Seq("vec_id"))
      .select(cols.map(col): _*).distinct()
      .collect().map(r => cols.indices.map(r.getString)).toSeq
    val newVals = upd.select(cols.map(col): _*).distinct()
      .collect().map(r => cols.indices.map(r.getString)).toSeq
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
        cols.zip(vs).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
        .reduce(_ || _)
      val survivors = byval.filter(touchedPred)
        .join(broadcast(updIds), Seq("vec_id"), "left_anti")
      val merged = survivors
        .unionByName(upd.select(byval.columns.map(col): _*))
        .repartition(cols.map(col): _*)
        .localCheckpoint(true)
      try {
        // sort AFTER the checkpoint so the writer sees the ordering
        // (a checkpoint erases outputOrdering and the writer's own
        // partition-column re-sort would drop the vec_id sub-order
        // the shortlist point fetch row-group-prunes on)
        merged
          .sortWithinPartitions((cols :+ "vec_id").map(col): _*)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(cols: _*)
          .parquet(s"$srpDir/meta/byval")
        // a value partition emptied by a move survives dynamic
        // overwrite — delete it (the SrpStore.upsert emptied-bucket move)
        val present = merged.select(cols.map(col): _*).distinct()
          .collect().map(r => cols.indices.map(i => String.valueOf(r.get(i)))).toSet
        val f = Hfs.fs(spark, srpDir)
        touched.filterNot(present).foreach { vs =>
          // partition dirs on disk carry Spark's Hive-style escaping
          // (space, '/', '=', '%', …) — the delete path must use the
          // SAME escaping or an emptied partition with such a value
          // survives and keeps serving its stale rows
          val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
          val sub = cols.zip(vs).map { case (c, v) => s"${esc(c)}=${esc(v)}" }.mkString("/")
          f.delete(new org.apache.hadoop.fs.Path(s"$srpDir/meta/byval/$sub"), true): Unit
        }
      } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(merged)
      // byid: rewrite the updated ids' mb partitions
      val mbs = updIds.collect().map(r =>
        Math.floorMod(r.getLong(0), IdPartitions.toLong)).distinct.toSeq
      val byid = spark.read.parquet(s"$srpDir/meta/byid")
        .select((Seq(col("vec_id")) ++ cols.map(c => col(c).cast("string").as(c)) :+
          col("mb").cast("long").as("mb")): _*)
      val idSurvivors = byid.filter(col("mb").isin(mbs: _*))
        .join(broadcast(updIds), Seq("vec_id"), "left_anti")
      val idMerged = idSurvivors
        .unionByName(upd.select((Seq(col("vec_id")) ++ cols.map(col)): _*)
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
        .groupBy(cols.map(c => col(c).cast("string").as(c)): _*)
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

  // stats are a handful of rows per store — memoized like centroids.
  // The cache entry also carries the store's DECLARED meta columns
  // (the stats schema minus "cnt"): every read path infers them from
  // the artifact itself, so stores declared over different columns
  // (the reference's withdrawn/type vs the corpus default
  // lang/source) serve through the same code with no configuration.
  private val statsCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[String], Seq[(Map[String, String], Long)])]
  private val metaVerified =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  graft.Tables.onInvalidate { p =>
    statsCache.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k))
    metaVerified.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k))
  }

  private def statsEntry(spark: SparkSession,
                         srpDir: String): (Seq[String], Seq[(Map[String, String], Long)]) =
    statsCache.getOrElseUpdate(srpDir, {
      // the crash contract's read-side gate, enforced at the ONE entry
      // every serve path (matchCount/byValPruned/range/meta serves)
      // funnels through: a torn store (upsertMeta uncommitted before
      // its rewrites, then died) still has readable stats FILES but no
      // _SUCCESS — it must refuse loudly, never serve stale rows
      require(metaCommitted(spark, srpDir),
        s"meta artifacts at $srpDir are uncommitted (crashed " +
          "write/upsert?) — rebuild via ensureMeta/writeMeta before serving")
      val df = spark.read.parquet(s"$srpDir/meta/stats")
      val cols = df.schema.fieldNames.filterNot(_ == "cnt").toSeq
      (cols, df.collect().toSeq.map { r =>
        (cols.map(c => c -> String.valueOf(r.getAs[Any](c))).toMap,
          r.getAs[Long]("cnt"))
      })
    })

  /** the store's declared filter columns, read from its own stats
    * artifact */
  def storeMetaCols(spark: SparkSession, srpDir: String): Seq[String] =
    statsEntry(spark, srpDir)._1

  private def stats(spark: SparkSession, srpDir: String): Seq[(Map[String, String], Long)] =
    statsEntry(spark, srpDir)._2

  /** matching-row count for an equality conjunction over [[MetaCols]]
    * (subset allowed) — read from the write-time stats artifact */
  def matchCount(spark: SparkSession, srpDir: String,
                 pred: Seq[(String, String)]): Long = {
    requirePred(spark, srpDir, pred)
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

  private def requirePred(spark: SparkSession, srpDir: String,
                          pred: Seq[(String, String)]): Unit = {
    require(pred.nonEmpty, "filtered search needs at least one predicate term")
    val declared = storeMetaCols(spark, srpDir)
    val bad = pred.map(_._1).filterNot(declared.contains)
    require(bad.isEmpty,
      s"predicate columns ${bad.mkString(",")} not in declared meta columns ${declared.mkString(",")}")
  }

  private def predCol(pred: Seq[(String, String)]): Column =
    pred.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)

  /** Pruned exact read: (vec_id, embedding) of the rows matching the
    * predicate — partition columns only, so the filter is static
    * file-index pruning. */
  def byValPruned(spark: SparkSession, srpDir: String,
                  pred: Seq[(String, String)]): DataFrame = {
    requirePred(spark, srpDir, pred)
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
    val w = shortlistWidth(matching)
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

  /** The BATCHED filtered serve (r13): the whole query table answered
    * against one predicate in one set-based plan — the filtered
    * analogue of the unfiltered batch matrix (v26/v29/v33/v38), built
    * on the code tier because its candidates match by construction
    * (a batched walk would post-filter per query and re-inherit the
    * recall cliff). Plan shape is [[graft.operators.HammingIndex]]'s
    * batch contract over the PRUNED byval artifact:
    *
    *  1. code scan: only the matching partitions' (vec_id, keys) rows
    *     — partition-pruned, embedding column never read — with band
    *     keys flattened to primitive columns before the pair stream
    *     (the r11 element_at lesson);
    *  2. pair stream: pruned codes × broadcast query codes (|Q|·M
    *     integer ops on 64 B rows), per-query Hamming top-W via the
    *     bounded [[graft.functions.TopKPairs]] aggregate (asc) — the
    *     map-side partials cap per (query, partition), nothing sorts
    *     or collects the pair stream;
    *  3. rerank: shortlist joined back to the pruned byval embeddings
    *     (shuffle-hash, W·|Q| rows) + the query vectors, exact cosine,
    *     per-query (sim DESC, vec_id) top-k.
    *
    * W follows the single-query policy (max([[CodeShortlist]],
    * matching/[[ShortlistRatio]]) capped [[MaxShortlist]]) — here it
    * bounds the AGGREGATE buffers and the rerank join width, with no
    * driver collect anywhere. When W ≥ matching the result is the
    * exact filtered per-query top-k (the covering contract v41's
    * oracle replays). */
  def searchFilteredBatch(spark: SparkSession, d: String, metaDir: String,
                          queryMod: Int, pred: Seq[(String, String)],
                          k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensureMeta(spark, d, metaDir)
    val matching = matchCount(spark, metaDir, pred)
    val w = shortlistWidth(matching)
    val emb = Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val bands = SrpBanded.Bands
    // keys computed ONCE per query row, then flattened (the CodeStore
    // batch shape — inlining the kernel into each element_at leans on
    // codegen subexpression elimination instead of guaranteeing it)
    val qFlat = queries
      .select(col("query_id"),
        SrpBanded.bandKeysCol(col("q_vec"), SrpBanded.Dim, CodeRpb).as("q_keys"))
      .select(col("query_id") +:
        (0 until bands).map(b => element_at(col("q_keys"), b + 1).as(s"q$b")): _*)
    val cFlat = spark.read.parquet(s"$metaDir/meta/byval")
      .filter(predCol(pred))
      .select(col("vec_id") +:
        (0 until bands).map(b => element_at(col("keys"), b + 1).as(s"c$b")): _*)
    lastCodeScanPlan = cFlat.queryExecution.executedPlan.toString
    val ham = (0 until bands).map { b =>
      bit_count(col(s"c$b").bitwiseXOR(col(s"q$b")))
    }.reduce(_ + _).cast("int")
    val short = cFlat.crossJoin(broadcast(qFlat))
      .select(col("query_id"), col("vec_id"), ham.as("ham"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(
        col("vec_id"), col("ham"), w, asc = true).as("__tk"))
      .select(col("query_id"),
        explode(col("__tk").getField("neighbor_id")).as("vec_id"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    lastFilteredPath = s"code_batch:$w"
    short
      .join(byValPruned(spark, metaDir, pred), Seq("vec_id"))
      .join(queries.hint("shuffle_hash"), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        vectors.cosine_sim(col("embedding"), col("q_vec")).as("sim"))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk"), round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rk"))
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

  /** Filtered serve from the meta artifacts ALONE — no index store
    * opened: the exact tier or the code tier by cardinality. A
    * predicate past `codeScanMax` has no walk to escalate into (there
    * is no index here) and lands in the exact fallback; a caller
    * wanting O(budget) very-broad serves wires a family's
    * `searchFiltered` instead. This is the minimal deployment shape:
    * `writeMetaFrom` + this method IS a filtered vector store. */
  def searchFilteredMeta(spark: SparkSession, metaDir: String,
                         queryVec: Array[Float], pred: Seq[(String, String)],
                         k: Int = 10,
                         exactScanMax: Long = ExactScanMax,
                         codeScanMax: Long = CodeScanMax): DataFrame =
    searchFilteredBy(spark, metaDir, queryVec, pred, k, exactScanMax,
      codeScanMax)(_ => Seq.empty)

  /** Filtered RANGE search from the meta artifacts: every matching
    * row within the similarity radius — the reference's
    * `WHERE <meta> AND similarity ≥ t` shape (v13's range contract
    * composed with v39's predicate). Exact by construction: the
    * pruned byval partitions are scanned in full (the matching set IS
    * the candidate set — a range result has no k to shortlist
    * toward), distributed end-to-end with no driver-side candidate
    * state, so the result may be any size. The filter applies to the
    * ROUNDED similarity, the emission contract both engines share. */
  def rangeFilteredMeta(spark: SparkSession, metaDir: String,
                        queryVec: Array[Float], pred: Seq[(String, String)],
                        minSim: Double): DataFrame =
    byValPruned(spark, metaDir, pred)
      .select(col("vec_id"),
        round(vectors.cosine_sim(col("embedding"), typedLit(queryVec)), 6)
          .as("sim"))
      .filter(col("sim") >= minSim)
      .orderBy(col("sim").desc, col("vec_id"))

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
      // the v28 serve's own seed path: driver bucket cache when the
      // store fits its byte budget (zero seed Spark jobs — and the
      // escalation rungs re-seed, so this is paid up to 3× per serve),
      // pruned distributed read when over
      SrpStore.walkVisitedCold(spark, srpDir, edgeDir, queryVec,
        beam * math.min(f, 4), iters, maxEntries * f, graphK, probeRadius)
    }
  }
}
