package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.streaming.EventStream
import graft.functions.{vectors, FakeEmbedder}

/** Driver contract — see SURVEY.md §2 for the inventory and §5 for
  * the oracle-parity conventions every entry follows.
  */
object SparkEntry {

  /** The flagship: end-to-end semantic search (the reference's
    * find_similar_customer_records tool) on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    ensureScaleConfs(spark)
    SimilaritySearch.semanticSearch(spark, "/root/testdata/sf0.001",
      "fast vector search over spark tables", 10)
  }

  private val SearchText = "fast vector search over spark tables"
  private[graft] val JoinQueryFilter = 50 // query set = vec_id % 50 == 0

  /** literal SQL array for the (deterministic) fake query embedding —
    * exact float→double widening so the oracle scores identical bits */
  private def queryVecSql: String =
    FakeEmbedder.embed(SearchText).map(f => f.toDouble.toString).mkString("[", ", ", "]")

  /** Engine-contract session conf: typed top-k partial aggregates
    * (TopKPairs — every batched-serve candidate cut and the graph
    * build's bucket cap) must stay on the ObjectHashAggregate HASH
    * path. Spark's default falls back to sort-based aggregation at
    * 128 distinct keys per task, which re-sorts (and at scale spills)
    * the exact candidate stream the bounded aggregate exists to avoid
    * sorting — measured 3.3× slower at the 1000× decade (PERF.md r10).
    *
    * `queries` runs against a CALLER-built session, so an embedder
    * who builds a default-conf session would silently lose the hash
    * path. Every entry therefore asserts the conf on the way in: the
    * conf is runtime-mutable, so a session still at Spark's default
    * is raised in place (logged); a session where the user PINNED a
    * lower value is respected but loudly warned.
    *
    * Implied heap budget (why the raise is safe, and what a caller
    * who raises `k` must re-check): a partial ObjectHashAggregate
    * holds one TopKBuffer per distinct group key per task — capacity
    * 2k (id, score) entries = 16·2k bytes + ~48 B overhead, so ~2 KB
    * at the serve/build k≤64 and ~64 KB at the seed-budget k=2048.
    * Distinct keys per task are bounded by the repartitioning feeding
    * each aggregate (query_id or src hash-spread over the shuffle
    * partitions): at the benched 1000× decade that is ≤ ~500k keys ×
    * 2 KB ≈ 1 GB/task — inside executor memory with the 4 GiB-key
    * ceiling never reached. The ceiling is a guard rail against
    * unbounded group growth, not a target. */
  private[graft] val HashAggFallbackKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  private[graft] val HashAggFallbackMin = 4194304L
  private val SparkDefaultFallback = 128L
  /** what [[ensureScaleConfs]] last did — spec hook */
  @volatile private[graft] var lastConfContractAction: String = ""
  private[graft] def ensureScaleConfs(spark: SparkSession): Unit = {
    val cur = spark.conf.get(HashAggFallbackKey, SparkDefaultFallback.toString).toLong
    if (cur >= HashAggFallbackMin) lastConfContractAction = "ok"
    else if (cur == SparkDefaultFallback) {
      // Spark's own default — the caller never chose it; raise in place
      spark.conf.set(HashAggFallbackKey, HashAggFallbackMin.toString)
      lastConfContractAction = s"raised:$cur"
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft: raised $HashAggFallbackKey $cur -> $HashAggFallbackMin " +
          "(engine contract: TopKPairs partial aggregates must stay on the " +
          "hash path; see SparkEntry.ensureScaleConfs)")
    } else {
      // user-pinned value: respect it, but the scale contract is void
      lastConfContractAction = s"warned:$cur"
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft: $HashAggFallbackKey=$cur is below the engine contract " +
          s"($HashAggFallbackMin) — top-k aggregates will fall back to " +
          "sort-based aggregation and the batched-serve scale posture " +
          "does not hold (see SparkEntry.ensureScaleConfs)")
    }
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesImpl.map { case (n, f) =>
      n -> ((s: SparkSession, d: String) => { ensureScaleConfs(s); f(s, d) })
    }

  private lazy val queriesImpl: Map[String, (SparkSession, String) => DataFrame] = Map(
    // core SQL
    "q1_pricing_summary" -> CoreQueries.q1PricingSummary _,
    "q2_topn_revenue" -> CoreQueries.q2TopNRevenue _,
    "q3_cust_order_revenue" -> CoreQueries.q3CustOrderRevenue _,
    "q4_semi_join" -> CoreQueries.q4SemiJoin _,
    "q5_region_nation_rollup" -> CoreQueries.q5RegionNation _,
    "q6_selective_filter" -> CoreQueries.q6SelectiveFilter _,
    "q7_window_rank" -> CoreQueries.q7WindowRank _,
    "q8_rollup" -> CoreQueries.q8Rollup _,
    "q9_anti_join" -> CoreQueries.q9AntiJoin _,
    "q10_distinct_agg" -> CoreQueries.q10DistinctAgg _,
    "q11_event_window" -> CoreQueries.q11EventWindow _,
    "q12_sessionize" -> CoreQueries.q12Sessionize _,
    "q13_json_extract" -> CoreQueries.q13JsonExtract _,
    "q14_funnel" -> CoreQueries.q14Funnel _,
    "q15_asof_join" -> CoreQueries.q15AsofJoin _,
    "q16_percentiles" -> CoreQueries.q16Percentiles _,
    "q17_set_ops" -> CoreQueries.q17SetOps _,
    "q18_latest_per_key" -> CoreQueries.q18LatestPerKey _,
    "q19_above_cust_avg" -> CoreQueries.q19AboveCustomerAvg _,
    "q20_cube" -> CoreQueries.q20Cube _,
    "q21_sliding_window" -> CoreQueries.q21SlidingWindow _,
    "q22_pivot" -> CoreQueries.q22Pivot _,
    "q23_running_total" -> CoreQueries.q23RunningTotal _,
    "q24_range_join" -> CoreQueries.q24RangeJoin _,
    "q25_grouping_sets" -> CoreQueries.q25GroupingSets _,
    "q26_ntile" -> CoreQueries.q26Ntile _,
    "q27_full_outer" -> CoreQueries.q27FullOuter _,
    "q29_multi_distinct" -> CoreQueries.q29MultiDistinct _,
    "q30_percent_rank" -> CoreQueries.q30PercentRank _,
    "q31_text_search" -> CoreQueries.q31TextSearch _,
    "q32_pagination" -> ((s, d) => CoreQueries.q32Pagination(s, d)),
    "q33_global_decile" -> CoreQueries.q33GlobalDecile _,
    // skew-resilient two-phase aggregation, oracle = the plain GROUP BY
    // it must be indistinguishable from
    "q28_salted_agg" -> ((s, d) => {
      Salted.saltedCountSum(
          Tables.events(s, d).select(col("event_type"),
            col("value").cast("decimal(18,2)").as("v")),
          col("event_type"), col("v"), salts = 16)
        .select(col("k").as("event_type"), col("n"),
          col("total").cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),
    // vector search
    "v1_knn_cosine" -> ((s, d) => SimilaritySearch.knn(
      Tables.embeddings(s, d), "embedding", "vec_id",
      FakeEmbedder.embed(SearchText), 10, "cosine")),
    "v2_knn_l2" -> ((s, d) => SimilaritySearch.knn(
      Tables.embeddings(s, d), "embedding", "vec_id",
      FakeEmbedder.embed(SearchText), 10, "l2")),
    "v3_knn_dot" -> ((s, d) => SimilaritySearch.knn(
      Tables.embeddings(s, d), "embedding", "vec_id",
      FakeEmbedder.embed(SearchText), 10, "dot")),
    "v4_similarity_join" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.similarityJoin(
        emb.filter(col("vec_id") % JoinQueryFilter === 0), emb,
        "vec_id", "embedding", "vec_id", "embedding", 5, "cosine")
        .orderBy(col("query_id"), col("score").desc, col("neighbor_id"))
    }),
    // the non-broadcast (block-replicated) similarity join — the shape
    // for query sets too big to broadcast; same oracle as v4
    "v16_similarity_join_large" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.similarityJoinLarge(
        emb.filter(col("vec_id") % JoinQueryFilter === 0), emb,
        "vec_id", "embedding", "vec_id", "embedding", 5, blocks = 8, "cosine")
        .orderBy(col("query_id"), col("score").desc, col("neighbor_id"))
    }),
    "v5_ivf_build" -> ((s, d) => IvfIndex.buildSummary(s, d)),
    "v6_ivf_search" -> ((s, d) => IvfIndex.searchSummary(s, d, SearchText)),
    "v7_record_lookup" -> ((s, d) =>
      SimilaritySearch.recordById(Tables.documents(s, d), "doc_id", 42L)),
    "v8_semantic_search" -> ((s, d) =>
      SimilaritySearch.semanticSearch(s, d, SearchText, 10)),
    // Scalar integer digest of the embed path (no array column — the
    // driver's compare crashes on array cells; no float column — the
    // digest is the exact pre-normalization integer state, and the
    // `consistent` flag pins the float embedding to it Spark-side).
    "v9_embed_ingest" -> ((s, d) => graft.sources.Ingest.embedIngestDigest(s, d)),
    "v10_filtered_knn" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("lang") === "en").select("doc_id")
      val emb = Tables.embeddings(s, d)
      SimilaritySearch.knn(
        emb.join(docs, emb("vec_id") === docs("doc_id"), "left_semi"),
        "embedding", "vec_id", FakeEmbedder.embed(SearchText), 10, "cosine")
    }),
    "v11_hybrid_search" -> ((s, d) =>
      SimilaritySearch.hybridSearch(s, d, SearchText, 10)),
    "v12_pq_search" -> ((s, d) => PqIndex.searchSummary(s, d, SearchText)),
    // OPQ-style PQ: energy-balanced snake permutation of dims ahead
    // of the subspace split, same code budget as v12 (Ge CVPR'13's
    // permutation special case, pinned + integer-exact)
    "v30_opq_search" -> ((s, d) => OpqIndex.searchSummary(s, d, SearchText)),
    // hierarchical navigable graph: hash-derandomized HNSW levels,
    // greedy coarse-to-fine descent, shared layer-0 beam tail
    "v31_hnsw_search" -> ((s, d) =>
      Hnsw.search(s, d, FakeEmbedder.embed(SearchText))),
    // v31 served from the persisted hierarchy — entry, layer edges
    // and layer-0 hops all read store artifacts with embeddings
    // in-row: the serve path never touches the corpus (no corpus dir
    // in the search signature). Identical rows, same oracle.
    "v32_hnsw_stored" -> ((s, d) => graft.sources.HnswStore.search(
      s, graft.sources.HnswStore.storeFor(s, d), FakeEmbedder.embed(SearchText))),
    // batched multi-query hierarchical serve (the v26 shape over the
    // layered walk) — one set-based plan, no query broadcast
    "v33_hnsw_batch" -> ((s, d) => Hnsw.searchBatch(s, d, JoinQueryFilter)),
    // v33 over the persisted hierarchy: stored entry + stored layers
    // + stored layer-0 edges, zero graph construction at query time —
    // the v27 analogue completing the stored-batch matrix
    "v34_hnsw_batch_stored" -> ((s, d) => graft.sources.HnswStore.searchBatch(
      s, d, graft.sources.HnswStore.storeFor(s, d), JoinQueryFilter)),
    // compact-code linear scan: 64-bit SRP sign sketch (8 band-sliced
    // keys), Hamming shortlist via codegen'd xor/bit_count, exact
    // rerank — the high-recall batch-curation family (8 B/row scan)
    "v36_hamming_search" -> ((s, d) =>
      HammingIndex.search(s, d, FakeEmbedder.embed(SearchText))),
    // v36 served from the persisted code store: 8-byte column-pruned
    // code scan + pb-pruned embedding point-fetch, zero coding work
    // and zero corpus access at query time (same oracle as v36)
    "v37_hamming_stored" -> ((s, d) => graft.sources.CodeStore.search(
      s, graft.sources.CodeStore.storeFor(s, d), FakeEmbedder.embed(SearchText))),
    // batched compact-code serve: the whole query table answered by
    // ONE 8 B/row code scan (query codes broadcast — code-sized, the
    // v29 model license), per-query WindowGroupLimit shortlist, rerank
    // from the store's in-row embeddings under the SHUFFLE_HASH query
    // contract — closes the 4-family × batch matrix
    "v38_hamming_batch" -> ((s, d) => graft.sources.CodeStore.searchBatch(
      s, graft.sources.CodeStore.storeFor(s, d), d, JoinQueryFilter)),
    // PER-QUERY k on the UNFILTERED batch matrix (r16, completing the
    // v45/v46 contract): the reference's `limit` is per-call, so the
    // set-based serves take a per-caller limit too — here as an
    // expression over query_id (k_q = 2 + (id % 7) % 4 ∈ {2..5}),
    // trimmed after the literal WindowGroupLimit ceiling. Same kExpr
    // seam on graphSearchBatch / Hnsw.searchBatch /
    // searchResidualBatch (spec-pinned parity vs the fixed-k serve).
    "v47_hamming_batch_perk" -> ((s, d) => graft.sources.CodeStore.searchBatch(
      s, graft.sources.CodeStore.storeFor(s, d), d, JoinQueryFilter,
      kExpr = Some(lit(2) + col("query_id") % 7 % 4))),
    // hierarchical descent with the layer-0 tail over the NN-Descent-
    // REFINED graph (v21's edges): better per-hop recall at identical
    // serve cost — the v25 move applied to the hierarchy
    "v35_hnsw_refined" -> ((s, d) =>
      Hnsw.search(s, d, FakeEmbedder.embed(SearchText), refined = true)),
    "v15_sq_search" -> ((s, d) => SqIndex.searchSummary(s, d, SearchText)),
    // diversity rerank (oracle: the greedy loop unrolled into k CTE stages)
    "v17_mmr_rerank" -> ((s, d) => SimilaritySearch.mmrRerank(
      Tables.embeddings(s, d), "embedding", "vec_id",
      FakeEmbedder.embed(SearchText), 10, 100)),
    "v14_ivf_similarity_join" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val model = IvfIndex.fitCached(s, d, 16, 5)
      IvfIndex.similarityJoin(
        emb.filter(col("vec_id") % JoinQueryFilter === 0), emb,
        "vec_id", "embedding", "vec_id", "embedding", model, 5, 4)
        .orderBy(col("query_id"), col("score").desc, col("neighbor_id"))
    }),
    "v13_range_search" -> ((s, d) => {
      val q = typedLit(FakeEmbedder.embed(SearchText))
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(graft.functions.vectors.l2_dist(col("embedding"), q), 6).as("dist"))
        .filter(col("dist") <= 1.35)
        .orderBy(col("dist"), col("vec_id"))
    }),
    // dedup
    "d1_exact_dedup" -> Dedup.exactDedup _,
    "d2_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "d3_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "d4_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "d5_embedding_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "d6_dup_components" -> ((s, d) => Dedup.dupComponents(s, d)),
    "d7_contamination" -> ((s, d) => Dedup.contamination(s, d)),
    "d8_canonical_docs" -> ((s, d) => Dedup.canonicalDocs(s, d)),
    "d9_srp_banded_neardup" -> ((s, d) => SrpBanded.srpBandedNearDup(s, d)),
    "d10_chunk_dedup" -> ((s, d) => Dedup.chunkDedup(s, d)),
    "d11_semdedup" -> ((s, d) => Dedup.semDedup(s, d)),
    // soft dedup: every doc kept, near-dup cluster members share one
    // document's sampling mass (weight = 1/cluster_size)
    "d12_dup_weight" -> ((s, d) => Dedup.dupWeights(s, d)),
    // incremental near-dup: a new batch (doc_id % 3 == 0) deduped
    // against the persisted band-signature store of the rest of the
    // corpus — probed buckets only, the corpus is never re-banded
    "d13_incremental_neardup" -> ((s, d) =>
      graft.sources.SigStore.incrementalNearDupEntry(s, d)),
    // end-to-end curation funnel: quality gate → exact dedup →
    // near-dup canonicalization, one disposition row per document
    "p1_curation_pipeline" -> ((s, d) => Pipeline.curationPipeline(s, d)),
    // the funnel report: per-(lang, source) stage counts + kept token
    // mass — the training-mix table the pipeline feeds
    "p2_curation_summary" -> ((s, d) => Pipeline.curationSummary(s, d)),
    "v18_knn_graph" -> ((s, d) => SrpBanded.knnGraph(s, d)),
    "v19_graph_search" -> ((s, d) =>
      SrpBanded.graphSearch(s, d, FakeEmbedder.embed(SearchText))),
    // v19's serve path: identical search, seeds read from the
    // persisted (band, bk)-partitioned SrpStore with partition
    // pruning instead of banding the corpus per query
    "v20_graph_search_stored" -> ((s, d) =>
      graft.sources.SrpStore.graphSearch(s, d,
        graft.sources.SrpStore.storeFor(s, d),
        FakeEmbedder.embed(SearchText))),
    // one NN-Descent round over v18's graph: neighbors-of-neighbors
    // rescan repairs LSH misses at n·k² candidate cost
    "v21_nn_descent" -> ((s, d) => SrpBanded.nnDescentGraph(s, d)),
    // residual IVF-PQ (IVFADC): codes quantize x − centroid(list(x)),
    // probe scans nprobe lists' 8-byte codes with per-list ADC tables
    "v22_ivfpq_residual" -> ((s, d) => IvfPqResidual.searchSummary(s, d, SearchText)),
    // v18's graph build reading the persisted SrpStore banding
    // (embedding column pruned from the scan) instead of re-hashing
    "v23_knn_graph_stored" -> ((s, d) =>
      graft.sources.SrpStore.knnGraphStored(s, d)),
    // beam search over the NN-Descent-refined graph: better per-hop
    // recall at identical serve cost (graph quality paid at build)
    "v25_graph_search_refined" -> ((s, d) =>
      SrpBanded.graphSearchRefined(s, d, FakeEmbedder.embed(SearchText))),
    // batched graph-ANN: the whole query table (vec_id % 50) served in
    // one set-based plan — the graph analogue of v14's IVF join
    "v26_graph_search_batch" -> ((s, d) =>
      SrpBanded.graphSearchBatch(s, d, JoinQueryFilter)),
    // v26 with the corpus banding read from the persisted SrpStore
    // instead of re-hashing (same oracle as v26); the seed read is
    // adaptive — partition-pruned bucket point-reads while the probe
    // union is sparse, the compact banding artifact once the batch
    // saturates the bucket space (SrpStore.batchBanding's
    // bitmap-vs-seq-scan crossover)
    "v27_graph_search_batch_stored" -> ((s, d) =>
      SrpBanded.graphSearchBatch(s, d, JoinQueryFilter,
        bandedSource = Some(keys => graft.sources.SrpStore.batchBanding(s,
          graft.sources.SrpStore.storeFor(s, d), keys)))),
    // fully store-backed serve: seeds from pruned SrpStore buckets,
    // hops over the persisted refined edge table with embeddings
    // in-row — zero build AND zero corpus reads at query time (same
    // oracle as v25)
    "v28_graph_search_cold" -> ((s, d) =>
      graft.sources.SrpStore.graphSearchCold(s,
        graft.sources.SrpStore.storeFor(s, d),
        graft.sources.EdgeStore.refinedStoreFor(s, d),
        FakeEmbedder.embed(SearchText))),
    // metadata-filtered ANN on the STORED serve path (the reference's
    // withdrawn/type filtered-search pattern as an index query, not an
    // exact corpus scan): cardinality-planned — selective predicates
    // take an exact top-k over meta-partition-pruned store rows
    // (recall 1.0 on few matching bytes), broad ones the v28 walk +
    // bounded post-filter with deterministic escalation
    "v39_filtered_graph_search" -> ((s, d) =>
      graft.sources.FilteredServe.searchFiltered(s, d,
        graft.sources.SrpStore.storeFor(s, d),
        graft.sources.EdgeStore.refinedStoreFor(s, d),
        FakeEmbedder.embed(SearchText),
        Seq("lang" -> "de", "source" -> "src3"), k = 10)),
    // the same planner's MID-SELECTIVITY tier (r13): the per-value
    // CODE index — partition-pruned scan of only the matching rows'
    // 192-bit sign sketches (embedding column never read), Hamming
    // shortlist, exact rerank. Forced past the exact tier
    // (exactScanMax = 0); the shortlist floor covers every matching
    // row at this scale, so the serve is the exact filtered top-k
    // the oracle replays — the covering-shortlist contract
    // FilteredSearchSpec pins.
    "v40_filtered_code_search" -> ((s, d) =>
      graft.sources.FilteredServe.searchFiltered(s, d,
        graft.sources.SrpStore.storeFor(s, d),
        graft.sources.EdgeStore.refinedStoreFor(s, d),
        FakeEmbedder.embed(SearchText),
        Seq("lang" -> "en"), k = 10, exactScanMax = 0L)),
    // the BATCHED filtered serve (r13): the whole query table against
    // one predicate in one set-based plan — pruned code scan ×
    // broadcast query codes, per-query Hamming top-W aggregate, exact
    // rerank over pruned byval embeddings. The covering regime (W ≥
    // matching at verify scale) makes it the exact filtered per-query
    // top-k the oracle replays.
    "v41_filtered_code_batch" -> ((s, d) =>
      graft.sources.FilteredServe.searchFilteredBatch(s, d,
        graft.sources.SrpStore.storeFor(s, d),
        queryMod = JoinQueryFilter, Seq("lang" -> "en"), k = 5)),
    // filtered RANGE search from the meta artifacts (v13's range
    // contract composed with v39's predicate): every matching row at
    // sim ≥ t, exact over the pruned partitions, any result size
    "v42_filtered_range" -> ((s, d) => {
      val srpDir = graft.sources.SrpStore.storeFor(s, d)
      graft.sources.FilteredServe.ensureMeta(s, d, srpDir)
      graft.sources.FilteredServe.rangeFilteredMeta(s, srpDir,
        FakeEmbedder.embed(SearchText), Seq("lang" -> "en"), minSim = 0.15)
    }),
    // filtered search with a RANGE predicate (r14): the reference's
    // `WHERE num_claims >= N AND country = 'EN' ORDER BY embedding
    // <=> q` class (sql/02_schema.sql's BIGINT/date columns) — the
    // partition-class term prunes statically via the enumerated stats
    // combos, the range-class term filters in-scan over only those
    // dirs, cardinality comes from the write-time rstats histogram;
    // every tier is exact over the matching set
    "v43_filtered_range_pred" -> ((s, d) => {
      val dir = graft.sources.FilteredServe.refMetaStoreFor(s, d)
      graft.sources.FilteredServe.searchFilteredMetaTerms(s, dir,
        FakeEmbedder.embed(SearchText),
        Seq(graft.sources.MetaTerm.Eq("country", "EN"),
          graft.sources.MetaTerm.Cmp("num_claims", ">=", "22")), k = 10)
    }),
    // HETEROGENEOUS-predicate batched filtered serve (r14): every
    // query carries its caller's own filter (the reference's actual
    // request shape) — queries grouped by predicate value, one pruned
    // code scan + batch shortlist per group, per-group plans unioned.
    // Covering regime at verify scale (max matching 218 ≤ W = 512) ⇒
    // per-query exact filtered top-k, which the oracle replays.
    "v44_filtered_batch_mixed" -> ((s, d) => {
      val srpDir = graft.sources.SrpStore.storeFor(s, d)
      graft.sources.FilteredServe.ensureMeta(s, d, srpDir)
      val emb = Tables.embeddings(s, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === graft.operators.SrpBanded.Dim)
      val queries = emb.filter(col("vec_id") % JoinQueryFilter === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .join(Tables.documents(s, d)
          .select(col("doc_id").as("query_id"), col("lang")), Seq("query_id"))
      graft.sources.FilteredServe.searchFilteredBatchMixed(s, srpDir,
        queries, Seq("lang"), k = 5)
    }),
    // PER-QUERY k on the batched filtered serve (r16): the reference's
    // `limit` is a PER-CALL tool parameter (tools.yaml:19-21), so a
    // mixed batch of callers arrives with per-caller k — carried as a
    // `k` column through the batch plan's final rank cut (rk ≤ k_q).
    // Covering regime at verify scale ⇒ each query's exact filtered
    // top-k_q, which the oracle replays with the same per-query bound.
    "v45_filtered_batch_perk" -> ((s, d) => {
      val srpDir = graft.sources.SrpStore.storeFor(s, d)
      graft.sources.FilteredServe.ensureMeta(s, d, srpDir)
      val emb = Tables.embeddings(s, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === graft.operators.SrpBanded.Dim)
      val queries = emb.filter(col("vec_id") % JoinQueryFilter === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"),
          (lit(2) + col("vec_id") % 7 % 4).cast("int").as("k"))
      graft.sources.FilteredServe.searchFilteredBatchFrom(s, srpDir,
        queries, Seq(graft.sources.MetaTerm.Eq("lang", "en")), k = 5,
        kCol = Some("k"))
    }),
    // per-query k on the HETEROGENEOUS-predicate batch (r16): each
    // caller carries its own filter AND its own limit — v44's grouped
    // plan with the k column threaded through every group's rank cut
    "v46_filtered_mixed_perk" -> ((s, d) => {
      val srpDir = graft.sources.SrpStore.storeFor(s, d)
      graft.sources.FilteredServe.ensureMeta(s, d, srpDir)
      val emb = Tables.embeddings(s, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === graft.operators.SrpBanded.Dim)
      val queries = emb.filter(col("vec_id") % JoinQueryFilter === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"),
          (lit(2) + col("vec_id") % 7 % 4).cast("int").as("k"))
        .join(Tables.documents(s, d)
          .select(col("doc_id").as("query_id"), col("lang")), Seq("query_id"))
      graft.sources.FilteredServe.searchFilteredBatchMixedOps(s, srpDir,
        queries, Seq("lang" -> "="), k = 5, kCol = Some("k"))
    }),
    // v22 served from a persisted residual-code store: partition-
    // pruned probe over 8-byte codes, same results as in-memory
    "v24_ivfpq_residual_stored" -> ((s, d) =>
      graft.sources.IvfPqStore.searchResidual(s,
        graft.sources.IvfPqStore.residualStoreFor(s, d),
        Tables.embeddings(s, d), "embedding", "vec_id",
        FakeEmbedder.embed(SearchText), topK = 10, nprobe = 4)),
    // batched serve over the persisted residual codes: the whole
    // query table in one set-based plan (v14's join shape over the
    // IvfPqStore — the quantization-family analogue of v26)
    "v29_ivfpq_batch" -> ((s, d) =>
      graft.sources.IvfPqStore.searchResidualBatch(s,
        graft.sources.IvfPqStore.residualStoreFor(s, d), d,
        queryMod = JoinQueryFilter)),
    // reference-schema parity: customer_records_data mapped from the
    // corpus, queried through the reference's two tool statements
    "r1_ref_filtered_knn" -> ((s, d) =>
      ReferenceParity.findSimilarLive(s, d, SearchText)),
    "r2_ref_record_lookup" -> ((s, d) =>
      ReferenceParity.recordById(s, d, "POL-00000042")),
    // the reference's exact tool predicate (withdrawn=0 AND
    // type='POLICY') on the STORED filtered path: meta artifacts
    // DECLARED over the reference's own columns (writeMetaFrom +
    // storeMetaCols inference), served by the planner's code tier
    "r3_ref_filtered_stored" -> ((s, d) =>
      ReferenceParity.findSimilarLiveStored(s, d, SearchText)),
    // text analysis
    "t1_lang_profile" -> TextOps.langProfile _,
    "t2_quality_score" -> TextOps.qualityScore _,
    "t3_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "t4_fingerprint" -> TextOps.fingerprint _,
    "t5_sequence_pack" -> ((s, d) => TextOps.sequencePack(s, d)),
    "t6_hash_sample" -> ((s, d) => TextOps.hashSample(s, d)),
    "t7_tfidf_top_terms" -> ((s, d) => TextOps.tfidfTopTerms(s, d)),
    "t8_dq_profile" -> TextOps.dqProfile _,
    "t9_langid" -> TextOps.langId _,
    "t10_bigram_freq" -> ((s, d) => TextOps.bigramFreq(s, d)),
    "t11_stratified_sample" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "t12_pii_redact" -> TextOps.piiRedact _,
    "t13_unigram_logprob" -> ((s, d) => TextOps.unigramLogprob(s, d)),
    "t14_len_histogram" -> TextOps.lenHistogram _,
    "t15_repetition" -> TextOps.repetition _,
    "t16_mix_weights" -> ((s, d) => TextOps.mixWeights(s, d)),
    "t17_quality_gate" -> TextOps.qualityGate _,
    // Jelinek-Mercer interpolated bigram perplexity proxy — catches
    // locally-incoherent text t13's unigram scoring cannot
    "t18_bigram_logprob" -> ((s, d) => TextOps.bigramLogprob(s, d)),
    // multimodal
    "m1_blob_metadata" -> Multimodal.blobMetadata _,
    "m2_frame_sample" -> Multimodal.frameSample _,
    "m3_decode_batch" -> ((s, d) => Multimodal.decodeBatchedFlat(s, d)),
    "m4_media_header" -> Multimodal.mediaHeader _,
    "m5_modality_route" -> Multimodal.modalityRoute _,
    "m6_resize_plan" -> ((s, d) => Multimodal.resizePlan(s, d)),
    "m7_audio_chunk" -> ((s, d) => Multimodal.audioChunk(s, d)),
    // cross-video near-dup: videos pair by shared frame-fingerprint
    // sets (bounded fingerprints per video, capped buckets, one pair
    // aggregate — no all-pairs stage); the fingerprint is the stubbed
    // decode step, the plumbing is the production shape
    "m8_frame_dedup" -> ((s, d) => Multimodal.frameDedup(s, d)),
    // streaming (batch twin; streaming form spec-tested)
    "s1_stream_counts" -> EventStream.dailyCountsBatch _,
    "s2_stream_join" -> EventStream.clickPurchaseJoinBatch _,
    "s3_stream_dedup" -> EventStream.dedupBatch _,
    "s4_stream_topk" -> EventStream.trendingBatch _,
  )

  lazy val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> CoreQueries.q1Sql,
    "q2_topn_revenue" -> CoreQueries.q2Sql,
    "q3_cust_order_revenue" -> CoreQueries.q3Sql,
    "q4_semi_join" -> CoreQueries.q4Sql,
    "q5_region_nation_rollup" -> CoreQueries.q5Sql,
    "q6_selective_filter" -> CoreQueries.q6Sql,
    "q7_window_rank" -> CoreQueries.q7Sql,
    "q8_rollup" -> CoreQueries.q8Sql,
    "q9_anti_join" -> CoreQueries.q9Sql,
    "q10_distinct_agg" -> CoreQueries.q10Sql,
    "q11_event_window" -> CoreQueries.q11Sql,
    "q12_sessionize" -> CoreQueries.q12Sql,
    "q13_json_extract" -> CoreQueries.q13Sql,
    "q14_funnel" -> CoreQueries.q14Sql,
    "q15_asof_join" -> CoreQueries.q15Sql,
    "q16_percentiles" -> CoreQueries.q16Sql,
    "q17_set_ops" -> CoreQueries.q17Sql,
    "q18_latest_per_key" -> CoreQueries.q18Sql,
    "q19_above_cust_avg" -> CoreQueries.q19Sql,
    "q20_cube" -> CoreQueries.q20Sql,
    "q21_sliding_window" -> CoreQueries.q21Sql,
    "q22_pivot" -> CoreQueries.q22Sql,
    "q23_running_total" -> CoreQueries.q23Sql,
    "q24_range_join" -> CoreQueries.q24Sql,
    "q25_grouping_sets" -> CoreQueries.q25Sql,
    "q26_ntile" -> CoreQueries.q26Sql,
    "q27_full_outer" -> CoreQueries.q27Sql,
    "q29_multi_distinct" -> CoreQueries.q29Sql,
    "q30_percent_rank" -> CoreQueries.q30Sql,
    "q31_text_search" -> CoreQueries.q31Sql,
    "q32_pagination" -> CoreQueries.q32Sql(),
    "q33_global_decile" -> CoreQueries.q33Sql,
    "q28_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "v1_knn_cosine" ->
      s"""SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "v2_knn_l2" ->
      s"""SELECT vec_id, round(list_distance(CAST(embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS score
         |FROM embeddings ORDER BY score ASC, vec_id LIMIT 10""".stripMargin,
    "v3_knn_dot" ->
      s"""SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS score
         |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "v16_similarity_join_large" ->
      s"""SELECT query_id, neighbor_id, score FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
         |  FROM embeddings c, (SELECT vec_id, embedding FROM embeddings WHERE vec_id % $JoinQueryFilter = 0) q
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) <= 5)
         |ORDER BY query_id, score DESC, neighbor_id""".stripMargin,
    "v4_similarity_join" ->
      s"""SELECT query_id, neighbor_id, score FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
         |  FROM embeddings c, (SELECT vec_id, embedding FROM embeddings WHERE vec_id % $JoinQueryFilter = 0) q
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) <= 5)
         |ORDER BY query_id, score DESC, neighbor_id""".stripMargin,
    "v7_record_lookup" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42",
    "v13_range_search" ->
      s"""SELECT vec_id, dist FROM (
         |  SELECT vec_id, round(list_distance(CAST(embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS dist
         |  FROM embeddings)
         |WHERE dist <= 1.35 ORDER BY dist, vec_id""".stripMargin,
    "v10_filtered_knn" ->
      s"""SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS score
         |FROM embeddings e
         |WHERE EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id AND d.lang = 'en')
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "v11_hybrid_search" -> {
      val qToks = SearchText.toLowerCase.split(" ").distinct
      val tokList = qToks.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""SELECT doc_id,
         |  round(0.7 * list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[]))
         |    + ${1.0 - 0.7} * (CAST(len(list_intersect(list_distinct(string_split(lower(d.text), ' ')), $tokList)) AS DOUBLE) / ${qToks.length.toDouble}), 6) AS hybrid_score
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |ORDER BY hybrid_score DESC, doc_id LIMIT 10""".stripMargin
    },
    "v8_semantic_search" ->
      s"""SELECT e.vec_id AS doc_id, d.lang AS lang, d.source AS source, d.n_chars AS n_chars,
         |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS similarity
         |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |ORDER BY similarity DESC, doc_id LIMIT 10""".stripMargin,
    "d1_exact_dedup" -> Dedup.exactDedupSql,
    "d2_minhash_lsh" -> Dedup.minhashLshSql(),
    "d4_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "d5_embedding_neardup" -> Dedup.embeddingNearDupSql(),
    "d6_dup_components" -> Dedup.dupComponentsSql(),
    "d7_contamination" -> Dedup.contaminationSql(),
    "d8_canonical_docs" -> Dedup.canonicalDocsSql(),
    "d9_srp_banded_neardup" -> SrpBanded.srpBandedNearDupSql(),
    "d10_chunk_dedup" -> Dedup.chunkDedupSql(),
    "d11_semdedup" -> Dedup.semDedupSql(),
    "d12_dup_weight" -> Dedup.dupWeightsSql(),
    "d13_incremental_neardup" -> graft.sources.SigStore.incrementalNearDupSql,
    "p1_curation_pipeline" -> Pipeline.curationPipelineSql,
    "p2_curation_summary" -> Pipeline.curationSummarySql,
    "v18_knn_graph" -> SrpBanded.knnGraphSql(),
    "v19_graph_search" -> SrpBanded.graphSearchSql(queryVecSql,
      SrpBanded.queryProbeKeys(FakeEmbedder.embed(SearchText))),
    // same oracle as v19: the stored path must return the same rows
    "v20_graph_search_stored" -> SrpBanded.graphSearchSql(queryVecSql,
      SrpBanded.queryProbeKeys(FakeEmbedder.embed(SearchText))),
    "v21_nn_descent" -> SrpBanded.nnDescentGraphSql(),
    "r1_ref_filtered_knn" -> ReferenceParity.findSimilarLiveSql(queryVecSql),
    "r2_ref_record_lookup" -> ReferenceParity.recordByIdSql("POL-00000042"),
    "r3_ref_filtered_stored" -> ReferenceParity.findSimilarLiveStoredSql(queryVecSql),
    "t1_lang_profile" -> TextOps.langProfileSql,
    "t2_quality_score" -> TextOps.qualityScoreSql,
    "t3_token_count" -> TextOps.tokenCountSql,
    "t4_fingerprint" -> TextOps.fingerprintSql,
    "t5_sequence_pack" -> TextOps.sequencePackSql(),
    "t6_hash_sample" -> TextOps.hashSampleSql(),
    "t7_tfidf_top_terms" -> TextOps.tfidfTopTermsSql(),
    "t8_dq_profile" -> TextOps.dqProfileSql,
    "t9_langid" -> TextOps.langIdSql,
    "t10_bigram_freq" -> TextOps.bigramFreqSql,
    "t11_stratified_sample" -> TextOps.stratifiedSampleSql(),
    "t12_pii_redact" -> TextOps.piiRedactSql,
    "t13_unigram_logprob" -> TextOps.unigramLogprobSql,
    "t14_len_histogram" -> TextOps.lenHistogramSql,
    "t15_repetition" -> TextOps.repetitionSql,
    "t16_mix_weights" -> TextOps.mixWeightsSql,
    "t17_quality_gate" -> TextOps.qualityGateSql,
    "t18_bigram_logprob" -> TextOps.bigramLogprobSql(),
    "m1_blob_metadata" -> Multimodal.blobMetadataSql,
    "m2_frame_sample" -> Multimodal.frameSampleSql,
    "m4_media_header" -> Multimodal.mediaHeaderSql,
    "m5_modality_route" -> Multimodal.modalityRouteSql,
    "m6_resize_plan" -> Multimodal.resizePlanSql(),
    "m7_audio_chunk" -> Multimodal.audioChunkSql(),
    "m8_frame_dedup" -> Multimodal.frameDedupSql(),
    "m3_decode_batch" -> Multimodal.decodeBatchSql,
    "s1_stream_counts" -> EventStream.dailyCountsSql,
    "s2_stream_join" -> EventStream.clickPurchaseJoinSql,
    "s3_stream_dedup" -> EventStream.dedupBatchSql,
    "s4_stream_topk" -> EventStream.trendingSql,
    "d3_simhash" -> Dedup.simhashPairsSql(),
    "v9_embed_ingest" -> graft.sources.Ingest.embedIngestDigestSql,
    "v17_mmr_rerank" -> SimilaritySearch.mmrRerankSql(queryVecSql),
    // the k-means / probe arithmetic is pinned to exact integers
    // (IvfIndex object doc), so the whole training loop replays in SQL
    "v5_ivf_build" -> IvfIndex.buildSummarySql(),
    "v6_ivf_search" -> IvfIndex.searchSummarySql(FakeEmbedder.embed(SearchText)),
    "v14_ivf_similarity_join" -> IvfIndex.similarityJoinSql(JoinQueryFilter),
    "v15_sq_search" -> SqIndex.searchSummarySql(FakeEmbedder.embed(SearchText)),
    "v12_pq_search" -> PqIndex.searchSummarySql(FakeEmbedder.embed(SearchText)),
    "v30_opq_search" -> OpqIndex.searchSummarySql(FakeEmbedder.embed(SearchText)),
    "v31_hnsw_search" -> Hnsw.searchSql(queryVecSql),
    // same oracle as v31: the stored path must return the same rows
    "v32_hnsw_stored" -> Hnsw.searchSql(queryVecSql),
    "v33_hnsw_batch" -> Hnsw.searchBatchSql(JoinQueryFilter),
    // same oracle as v33: the stored hierarchy must serve the same batch
    "v34_hnsw_batch_stored" -> Hnsw.searchBatchSql(JoinQueryFilter),
    // descent unchanged, tail over the refined graph (v21's CTEs)
    "v35_hnsw_refined" -> Hnsw.searchRefinedSql(queryVecSql),
    // sign-sketch shortlist + exact rerank; the query's band keys are
    // interpolated from the SAME queryBandKeys the Scala path calls
    "v36_hamming_search" -> HammingIndex.searchSql(queryVecSql,
      SrpBanded.queryBandKeys(FakeEmbedder.embed(SearchText)).map(_._2)),
    // same oracle as v36: the stored code scan must serve identically
    "v37_hamming_stored" -> HammingIndex.searchSql(queryVecSql,
      SrpBanded.queryBandKeys(FakeEmbedder.embed(SearchText)).map(_._2)),
    // batched code scan: query codes from the shared bands CTE
    "v38_hamming_batch" -> HammingIndex.searchBatchSql(JoinQueryFilter),
    // per-query limit replayed as the same rk bound over query_id
    "v47_hamming_batch_perk" -> HammingIndex.searchBatchSql(JoinQueryFilter,
      perKSql = Some("2 + (query_id % 7) % 4")),
    "v22_ivfpq_residual" -> IvfPqResidual.searchSummarySql(FakeEmbedder.embed(SearchText)),
    // same oracle as v18: the stored build must return the same graph
    "v23_knn_graph_stored" -> SrpBanded.knnGraphSql(),
    // same oracle as v22: the stored probe must return the same rows
    "v24_ivfpq_residual_stored" -> IvfPqResidual.searchSummarySql(FakeEmbedder.embed(SearchText)),
    "v29_ivfpq_batch" -> IvfPqResidual.batchSearchSql(JoinQueryFilter),
    "v25_graph_search_refined" -> SrpBanded.graphSearchRefinedSql(queryVecSql,
      SrpBanded.queryProbeKeys(FakeEmbedder.embed(SearchText))),
    "v26_graph_search_batch" -> SrpBanded.graphSearchBatchSql(JoinQueryFilter),
    // same oracle as v26: stored banding must yield the same batch
    "v27_graph_search_batch_stored" -> SrpBanded.graphSearchBatchSql(JoinQueryFilter),
    // same oracle as v25: stored seeds + stored edges, same results
    "v28_graph_search_cold" -> SrpBanded.graphSearchRefinedSql(queryVecSql,
      SrpBanded.queryProbeKeys(FakeEmbedder.embed(SearchText))),
    // filtered stored search: the selective branch is an EXACT ranking
    // over only-matching rows, so the twin is the filtered exact top-k
    // (rank on the raw similarity — same tie order as the Scala cut —
    // then round for emission)
    "v39_filtered_graph_search" ->
      s"""SELECT vec_id, rk, sim FROM (
         |  SELECT e.vec_id AS vec_id,
         |    row_number() OVER (ORDER BY
         |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])) DESC,
         |      e.vec_id) AS rk,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS sim
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'de' AND d.source = 'src3')
         |WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // code tier with a covering shortlist (W = 256 ≥ matching rows at
    // this scale): the serve IS the exact filtered ranking, so the
    // twin is the same filtered exact top-k shape as v39's
    "v40_filtered_code_search" ->
      s"""SELECT vec_id, rk, sim FROM (
         |  SELECT e.vec_id AS vec_id,
         |    row_number() OVER (ORDER BY
         |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])) DESC,
         |      e.vec_id) AS rk,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS sim
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en')
         |WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // batched code tier with a covering shortlist: per-query exact
    // filtered top-k over the matching rows, query set = corpus slice
    "v41_filtered_code_batch" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT vec_id AS query_id, v FROM e WHERE vec_id % $JoinQueryFilter = 0),
         |m AS MATERIALIZED (
         |  SELECT e.vec_id, e.v FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en')
         |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS INTEGER) AS rk,
         |  round(sim, 6) AS sim
         |FROM (
         |  SELECT q.query_id, m.vec_id,
         |    list_cosine_similarity(m.v, q.v) AS sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      list_cosine_similarity(m.v, q.v) DESC, m.vec_id) AS rk
         |  FROM m, q)
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // filtered range: all matching rows at (rounded) sim ≥ t
    "v42_filtered_range" ->
      s"""SELECT vec_id, sim FROM (
         |  SELECT e.vec_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS sim
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en')
         |WHERE sim >= 0.15 ORDER BY sim DESC, vec_id""".stripMargin,
    // range-predicate filtered search: exact tier over the matching
    // set (matching ≈ 106 ≤ exactScanMax) — the reference's
    // num_claims/country columns as ReferenceParity maps them
    "v43_filtered_range_pred" ->
      s"""SELECT vec_id, rk, sim FROM (
         |  SELECT e.vec_id AS vec_id,
         |    row_number() OVER (ORDER BY
         |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])) DESC,
         |      e.vec_id) AS rk,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST($queryVecSql AS DOUBLE[])), 6) AS sim
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE upper(substr(d.lang, 1, 2)) = 'EN' AND d.doc_id % 43 >= 22)
         |WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // mixed-predicate batch in the covering regime: per-query exact
    // filtered top-k where each query's filter is its own doc's lang
    "v44_filtered_batch_mixed" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT e.vec_id AS query_id, e.v, d.lang
         |  FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE e.vec_id % $JoinQueryFilter = 0),
         |m AS MATERIALIZED (
         |  SELECT e.vec_id, e.v, d.lang FROM e JOIN documents d ON e.vec_id = d.doc_id)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS INTEGER) AS rk,
         |  round(sim, 6) AS sim
         |FROM (
         |  SELECT q.query_id, m.vec_id,
         |    list_cosine_similarity(m.v, q.v) AS sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      list_cosine_similarity(m.v, q.v) DESC, m.vec_id) AS rk
         |  FROM m JOIN q ON m.lang = q.lang)
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // per-query k: covering ⇒ exact filtered top-k_q per query, the
    // per-caller-limit contract (k_q = 2 + (id % 7) % 4 ∈ {2..5})
    "v45_filtered_batch_perk" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT vec_id AS query_id, v, 2 + (vec_id % 7) % 4 AS kq
         |  FROM e WHERE vec_id % $JoinQueryFilter = 0),
         |m AS MATERIALIZED (
         |  SELECT e.vec_id, e.v FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en')
         |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS INTEGER) AS rk,
         |  round(sim, 6) AS sim
         |FROM (
         |  SELECT q.query_id, m.vec_id, q.kq,
         |    list_cosine_similarity(m.v, q.v) AS sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      list_cosine_similarity(m.v, q.v) DESC, m.vec_id) AS rk
         |  FROM m, q)
         |WHERE rk <= kq ORDER BY query_id, rk""".stripMargin,
    // heterogeneous predicates AND per-query limits in one batch
    "v46_filtered_mixed_perk" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT e.vec_id AS query_id, e.v, d.lang,
         |    2 + (e.vec_id % 7) % 4 AS kq
         |  FROM e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE e.vec_id % $JoinQueryFilter = 0),
         |m AS MATERIALIZED (
         |  SELECT e.vec_id, e.v, d.lang FROM e JOIN documents d ON e.vec_id = d.doc_id)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rk AS INTEGER) AS rk,
         |  round(sim, 6) AS sim
         |FROM (
         |  SELECT q.query_id, m.vec_id, q.kq,
         |    list_cosine_similarity(m.v, q.v) AS sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      list_cosine_similarity(m.v, q.v) DESC, m.vec_id) AS rk
         |  FROM m JOIN q ON m.lang = q.lang)
         |WHERE rk <= kq ORDER BY query_id, rk""".stripMargin,
  )
}
