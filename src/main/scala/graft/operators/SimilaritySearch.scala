package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{vectors, FakeEmbedder}

/** The reference's pgvector query surface, Spark-first.
  *
  * - `knn*`: tools.yaml:22-27 `find_similar_customer_records` —
  *   ORDER BY distance LIMIT k. Spark plans `orderBy(...).limit(k)`
  *   as TakeOrderedAndProject: each partition keeps its local top-k,
  *   the driver merges — no global sort, no shuffle of the corpus.
  *   That shape survives a 1000-executor / 100 TB scan.
  * - `similarityJoin`: the batch version — a whole table of query
  *   vectors at once. Queries are broadcast (small side), the corpus
  *   is scanned once; per-query top-k via window over (query id).
  * - `recordById`: tools.yaml:29-39 `get_record_by_id` — a predicate
  *   that pushes down to the parquet scan.
  * - `semanticSearch`: the end-to-end tool — embed query text with
  *   the (stubbed) embedder, score, top-k, join doc metadata.
  */
object SimilaritySearch {

  /** similarity score column for a constant query vector */
  def score(metric: String, vec: Column, query: Array[Float]): Column = {
    val q = typedLit(query)
    metric match {
      case "cosine" => vectors.cosine_sim(vec, q)
      case "l2"     => vectors.l2_dist(vec, q)
      case "dot"    => vectors.dot_product(vec, q)
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }
  }

  /** Exact top-k scan: brute-force over the corpus, TakeOrderedAndProject. */
  def knn(corpus: DataFrame, vecCol: String, idCol: String,
          query: Array[Float], k: Int, metric: String = "cosine"): DataFrame = {
    val asc = metric == "l2" // distances: smaller is better
    val s = round(score(metric, col(vecCol), query), 6).as("score")
    val scored = corpus.select(col(idCol), s)
    // explicit NULLS LAST: Spark's asc defaults to NULLS FIRST while
    // the oracle engine defaults to NULLS LAST — a null embedding row
    // must never outrank a scored one
    val ord = if (asc) Seq(col("score").asc_nulls_last, col(idCol).asc)
              else Seq(col("score").desc_nulls_last, col(idCol).asc)
    scored.orderBy(ord: _*).limit(k)
  }

  /** Batch similarity join: top-k corpus neighbors for EACH query row.
    * `queries` must be broadcast-sized (it is hinted); the corpus side
    * is never shuffled — scoring is map-only, and the per-query top-k
    * runs through the custom [[graft.functions.TopKPairs]] aggregate:
    * partial k-bounded heaps combine map-side, so only
    * k × partitions × queries rows ever reach the exchange, with no
    * full sort anywhere (O(n log k) vs the window's O(n log n)).
    */
  def similarityJoin(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, qVecCol: String,
                     cIdCol: String, cVecCol: String,
                     k: Int, metric: String = "cosine"): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("q_vec")))
    val scoreCol = metric match {
      case "cosine" => vectors.cosine_sim(col(cVecCol), col("q_vec"))
      case "l2"     => vectors.l2_dist(col(cVecCol), col("q_vec"))
      case "dot"    => vectors.dot_product(col(cVecCol), col("q_vec"))
    }
    val asc = metric == "l2"
    val scored = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol))
      .join(q) // broadcast nested-loop: corpus x queries, map-only
      .select(col("query_id"), col("neighbor_id"),
        round(scoreCol, 6).as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(
        col("neighbor_id"), col("score"), k, asc).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.score").as("score"))
  }

  /** Large-query-set similarity join — when the query table itself is
    * too big to broadcast. Block-nested-loop on an explicit grid: the
    * corpus hashes into `blocks` partitions once; each query row is
    * replicated to every corpus block (queries × blocks rows — choose
    * `blocks` ≈ corpus_size / healthy_partition so the replication
    * stays far below the corpus). Every (query, corpus-row) pair meets
    * exactly once; per-query top-k via the same bounded-heap
    * aggregate. No side needs to fit in memory anywhere.
    */
  def similarityJoinLarge(queries: DataFrame, corpus: DataFrame,
                          qIdCol: String, qVecCol: String,
                          cIdCol: String, cVecCol: String,
                          k: Int, blocks: Int,
                          metric: String = "cosine"): DataFrame = {
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("c_vec"),
      pmod(hash(col(cIdCol)), lit(blocks)).as("blk"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("q_vec"),
      explode(sequence(lit(0), lit(blocks - 1))).as("blk"))
    val scoreCol = metric match {
      case "cosine" => vectors.cosine_sim(col("c_vec"), col("q_vec"))
      case "l2"     => vectors.l2_dist(col("c_vec"), col("q_vec"))
      case "dot"    => vectors.dot_product(col("c_vec"), col("q_vec"))
    }
    val asc = metric == "l2"
    c.join(q, Seq("blk"))
      .select(col("query_id"), col("neighbor_id"), round(scoreCol, 6).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(
        col("neighbor_id"), col("score"), k, asc).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.score").as("score"))
  }

  /** Filtered knn — the pgvector "metadata filter + vector search"
    * hybrid: the predicate pushes into the parquet scan, the top-k
    * runs over only the surviving rows. */
  def filteredKnn(corpus: DataFrame, predicate: Column, vecCol: String,
                  idCol: String, query: Array[Float], k: Int,
                  metric: String = "cosine"): DataFrame =
    knn(corpus.filter(predicate), vecCol, idCol, query, k, metric)

  /** Hybrid lexical + vector scoring: blend cosine similarity with a
    * query-token overlap ratio (a cheap BM25 stand-in) — the classic
    * RAG reranking shape, one map-only pass then top-k. */
  def hybridSearch(spark: SparkSession, sfDir: String, queryText: String,
                   k: Int, alpha: Double = 0.7): DataFrame = {
    val qv = FakeEmbedder.embed(queryText)
    val qToks = queryText.toLowerCase.split(" ").distinct
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val joined = emb.join(docs, emb("vec_id") === docs("doc_id"))
    val lexical = size(array_intersect(
      array_distinct(split(lower(col("text")), " ")),
      typedLit(qToks))).cast("double") / qToks.length.toDouble
    val vec = vectors.cosine_sim(col("embedding"), typedLit(qv))
    joined.select(col("doc_id"),
        round(lit(alpha) * vec + lit(1.0 - alpha) * lexical, 6).as("hybrid_score"))
      .orderBy(col("hybrid_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Point lookup — get_record_by_id. Filter pushes to the scan. */
  def recordById(documents: DataFrame, idCol: String, id: Long): DataFrame =
    documents.filter(col(idCol) === id)

  /** End-to-end semantic search over documents (find_similar_customer_records):
    * embed the query text, score embeddings, top-k, attach metadata. */
  def semanticSearch(spark: SparkSession, sfDir: String,
                     queryText: String, k: Int): DataFrame = {
    val qv = FakeEmbedder.embed(queryText)
    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val top = knn(emb, "embedding", "vec_id", qv, k, "cosine")
      .withColumnRenamed("score", "similarity")
    // doc_id == vec_id in the synthetic corpus (one embedding per doc)
    top.join(docs, top("vec_id") === docs("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("similarity"))
      .orderBy(col("similarity").desc, col("doc_id").asc)
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) — diversity-aware top-k for RAG context building: greedily
    * pick the candidate maximizing
    *   λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s).
    * The distributed part is the candidate scan (ordinary knn,
    * candK ≫ k); the greedy selection is O(candK²·dim) on the DRIVER
    * over the collected candidates — correct at scale because candK
    * is a constant (e.g. 100), not a function of corpus size.
    * Deterministic: ties break on id. */
  def mmrRerank(corpus: DataFrame, vecCol: String, idCol: String,
                query: Array[Float], k: Int, candK: Int,
                lambda: Double = 0.7): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        vectors.cosine_sim(col(vecCol), typedLit(query)).as("qs"))
      .orderBy(col("qs").desc_nulls_last, col("id").asc)
      .limit(candK)
      .as[(Long, Array[Float], Double)]
      .collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Int)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val best = remaining.maxBy { case (id, v, qs) =>
        val maxSel =
          if (selected.isEmpty) 0.0
          else selected.map { case (sid, _, _) =>
            cos(v, cands.find(_._1 == sid).get._2)
          }.max
        (lambda * qs - (1 - lambda) * maxSel, -id)
      }
      val mmr = lambda * best._3 - (1 - lambda) * (
        if (selected.isEmpty) 0.0
        else selected.map { case (sid, _, _) => cos(best._2, cands.find(_._1 == sid).get._2) }.max)
      selected += ((best._1, mmr, selected.length + 1))
      remaining -= best
    }
    selected.toSeq.map { case (id, s, r) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r) }
      .toDF("id", "mmr_score", "rank")
  }
}
