package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.vectors

/** IVF (inverted-file) index — the Spark-native analogue of the
  * reference's `CREATE INDEX ... USING ivfflat (lists = N)`
  * (sql/05_vector_index.sql:3-6).
  *
  * Build = Lloyd k-means with deterministic init (first k vectors by
  * id). Every step is scale-shaped:
  * - assignment is map-only (centroid matrix rides as a broadcast
  *   reference object inside a codegen'd expression — no join, no
  *   shuffle of the corpus);
  * - the update step shuffles only (k × dim) partial sums (posexplode
  *   → groupBy (cluster, dim) with map-side combine);
  * - centroids collect to the driver (k × dim floats — tiny at any
  *   corpus size).
  * At cluster scale the assigned corpus would be written back
  * partitioned by `list_id` so a probe reads nprobe/nlists of the
  * files; locally `search` filters on the assignment column, which is
  * the same pruning logic.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  /** Index builds are expensive and reusable (the reference builds its
    * ivfflat index once, then serves queries); memoize per
    * (dataset, k, iters) so build + search queries in one session
    * share the model. */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Model]
  // a rewrite of the source dir must drop models fit on the old data
  graft.Tables.onInvalidate(p =>
    modelCache.filterInPlace((k, _) => !k._1.startsWith(p) && !p.startsWith(k._1)))

  def fitCached(spark: SparkSession, d: String, k: Int, iters: Int): Model =
    modelCache.getOrElseUpdate((d, k, iters),
      fit(Tables.embeddings(spark, d), "embedding", "vec_id", k, iters))

  /** Deterministic Lloyd k-means over an `array<float>` column. */
  def fit(emb: DataFrame, vecCol: String, idCol: String,
          k: Int, iters: Int): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    var centroids: Array[Array[Float]] = emb
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).as[Array[Float]].collect()

    for (_ <- 1 to iters) {
      val assigned = emb.select(
        vectors.closest_centroid(col(vecCol), centroids).as("list_id"),
        col(vecCol).as("v"))
      val sums = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("list_id"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val dim = centroids(0).length
      val next = Array.tabulate(centroids.length)(i => centroids(i).clone())
      val byList = sums.groupBy(_.getInt(0))
      byList.foreach { case (listId, rows) =>
        val c = new Array[Float](dim)
        rows.foreach { r =>
          c(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
        }
        next(listId) = c
      }
      centroids = next
    }
    Model(centroids)
  }

  /** Corpus with its list assignment — the inverted-file layout. At
    * scale: `.write.partitionBy("list_id").parquet(...)`. */
  def assign(emb: DataFrame, vecCol: String, model: Model): DataFrame =
    emb.withColumn("list_id", vectors.closest_centroid(col(vecCol), model.centroids))

  /** Per-list stats — the index summary (v5 output). */
  def buildSummary(spark: SparkSession, d: String, k: Int = 16, iters: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val model = fitCached(spark, d, k, iters)
    assign(emb, "embedding", model)
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("list_id"))
  }

  /** The one centroid-ranking kernel every probe path shares: squared
    * L2 in DOUBLE precision (matching ClosestCentroid's widening — a
    * float-subtraction copy could rank near-tied lists differently),
    * ties broken on list id. */
  def rankLists(model: Model, query: Array[Float], nprobe: Int): Seq[Int] =
    model.centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0
      var j = 0
      val n = math.min(c.length, query.length)
      while (j < n) {
        val dd = c(j).toDouble - query(j).toDouble; s += dd * dd; j += 1
      }
      (i, s)
    }.sortBy { case (i, s) => (s, i) }.take(nprobe).map(_._1).toSeq

  /** IVF probe: rank lists by centroid distance to the query, scan
    * only the top `nprobe` lists, exact top-k inside them. */
  def search(emb: DataFrame, vecCol: String, idCol: String, model: Model,
             query: Array[Float], topK: Int, nprobe: Int): DataFrame = {
    val ranked = rankLists(model, query, nprobe)
    assign(emb, vecCol, model)
      .filter(col("list_id").isin(ranked: _*))
      .select(col(idCol),
        round(vectors.cosine_sim(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** IVF-accelerated similarity JOIN — the "approximate join" the
    * engine is built around: every query probes only its `nprobe`
    * nearest inverted lists instead of the whole corpus. Corpus side
    * gets its list assignment once (map-only); queries explode to
    * (query, list) probes; the equi-join on `list_id` is the only
    * shuffle and it moves nprobe/nlists of the scored pairs a
    * brute-force join would. Top-k per query via the bounded heap. */
  def similarityJoin(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, qVecCol: String,
                     cIdCol: String, cVecCol: String,
                     model: Model, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val probes = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("q_vec"),
        explode(GraftBridge.column(graft.functions.NearestCentroids(
          GraftBridge.expression(col(qVecCol)), model.centroids, nprobe))).as("list_id"))
    val assigned = assign(corpus, cVecCol, model)
      .select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("c_vec"), col("list_id"))
    assigned.join(probes, Seq("list_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vectors.cosine_sim(col("c_vec"), col("q_vec")), 6).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairs.top_k_pairs(
        col("neighbor_id"), col("score"), k, asc = false).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.score").as("score"))
  }

  def searchSummary(spark: SparkSession, d: String, queryText: String,
                    k: Int = 16, iters: Int = 5, topK: Int = 10, nprobe: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val model = fitCached(spark, d, k, iters)
    search(emb, "embedding", "vec_id", model,
      graft.functions.FakeEmbedder.embed(queryText), topK, nprobe)
  }
}
