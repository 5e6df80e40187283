package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar quantization (SQ8) — the third compression tier of the
  * vector store, next to IVF (pruning, IvfIndex) and PQ (subspace
  * codebooks, PqIndex). Each dimension is affinely mapped to one byte
  * using corpus-wide per-dimension min/max (the technique pgvector
  * 0.7 ships as `halfvec`/`bit` quantization and FAISS calls
  * ScalarQuantizer, reference: sql/05_vector_index.sql:3-6 builds the
  * equivalent lossy-index tier).
  *
  * 64-dim float32 (256 B) → 64 B codes (4×). Unlike PQ there is no
  * codebook training — the "model" is 2·dim floats, so fit is a
  * single distributed min/max aggregate (map-side partial, 32·dim
  * tiny rows shuffled) and encode/decode are pure per-row arithmetic
  * that stays inside whole-stage codegen via zip_with/aggregate.
  * Search reconstructs approximate vectors from codes, takes
  * rerank×k candidates by approximate L2, and exact-reranks them.
  */
object SqIndex {

  /** per-dimension affine range; the entire "index model" */
  case class Model(mins: Array[Float], maxs: Array[Float]) {
    def dim: Int = mins.length
    /** code→value scale (0 where the dimension is constant) */
    def widths: Array[Float] =
      mins.zip(maxs).map { case (mn, mx) => if (mx > mn) (mx - mn) / 255f else 0f }
  }

  private val sqCache =
    scala.collection.concurrent.TrieMap.empty[String, Model]
  // a rewrite of the source dir must drop ranges fit on the old data
  graft.Tables.onInvalidate(p =>
    sqCache.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k)))

  /** One aggregate pass: posexplode to (dim, x), partial min/max
    * map-side, 32·dim rows to the driver. */
  def fit(emb: DataFrame, vecCol: String): Model = {
    val rows = emb
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    val dim = rows.length
    val mins = new Array[Float](dim)
    val maxs = new Array[Float](dim)
    rows.foreach { r => mins(r.getInt(0)) = r.getFloat(1); maxs(r.getInt(0)) = r.getFloat(2) }
    Model(mins, maxs)
  }

  def fitCached(spark: SparkSession, d: String): Model =
    sqCache.getOrElseUpdate(d, fit(Tables.embeddings(spark, d), "embedding"))

  /** float vector → array<int> of byte codes (kept as int for cheap
    * arithmetic; a persisted layout would pack to binary) */
  def encode(vec: Column, model: Model): Column = {
    val minsL = typedLit(model.mins)
    val invW = typedLit(model.widths.map(w => if (w > 0f) 1f / w else 0f))
    zip_with(
      zip_with(vec, minsL, (x, mn) => x - mn),
      invW,
      (dv, iw) => least(greatest(round(dv * iw), lit(0.0)), lit(255.0)).cast("int"))
  }

  /** approximate squared L2 between the query and a codes column,
    * computed without materializing the reconstruction */
  def approxDistSq(codes: Column, model: Model, query: Array[Float]): Column = {
    // (q_i - (min_i + c_i * w_i))² = (qadj_i - c_i * w_i)² with
    // qadj precomputed on the driver
    val qadj = typedLit(query.zip(model.mins).map { case (q, mn) => q - mn })
    val wL = typedLit(model.widths)
    val diffs = zip_with(zip_with(codes, wL, (c, w) => c * w), qadj, (r, qa) => qa - r)
    aggregate(diffs, lit(0.0), (acc, x) => acc + x * x)
  }

  /** SQ scan + exact rerank: approximate distances order rerank×k
    * candidates, full-precision L2 settles the final top-k. */
  def search(emb: DataFrame, vecCol: String, idCol: String, model: Model,
             query: Array[Float], topK: Int, rerank: Int = 4): DataFrame = {
    val candidates = emb
      .select(col(idCol), col(vecCol),
        approxDistSq(encode(col(vecCol), model), model, query).as("adist"))
      .orderBy(col("adist").asc_nulls_last, col(idCol).asc)
      .limit(topK * rerank)
    candidates
      .select(col(idCol),
        round(graft.functions.vectors.l2_dist(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }

  def searchSummary(spark: SparkSession, d: String, queryText: String,
                    topK: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val model = fitCached(spark, d)
    search(emb, "embedding", "vec_id", model,
      graft.functions.FakeEmbedder.embed(queryText), topK)
  }
}
