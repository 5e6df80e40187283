package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, IvfPqResidual, PqIndex}

/** Combined IVF + PQ persisted index — the full FAISS-style "IVFPQ"
  * layout (public design: inverted lists from a coarse quantizer,
  * product-quantized codes inside each list):
  *
  * {{{
  *   <dir>/lists/list_id=<i>/   (id, codes) — 8 B codes, not 256 B vectors
  *   <dir>/centroids/           coarse quantizer
  *   <dir>/codebooks/           PQ codebooks
  * }}}
  *
  * A probe therefore (1) prunes to nprobe/nlists of the FILES via
  * partition pruning, (2) scans only the 8-byte codes inside them
  * (≈32× less IO than float vectors), (3) reranks the few surviving
  * candidates exactly against the source table. Each stage cuts the
  * data the next one sees — that multiplicative pruning is what makes
  * 100 TB of vectors scannable.
  */
object IvfPqStore {

  def write(spark: SparkSession, emb: DataFrame, vecCol: String, idCol: String,
            ivf: IvfIndex.Model, pq: PqIndex.Model, dir: String): Unit = {
    import spark.implicits._
    IvfIndex.assign(emb, vecCol, ivf)
      .select(col(idCol).as("id"),
        PqIndex.encodeColumn(col(vecCol), pq).as("codes"),
        col("list_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$dir/lists")
    ivf.centroids.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (w, j) => (i, j, w) } }
      .toSeq.toDF("list_id", "dim", "w")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    pq.codebooks.zipWithIndex
      .flatMap { case (book, j) => book.zipWithIndex.flatMap { case (cen, c) =>
        cen.zipWithIndex.map { case (w, i) => (j, c, i, w) } } }
      .toSeq.toDF("subspace", "code", "dim", "w")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
    // rewriting the store must drop memoized models + cached scans
    graft.Tables.invalidate(dir)
  }

  // models are tiny driver-side arrays, but re-reading + collecting
  // two parquet dirs per query is pure fixed overhead — memoize per
  // dir, dropped by Tables.invalidate when the store is rewritten
  private val modelCache = scala.collection.concurrent.TrieMap
    .empty[String, (IvfIndex.Model, PqIndex.Model)]
  graft.Tables.onInvalidate(p =>
    modelCache.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k)))

  def readModels(spark: SparkSession, dir: String): (IvfIndex.Model, PqIndex.Model) =
    modelCache.getOrElseUpdate(dir, readModelsUncached(spark, dir))

  private def readModelsUncached(spark: SparkSession, dir: String): (IvfIndex.Model, PqIndex.Model) = {
    val ivf = IvfStore.readCentroids(spark, s"$dir")
    val rows = spark.read.parquet(s"$dir/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val dsub = rows.map(_._3).max + 1
    val books = Array.fill(m, k)(new Array[Double](dsub))
    rows.foreach { case (j, c, i, w) => books(j)(c)(i) = w }
    (ivf, PqIndex.Model(books))
  }

  // -------------------------------------------------------------
  // Residual layout (v22 persisted): same directory structure, but
  // the stored codes product-quantize x − c(list(x)) — see
  // [[graft.operators.IvfPqResidual]]. The floored residual anchors
  // derive from the stored centroids (floor), so no extra artifact;
  // raw and residual stores differ only in what the codes MEAN, and
  // the search path that must match it.
  // -------------------------------------------------------------

  def writeResidual(spark: SparkSession, emb: DataFrame, vecCol: String,
                    idCol: String, model: IvfPqResidual.Model, dir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    IvfPqResidual.residualFrame(emb, vecCol, idCol, model.ivf, model.rc)
      .select(col("id"),
        GraftBridge.column(graft.operators.PqEncode(
          GraftBridge.expression(col("q")), model.pq.codebooks)).as("codes"),
        col("list_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$dir/lists")
    model.ivf.centroids.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (w, j) => (i, j, w) } }
      .toSeq.toDF("list_id", "dim", "w")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    model.pq.codebooks.zipWithIndex
      .flatMap { case (book, j) => book.zipWithIndex.flatMap { case (cen, c) =>
        cen.zipWithIndex.map { case (w, i) => (j, c, i, w) } } }
      .toSeq.toDF("subspace", "code", "dim", "w")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
    graft.Tables.invalidate(dir)
  }

  /** probe of a residual store: identical pruning shape to [[search]],
    * but each probed list's codes score against that list's own
    * residual distance table. Result parity with the in-memory
    * [[IvfPqResidual.searchSummary]] is spec-asserted. */
  def searchResidual(spark: SparkSession, dir: String, source: DataFrame,
                     vecCol: String, idCol: String,
                     query: Array[Float], topK: Int, nprobe: Int,
                     rerank: Int = 4): DataFrame = {
    val (ivf, pq) = readModels(spark, dir)
    val rc = ivf.centroids.map(_.map(x => math.floor(x).toLong))
    val model = IvfPqResidual.Model(ivf, rc, pq)
    val probed = IvfIndex.rankLists(ivf, query, nprobe)
    val tables = IvfPqResidual.residualTables(model, query)
    val candidates = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(probed: _*)) // partition-pruned
      .select(col("id"),
        IvfPqResidual.adcByListCol(col("codes"), col("list_id"), tables).as("adc"))
      .orderBy(col("adc").asc_nulls_last, col("id").asc)
      .limit(topK * rerank)
    source
      .join(candidates, source(idCol) === candidates("id"), "left_semi")
      .select(col(idCol),
        round(graft.functions.vectors.l2_dist(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }

  // one residual store per corpus dir, built lazily for the queries()
  // entry — a real deployment writes it at ingest time
  private val residualStoreCache = new graft.SessionCache[String, String](
    4, (_: String) => ())
  graft.Tables.onInvalidate { p =>
    residualStoreCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def residualStoreFor(spark: SparkSession, d: String): String =
    residualStoreCache.getOrElseUpdate(spark, d) {
      val dir = java.nio.file.Files.createTempDirectory("ivfpqres").toString
      writeResidual(spark, graft.Tables.embeddings(spark, d), "embedding",
        "vec_id", IvfPqResidual.fitCached(spark, d), dir)
      dir
    }

  /** probe: partition-pruned compressed scan + exact rerank against
    * the source embeddings table */
  def search(spark: SparkSession, dir: String, source: DataFrame,
             vecCol: String, idCol: String,
             query: Array[Float], topK: Int, nprobe: Int,
             rerank: Int = 4): DataFrame = {
    val (ivf, pq) = readModels(spark, dir)
    val probed = IvfIndex.rankLists(ivf, query, nprobe)
    val table = PqIndex.distanceTable(pq, query)
    val candidates = spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(probed: _*)) // partition-pruned
      .select(col("id"), PqIndex.adcColumn(col("codes"), table).as("adc"))
      .orderBy(col("adc").asc_nulls_last, col("id").asc)
      .limit(topK * rerank)
    source
      .join(candidates, source(idCol) === candidates("id"), "left_semi")
      .select(col(idCol),
        round(graft.functions.vectors.l2_dist(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }
}
