package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex
import graft.functions.vectors

/** On-disk IVF index — the persisted form of the reference's
  * `CREATE INDEX ... USING ivfflat` (sql/05_vector_index.sql).
  *
  * Layout:
  * {{{
  *   <dir>/centroids/            k × dim rows (list_id, dim, w)
  *   <dir>/lists/list_id=<i>/    corpus rows for inverted list i
  * }}}
  * `lists/` is parquet partitioned by `list_id`, so a probe with
  * `nprobe` lists compiles to a scan whose `PartitionFilters` prune
  * to nprobe/nlists of the files — at 100 TB that pruning happens in
  * the file index, before any IO. The same layout works on any
  * distributed FS; only `dir` changes.
  */
object IvfStore {

  def write(spark: SparkSession, emb: DataFrame, vecCol: String,
            model: IvfIndex.Model, dir: String): Unit = {
    import spark.implicits._
    IvfIndex.assign(emb, vecCol, model)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("list_id")
      .parquet(s"$dir/lists")
    model.centroids.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (w, j) => (i, j, w) } }
      .toSeq.toDF("list_id", "dim", "w")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    // rewriting the store must drop memoized centroids + cached scans
    graft.Tables.invalidate(dir)
  }

  // the centroid matrix is tiny and immutable per store — memoize per
  // dir instead of a parquet read+collect per probe; dropped via
  // Tables.invalidate when the store is rewritten
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, IvfIndex.Model]
  graft.Tables.onInvalidate(p =>
    centroidCache.filterInPlace((k, _) => !k.startsWith(p) && !p.startsWith(k)))

  def readCentroids(spark: SparkSession, dir: String): IvfIndex.Model =
    centroidCache.getOrElseUpdate(dir, {
      val rows = spark.read.parquet(s"$dir/centroids")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
      val k = rows.map(_._1).max + 1
      val dim = rows.map(_._2).max + 1
      val cs = Array.fill(k)(new Array[Float](dim))
      rows.foreach { case (i, j, w) => cs(i)(j) = w }
      IvfIndex.Model(cs)
    })

  /** Probe the persisted index: rank centroids on the driver, scan
    * only the `nprobe` matching list partitions. */
  def search(spark: SparkSession, dir: String, vecCol: String, idCol: String,
             query: Array[Float], topK: Int, nprobe: Int): DataFrame = {
    val model = readCentroids(spark, dir)
    val probed = IvfIndex.rankLists(model, query, nprobe)
    spark.read.parquet(s"$dir/lists")
      .filter(col("list_id").isin(probed: _*)) // partition-pruned scan
      .select(col(idCol),
        round(vectors.cosine_sim(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }
}
