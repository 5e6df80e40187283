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
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val k = rows.map(_._1).max + 1
      val dim = rows.map(_._2).max + 1
      val cs = Array.fill(k)(new Array[Double](dim))
      rows.foreach { case (i, j, w) => cs(i)(j) = w }
      IvfIndex.Model(cs)
    })

  /** Incremental maintenance: fold freshly-embedded rows into the
    * persisted index WITHOUT a full rebuild — the reference's
    * "UPDATE ... SET embedding = ..." (sql/04_embeddings.sql:5-7)
    * feeding its ivfflat index (sql/05_vector_index.sql:3-6), where
    * new rows become searchable without re-running CREATE INDEX.
    *
    * New/updated vectors are assigned to the EXISTING centroids, and
    * only the touched list partitions are rewritten via dynamic
    * partition overwrite: the lists that gain rows, plus the lists
    * holding a stale copy of an updated id. Locating stale copies is
    * an id-column-pruned scan of the store — the one unavoidable
    * full-store read, and it reads one small column. Updates win over
    * existing rows with the same id. Centroids drift from optimal as
    * upserts accumulate — IVFFlat's standard trade; a periodic full
    * [[write]] re-trains and re-balances.
    *
    * Returns the touched list ids (what a spec asserts rewrite
    * minimality against). */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
             vecCol: String, idCol: String): Seq[Int] = {
    val model = readCentroids(spark, dir)
    val assigned = IvfIndex.assign(updates, vecCol, model)
    val store = spark.read.parquet(s"$dir/lists")
    val updIds = updates.select(col(idCol)).distinct()
    val oldLists = store.join(broadcast(updIds), Seq(idCol))
      .select(col("list_id")).distinct().collect().map(_.getInt(0))
    val newLists = assigned
      .select(col("list_id")).distinct().collect().map(_.getInt(0))
    val touched = (oldLists ++ newLists).distinct.sorted.toSeq
    if (touched.nonEmpty) {
      // survivors: touched-partition rows minus stale copies of
      // updated ids (an id that moved lists must not stay behind)
      val survivors = store
        .filter(col("list_id").isin(touched: _*))
        .join(broadcast(updIds), Seq(idCol), "left_anti")
      // break lineage from the files about to be overwritten — the
      // write cannot read the path it replaces; touched-lists data is
      // bounded (the whole point of the incremental path)
      val merged = survivors.unionByName(assigned).localCheckpoint(true)
      try {
        merged.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("list_id")
          .parquet(s"$dir/lists")
        // dynamic overwrite only rewrites partitions PRESENT in the
        // written data: a touched list emptied by a move (its only
        // rows migrated elsewhere) appears in no output row and its
        // old file — holding the stale copy — would survive. Delete
        // those emptied partitions explicitly.
        val present = merged.select(col("list_id")).distinct()
          .collect().map(_.getInt(0)).toSet
        val emptied = touched.filterNot(present)
        if (emptied.nonEmpty) {
          val conf = spark.sparkContext.hadoopConfiguration
          emptied.foreach { l =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/lists/list_id=$l")
            val fs = p.getFileSystem(conf)
            fs.delete(p, true): Unit
          }
        }
      } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(merged)
      // cached list scans are stale now; centroids re-read (unchanged)
      graft.Tables.invalidate(s"$dir/lists")
    }
    touched
  }

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
