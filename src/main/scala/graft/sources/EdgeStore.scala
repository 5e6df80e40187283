package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SrpBanded
import graft.functions.vectors

/** Persisted k-NN graph edges — the third and last index artifact a
  * graph-ANN serving process needs on disk (reference role: sql/05's
  * always-resident index). With [[SrpStore]] (seed buckets + compact
  * banding) and this edge table, a FRESH session serves queries with
  * zero training or graph construction at startup: seeds come from
  * pruned bucket partitions, hops from a 16-byte-row edge scan.
  *
  * Layout: `<dir>/edges/pb=<p>/` — (src, dst) parquet, partitioned by
  * `pb = src mod EdgePartitions`, the refined v21 graph by default.
  * The partitioning exists for [[upsert]]: refreshing the edges of a
  * touched neighborhood dynamic-overwrites only the partitions
  * holding those sources, the same touched-partition contract as
  * [[IvfStore.upsert]] / [[SrpStore.upsert]]. Rewrites go through
  * [[graft.Tables.invalidate]] like every other store.
  */
object EdgeStore {

  /** src-hash partition count: coarse enough that a store stays a few
    * files per partition, fine enough that a small upsert's
    * neighborhood touches a strict subset */
  val EdgePartitions = 64

  def write(spark: SparkSession, edges: DataFrame, dir: String): Unit = {
    edges.select(col("src"), col("dst"))
      .withColumn("pb", pmod(col("src"), lit(EdgePartitions.toLong)))
      .repartition(col("pb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pb")
      .parquet(s"$dir/edges")
    graft.Tables.invalidate(dir)
  }

  // a serving process opens the edge table once; the handle caches
  // the file listing, reads stay lazy per query
  private val frameCache = new graft.SessionCache[String, DataFrame](8)
  graft.Tables.onInvalidate { p =>
    frameCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def read(spark: SparkSession, dir: String): DataFrame =
    frameCache.getOrElseUpdate(spark, dir)(
      spark.read.parquet(s"$dir/edges").select(col("src"), col("dst")))

  /** Incremental graph maintenance — the edge-table analogue of
    * [[SrpStore.upsert]], closing the staleness window where an
    * upserted vector was findable through its seed buckets but never
    * reachable as a hop DESTINATION until a full rebuild.
    *
    * After the corpus table (ingest upsert) and the SRP store
    * ([[SrpStore.upsert]]) have absorbed `updates`, the touched
    * neighborhood is re-scored and only its edges rewritten:
    *
    *  - touched sources = the upserted ids, every id sharing a seed
    *    bucket with one (the collision set — exactly the candidate
    *    generator the full v18 build uses, so an upserted vector is
    *    adopted by the same sources a rebuild would give it), and
    *    every current reverse neighbor of an updated id (its old
    *    adopters must re-rank it under its new embedding);
    *  - candidates per touched source = its bucket collisions plus
    *    its current edges (the NN-Descent-refined survivors — kept so
    *    refinement quality is not thrown away on untouched
    *    neighbors);
    *  - exact cosine, top-`graphK` per source, same (sim DESC, dst)
    *    tie-break as every graph build here — deterministic;
    *  - dynamic partition overwrite of only the `pb` partitions
    *    holding touched sources, non-touched sources in those
    *    partitions surviving via anti-join (the [[IvfStore.upsert]]
    *    template).
    *
    * `d` must be the post-ingest corpus dir (the scoring join reads
    * its embeddings, updates included). Cost is O(neighborhood), not
    * O(corpus): no stage reads untouched sources' data. Periodic full
    * [[SrpBanded.nnDescentGraph]] rebuilds re-spread refinement
    * globally, as with every incremental index here. Returns the
    * touched `pb` partitions (what a spec asserts rewrite minimality
    * against). */
  def upsert(spark: SparkSession, edgeDir: String, d: String, srpDir: String,
             updates: DataFrame, graphK: Int = 5): Seq[Long] = {
    import org.apache.spark.sql.expressions.Window
    val upd = updates
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"))
    val updIds = upd.distinct()
    val banding = SrpStore.bandingFrame(spark, srpDir)
      .withColumn("band", col("band").cast("int"))
      .withColumn("bk", col("bk").cast("long"))
    val edges = read(spark, edgeDir)
    // the upserted ids' buckets, then everyone in them
    val updKeys = banding.join(broadcast(updIds), Seq("vec_id"))
      .select(col("band"), col("bk")).distinct()
    val collisions = banding.join(broadcast(updKeys), Seq("band", "bk"))
      .select(col("vec_id")).distinct()
    val revNeighbors = edges
      .join(broadcast(updIds.withColumnRenamed("vec_id", "dst")), Seq("dst"))
      .select(col("src").as("vec_id"))
    val touchedSrc = collisions.union(revNeighbors).union(updIds)
      .distinct().localCheckpoint(true)
    try {
      // candidates: bucket collisions of the touched sources + their
      // current (refined) edges
      val tBand = banding.join(touchedSrc, Seq("vec_id"))
        .select(col("band"), col("bk"), col("vec_id").as("src"))
      val cand = tBand
        .join(banding.select(col("band"), col("bk"), col("vec_id").as("dst")),
          Seq("band", "bk"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .union(edges.join(touchedSrc.withColumnRenamed("vec_id", "src"), Seq("src")))
        .distinct()
      val emb = graft.Tables.embeddings(spark, d)
        .filter(col("embedding").isNotNull &&
          size(col("embedding")) === SrpBanded.Dim)
        .select(col("vec_id"), col("embedding"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("sim").desc, col("dst"))
      val newEdges = cand
        .join(emb.select(col("vec_id").as("src"), col("embedding").as("emb_s")), Seq("src"))
        .join(emb.select(col("vec_id").as("dst"), col("embedding").as("emb_d")), Seq("dst"))
        .select(col("src"), col("dst"),
          vectors.cosine_sim(col("emb_s"), col("emb_d")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= graphK)
        .select(col("src"), col("dst"))
      // touched pb partitions (≤ EdgePartitions by construction)
      val touchedPbs = touchedSrc
        .select(pmod(col("vec_id"), lit(EdgePartitions.toLong)).as("pb"))
        .distinct().collect().map(_.getLong(0))
      val store = spark.read.parquet(s"$edgeDir/edges")
      val survivors = store
        .withColumn("pb", col("pb").cast("long"))
        .filter(col("pb").isin(touchedPbs: _*))
        .join(touchedSrc.withColumnRenamed("vec_id", "src"), Seq("src"), "left_anti")
        .select(col("src"), col("dst"), col("pb"))
      val merged = survivors
        .unionByName(newEdges.withColumn("pb",
          pmod(col("src"), lit(EdgePartitions.toLong))))
        .repartition(col("pb"))
        .localCheckpoint(true)
      try {
        merged.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pb")
          .parquet(s"$edgeDir/edges")
      } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(merged)
      graft.Tables.invalidate(edgeDir)
      touchedPbs.sorted.toSeq
    } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(touchedSrc)
  }

  // one refined-edge store per corpus dir, built lazily for the
  // queries() entry — a real deployment writes it after each offline
  // graph build/refinement
  private val storeCache = new graft.SessionCache[String, String](
    4, (_: String) => ())
  graft.Tables.onInvalidate { p =>
    storeCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def refinedStoreFor(spark: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(spark, d) {
      val dir = java.nio.file.Files.createTempDirectory("edgestore").toString
      write(spark, SrpBanded.materializedRefinedGraph(spark, d), dir)
      dir
    }
}
