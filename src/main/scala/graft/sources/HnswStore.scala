package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, SrpBanded}

/** Persisted HNSW hierarchy — the on-disk artifact set the
  * hierarchical serve path ([[graft.operators.Hnsw]], v31) needs so a
  * FRESH session answers queries with zero graph construction at
  * startup (the v28 contract, extended to the layered family):
  *
  *  - `<dir>/layers/layer=<l>/pb=<p>/` — the upper-layer navigation
  *    edges (src, dst), partitioned by layer and `pb = src mod
  *    [[LayerPartitions]]`. A descent step touches ≤ DescentBeam
  *    sources, so the read prunes to one layer × the frontier's pb
  *    buckets in the file index — point reads, not scans.
  *  - `<dir>/l0/edges/pb=<p>/` — the layer-0 beam graph in the
  *    [[EdgeStore]] layout (v18's edges by default, matching v31).
  *
  * Levels are a pure function of vec_id (the md5 rule), so the store
  * needs no level table — membership is recomputed, never stored,
  * and can therefore never go stale. Scoring reads embeddings from
  * the corpus parquet (on-disk data, not session state).
  */
object HnswStore {

  /** src-hash partition count per layer: upper layers thin 4× per
    * level, so coarser than EdgeStore's 64 keeps files non-tiny */
  val LayerPartitions = 16

  def write(spark: SparkSession, d: String, dir: String): Unit = {
    val layers = (1 to Hnsw.MaxLevel).map { l =>
      Hnsw.layerGraph(spark, d, l).withColumn("layer", lit(l))
    }.reduce(_ unionByName _)
    layers
      .withColumn("pb", pmod(col("src"), lit(LayerPartitions.toLong)))
      .repartition(col("layer"), col("pb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("layer", "pb")
      .parquet(s"$dir/layers")
    EdgeStore.write(spark, SrpBanded.materializedGraph(spark, d, 5), s"$dir/l0")
    graft.Tables.invalidate(dir)
  }

  private val frameCache = new graft.SessionCache[String, DataFrame](8)
  graft.Tables.onInvalidate { p =>
    frameCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def layersFrame(spark: SparkSession, dir: String): DataFrame =
    frameCache.getOrElseUpdate(spark, dir)(
      spark.read.parquet(s"$dir/layers")
        .select(col("src"), col("dst"),
          col("layer").cast("int").as("layer"), col("pb").cast("long").as("pb")))

  /** executed plan of the last descent-step layer read — spec hook
    * for the partition-pruning assertion */
  @volatile var lastLayerPlan: String = ""

  /** v32: v31's search served entirely from the persisted hierarchy —
    * the walk reads pruned (layer, pb) partitions, the layer-0 tail
    * hops over the stored [[EdgeStore]] edges. Identical rows to the
    * in-memory path (same edges, same IEEE scores), so it shares
    * v31's oracle. */
  def search(spark: SparkSession, d: String, dir: String,
             queryVec: Array[Float], k: Int = 10, beam: Int = 16,
             iters: Int = 3, maxEntries: Int = 64): DataFrame = {
    val layers = layersFrame(spark, dir)
    val pool = Hnsw.descentPoolBy(spark, d, queryVec,
      (l, frontier) => {
        val pbs = frontier.map(_ % LayerPartitions).distinct
        val step = layers
          .filter(col("layer") === l && col("pb").isin(pbs: _*) &&
            col("src").isin(frontier: _*))
        lastLayerPlan = step.queryExecution.executedPlan.toString
        step
      })
    SrpBanded.graphSearchFrom(spark, d, pool, queryVec,
      k, beam, iters, maxEntries, graphK = 5,
      graphOverride = Some(EdgeStore.read(spark, s"$dir/l0")))
  }

  /** Incremental hierarchy maintenance — the upsert analogue
    * [[EdgeStore.upsert]] provides for the flat graph, applied to
    * every upper layer. Layer membership is a pure function of
    * vec_id, so an upserted vector's layers are knowable without any
    * stored state; what must refresh are the EDGES: the vector's own
    * top-k on each of its layers, and the layer-members who should
    * adopt it (its band collisions within the layer) or re-rank it
    * (its current reverse neighbors).
    *
    * Call AFTER the corpus ingest upsert and [[SrpStore.upsert]]
    * (`d` = post-ingest corpus, `srpDir`'s banding supplies the
    * collision candidates — the same generator the full build uses).
    * Only the (layer, pb) partitions holding touched sources are
    * dynamic-overwritten; cost is O(neighborhood per layer), and
    * layers thin 4× per level. The layer-0 edge table is
    * [[EdgeStore]]'s — run its upsert on `<dir>/l0` alongside.
    * Returns the touched (layer, pb) partitions for minimality
    * assertions. */
  def upsert(spark: SparkSession, dir: String, d: String, srpDir: String,
             updates: DataFrame, levelK: Int = Hnsw.LevelK): Seq[(Int, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val upd = updates
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id")).distinct()
    val banding = SrpStore.bandingFrame(spark, srpDir)
      .withColumn("band", col("band").cast("int"))
      .withColumn("bk", col("bk").cast("long"))
    val layers = layersFrame(spark, dir)
    val emb = graft.Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))
    val perLayer = (1 to Hnsw.MaxLevel).map { l =>
      // membership is recomputed from the id — no stored level table
      val memberBanding = banding.filter(Hnsw.levelCol(col("vec_id")) >= l)
      val updIdsL = upd.filter(Hnsw.levelCol(col("vec_id")) >= l)
      val updKeys = memberBanding.join(broadcast(updIdsL), Seq("vec_id"))
        .select(col("band"), col("bk")).distinct()
      val collisions = memberBanding.join(broadcast(updKeys), Seq("band", "bk"))
        .select(col("vec_id")).distinct()
      val revNeighbors = layers.filter(col("layer") === l)
        .join(broadcast(updIdsL.withColumnRenamed("vec_id", "dst")), Seq("dst"))
        .select(col("src").as("vec_id"))
      val touched = collisions.union(revNeighbors).union(updIdsL).distinct()
      val tBand = memberBanding.join(touched, Seq("vec_id"))
        .select(col("band"), col("bk"), col("vec_id").as("src"))
      val cand = tBand
        .join(memberBanding.select(col("band"), col("bk"), col("vec_id").as("dst")),
          Seq("band", "bk"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .union(layers.filter(col("layer") === l)
          .join(touched.withColumnRenamed("vec_id", "src"), Seq("src"))
          .select(col("src"), col("dst")))
        .distinct()
      val w = Window.partitionBy(col("src"))
        .orderBy(col("sim").desc, col("dst"))
      val newEdges = cand
        .join(emb.select(col("vec_id").as("src"), col("embedding").as("emb_s")), Seq("src"))
        .join(emb.select(col("vec_id").as("dst"), col("embedding").as("emb_d")), Seq("dst"))
        .select(col("src"), col("dst"),
          graft.functions.vectors.cosine_sim(col("emb_s"), col("emb_d")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= levelK)
        .select(col("src"), col("dst"))
      (l, touched, newEdges)
    }
    val touchedParts = perLayer.flatMap { case (l, touched, _) =>
      touched.select(pmod(col("vec_id"), lit(LayerPartitions.toLong)).as("pb"))
        .distinct().collect().map(r => (l, r.getLong(0)))
    }
    val store = spark.read.parquet(s"$dir/layers")
      .select(col("src"), col("dst"),
        col("layer").cast("int").as("layer"), col("pb").cast("long").as("pb"))
    val merged = perLayer.map { case (l, touched, newEdges) =>
      val pbs = touchedParts.collect { case (`l`, pb) => pb }
      val survivors = store
        .filter(col("layer") === l && col("pb").isin(pbs: _*))
        .join(touched.withColumnRenamed("vec_id", "src"), Seq("src"), "left_anti")
        .select(col("src"), col("dst"), col("layer"), col("pb"))
      survivors.unionByName(newEdges
        .withColumn("layer", lit(l))
        .withColumn("pb", pmod(col("src"), lit(LayerPartitions.toLong))))
    }.reduce(_ unionByName _)
      .repartition(col("layer"), col("pb"))
      .localCheckpoint(true)
    try {
      merged.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("layer", "pb")
        .parquet(s"$dir/layers")
    } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(merged)
    graft.Tables.invalidate(dir)
    touchedParts.sorted
  }

  // one store per corpus dir, built lazily for the queries() entry —
  // a real deployment writes it after each offline build
  private val storeCache = new graft.SessionCache[String, String](
    4, (_: String) => ())
  graft.Tables.onInvalidate { p =>
    storeCache.invalidate(k => k.startsWith(p) || p.startsWith(k))
  }
  def storeFor(spark: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(spark, d) {
      val dir = java.nio.file.Files.createTempDirectory("hnswstore").toString
      write(spark, d, dir)
      dir
    }
}
