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
