package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SrpBanded

/** Persisted k-NN graph edges — the third and last index artifact a
  * graph-ANN serving process needs on disk (reference role: sql/05's
  * always-resident index). With [[SrpStore]] (seed buckets + compact
  * banding) and this edge table, a FRESH session serves queries with
  * zero training or graph construction at startup: seeds come from
  * pruned bucket partitions, hops from a 16-byte-row edge scan.
  *
  * Layout: `<dir>/edges/` — (src, dst) parquet, the refined v21
  * graph by default. Rewrites go through [[graft.Tables.invalidate]]
  * like every other store.
  */
object EdgeStore {

  def write(spark: SparkSession, edges: DataFrame, dir: String): Unit = {
    edges.select(col("src"), col("dst"))
      .write.mode(SaveMode.Overwrite)
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
    frameCache.getOrElseUpdate(spark, dir)(spark.read.parquet(s"$dir/edges"))

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
