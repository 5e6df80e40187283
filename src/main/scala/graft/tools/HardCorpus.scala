package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The deterministic HARD-similarity corpus construction shared by
  * [[HardRecallProbe]] (unfiltered, r11) and
  * [[FilteredHardRecallProbe]] (metadata-planted, r13): a
  * random-Gaussian background (pairwise cos ~N(0, 1/Dim); max over
  * 200k rows ≈ 0.62) with neighbors PLANTED at exact cosine tiers
  * around each query (v = c·û + √(1−c²)·ŵ⊥, the standard
  * construction). Every vector derives from a fixed per-id seed, so
  * both probes replay bit-identically and their artifacts compare
  * across rounds. */
object HardCorpus {
  val Dim: Int = graft.operators.SrpBanded.Dim
  val Tiers: Seq[Double] = Seq(0.70, 0.80, 0.90, 0.95)
  val PlantedPerQuery = 4
  /** query ids are the multiples of Mod; background/planted ids never
    * are ([[nonQueryId]]) */
  val Mod = 1000

  def gaussian(seed: Long): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(Dim)(r.nextGaussian().toFloat)
  }
  def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(x => (x / n).toFloat)
  }
  /** exact-cosine plant: c·û + √(1−c²)·ŵ⊥ with ŵ⊥ ⊥ û. */
  def plant(u: Array[Float], c: Double, seed: Long): Array[Float] = {
    val w = gaussian(seed)
    val du = w.lazyZip(u).map((a, b) => a.toDouble * b).sum
    val perp = normalize(w.lazyZip(u).map((a, b) => (a - du * b).toFloat).toArray)
    val s = math.sqrt(1 - c * c)
    u.lazyZip(perp).map((a, b) => (c * a + s * b).toFloat).toArray
  }
  /** x-th positive integer NOT divisible by Mod — background/planted
    * ids must never enter the query slice (vec_id % Mod == 0). */
  def nonQueryId(x: Long): Long =
    (x / (Mod - 1)) * Mod + (x % (Mod - 1)) + 1

  /** deterministic query vectors: ((qi+1)·Mod, û_qi) */
  def queryVecs(nQ: Int): Seq[(Long, Array[Float])] =
    (0 until nQ).map { qi =>
      ((qi + 1).toLong * Mod, normalize(gaussian(0xA11CE + qi)))
    }

  /** planted rows for query qi at its tier (qi / queriesPerTier) —
    * ids start past the background id range */
  def plantedRows(nBg: Long, nQ: Int, queriesPerTier: Int): Seq[(Long, Array[Float])] = {
    val qs = queryVecs(nQ)
    (0 until nQ).flatMap { qi =>
      val (_, u) = qs(qi)
      val c = Tiers(qi / queriesPerTier)
      (0 until PlantedPerQuery).map { p =>
        (nonQueryId(nBg + qi.toLong * PlantedPerQuery + p),
          plant(u, c, 0xBEEF00L + qi * 131L + p))
      }
    }
  }

  /** write embeddings.parquet under `dir` (idempotent): background +
    * queries + planted, float-cast, 32 partitions */
  def writeEmbeddings(spark: SparkSession, dir: String, nBg: Long,
                      nQ: Int, queriesPerTier: Int): Unit = {
    import spark.implicits._
    val embPath = s"$dir/embeddings.parquet"
    if (new java.io.File(embPath).exists()) return
    val bg = spark.range(nBg).map { x =>
      (nonQueryId(x), gaussian(0x5EED0000L + x))
    }.toDF("vec_id", "embedding")
    val qp = spark.createDataFrame(
        queryVecs(nQ) ++ plantedRows(nBg, nQ, queriesPerTier))
      .toDF("vec_id", "embedding")
    bg.unionByName(qp)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(embPath)
  }
}
