package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The ONE sign-flip embedding-replication construction the scale
  * benches share (DedupScaleBench's embedding decades and
  * FilteredScaleProbe) — copy i multiplies component j by s(i, j) = ±1
  * from an integer hash, so within-copy inner products (and the dup
  * structure) replicate EXACTLY while cross-copy cosines are
  * ~N(0, 1/Dim) noise. Deterministic: pure function of (copy, j).
  * The claim's exactness must not live in two hand-maintained copies. */
private[graft] object ScaleCorpus {

  /** replicate `src`'s embeddings table `copies`× into `path`;
    * `withLabel` also shifts the label column copy-disjoint
    * (label + copy·1000 — d5/d11's blocking posture) */
  def replicateEmbeddings(spark: SparkSession, src: String, copies: Int,
                          path: String, withLabel: Boolean): Unit = {
    val cols = if (withLabel) Seq("vec_id", "embedding", "label") else Seq("vec_id", "embedding")
    val base = Tables.embeddings(spark, src).select(cols.map(col): _*)
    val maxId = base.agg(max(col("vec_id"))).first().getLong(0) + 1
    val replicated = base
      .crossJoin(spark.range(copies).select(col("id").cast("int").as("__copy")))
      .select((Seq(
        (col("vec_id") + col("__copy").cast("long") * lit(maxId)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x * (lit(1.0f) - lit(2.0f) *
            pmod(xxhash64(col("__copy"), j), lit(2)).cast("float")))
          .cast("array<float>").as("embedding")) ++
        (if (withLabel) Seq((col("label") + col("__copy") * lit(1000)).as("label"))
         else Seq.empty)): _*)
    replicated.repartition(math.max(32, copies / 4))
      .write.mode("overwrite").parquet(path)
  }
}
