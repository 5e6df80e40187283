package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Column-level API over the native vector expressions, plus SQL
  * registration so `spark.sql("SELECT cosine_sim(a, b) ...")` works —
  * mirroring how pgvector exposes operators inside SQL.
  */
object vectors {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def e(col: Column) = GraftBridge.expression(col)

  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Driver-side twin of [[CosineSimilarity]]'s kernel — the SAME
    * float→double widening, accumulation order and zero-denominator
    * rule, so the produced double is BIT-IDENTICAL to the Spark
    * expression over the same floats (KernelProperties asserts raw-bit
    * equality). This is what lets a bounded driver-side walk step
    * (HNSW upper-layer descent over a cached layer) score candidates
    * without a Spark job while keeping every serve hash-stable against
    * its distributed twin. */
  def cosine_sim_local(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  def l2_dist(a: Column, b: Column): Column = c(L2Distance(e(a), e(b)))
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def embed_text(t: Column): Column = c(EmbedText(e(t)))
  def closest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    c(ClosestCentroid(e(v), centroids))
  def nearest_centroid_dist(v: Column, centroids: Array[Array[Double]]): Column =
    c(NearestCentroidDist(e(v), centroids))

  /** register SQL names on the session (temp functions) */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", xs => CosineSimilarity(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_dist", xs => L2Distance(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", xs => DotProduct(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("embed_text", xs => EmbedText(xs.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", xs => SimHash64(xs.head), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_intersect_count",
      xs => SortedIntersectCount(xs(0), xs(1)), "scala_udf")
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
    reg.createOrReplaceTempFunction("char_shingles",
      xs => CharShingles(xs(0), litInt(xs(1), "char_shingles n")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      xs => MinHashSig(xs(0), litInt(xs(1), "minhash_sig n"), litInt(xs(2), "minhash_sig k")), "scala_udf")
    // aggregate: top_k_pairs(id, score, k[, asc]) — k/asc must be literals
    reg.createOrReplaceTempFunction("top_k_pairs", xs => {
      import org.apache.spark.sql.catalyst.expressions.Literal
      val k = xs(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"top_k_pairs k must be an int literal, got $other")
      }
      val asc = if (xs.length > 3) xs(3) match {
        case Literal(v: Boolean, _) => v
        case other => throw new IllegalArgumentException(s"top_k_pairs asc must be a boolean literal, got $other")
      } else false
      TopKPairs(xs(0), xs(1), k, asc).toAggregateExpression()
    }, "scala_udf")
  }
}
