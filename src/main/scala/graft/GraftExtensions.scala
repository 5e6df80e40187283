package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session extension registering graft's native SQL functions, so a
  * cluster job can opt in with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and use
  * `cosine_sim` / `l2_dist` / `dot_product` / `embed_text` /
  * `char_shingles` / `minhash_sig` / `simhash64` directly in SQL —
  * the same surface pgvector exposes inside Postgres SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (xs: Seq[Expression]) => CosineSimilarity(xs(0), xs(1))))
    ext.injectFunction((FunctionIdentifier("l2_dist"),
      info("l2_dist", "l2_dist(a, b) - euclidean distance of two float vectors"),
      (xs: Seq[Expression]) => L2Distance(xs(0), xs(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product of two float vectors"),
      (xs: Seq[Expression]) => DotProduct(xs(0), xs(1))))
    ext.injectFunction((FunctionIdentifier("embed_text"),
      info("embed_text", "embed_text(s) - deterministic text embedding (stub)"),
      (xs: Seq[Expression]) => EmbedText(xs.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(s) - 64-bit simhash of text"),
      (xs: Seq[Expression]) => SimHash64(xs.head)))
    // keep this surface identical to vectors.register — SQL that works
    // in a test session must work on a cluster opting in via conf
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "sorted_intersect_count(a, b) - intersection size of two sorted arrays"),
      (xs: Seq[Expression]) => SortedIntersectCount(xs(0), xs(1))))
    ext.injectFunction((FunctionIdentifier("char_shingles"),
      info("char_shingles", "char_shingles(s, n) - distinct char n-grams (n int literal)"),
      (xs: Seq[Expression]) => CharShingles(xs(0), litInt(xs(1), "char_shingles n"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(s, n, k) - minhash signature (n, k int literals)"),
      (xs: Seq[Expression]) => MinHashSig(xs(0),
        litInt(xs(1), "minhash_sig n"), litInt(xs(2), "minhash_sig k"))))
    // table surface: the persisted-store serves as SQL TVFs — the
    // reference's tool statements (`SELECT ... ORDER BY embedding <=> q
    // LIMIT k`) become `SELECT * FROM graft_hnsw_search(dir, q, k)`;
    // builders shared with tvf.register so the two opt-in paths
    // cannot diverge
    tvf.builders.foreach { case (name, usage, b) =>
      ext.injectTableFunction((FunctionIdentifier(name), info(name, usage), b))
    }
    ext.injectFunction((FunctionIdentifier("top_k_pairs"),
      info("top_k_pairs", "top_k_pairs(id, score, k[, asc]) - bounded top-k aggregate (k, asc literals)"),
      (xs: Seq[Expression]) => {
        val asc = xs.length > 3 && (xs(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k_pairs asc must be a boolean literal, got $other")
        })
        TopKPairs(xs(0), xs(1), litInt(xs(2), "top_k_pairs k"), asc)
          .toAggregateExpression()
      }))
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
}
