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
  }
}
