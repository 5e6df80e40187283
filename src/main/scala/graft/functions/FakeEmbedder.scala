package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Deterministic stand-in for the reference's `embedding(model, text)`
  * call (sql/04_embeddings.sql:5-7 uses Vertex `text-embedding-005`).
  * A real deployment swaps this for batched model inference inside
  * `mapPartitions`; the Spark-side plumbing (schema `array<float>`,
  * map-only, codegen-friendly) is identical either way.
  *
  * Algorithm: character-trigram feature hashing into `Dim` signed
  * buckets, L2-normalized. Pure JVM arithmetic — the same bytes on
  * driver (to inline a query literal into oracle SQL) and executors.
  */
object FakeEmbedder extends Embedder {
  val Dim = 64
  override def dim: Int = Dim

  /** [[Embedder]] scalar form — the pinned-width corpus embedding */
  override def embed(text: String): Array[Float] = embed(text, Dim)

  /** [[Embedder]] column form — the native codegen'd [[EmbedText]]
    * expression (stays inside whole-stage codegen; a real model's
    * implementation batches inside mapPartitions instead) */
  override def embedCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    vectors.embed_text(text)

  /** dim-parametrized so parity fixtures can run at the reference's
    * actual vector(768) width (sql/02_schema.sql:20); the corpus
    * tables stay at the default 64. */
  def embed(text: String, dim: Int = Dim): Array[Float] = {
    val v = new Array[Double](dim)
    val t = "" + (if (text == null) "" else text.toLowerCase) + ""
    var i = 0
    while (i + 3 <= t.length) {
      // FNV-1a over the 3 chars — stable, endianness-free
      var h = 0x811c9dc5
      var j = i
      while (j < i + 3) { h ^= t.charAt(j); h *= 0x01000193; j += 1 }
      val bucket = (h & 0x7fffffff) % dim
      val sign = if (((h >>> 31) & 1) == 0) 1.0 else -1.0
      v(bucket) += sign
      i += 1
    }
    var norm = 0.0
    var k = 0
    while (k < dim) { norm += v(k) * v(k); k += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    k = 0
    while (k < dim) { out(k) = (v(k) * inv).toFloat; k += 1 }
    out
  }

  /** codegen-callable: UTF8String in, ArrayData out */
  def embedJ(s: UTF8String): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(embed(if (s == null) "" else s.toString))
}

/** `embed_text(text)` as a native expression so batch ingestion
  * (reference sql/04_embeddings.sql) stays inside whole-stage codegen. */
case class EmbedText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def foldable: Boolean = child.foldable
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "embed_text"

  override def nullSafeEval(v: Any): Any =
    FakeEmbedder.embedJ(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.FakeEmbedder.embedJ($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
