package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** A model-FILE-backed [[Embedder]] — the load-a-local-model shape of
  * the reference's `embedding('text-embedding-005', $1)` call
  * (tools.yaml:23): weights live in an artifact on disk, not in code,
  * and inference amortizes model setup per PARTITION, never per row.
  *
  * The model is a hashed-bag-of-tokens linear encoder (the public
  * fastText-style shape: token → hashed bucket → weight row; text
  * embedding = l2-normalized sum of its tokens' rows). Deliberately
  * tiny mathematics — the POINT is the plumbing a real checkpoint
  * needs and a hermetic build can still prove:
  *
  *  - weights load from `modelPath` ONCE PER JVM ([[FileEmbedder.load]]
  *    memoizes; [[FileEmbedder.loads]] counts actual file reads — the
  *    spec asserts 1 across a multi-partition ingest), the executor-
  *    side analogue of m3's shared decoder handle;
  *  - [[embedFrame]] overrides the seam's batch hook with
  *    `mapPartitions`: the handle is fetched once per partition and
  *    rows are fed through in [[FileEmbedder.BatchSize]]-row groups —
  *    the row-batch shape a real encoder's forward pass consumes;
  *  - [[embedCol]] (the scalar column contract) is a CodegenFallback
  *    expression over the same per-JVM handle, so trait-level
  *    composition still works — but ingest goes through the batched
  *    frame path, which the spec asserts plans as a MapPartitions
  *    node with no shuffle.
  *
  * Swapping this in touches NO operator code — the same license
  * EmbedderSpec proves for the lightweight implementations. */
final case class FileEmbedder(modelPath: String) extends Embedder {
  override def dim: Int = FileEmbedder.load(modelPath).dim
  override def embed(text: String): Array[Float] =
    FileEmbedder.encode(FileEmbedder.load(modelPath), text)
  override def embedCol(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      FileEmbedExpr(org.apache.spark.sql.GraftBridge.expression(text), modelPath))
  override def embedFrame(df: DataFrame, textCol: String): DataFrame = {
    val path = modelPath
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add("embedding",
      ArrayType(FloatType, containsNull = false), nullable = false)
    df.mapPartitions { it =>
      val m = FileEmbedder.load(path) // per-partition fetch, per-JVM read
      it.grouped(FileEmbedder.BatchSize).flatMap { batch =>
        batch.map(r => Row.fromSeq(
          r.toSeq :+ FileEmbedder.encode(m, r.getString(idx)).toSeq))
      }
    }(Encoders.row(outSchema))
  }
}

/** `file_embed(text)` — scalar column form over the per-JVM model
  * handle. CodegenFallback: a file-backed model has no codegen story;
  * the BATCH path (embedFrame) is where ingest throughput lives. */
private[graft] case class FileEmbedExpr(child: Expression, modelPath: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "file_embed"
  override def nullSafeEval(t: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      FileEmbedder.encode(FileEmbedder.load(modelPath), t.toString))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FileEmbedder {
  /** rows per inference batch fed to the model inside a partition */
  val BatchSize = 256

  private val Magic = 0x47524654 // "GRFT"

  final class Model(val dim: Int, val vocab: Int, val weights: Array[Float])

  /** count of actual model-file READS (not lookups) — the spec's
    * once-per-JVM assertion hook */
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Model]
  private val loadLock = new Object
  private[graft] def dropCached(path: String): Unit = { cache.remove(path): Unit }

  /** fast-path lookup, double-checked init lock on miss: concurrent
    * first-touch partitions must not each read the weight file
    * (TrieMap.getOrElseUpdate may evaluate the thunk more than once
    * under contention — measured 4× on a 4-partition first ingest) */
  def load(path: String): Model = cache.get(path) match {
    case Some(m) => m
    case None => loadLock.synchronized { cache.getOrElseUpdate(path, readModel(path)) }
  }

  private def readModel(path: String): Model = {
    loads.incrementAndGet()
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      require(in.readInt() == Magic, s"$path is not a graft embedder model")
      val dim = in.readInt(); val vocab = in.readInt()
      require(dim > 0 && vocab > 0, s"$path: bad header dim=$dim vocab=$vocab")
      val w = new Array[Float](vocab * dim)
      var i = 0
      while (i < w.length) { w(i) = in.readFloat(); i += 1 }
      new Model(dim, vocab, w)
    } finally in.close()
  }

  /** deterministic token→bucket hash (polynomial over UTF-16 units —
    * engine-independent, no JVM hashCode reliance) */
  private def bucket(token: String, vocab: Int): Int = {
    var h = 7L
    var i = 0
    while (i < token.length) { h = (h * 31 + token.charAt(i)) & 0x7fffffffffffffL; i += 1 }
    (h % vocab).toInt
  }

  def encode(m: Model, text: String): Array[Float] = {
    val out = new Array[Float](m.dim)
    val t = if (text == null) "" else text
    t.toLowerCase.split("\\W+").foreach { tok =>
      if (tok.nonEmpty) {
        val off = bucket(tok, m.vocab) * m.dim
        var j = 0
        while (j < m.dim) { out(j) += m.weights(off + j); j += 1 }
      }
    }
    var n = 0.0
    var j = 0
    while (j < m.dim) { n += out(j).toDouble * out(j); j += 1 }
    val norm = math.sqrt(n)
    if (norm > 0) { j = 0; while (j < m.dim) { out(j) = (out(j) / norm).toFloat; j += 1 } }
    out
  }

  /** Write a deterministic model artifact (seeded uniform weights) —
    * what a training job would export; the spec generates one to prove
    * the load/serve path without shipping binary fixtures. */
  def writeModel(path: String, dim: Int, vocab: Int, seed: Long): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      out.writeInt(Magic); out.writeInt(dim); out.writeInt(vocab)
      val rng = new scala.util.Random(seed)
      var i = 0
      while (i < vocab * dim) { out.writeFloat(rng.nextFloat() * 2f - 1f); i += 1 }
    } finally out.close()
  }
}
