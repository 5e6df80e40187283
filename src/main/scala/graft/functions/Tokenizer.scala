package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The tokenization seam behind the token-counting operators (t3
  * token counts, t5 sequence packing, t13/t18 log-prob scoring, t16
  * mix planning): token counts drive packing budgets and sampling
  * weights, so a deployment must be able to swap the oracle-pinned
  * whitespace default for its REAL tokenizer without touching
  * operator code — the [[Embedder]] license applied to text.
  *
  * Two hooks: [[tokensFrame]] (the token arrays — what per-token
  * scoring consumes) and [[countFrame]] (just the counts — what
  * packing/budgeting consumes; implementations may override it with a
  * cheaper count-only path). The default [[WhitespaceTokenizer]]
  * reproduces `split(text, ' ')` exactly — every oracle stays
  * hash-green because the gate entries never pass a non-default
  * tokenizer. [[BpeTokenizer]] is the heavyweight proof: a
  * merges-file-backed byte-pair encoder loaded ONCE PER JVM and
  * applied in batched `mapPartitions` — the [[FileEmbedder]] plumbing
  * shape, which is what loading a real tokenizer's merges/vocab
  * artifact costs. */
trait Tokenizer extends Serializable {
  def name: String
  /** single-text driver-side form (gateways, specs) */
  def tokenize(text: String): Seq[String]
  /** append `out` = array<string> of `textCol`'s tokens */
  def tokensFrame(df: DataFrame, textCol: String, out: String): DataFrame
  /** append `out` = integer token count of `textCol` */
  def countFrame(df: DataFrame, textCol: String, out: String): DataFrame = {
    val arr = out + "__toks"
    tokensFrame(df, textCol, arr)
      .withColumn(out, size(col(arr))).drop(arr)
  }
}

/** The oracle-pinned default: one token per space-delimited run,
  * trailing/leading empties kept — bit-identical to the engines'
  * shared `split(text, ' ')` / `string_split(text, ' ')` idiom. */
object WhitespaceTokenizer extends Tokenizer {
  override def name: String = "whitespace"
  override def tokenize(text: String): Seq[String] =
    (if (text == null) "" else text).split(" ", -1).toSeq
  override def tokensFrame(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn(out, split(col(textCol), " "))
  // count-only consumers keep today's exact plan: a codegen'd
  // size(split(..)) expression, no array column materialized
  override def countFrame(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn(out, size(split(col(textCol), " ")))
}

/** Merges-file-backed BPE: whitespace pre-split, then each word is
  * reduced from characters by greedily applying the lowest-rank
  * adjacent merge (the published BPE algorithm; the merges file is
  * the `merges.txt` artifact every BPE tokenizer ships). The file
  * loads once per JVM ([[BpeTokenizer.loads]] counts real reads) and
  * [[tokensFrame]] runs as batched `mapPartitions` with a
  * per-partition handle — no per-row init, no UDF boxing in a loop
  * the executor can't amortize. */
final case class BpeTokenizer(mergesPath: String) extends Tokenizer {
  override def name: String = s"bpe:$mergesPath"

  override def tokenize(text: String): Seq[String] = {
    val ranks = BpeTokenizer.load(mergesPath)
    (if (text == null) "" else text).split(" ", -1).toSeq
      .flatMap(w => BpeTokenizer.encodeWord(ranks, w))
  }

  override def tokensFrame(df: DataFrame, textCol: String, out: String): DataFrame = {
    val path = mergesPath
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(out,
      ArrayType(StringType, containsNull = false), nullable = false)
    df.mapPartitions { it =>
      val ranks = BpeTokenizer.load(path) // per-partition fetch, per-JVM read
      it.grouped(BpeTokenizer.BatchSize).flatMap { batch =>
        batch.map { r =>
          val t = if (r.isNullAt(idx)) "" else r.getString(idx)
          val toks = t.split(" ", -1).toSeq
            .flatMap(w => BpeTokenizer.encodeWord(ranks, w))
          Row.fromSeq(r.toSeq :+ toks)
        }
      }
    }(Encoders.row(outSchema))
  }
}

object BpeTokenizer {
  /** rows per group fed through a partition's handle */
  val BatchSize = 256
  private val Header = "GRFT-BPE"

  type Ranks = java.util.HashMap[(String, String), Integer]

  /** count of actual merges-file READS (not lookups) — the spec's
    * once-per-JVM assertion hook (the FileEmbedder contract) */
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Ranks]
  private val loadLock = new Object
  private[graft] def dropCached(path: String): Unit = { cache.remove(path): Unit }

  def load(path: String): Ranks = cache.get(path) match {
    case Some(m) => m
    case None => loadLock.synchronized { cache.getOrElseUpdate(path, readMerges(path)) }
  }

  private def readMerges(path: String): Ranks = {
    loads.incrementAndGet()
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    require(!lines.isEmpty && lines.get(0) == Header,
      s"$path is not a graft BPE merges file")
    val m = new Ranks
    var i = 1
    while (i < lines.size) {
      val l = lines.get(i)
      if (l.nonEmpty) {
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"$path:$i bad merge line '$l'")
        m.put((l.substring(0, sp), l.substring(sp + 1)), Integer.valueOf(i - 1))
      }
      i += 1
    }
    m
  }

  /** greedy lowest-rank merge loop over one word's character symbols */
  private[graft] def encodeWord(ranks: Ranks, word: String): Seq[String] = {
    if (word.length <= 1) return Seq(word)
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        // Integer, not Int: a missing key's null must stay null —
        // an unboxed HashMap[_, Int] turns it into rank 0 (the best)
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r.intValue() < best) { best = r.intValue(); at = i }
        i += 1
      }
      if (at < 0) done = true
      else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)
    }
    syms
  }

  /** write a merges artifact (spec/dev helper — what a tokenizer
    * training job exports) */
  def writeMerges(path: String, merges: Seq[(String, String)]): Unit = {
    val out = new java.io.PrintWriter(path, "UTF-8")
    try {
      out.println(Header)
      merges.foreach { case (a, b) => out.println(s"$a $b") }
    } finally out.close()
  }
}
