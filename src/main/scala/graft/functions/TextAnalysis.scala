package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Text primitives for the dedup / analysis pipeline: character
  * shingles, MinHash signatures, SimHash. All kernels are static JVM
  * methods so the expressions stay codegen-callable (no closure
  * serialization, no boxing per element beyond the output arrays).
  *
  * Hashes are self-contained FNV/xor-shift arithmetic — identical on
  * driver and executors, no dependence on JVM hashCode of objects.
  */
object TextHash {
  /** FNV-1a 64-bit over a char range of `s`. */
  def fnv64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** xor-shift mix to derive the i-th hash family member from a base hash. */
  def mix(h0: Long, seed: Int): Long = {
    var h = h0 ^ (0x9e3779b97f4a7c15L * (seed + 1))
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** distinct character n-gram shingles */
  def shingles(text: String, n: Int): Array[String] = {
    if (text == null || text.length < n) return Array.empty
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= text.length) { set.add(text.substring(i, i + n)); i += 1 }
    set.toArray(new Array[String](set.size))
  }

  /** MinHash signature: for each of `k` hash families, the minimum
    * mixed hash over the shingle set. */
  def minhash(text: String, n: Int, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (text == null || text.length < n) return sig
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i + n <= text.length) {
      val base = fnv64(text, i, i + n)
      if (seen.add(base)) {
        var j = 0
        while (j < k) {
          val h = mix(base, j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    var start = -1
    var i = 0
    val len = text.length
    while (i <= len) {
      val isSep = i == len || text.charAt(i) == ' '
      if (!isSep && start < 0) start = i
      if (isSep && start >= 0) {
        val h = mix(fnv64(text, start, i), 0)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // --- codegen-callable wrappers (UTF8String / ArrayData shapes) ---
  def shinglesJ(s: UTF8String, n: Int): ArrayData = {
    val arr = shingles(if (s == null) null else s.toString, n)
    new GenericArrayData(arr.map(x => UTF8String.fromString(x).asInstanceOf[Any]))
  }
  def minhashJ(s: UTF8String, n: Int, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhash(if (s == null) null else s.toString, n, k))
  def simhashJ(s: UTF8String): Long = simhash(if (s == null) null else s.toString)

  /** merge-walk intersection count over two sorted UTF8String arrays */
  def sortedIntersectCountJ(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** merge walk over SORTED long arrays — the hashed-token fast path
    * (8-byte compares instead of UTF8String compares) */
  def sortedIntersectCountLongJ(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def shingleJaccardJ(a: UTF8String, b: UTF8String, n: Int): Double =
    shingleJaccard(if (a == null) null else a.toString,
      if (b == null) null else b.toString, n)

  /** Exact Jaccard between two docs' shingle sets (verification step).
    * Two EMPTY shingle sets score 0.0, not 1.0: texts shorter than the
    * shingle width carry no similarity evidence, and 1.0 would report
    * every pair of unrelated short docs as a perfect duplicate. */
  def shingleJaccard(a: String, b: String, n: Int): Double = {
    val sa = shingles(a, n).toSet
    val sb = shingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) return 0.0
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }
}

/** `char_shingles(text, n)` → array<string> of distinct n-grams. */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"
  override def nullSafeEval(v: Any): Any =
    TextHash.shinglesJ(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextHash.shinglesJ($s, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_sig(text)` → array<long> of k min-hashes over n-gram shingles. */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    TextHash.minhashJ(v.asInstanceOf[UTF8String], n, k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextHash.minhashJ($s, $n, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(text)` → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def nullSafeEval(v: Any): Any =
    TextHash.simhashJ(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextHash.simhashJ($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `shingle_jaccard(a, b)` — exact n-gram-shingle Jaccard between two
  * texts (the LSH verification step), as a native expression so the
  * candidate-pair pass stays codegen'd. */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_jaccard"
  override def nullSafeEval(l: Any, r: Any): Any =
    TextHash.shingleJaccardJ(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.shingleJaccardJ($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `sorted_intersect_count(a, b)` — intersection size of two SORTED
  * string arrays by a single merge walk: no per-pair hash set, no
  * result array. The pair-comparison kernel of set-similarity joins
  * (the sort is paid once per document, the walk once per pair). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> arguments, " +
          s"got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  }
  // dispatch on the element type once at plan time: long arrays (hashed
  // tokens) take the primitive walk, string arrays the UTF8 walk
  private lazy val isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    if (isLong)
      TextHash.sortedIntersectCountLongJ(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      TextHash.sortedIntersectCountJ(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                         ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val fn = if (isLong) "sortedIntersectCountLongJ" else "sortedIntersectCountJ"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object text {
  import org.apache.spark.sql.{Column, GraftBridge}
  private def e(c: Column) = GraftBridge.expression(c)
  def char_shingles(t: Column, n: Int): Column = GraftBridge.column(CharShingles(e(t), n))
  def minhash_sig(t: Column, n: Int = 5, k: Int = 32): Column = GraftBridge.column(MinHashSig(e(t), n, k))
  def simhash64(t: Column): Column = GraftBridge.column(SimHash64(e(t)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(e(a), e(b)))
  def shingle_jaccard(a: Column, b: Column, n: Int = 5): Column =
    GraftBridge.column(ShingleJaccard(e(a), e(b), n))
}
