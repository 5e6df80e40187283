package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded top-k buffer of (id, score) pairs. Keeps at most 2k entries
  * between compactions — O(n log k) overall, fixed memory, no full
  * sort of the scored stream. Ordering: best = (score better, then
  * lower id), matching `row_number() OVER (ORDER BY score [DESC|ASC],
  * id)` so results are deterministic and oracle-comparable.
  */
final class TopKBuffer(val k: Int, val asc: Boolean, val distinct: Boolean = false) {
  // capacity grows ×2 toward the 2k working bound instead of being
  // allocated eagerly: an aggregation holds ONE buffer per live group
  // key, and at a large-k call site (the 2048-entry seed budget) the
  // eager 2·k arrays cost ~64 KB per group BEFORE any row arrives —
  // 40k query groups per task = 2.6 GB of empty arrays, the measured
  // 1000×-decade OOM. Growth changes only allocation timing: compact
  // (and therefore the kept multiset) still happens exactly at the
  // 2k bound, so results are bit-identical.
  private val cap = math.max(4, 2 * k)
  var ids = new Array[Long](math.min(cap, 16))
  var scores = new Array[Double](math.min(cap, 16))
  var size = 0

  private def grow(): Unit = {
    val n = math.min(cap, ids.length * 2)
    ids = java.util.Arrays.copyOf(ids, n)
    scores = java.util.Arrays.copyOf(scores, n)
  }

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2

  def add(id: Long, score: Double): Unit = {
    // NaN scores carry no rank: better() is not a strict weak order
    // over NaN and the compact sort's contract would break — drop them
    if (score.isNaN) return
    // distinct mode: at most one slot per id. CONTRACT: duplicates of
    // an id carry an IDENTICAL score (the graph build's multi-band
    // pairs — same cosine expression over the same floats); with
    // differing scores the kept one would be arrival-order-dependent.
    // Scanning only the live buffer is exact under that contract: a
    // duplicate of an id evicted by compact() ranks identically to
    // its original, i.e. below the kept top-k of that moment, and the
    // kept set only ever improves — the re-added copy can never reach
    // the final top-k, so dropping-late-vs-keeping-early is
    // indistinguishable in the result.
    if (distinct) {
      var i = 0
      while (i < size) { if (ids(i) == id) return; i += 1 }
    }
    if (size == ids.length) {
      if (ids.length < cap) grow() else compact()
    }
    // after grow() capacity doubled; after compact() (only at the full
    // 2k bound) size == min(k, size) < cap — room either way
    ids(size) = id; scores(size) = score; size += 1
  }

  /** sort by goodness and trim to k */
  def compact(): Unit = {
    val idx = (0 until size).sortWith((a, b) =>
      better(scores(a), ids(a), scores(b), ids(b))).toArray
    val n = math.min(k, size)
    val nIds = new Array[Long](ids.length)
    val nScores = new Array[Double](scores.length)
    var i = 0
    while (i < n) { nIds(i) = ids(idx(i)); nScores(i) = scores(idx(i)); i += 1 }
    ids = nIds; scores = nScores; size = n
  }

  def mergeIn(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.ids(i), o.scores(i)); i += 1 }
  }

  /** final (id, score) rows, best first, exactly ≤ k */
  def result(): Array[(Long, Double)] = {
    compact()
    Array.tabulate(size)(i => (ids(i), scores(i)))
  }
}

/** `top_k_pairs(id, score, k, asc)` — aggregate returning the top-k
  * (id, score) structs per group. The Spark-shaped replacement for
  * `window row_number <= k` in per-query knn joins: partial buffers
  * combine map-side, so only k rows per partition per group ever
  * shuffle, and nothing is fully sorted.
  */
case class TopKPairs(idExpr: Expression, scoreExpr: Expression, k: Int, asc: Boolean,
                     distinct: Boolean = false,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, asc, distinct)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    // tolerate any numeric input type: ExpectsInputTypes is closed off
    // in Spark 4 (AbstractDataType is private[sql]), so coerce here
    // instead of ClassCastException-ing mid-query on an INT id column
    if (id != null && sc != null) {
      val idL = id match {
        case l: java.lang.Long => l.longValue
        case n: java.lang.Number => n.longValue
        case o => o.asInstanceOf[Long]
      }
      val scD = sc match {
        case d: java.lang.Double => d.doubleValue
        case n: java.lang.Number => n.doubleValue
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case o => o.asInstanceOf[Double]
      }
      buf.add(idL, scD)
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.result().map { case (id, sc) =>
      new GenericInternalRow(Array[Any](id, sc)): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    buf.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.ids(i)); out.writeDouble(buf.scores(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k, asc, distinct)
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  import org.apache.spark.sql.{Column, GraftBridge}
  /** Column API: `groupBy(q).agg(top_k_pairs($"id", $"score", 5))` */
  def top_k_pairs(id: Column, score: Column, k: Int, asc: Boolean = false): Column =
    GraftBridge.column(
      TopKPairs(GraftBridge.expression(id), GraftBridge.expression(score), k, asc)
        .toAggregateExpression())

  /** Distinct-by-id variant — `row_number() <= k` over a stream whose
    * duplicate ids carry identical scores (see [[TopKBuffer.add]]'s
    * contract), without the pair-sized exchange+sort the window
    * needs: partial buffers cap map-side, so only ≤ k rows per group
    * per partition ride the shuffle. */
  def top_k_pairs_distinct(id: Column, score: Column, k: Int, asc: Boolean = false): Column =
    GraftBridge.column(
      TopKPairs(GraftBridge.expression(id), GraftBridge.expression(score), k, asc,
        distinct = true)
        .toAggregateExpression())
}
