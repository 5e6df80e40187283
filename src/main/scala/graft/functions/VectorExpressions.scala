package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>`
  * columns — the Spark-side equivalent of pgvector's `<=>`, `<->`,
  * `<#>` operators (reference: tools.yaml:24-26, sql/05_vector_index
  * .sql:5 `vector_l2_ops`).
  *
  * Implemented with `doGenCode` so the scoring loop stays inside
  * whole-stage codegen: a tight primitive `for` over the two
  * `ArrayData`s, no boxing, no UDF serialization. At 100 TB this is
  * the hot path — every corpus row is scored once per query batch.
  */
abstract class VectorScoreExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def foldable: Boolean = left.foldable && right.foldable

  // These names are exposed to SQL (GraftExtensions / vectors.register)
  // where any argument type can arrive. ExpectsInputTypes is closed off
  // in Spark 4 (AbstractDataType is private[sql]), so validate here:
  // without this an array<double> literal would analysis-pass and the
  // kernel's getFloat would read garbage half-words.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  /** scalar kernel over primitive arrays (interpreted path) */
  protected def kernel(a: ArrayData, b: ArrayData): Double

  /** java source for the codegen'd kernel; `a`,`b` are ArrayData vars,
    * must assign the result to `ev` (a declared double). All kernel
    * locals must be prefixed with `p` — Janino forbids shadowing, so
    * raw names collide with whatever the enclosing stage declared. */
  protected def genKernel(a: String, b: String, ev: String, p: String): String

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("vecScore")
      val p = ctx.freshName("vk")
      s"""
         |double $res = 0.0;
         |${genKernel(a, b, res, p)}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** Cosine similarity (pgvector similarity = `1 - (a <=> b)`). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorScoreExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def genKernel(a: String, b: String, ev: String, p: String): String =
    s"""
       |int ${p}_n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double ${p}_dot = 0.0, ${p}_na = 0.0, ${p}_nb = 0.0;
       |for (int ${p}_i = 0; ${p}_i < ${p}_n; ${p}_i++) {
       |  double ${p}_x = (double) $a.getFloat(${p}_i);
       |  double ${p}_y = (double) $b.getFloat(${p}_i);
       |  ${p}_dot += ${p}_x * ${p}_y; ${p}_na += ${p}_x * ${p}_x; ${p}_nb += ${p}_y * ${p}_y;
       |}
       |double ${p}_denom = java.lang.Math.sqrt(${p}_na) * java.lang.Math.sqrt(${p}_nb);
       |$ev = ${p}_denom == 0.0 ? 0.0 : ${p}_dot / ${p}_denom;
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance — pgvector `<->` / `vector_l2_ops`. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorScoreExpression {
  override def prettyName: String = "l2_dist"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }
  override protected def genKernel(a: String, b: String, ev: String, p: String): String =
    s"""
       |int ${p}_n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double ${p}_s = 0.0;
       |for (int ${p}_i = 0; ${p}_i < ${p}_n; ${p}_i++) {
       |  double ${p}_d = (double) $a.getFloat(${p}_i) - (double) $b.getFloat(${p}_i);
       |  ${p}_s += ${p}_d * ${p}_d;
       |}
       |$ev = java.lang.Math.sqrt(${p}_s);
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product — pgvector `<#>` (negated there for index order;
  * here the raw dot product, larger = more similar). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorScoreExpression {
  override def prettyName: String = "dot_product"
  override protected def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def genKernel(a: String, b: String, ev: String, p: String): String =
    s"""
       |int ${p}_n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double ${p}_s = 0.0;
       |for (int ${p}_i = 0; ${p}_i < ${p}_n; ${p}_i++) {
       |  ${p}_s += (double) $a.getFloat(${p}_i) * (double) $b.getFloat(${p}_i);
       |}
       |$ev = ${p}_s;
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `quantize_vec(v)` — `array<float>` → `array<long>` of floor(x·10⁶):
  * the exact integer domain the index stack trains and assigns in
  * (see [[graft.operators.IvfIndex]]). A codegen'd primitive loop,
  * replacing the `transform(cast(...), floor(x·10⁶))` higher-order
  * form: HOFs are CodegenFallback in Spark, so the lambda ran
  * interpreted per row inside every index scan — this keeps the whole
  * stage compiled. Identical arithmetic: float → double widening,
  * one double multiply, floor, truncate to long. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_vec"
  override def nullSafeEval(v: Any): Any =
    QuantizeVec.quantizeJ(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.QuantizeVec.quantizeJ($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QuantizeVec {
  /** static, codegen-callable. Assumes non-null elements (embedding
    * arrays are written containsNull = false). */
  def quantizeJ(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * 1e6).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Index of the nearest centroid (squared-L2) — the IVF coarse
  * quantizer assignment (reference: sql/05_vector_index.sql ivfflat).
  * The centroid matrix rides along as a broadcast-sized reference
  * object, so assignment is map-only: no shuffle, no join.
  *
  * Operates on the INTEGER-QUANTIZED corpus (`array<long>`, see
  * [[graft.operators.IvfIndex.quantize]]) against centroids that are
  * exact-integer-sum / count divisions — every distance term is an
  * IEEE double computed from exactly-representable operands in a
  * fixed dim-ascending order, so the assignment is bit-reproducible
  * in any engine (the property the DuckDB oracle relies on).
  */
case class ClosestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "closest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    ClosestCentroid.nearest(a, centroids)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ClosestCentroid.nearestJ($a, $cRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Indices of the `nprobe` nearest centroids (squared-L2), best
  * first — the multi-probe assignment for IVF-accelerated joins. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override def nullSafeEval(v: Any): Any =
    ClosestCentroid.nearestN(v.asInstanceOf[ArrayData], centroids, nprobe)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ClosestCentroid.nearestN($a, $cRef, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ClosestCentroid {
  def nearest(a: ArrayData, cs: Array[Array[Double]]): Int = nearestJ(a, cs)

  /** static, codegen-callable: nprobe nearest list ids, best first */
  def nearestN(a: ArrayData, cs: Array[Array[Double]], nprobe: Int): ArrayData = {
    val dists = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val cen = cs(c)
      val n = math.min(a.numElements(), cen.length)
      var s = 0.0; var i = 0
      while (i < n) {
        val d = a.getLong(i).toDouble - cen(i)
        s += d * d; i += 1
      }
      dists(c) = s
      c += 1
    }
    val idx = dists.indices.sortBy(i => (dists(i), i)).take(math.min(nprobe, cs.length)).toArray
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(idx)
  }
  /** static, codegen-callable */
  def nearestJ(a: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val cen = cs(c)
      val n = math.min(a.numElements(), cen.length)
      var s = 0.0; var i = 0
      while (i < n) {
        val d = a.getLong(i).toDouble - cen(i)
        s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }
  /** static, codegen-callable: the VALUE of the assignment distance —
    * min squared-L2 over the centroids, same loop (and therefore the
    * same IEEE accumulation order) as [[nearestJ]]. */
  def nearestDistJ(a: ArrayData, cs: Array[Array[Double]]): Double = {
    var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val cen = cs(c)
      val n = math.min(a.numElements(), cen.length)
      var s = 0.0; var i = 0
      while (i < n) {
        val d = a.getLong(i).toDouble - cen(i)
        s += d * d; i += 1
      }
      if (s < bestD) bestD = s
      c += 1
    }
    bestD
  }
}

/** Squared-L2 distance to the nearest centroid — the assignment
  * distance itself (the value [[ClosestCentroid]] minimizes), used by
  * SemDeDup's keep/remove rule. Same quantized-int64 domain and
  * dim-ascending accumulation as assignment, so the oracle's unrolled
  * `distSql` chain reproduces it bit-for-bit. */
case class NearestCentroidDist(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid_dist"
  override def nullSafeEval(v: Any): Any =
    ClosestCentroid.nearestDistJ(v.asInstanceOf[ArrayData], centroids)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ClosestCentroid.nearestDistJ($a, $cRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
