package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.{CosineSimilarity, DotProduct, FakeEmbedder, L2Distance, TextHash, TopKBuffer}

/** Property tests over the pure kernels — no SparkSession needed, the
  * expressions run interpreted over literal ArrayData. */
object KernelProperties extends Properties("graft.kernels") {

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toArray))

  private def lit(a: Array[Float]) =
    Literal.create(new GenericArrayData(a.map(_.asInstanceOf[Any])),
      ArrayType(FloatType))

  private def cos(a: Array[Float], b: Array[Float]): Double =
    CosineSimilarity(lit(a), lit(b)).eval(null).asInstanceOf[Double]
  private def l2(a: Array[Float], b: Array[Float]): Double =
    L2Distance(lit(a), lit(b)).eval(null).asInstanceOf[Double]
  private def dot(a: Array[Float], b: Array[Float]): Double =
    DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]

  property("cosine_sim_local is BIT-identical to the CosineSimilarity kernel") =
    forAll(vecGen, vecGen) { (a, b) =>
      // raw-bit equality, not epsilon: the driver-side walk steps score
      // with the local twin, and any divergence (even 1 ulp) could flip
      // a (sim DESC, id) ordering the oracle hash-checks
      java.lang.Double.doubleToRawLongBits(graft.functions.vectors.cosine_sim_local(a, b)) ==
        java.lang.Double.doubleToRawLongBits(cos(a, b))
    }

  property("cosine_sim_local twin holds on edge shapes (zero vec, length mismatch, NaN/Inf)") = {
    val edgeGen: Gen[Array[Float]] = Gen.oneOf(
      Gen.const(Array.fill(8)(0.0f)),
      Gen.choose(1, 8).map(n => Array.fill(n)(1.0f)),
      vecGen.map(v => { if (v.nonEmpty) v(0) = Float.NaN; v }),
      vecGen.map(v => { if (v.nonEmpty) v(v.length - 1) = Float.PositiveInfinity; v }))
    forAll(edgeGen, edgeGen) { (a, b) =>
      java.lang.Double.doubleToRawLongBits(graft.functions.vectors.cosine_sim_local(a, b)) ==
        java.lang.Double.doubleToRawLongBits(cos(a, b))
    }
  }

  property("cosine is within [-1,1] and symmetric") =
    forAll(vecGen, vecGen) { (a, b) =>
      val c = cos(a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 && c == cos(b, a)
    }

  property("cosine of a vector with itself is 1 (or 0 for zero vec)") =
    forAll(vecGen) { a =>
      val c = cos(a, a)
      val zero = a.forall(_ == 0.0f)
      if (zero) c == 0.0 else math.abs(c - 1.0) < 1e-9
    }

  property("l2 is non-negative, symmetric, zero on self") =
    forAll(vecGen, vecGen) { (a, b) =>
      l2(a, b) >= 0.0 && l2(a, b) == l2(b, a) && l2(a, a) == 0.0
    }

  property("dot is symmetric and matches manual sum") =
    forAll(vecGen) { a =>
      val manual = a.map(x => x.toDouble * x.toDouble).sum
      math.abs(dot(a, a) - manual) < 1e-6 * math.max(1.0, math.abs(manual))
    }

  property("shingles are distinct, length n, bounded in count") =
    forAll(Gen.alphaLowerStr, Gen.choose(2, 6)) { (s, n) =>
      val sh = TextHash.shingles(s, n)
      sh.toSet.size == sh.length &&
        sh.forall(_.length == n) &&
        sh.length <= math.max(0, s.length - n + 1)
    }

  property("minhash is deterministic and element-monotone under identity") =
    forAll(Gen.alphaLowerStr) { s =>
      TextHash.minhash(s, 5, 16).toSeq == TextHash.minhash(s, 5, 16).toSeq
    }

  property("simhash hamming distance is symmetric and zero on self") =
    forAll(Gen.alphaLowerStr, Gen.alphaLowerStr) { (a, b) =>
      val ha = TextHash.simhash(a); val hb = TextHash.simhash(b)
      java.lang.Long.bitCount(ha ^ hb) == java.lang.Long.bitCount(hb ^ ha) &&
        java.lang.Long.bitCount(ha ^ ha) == 0
    }

  property("embedder output is unit norm (or zero) and deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val e = FakeEmbedder.embed(s)
      val norm = math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
      e.length == FakeEmbedder.Dim &&
        (norm == 0.0 || math.abs(norm - 1.0) < 1e-5) &&
        e.toSeq == FakeEmbedder.embed(s).toSeq
    }

  private val pairsGen: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0.0, 1.0)))

  property("TopKBuffer equals sort-take-k reference") =
    forAll(pairsGen, Gen.choose(1, 10), Gen.oneOf(true, false)) { (xs, k, asc) =>
      val buf = new TopKBuffer(k, asc)
      xs.foreach { case (id, s) => buf.add(id, s) }
      val got = buf.result().toSeq
      val ref = xs.sortWith { case ((i1, s1), (i2, s2)) =>
        if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2
      }.take(k)
      got == ref
    }

  property("TopKBuffer merge equals single-buffer result") =
    forAll(pairsGen, pairsGen, Gen.choose(1, 8)) { (xs, ys, k) =>
      val one = new TopKBuffer(k, false)
      (xs ++ ys).foreach { case (id, s) => one.add(id, s) }
      val a = new TopKBuffer(k, false)
      xs.foreach { case (id, s) => a.add(id, s) }
      val b = new TopKBuffer(k, false)
      ys.foreach { case (id, s) => b.add(id, s) }
      a.mergeIn(b)
      a.result().toSeq == one.result().toSeq
    }

  // distinct mode: scores are a pure function of the id (the
  // identical-score-per-id contract TopKBuffer.add documents)
  private def idScore(id: Long): Double = ((id * 2654435761L) % 1000).toDouble / 1000.0

  property("TopKBuffer distinct equals dedup-sort-take-k under the per-id-score contract") =
    forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.choose(1, 8), Gen.oneOf(true, false)) {
      (ids, k, asc) =>
        val buf = new TopKBuffer(k, asc, distinct = true)
        ids.foreach(id => buf.add(id, idScore(id)))
        val ref = ids.distinct.map(id => (id, idScore(id))).sortWith {
          case ((i1, s1), (i2, s2)) =>
            if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2
        }.take(k)
        buf.result().toSeq == ref
    }

  property("TopKBuffer distinct merge equals single-buffer result") =
    forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.listOf(Gen.choose(0L, 30L)),
      Gen.choose(1, 8)) { (xs, ys, k) =>
      val one = new TopKBuffer(k, false, distinct = true)
      (xs ++ ys).foreach(id => one.add(id, idScore(id)))
      val a = new TopKBuffer(k, false, distinct = true)
      xs.foreach(id => a.add(id, idScore(id)))
      val b = new TopKBuffer(k, false, distinct = true)
      ys.foreach(id => b.add(id, idScore(id)))
      a.mergeIn(b)
      a.result().toSeq == one.result().toSeq
    }

  property("sorted-long intersect walk equals set intersection size") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      val aa = new GenericArrayData(a.toArray.sorted.map(_.asInstanceOf[Any]))
      val bb = new GenericArrayData(b.toArray.sorted.map(_.asInstanceOf[Any]))
      TextHash.sortedIntersectCountLongJ(aa, bb) == a.intersect(b).size
    }

  property("sorted-string intersect walk equals set intersection size") =
    forAll(Gen.listOf(Gen.alphaStr), Gen.listOf(Gen.alphaStr)) { (xs, ys) =>
      import org.apache.spark.unsafe.types.UTF8String
      val a = xs.toSet; val b = ys.toSet
      def arr(s: Set[String]) = new GenericArrayData(
        s.toArray.map(UTF8String.fromString).sortBy(identity[UTF8String])
          .map(_.asInstanceOf[Any]))
      TextHash.sortedIntersectCountJ(arr(a), arr(b)) == a.intersect(b).size
    }
}
