package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge
import graft.Tables

/** Product quantization — the compressed-vector tier of a vector
  * store (public technique: Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011; the same family pgvector
  * exposes as `halfvec`/quantized IVFPQ variants).
  *
  * The 64-dim float corpus (256 B/vector) is encoded as `m` one-byte
  * codes (here 8 B/vector — 32×): each of the `m` subspaces gets its
  * own k-means codebook. Queries score the codes with an asymmetric
  * distance table (m × k doubles, computed once per query on the
  * driver) — a table lookup + add per subspace instead of a 64-wide
  * float loop. At 100 TB this is the difference between scanning
  * 100 TB and scanning 3 TB; the exact-rerank step then touches only
  * the top candidates' full vectors.
  *
  * Codebook training runs over the floor(x·10⁶) int64 quantization
  * with the same exactness contract as [[IvfIndex]]: integer update
  * sums, single-division centroids, fixed-order distance loops. The
  * fitted codebooks, the per-row codes, and the ADC candidate order
  * are therefore bit-reproducible — [[searchSummarySql]] replays the
  * whole pipeline in DuckDB.
  */
object PqIndex {

  /** codebooks(j)(c) = centroid c of subspace j (exact-int-sum / n
    * doubles in the quantized domain) */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
    def dsub: Int = codebooks(0)(0).length
  }

  /** distance table for a query: table(j)(c) = ‖qq_j − codebook(j)(c)‖²
    * over the quantized query, dsub-ascending accumulation */
  def distanceTable(model: Model, query: Array[Float]): Array[Array[Double]] = {
    val qq = IvfIndex.quantizeQuery(query)
    Array.tabulate(model.m) { j =>
      Array.tabulate(model.k) { c =>
        val cen = model.codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < cen.length) {
          val d = qq(j * model.dsub + i) - cen(i); s += d * d; i += 1
        }
        s
      }
    }
  }

  /** Fit per-subspace codebooks with deterministic Lloyd iterations.
    * One distributed pass per iteration covers ALL subspaces: encode →
    * posexplode (subspace, code, dim, x) → groupBy over exact int64
    * sums. */
  def fit(emb: DataFrame, vecCol: String, idCol: String,
          m: Int = 8, k: Int = 16, iters: Int = 4): Model = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    fitQuantized(
      emb.select(col(idCol).as("id"), IvfIndex.quantize(col(vecCol)).as("q")),
      dim, m, k, iters)
  }

  /** Same Lloyd loop over an already-quantized `(id, q: array<long>)`
    * frame — the entry point [[IvfPqResidual]] uses to train on
    * residuals (q − floor(coarse centroid)), which stay exact int64. */
  def fitQuantized(qemb: DataFrame, dim: Int,
                   m: Int, k: Int, iters: Int): Model = {
    val spark = qemb.sparkSession
    import spark.implicits._
    val dsub = dim / m
    // init: subspace slices of the first k vectors by id; a corpus
    // smaller than k simply yields fewer codes per subspace (the same
    // graceful degradation IvfIndex.fit has)
    val init = qemb.orderBy(col("id")).limit(k)
      .select(col("q")).as[Array[Long]].collect()
    val k2 = math.min(k, init.length)
    require(k2 > 0, "PqIndex.fit: empty corpus")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      Array.tabulate(k2)(c =>
        init(c).slice(j * dsub, (j + 1) * dsub).map(_.toDouble)))

    for (_ <- 1 to iters) {
      val enc = encodeQuantized(col("q"), Model(books))
      val sums = qemb.select(posexplode(enc).as(Seq("j", "code")),
          col("q"))
        .select(col("j"), col("code"),
          posexplode(slice(col("q"), col("j") * dsub + 1, lit(dsub))).as(Seq("dim", "x")))
        .groupBy(col("j"), col("code"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      // empty codes keep their previous centroid (oracle: COALESCE)
      val next = books.map(_.map(_.clone()))
      sums.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case ((j, c), rows) =>
        val cen = new Array[Double](dsub)
        rows.foreach(r => cen(r.getInt(2)) = r.getLong(3).toDouble / r.getLong(4))
        next(j)(c) = cen
      }
      books = next
    }
    Model(books)
  }

  private def encodeQuantized(q: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(q), model.codebooks))

  def encodeColumn(vec: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column =
    encodeQuantized(IvfIndex.quantize(vec), model)

  def adcColumn(codes: org.apache.spark.sql.Column, table: Array[Array[Double]]): org.apache.spark.sql.Column =
    GraftBridge.column(PqAdcDistance(GraftBridge.expression(codes), table))

  /** ADC search with exact rerank: approximate distances over the
    * 8-byte codes select `rerank × topK` candidates; their full
    * vectors get exact L2 for the final order. */
  def search(emb: DataFrame, vecCol: String, idCol: String, model: Model,
             query: Array[Float], topK: Int, rerank: Int = 4): DataFrame = {
    val table = distanceTable(model, query)
    val candidates = emb
      .select(col(idCol), col(vecCol),
        adcColumn(encodeColumn(col(vecCol), model), table).as("adc"))
      .orderBy(col("adc").asc_nulls_last, col(idCol).asc)
      .limit(topK * rerank)
    candidates
      .select(col(idCol),
        round(graft.functions.vectors.l2_dist(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }

  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Model]
  // a rewrite of the source dir must drop codebooks fit on the old data
  graft.Tables.onInvalidate(p =>
    pqCache.filterInPlace((k, _) => !k._1.startsWith(p) && !p.startsWith(k._1)))

  def fitCached(spark: SparkSession, d: String, m: Int = 8, k: Int = 16): Model =
    pqCache.getOrElseUpdate((d, m, k),
      fit(Tables.embeddings(spark, d), "embedding", "vec_id", m, k))

  // Encode ONCE, query many: without this every search re-quantizes
  // the whole corpus (m·k·dsub float ops per row per query), defeating
  // the compressed-scan point. The persisted equivalent is IvfPqStore.
  private val codesCache = new graft.SessionCache[(String, Int, Int), DataFrame](
    8, org.apache.spark.sql.GraftBridge.unpersistPlanRdds)
  // a rewrite of the source dir releases stale checkpointed codes
  graft.Tables.onInvalidate(p =>
    codesCache.invalidate(k => k._1.startsWith(p) || p.startsWith(k._1)))

  def searchSummary(spark: SparkSession, d: String, queryText: String,
                    topK: Int = 10): DataFrame = {
    val model = fitCached(spark, d)
    val codes = codesCache.getOrElseUpdate(spark, (d, model.m, model.k)) {
      Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"),
          encodeColumn(col("embedding"), model).as("codes"))
        .localCheckpoint(true)
    }
    searchEncoded(codes, "codes", "embedding", "vec_id", model,
      graft.functions.FakeEmbedder.embed(queryText), topK)
  }

  /** ADC search over a pre-encoded frame (codes + full vectors). */
  def searchEncoded(encoded: DataFrame, codesCol: String, vecCol: String,
                    idCol: String, model: Model, query: Array[Float],
                    topK: Int, rerank: Int = 4): DataFrame = {
    val table = distanceTable(model, query)
    val candidates = encoded
      .select(col(idCol), col(vecCol),
        adcColumn(col(codesCol), table).as("adc"))
      .orderBy(col("adc").asc_nulls_last, col(idCol).asc)
      .limit(topK * rerank)
    candidates
      .select(col(idCol),
        round(graft.functions.vectors.l2_dist(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }

  /** CTE chain for PQ training + final encode over a source CTE
    * `$src(vec_id, q)` of int64 vectors: `${p}qs` (subspace slices),
    * `${p}cb0 … ${p}cb$iters` (Lloyd codebooks), `${p}af` (per-row
    * per-subspace nearest-code assignment). The `p` prefix keeps the
    * names disjoint when composed with [[IvfIndex.fitCtes]]'s CTEs
    * (which also emit a/u/cn stages) in [[IvfPqResidual]]'s oracle. */
  private[graft] def pqFitCtes(src: String, m: Int, k: Int, iters: Int,
                               dim: Int, p: String = ""): String = {
    val dsub = dim / m
    // squared L2 between sub (BIGINT list) and cb list `c`, unrolled
    def subDist(sub: String, c: String): String =
      (1 to dsub).map { i =>
        s"(CAST($sub[$i] AS DOUBLE)-$c[$i])*(CAST($sub[$i] AS DOUBLE)-$c[$i])"
      }.mkString(" + ")
    val iterCtes = (1 to iters).map { i =>
      s"""${p}a$i AS MATERIALIZED (
         |  SELECT vec_id, j, sub, code FROM (
         |    SELECT t.vec_id, t.j, t.sub, c.code,
         |      row_number() OVER (PARTITION BY t.vec_id, t.j
         |        ORDER BY ${subDist("t.sub", "c.c")}, c.code) AS rn
         |    FROM ${p}qs t JOIN ${p}cb${i - 1} c USING (j)) WHERE rn = 1),
         |${p}u$i AS MATERIALIZED (
         |  SELECT a.j, a.code, d.i AS dim, SUM(a.sub[d.i + 1]) AS s, COUNT(*) AS n
         |  FROM ${p}a$i a CROSS JOIN (SELECT unnest(range($dsub)) AS i) d
         |  GROUP BY 1, 2, 3),
         |${p}cn$i AS MATERIALIZED (
         |  SELECT j, code, list(CAST(s AS DOUBLE) / n ORDER BY dim) AS c
         |  FROM ${p}u$i GROUP BY j, code),
         |${p}cb$i AS MATERIALIZED (
         |  SELECT p.j, p.code, COALESCE(n.c, p.c) AS c
         |  FROM ${p}cb${i - 1} p LEFT JOIN ${p}cn$i n USING (j, code))""".stripMargin
    }.mkString(",\n")
    s"""${p}qs AS MATERIALIZED (
       |  SELECT vec_id, d.j AS j, list_slice(q, d.j * $dsub + 1, (d.j + 1) * $dsub) AS sub
       |  FROM $src CROSS JOIN (SELECT unnest(range($m)) AS j) d),
       |${p}cb0 AS MATERIALIZED (
       |  SELECT j, CAST(row_number() OVER (PARTITION BY j ORDER BY vec_id) AS INTEGER) - 1 AS code,
       |         list_transform(sub, x -> CAST(x AS DOUBLE)) AS c
       |  FROM (SELECT vec_id, j, sub FROM ${p}qs
       |        WHERE vec_id IN (SELECT vec_id FROM $src ORDER BY vec_id LIMIT $k))),
       |$iterCtes,
       |${p}af AS MATERIALIZED (
       |  SELECT vec_id, j, code FROM (
       |    SELECT t.vec_id, t.j, c.code,
       |      row_number() OVER (PARTITION BY t.vec_id, t.j
       |        ORDER BY ${subDist("t.sub", "c.c")}, c.code) AS rn
       |    FROM ${p}qs t JOIN ${p}cb$iters c USING (j)) WHERE rn = 1)""".stripMargin
  }

  /** DuckDB twin of [[searchSummary]]: replays codebook training
    * (per-(j, code) materialized Lloyd CTEs), encoding, the ADC
    * candidate cut and the exact rerank. The per-subspace distance
    * unrolls dsub-ascending; the per-row ADC sum unrolls j-ascending
    * over a `list(... ORDER BY j)` — both matching the kernels'
    * accumulation order exactly. */
  def searchSummarySql(query: Array[Float], m: Int = 8, k: Int = 16,
                       iters: Int = 4, topK: Int = 10, rerank: Int = 4,
                       dim: Int = 64): String = {
    val dsub = dim / m
    val qq = IvfIndex.quantizeQuery(query)
    val qVec = query.map(f => f.toDouble.toString).mkString("[", ", ", "]")
    val qqLit = qq.map(_.toString).mkString("[", ",", "]")
    // squared L2 between the literal quantized query's subspace j and `c`
    def queryDist(c: String): String =
      (1 to dsub).map { i =>
        s"(qq.ql[a.j * $dsub + $i]-$c[$i])*(qq.ql[a.j * $dsub + $i]-$c[$i])"
      }.mkString(" + ")
    s"""WITH qt AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x * ${IvfIndex.Scale}) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |${pqFitCtes("qt", m, k, iters, dim)},
       |qlit AS MATERIALIZED (SELECT CAST($qqLit AS DOUBLE[]) AS ql),
       |adcterms AS MATERIALIZED (
       |  SELECT a.vec_id, a.j, ${queryDist("c.c")} AS term
       |  FROM af a JOIN cb$iters c ON a.j = c.j AND a.code = c.code
       |  CROSS JOIN qlit qq),
       |cand AS MATERIALIZED (
       |  SELECT vec_id FROM (
       |    SELECT vec_id, ${(1 to m).map(j => s"al[$j]").mkString(" + ")} AS adc
       |    FROM (SELECT vec_id, list(term ORDER BY j) AS al FROM adcterms GROUP BY vec_id))
       |  ORDER BY adc ASC, vec_id LIMIT ${topK * rerank})
       |SELECT e.vec_id,
       |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST($qVec AS DOUBLE[])), 6) AS score
       |FROM cand JOIN embeddings e USING (vec_id)
       |ORDER BY score ASC, vec_id LIMIT $topK""".stripMargin
  }
}

/** `pq_encode(q)` → array<int> of per-subspace nearest-codeword ids
  * over the int64-quantized vector (fixed-order double accumulation
  * from exact operands — see [[PqIndex]] object doc). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(v: Any): Any =
    PqEncode.encodeJ(v.asInstanceOf[ArrayData], codebooks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, s => s"graft.operators.PqEncode.encodeJ($s, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncode {
  def encodeJ(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val d = vec.getLong(j * dsub + i).toDouble - cen(i); s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }
}

/** `pq_adc(codes)` → approximate squared distance via table lookups. */
case class PqAdcDistance(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(v: Any): Any =
    PqAdcDistance.adcJ(v.asInstanceOf[ArrayData], table)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", table, "double[][]")
    defineCodeGen(ctx, ev, s => s"graft.operators.PqAdcDistance.adcJ($s, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqAdcDistance {
  def adcJ(codes: ArrayData, table: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    while (j < table.length) { s += table(j)(codes.getInt(j)); j += 1 }
    s
  }
}
