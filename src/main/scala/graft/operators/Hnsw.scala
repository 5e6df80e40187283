package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.vectors

/** Hierarchical navigable graph search (HNSW, Malkov & Yashunin
  * TPAMI'18 — public), batch-built and deterministic so the whole
  * index + search replays in the DuckDB oracle.
  *
  * The hierarchy (reference role: the pgvector index of
  * sql/05_vector_index.sql, upgraded from IVF to a graph family):
  *  - **Levels** are assigned by a data-independent hash, exactly as
  *    the paper's geometric distribution but derandomized: level(v) =
  *    number of leading lowercase-hex digits of md5(vec_id) below
  *    '4' (p = 1/4 per level), capped at [[MaxLevel]]. md5 is the one
  *    hash both engines spell identically (the t6/t11 idiom), so the
  *    layer membership — and with it every edge — is oracle-exact.
  *  - **Upper-layer edges** (l ≥ 1): the v18 banded build restricted
  *    to level-l members — SRP band collisions among members, exact
  *    cosine, top-[[LevelK]] per source. Membership thins 4× per
  *    level, so each build is a strictly smaller instance of the
  *    already-sub-quadratic banded job (never all-pairs).
  *  - **Layer 0** is the full v18 graph the other serve paths share
  *    ([[SrpBanded.materializedGraph]] — same cached edges as v19).
  *
  * Search = the paper's coarse-to-fine walk: enter at the smallest
  * vec_id on the highest occupied layer, beam-descend each upper
  * layer (state = top-[[DescentBeam]] of state ∪ neighbors, at most
  * [[MaxSteps]] moves per layer — the paper's ef > 1 applied on
  * every layer), then run the SHARED beam tail over layer 0 seeded
  * with the walk's visited path. Unlike v19's LSH probe, seeding
  * needs no bucket reads at all — the entry is navigated, not
  * hashed; the probed-bucket scan disappears from the serve path
  * entirely.
  *
  * Scale shape: the walk state is one node (driver-side, the same
  * bounded-state license [[SrpBanded.graphSearchFrom]] documents);
  * each step reads ONE source's ≤ [[LevelK]] edge rows — against a
  * persisted src-partitioned edge table (EdgeStore layout) that is a
  * partition-pruned point read, paid at most 3·[[MaxSteps]] times.
  * Layer graphs are built once per corpus and cached
  * (localCheckpoint), like every other served artifact here.
  */
object Hnsw {

  /** upper layers 1..MaxLevel; membership p = 4^-l */
  val MaxLevel = 3
  /** out-degree per node on upper layers */
  val LevelK = 4
  /** beam moves per layer before handing down (converged walks
    * stay put, so the cap only bounds pathological chains) */
  val MaxSteps = 6
  /** walk width on the upper layers (the paper's ef > 1, applied to
    * every layer): the state is the top-DescentBeam frontier, not a
    * single node. Single-node greedy on a low-similarity corpus walks
    * into a local optimum the layer-0 beam can't escape — measured
    * recall@10 on the spec query: 0.0 at width 1, 0.1 at 4, 0.8 at 16
    * (the two misses are ranks 8 and 10 at Δcos < 0.01; the exact
    * top-8, including the top-1, are all found). */
  val DescentBeam = 16

  /** level(vec_id): leading md5 hex digits < '4', capped at MaxLevel.
    * Lowercase-hex md5 of the DECIMAL id string in both engines. */
  private[graft] def levelCol(id: Column): Column = {
    val h = md5(id.cast("string"))
    when(substring(h, 1, 1) >= "4", 0)
      .otherwise(when(substring(h, 2, 1) >= "4", 1)
        .otherwise(when(substring(h, 3, 1) >= "4", 2).otherwise(3)))
  }

  private def cleanEmb(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === SrpBanded.Dim)
      .select(col("vec_id"), col("embedding"))

  // layer graphs are the expensive part — one build per (dir, layer)
  private val layerCache = new graft.SessionCache[(String, Int, Int), DataFrame](
    8, org.apache.spark.sql.GraftBridge.unpersistPlanRdds)
  graft.Tables.onInvalidate { p =>
    layerCache.invalidate(k => k._1.startsWith(p) || p.startsWith(k._1))
  }

  /** The level-l (l ≥ 1) navigation graph: v18's banded build over
    * the members of that layer. Edges carry (src, dst) only. */
  private[graft] def layerGraph(spark: SparkSession, d: String, l: Int,
                                levelK: Int = LevelK): DataFrame =
    layerCache.getOrElseUpdate(spark, (d, l, levelK)) {
      val members = cleanEmb(spark, d).filter(levelCol(col("vec_id")) >= l)
      SrpBanded.knnGraphFromBanded(spark, d, SrpBanded.bandedOf(members), levelK)
        .select(col("src"), col("dst")).localCheckpoint(true)
    }

  /** The coarse-to-fine walk alone: enter at the top layer, beam-
    * descend every upper layer, return the visited path as a scored
    * pool (the seed the layer-0 tail consumes). `edgesFor(l,
    * frontier)` supplies the frontier's layer-l out-edges — the
    * in-memory layer graphs here, partition-pruned store reads in
    * [[graft.sources.HnswStore]]; same rows either way, so the two
    * serve paths share one walk (and one oracle). */
  private[graft] def descentPoolBy(spark: SparkSession, d: String,
      queryVec: Array[Float], edgesFor: (Int, Seq[Long]) => DataFrame,
      descentBeam: Int = DescentBeam, maxSteps: Int = MaxSteps): DataFrame = {
    import spark.implicits._
    val emb = cleanEmb(spark, d)
    val q = typedLit(queryVec)

    // entry point: min id on the highest occupied layer — one tiny agg
    val e = emb.agg(
      min(when(levelCol(col("vec_id")) >= 3, col("vec_id"))).as("e3"),
      min(when(levelCol(col("vec_id")) >= 2, col("vec_id"))).as("e2"),
      min(when(levelCol(col("vec_id")) >= 1, col("vec_id"))).as("e1"),
      min(col("vec_id")).as("e0")).collect()(0)
    val entry = (0 to 3).map(i => Option(e.get(i)).map(_.asInstanceOf[Long]))
      .collectFirst { case Some(id) => id }.get
    val entrySim = emb.filter(col("vec_id") === entry)
      .select(vectors.cosine_sim(col("embedding"), q)).as[Double].head()

    // the same NaN-greatest / id-asc total order the beam serve uses
    def better(aSim: Double, aId: Long, bSim: Double, bId: Long): Boolean = {
      val c =
        if (aSim.isNaN && bSim.isNaN) 0
        else if (aSim.isNaN) 1
        else if (bSim.isNaN) -1
        else if (aSim > bSim) 1 else if (aSim < bSim) -1 else 0
      if (c != 0) c > 0 else aId < bId
    }

    // beam descent: the state is the top-DescentBeam frontier; each
    // step reads ≤ DescentBeam sources' ≤ LevelK edge rows (point
    // reads against a src-partitioned edge table at scale) and keeps
    // the top-DescentBeam of state ∪ neighbors — monotone, so a
    // converged step is the identity and early exit is sound
    var state: Seq[(Long, Double)] = Seq((entry, entrySim))
    val path = scala.collection.mutable.LinkedHashMap(entry -> entrySim)
    for (l <- MaxLevel to 1 by -1) {
      var converged = false
      var step = 0
      while (!converged && step < maxSteps) {
        step += 1
        val nb = edgesFor(l, state.map(_._1))
          .join(emb, col("dst") === emb("vec_id"))
          .select(col("dst").as("vec_id"),
            vectors.cosine_sim(col("embedding"), q).as("sim"))
          .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
        val merged = (state ++ nb).groupBy(_._1).map(_._2.head).toSeq
          .sortWith { case ((ida, sa), (idb, sb)) => better(sa, ida, sb, idb) }
          .take(descentBeam)
        converged = merged.map(_._1) == state.map(_._1)
        state = merged
        state.foreach { case (id, s) => path.update(id, s) }
      }
    }

    path.toSeq.toDF("vec_id", "sim")
  }

  /** [[descentPoolBy]] over the in-memory (cached) layer graphs. */
  private[graft] def descentPool(spark: SparkSession, d: String,
      queryVec: Array[Float], descentBeam: Int = DescentBeam,
      maxSteps: Int = MaxSteps): DataFrame =
    descentPoolBy(spark, d, queryVec,
      (l, frontier) => layerGraph(spark, d, l)
        .filter(col("src").isin(frontier: _*)),
      descentBeam, maxSteps)

  /** v31: hierarchical search — descent seeds, then the shared
    * layer-0 beam tail. Same output contract as v19/v25:
    * (vec_id, rk, sim) top-k. */
  def search(spark: SparkSession, d: String, queryVec: Array[Float],
             k: Int = 10, beam: Int = 16, iters: Int = 3,
             maxEntries: Int = 64, graphK: Int = 5,
             refined: Boolean = false,
             descentBeam: Int = DescentBeam, maxSteps: Int = MaxSteps): DataFrame = {
    val pool = descentPool(spark, d, queryVec, descentBeam, maxSteps)
    val g0 = if (refined)
      Some(SrpBanded.materializedRefinedGraph(spark, d, graphK)) else None
    SrpBanded.graphSearchFrom(spark, d, pool, queryVec,
      k, beam, iters, maxEntries, graphK, graphOverride = g0)
  }

  // ---------------------------------------------------------------
  // DuckDB twin
  // ---------------------------------------------------------------

  private def lvlSql: String =
    s"""lvl AS MATERIALIZED (
       |  SELECT vec_id,
       |    CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) >= '4' THEN 0
       |         WHEN substring(md5(CAST(vec_id AS VARCHAR)), 2, 1) >= '4' THEN 1
       |         WHEN substring(md5(CAST(vec_id AS VARCHAR)), 3, 1) >= '4' THEN 2
       |         ELSE 3 END AS lvl
       |  FROM qt)""".stripMargin

  // MATERIALIZED throughout: the descent chains ~20 CTEs deep, and
  // DuckDB INLINES plain CTEs per reference — without pinning these,
  // the layer builds re-evaluate inside every unrolled step and the
  // oracle runs minutes instead of seconds (measured >120 s → 34 s)
  private def layerGraphSql(l: Int, levelK: Int): String =
    s"""hb$l AS MATERIALIZED (SELECT b.vec_id, b.band, b.bk FROM bands b JOIN lvl v USING (vec_id) WHERE v.lvl >= $l),
       |hc$l AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM hb$l a JOIN hb$l b ON a.band = b.band AND a.bk = b.bk AND a.vec_id <> b.vec_id),
       |hs$l AS MATERIALIZED (
       |  SELECT c.src, c.dst, list_cosine_similarity(s.v, t.v) AS sim
       |  FROM hc$l c JOIN e s ON c.src = s.vec_id JOIN e t ON c.dst = t.vec_id),
       |hg$l AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rk
       |    FROM hs$l) WHERE rk <= $levelK)""".stripMargin

  /** One beam-descent move on layer `l`: new state = top-DescentBeam
    * of state ∪ state's layer-l neighbors, by (sim DESC, id ASC).
    * Monotone — a converged step reproduces its input, so the fixed
    * unroll matches the Scala path's early exit. */
  private def stepSql(prev: String, out: String, l: Int): String =
    s"""${out}n AS MATERIALIZED (
       |  SELECT qs.vec_id, qs.sim
       |  FROM $prev p JOIN hg$l g ON g.src = p.vec_id
       |  JOIN qscore qs ON qs.vec_id = g.dst),
       |$out AS MATERIALIZED (
       |  SELECT vec_id, sim FROM (
       |    SELECT DISTINCT vec_id, sim FROM (
       |      SELECT * FROM $prev UNION ALL SELECT * FROM ${out}n))
       |  ORDER BY sim DESC, vec_id LIMIT $DescentBeam)""".stripMargin

  /** v31 oracle: shared bands + v18 graph + qscore CTEs, the replayed
    * layer assignment/edges, the unrolled greedy walk (MaxSteps per
    * layer), and the shared beam tail seeded by the walk's path. */
  def searchSql(queryVecSql: String, k: Int = 10, beam: Int = 16,
                iters: Int = 3, maxEntries: Int = 64, graphK: Int = 5,
                levelK: Int = LevelK): String = {
    val layers = (1 to MaxLevel).map(layerGraphSql(_, levelK)).mkString(",\n")
    val stepNames = scala.collection.mutable.ArrayBuffer("s0")
    val steps = (MaxLevel to 1 by -1).flatMap { l =>
      (1 to MaxSteps).map { i =>
        val prev = stepNames.last
        val out = s"ds${l}_$i"
        stepNames += out
        stepSql(prev, out, l)
      }
    }.mkString(",\n")
    val pathUnion = stepNames.map(n => s"SELECT vec_id FROM $n").mkString(" UNION ALL ")
    s"""WITH ${SrpBanded.srpBandsCtes},
       |${SrpBanded.rawGraphCtes(graphK)},
       |${SrpBanded.qscoreSql(queryVecSql)},
       |$lvlSql,
       |$layers,
       |entry AS (SELECT COALESCE(
       |  (SELECT min(vec_id) FROM lvl WHERE lvl >= 3),
       |  (SELECT min(vec_id) FROM lvl WHERE lvl >= 2),
       |  (SELECT min(vec_id) FROM lvl WHERE lvl >= 1),
       |  (SELECT min(vec_id) FROM qt)) AS node),
       |s0 AS (SELECT en.node AS vec_id, qs.sim FROM entry en JOIN qscore qs ON qs.vec_id = en.node),
       |$steps,
       |dpool AS (SELECT DISTINCT vec_id FROM ($pathUnion)),
       |f0s AS (
       |  SELECT p.vec_id, qs.sim FROM dpool p JOIN qscore qs USING (vec_id)
       |  ORDER BY sim DESC, vec_id LIMIT $maxEntries),
       |f0 AS (SELECT vec_id FROM f0s),
       |${SrpBanded.beamHopsSql(k, beam, iters, "graph")}""".stripMargin
  }
}
