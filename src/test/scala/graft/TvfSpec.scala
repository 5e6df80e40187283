package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FakeEmbedder

/** SQL table-valued-function surface over the persisted stores: a
  * pure-SQL session must serve the same rows as the Scala calls —
  * the builders ARE the Scala calls, spliced in at analysis time. */
class TvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  val queryText = "fast vector search over spark tables"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("stored serves through pure SQL equal the Scala calls") {
    graft.functions.tvf.register(spark)
    val q = FakeEmbedder.embed(queryText)

    val hnswDir = graft.sources.HnswStore.storeFor(spark, sf)
    assert(rows(spark.sql(
      s"SELECT * FROM graft_hnsw_search('$hnswDir', '$queryText', 10)")) ==
      rows(graft.sources.HnswStore.search(spark, hnswDir, q, 10)),
      "graft_hnsw_search diverged from HnswStore.search")

    val srpDir = graft.sources.SrpStore.storeFor(spark, sf)
    val edgeDir = graft.sources.EdgeStore.refinedStoreFor(spark, sf)
    assert(rows(spark.sql(
      s"SELECT * FROM graft_graph_search('$srpDir', '$edgeDir', '$queryText', 10)")) ==
      rows(graft.sources.SrpStore.graphSearchCold(spark, srpDir, edgeDir, q, k = 10)),
      "graft_graph_search diverged from SrpStore.graphSearchCold")

    val codeDir = graft.sources.CodeStore.storeFor(spark, sf)
    assert(rows(spark.sql(
      s"SELECT * FROM graft_code_search('$codeDir', '$queryText', 10)")) ==
      rows(graft.sources.CodeStore.search(spark, codeDir, q, k = 10)),
      "graft_code_search diverged from CodeStore.search")

    graft.sources.FilteredServe.ensureMeta(spark, sf, srpDir)
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_filtered_search('$sf', '$srpDir', '$edgeDir',
         |'$queryText', 10, 'lang', 'de', 'source', 'src11')""".stripMargin)) ==
      rows(graft.sources.FilteredServe.searchFiltered(spark, sf, srpDir, edgeDir,
        q, Seq("lang" -> "de", "source" -> "src11"), k = 10)),
      "graft_filtered_search diverged from FilteredServe.searchFiltered")

    // the COMPLETE filtered matrix through pure SQL (r13): the three
    // remaining families' filtered serves, each held to its Scala call.
    // Predicates span all three planner tiers: selective (exact),
    // mid-selectivity (code tier — 'lang=en' is past the spec's forced
    // exactScanMax=0 but here it rides the default planner, so it's
    // exact; the tier dispatch itself is FilteredSearchSpec's job) —
    // what this test pins is SQL-vs-Scala row identity per family.
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_code_filtered_search('$codeDir', '$srpDir',
         |'$queryText', 10, 'lang', 'en')""".stripMargin)) ==
      rows(graft.sources.CodeStore.searchFiltered(spark, codeDir, srpDir,
        q, Seq("lang" -> "en"), k = 10)),
      "graft_code_filtered_search diverged from CodeStore.searchFiltered")

    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_hnsw_filtered_search('$hnswDir', '$srpDir',
         |'$queryText', 10, 'lang', 'de', 'source', 'src11')""".stripMargin)) ==
      rows(graft.sources.HnswStore.searchFiltered(spark, hnswDir, srpDir,
        q, Seq("lang" -> "de", "source" -> "src11"), k = 10)),
      "graft_hnsw_filtered_search diverged from HnswStore.searchFiltered")

    val pqDir = graft.sources.IvfPqStore.residualStoreFor(spark, sf)
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_ivfpq_filtered_search('$pqDir', '$srpDir', '$sf',
         |'$queryText', 10, 'lang', 'fr')""".stripMargin)) ==
      rows(graft.sources.IvfPqStore.searchFilteredResidual(spark, pqDir, srpDir,
        Tables.embeddings(spark, sf), "embedding", "vec_id",
        q, Seq("lang" -> "fr"), k = 10)),
      "graft_ivfpq_filtered_search diverged from IvfPqStore.searchFilteredResidual")

    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_meta_filtered_search('$srpDir',
         |'$queryText', 10, 'lang', 'de', 'source', 'src11')""".stripMargin)) ==
      rows(graft.sources.FilteredServe.searchFilteredMeta(spark, srpDir,
        q, Seq("lang" -> "de", "source" -> "src11"), k = 10)),
      "graft_meta_filtered_search diverged from FilteredServe.searchFilteredMeta")

    // the TVF result composes like any table: outer SQL filters/projects
    val filtered = spark.sql(
      s"""SELECT vec_id FROM graft_hnsw_search('$hnswDir', '$queryText', 10)
         |WHERE rk <= 3 ORDER BY rk""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(filtered ==
      rows(graft.sources.HnswStore.search(spark, hnswDir, q, 10))
        .take(3).map(_.head))
  }

  test("typed range predicates through pure SQL: col,op,val triples equal the Scala terms API") {
    import graft.sources.MetaTerm
    graft.functions.tvf.register(spark)
    val q = FakeEmbedder.embed(queryText)
    // the reference-schema store: country partition-class, num_claims
    // range-class (sql/02_schema.sql's filterable columns) — the first
    // SQL user of v43's capability no longer falls back to Scala
    val refMeta = graft.sources.FilteredServe.refMetaStoreFor(spark, sf)
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_meta_filtered_search('$refMeta', '$queryText',
         |10, 'country', 'EN', 'num_claims', '>=', '22')""".stripMargin)) ==
      rows(graft.sources.FilteredServe.searchFilteredMetaTerms(spark, refMeta,
        q, Seq(MetaTerm.Eq("country", "EN"),
          MetaTerm.Cmp("num_claims", ">=", "22")), k = 10)),
      "SQL range predicate diverged from searchFilteredMetaTerms (v43)")
    // mixed pair + triple spellings in ONE statement, on the stored
    // graph family too (all four family TVFs share termsOf)
    val srpDir = graft.sources.SrpStore.storeFor(spark, sf)
    val edgeDir = graft.sources.EdgeStore.refinedStoreFor(spark, sf)
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_filtered_search('$sf', '$srpDir', '$edgeDir',
         |'$queryText', 10, 'lang', '!=', 'en', 'source', 'src11')""".stripMargin)) ==
      rows(graft.sources.FilteredServe.searchFilteredTerms(spark, sf, srpDir,
        edgeDir, q, Seq(MetaTerm.Cmp("lang", "!=", "en"),
          MetaTerm.Eq("source", "src11")), k = 10)),
      "graft_filtered_search with a typed term diverged from the Scala call")
    // explicit '=' binds as the TYPED comparison (range-class legal)
    assert(rows(spark.sql(
      s"""SELECT vec_id, rk, sim FROM graft_meta_filtered_search('$refMeta', '$queryText',
         |5, 'num_claims', '=', '22')""".stripMargin)) ==
      rows(graft.sources.FilteredServe.searchFilteredMetaTerms(spark, refMeta,
        q, Seq(MetaTerm.Cmp("num_claims", "=", "22")), k = 5)),
      "SQL '=' triple diverged from the typed-equality Scala call")
    // malformed trailing predicate fails analysis loudly
    val e = intercept[Exception] {
      spark.sql(s"""SELECT vec_id, rk, sim FROM graft_meta_filtered_search('$refMeta',
        |'$queryText', 5, 'num_claims', '>=')""".stripMargin).collect()
    }
    assert(e.getMessage.contains("no value"),
      s"malformed triple not refused: ${e.getMessage.take(200)}")
  }

  test("dedup-check TVF equals the one-document incremental serve") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    graft.functions.tvf.register(spark)
    val sigDir = graft.sources.SigStore.storeFor(spark, sf)
    // a text the store DOES contain, so the check returns its near-dups
    val dup = Tables.documents(spark, sf)
      .filter(col("doc_id") % graft.sources.SigStore.BatchMod =!= 0)
      .orderBy(col("doc_id")).limit(1)
      .select(col("text")).head().getString(0)
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_dedup_check('$sigDir', 1000000000, '${dup.replace("'", "''")}')"))
    val viaScala = rows(graft.sources.SigStore.incrementalNearDup(spark, sigDir,
      Seq((1000000000L, dup)).toDF("doc_id", "text")))
    assert(viaSql == viaScala && viaSql.nonEmpty,
      s"dedup-check diverged (sql=${viaSql.size} scala=${viaScala.size})")
  }

  test("sqlLit round-trips adversarial request text (quotes, backslashes, breakout attempts)") {
    graft.functions.tvf.register(spark)
    val hnswDir = graft.sources.HnswStore.storeFor(spark, sf)
    // each text embeds differently, so SQL==Scala row equality proves
    // the text reached the builder VERBATIM — including the backslash
    // cases that, pre-fix, either swallowed the closing quote or broke
    // out of the literal into live SQL (Spark's default lexer treats
    // \' as an escaped quote)
    val nasty = Seq(
      "it's a 'quoted' query",
      "trailing backslash \\",
      "break \\', 999999) --out",
      "mix \\\\ '' \\' end\\")
    nasty.foreach { text =>
      val viaSql = rows(spark.sql(
        s"SELECT * FROM graft_hnsw_search('$hnswDir', ${graft.functions.tvf.sqlLit(text)}, 5)"))
      val viaScala = rows(graft.sources.HnswStore.search(spark, hnswDir,
        FakeEmbedder.embed(text), 5))
      assert(viaSql == viaScala, s"sqlLit round-trip diverged for <$text>")
    }
  }

  test("sqlLit follows the session's lexer mode (legacy escapedStringLiterals keeps backslashes raw)") {
    val key = "spark.sql.parser.escapedStringLiterals"
    val prev = spark.conf.get(key, "false")
    try {
      spark.conf.set(key, "false")
      assert(graft.functions.tvf.sqlLit("""a\b'c""") == """'a\\b''c'""")
      // legacy lexer: literals "remain escaped" — backslashes stay
      // RAW (doubling would corrupt) and quote-bearing text is
      // unrepresentable, so sqlLit refuses it loudly
      spark.conf.set(key, "true")
      intercept[IllegalArgumentException] {
        graft.functions.tvf.sqlLit("""a\b'c""")
      }
      // text ending in an ODD backslash run is unrepresentable too:
      // the final backslash would lex with the closing quote as one
      // unit and extend the literal past its boundary
      intercept[IllegalArgumentException] {
        graft.functions.tvf.sqlLit("""abc\""")
      }
      intercept[IllegalArgumentException] {
        graft.functions.tvf.sqlLit("abc" + "\\\\\\") // three trailing
      }
      // quote-free text round-trips raw through a live legacy parse —
      // mid-string backslashes and EVEN trailing runs are fine
      val lit = graft.functions.tvf.sqlLit("""a\b c""")
      assert(lit == """'a\b c'""")
      val got = spark.sql(s"SELECT $lit AS s").head().getString(0)
      assert(got == """a\b c""", s"legacy-mode literal parsed to <$got>")
      val evenLit = graft.functions.tvf.sqlLit("""ab\\""")
      val gotEven = spark.sql(s"SELECT $evenLit AS s").head().getString(0)
      assert(gotEven == """ab\\""", s"legacy even-trailing parsed to <$gotEven>")
    } finally spark.conf.set(key, prev)
  }

  test("non-literal TVF arguments fail analysis loudly") {
    graft.functions.tvf.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_hnsw_search(concat('a', 'b'), 'q', 10)").collect()
    }
    assert(e.getMessage != null)
  }

  test("GraftExtensions injects the TVFs into a fresh session") {
    import org.apache.spark.sql.SparkSession
    // stores built (on disk) by the shared session are plain parquet —
    // readable from any session
    val codeDir = graft.sources.CodeStore.storeFor(spark, sf)
    val expect = rows(graft.sources.CodeStore.search(spark, codeDir,
      FakeEmbedder.embed(queryText), k = 5))
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        s"SELECT * FROM graft_code_search('$codeDir', '$queryText', 5)")
        .collect().map(_.toSeq).toSeq
      assert(got == expect, "extensions-injected TVF diverged")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("filtered TVFs surface per-request coverage columns (tier, matching, W, ratio)") {
    import org.apache.spark.sql.functions.col
    graft.functions.tvf.register(spark)
    val srpDir = graft.sources.SrpStore.storeFor(spark, sf)
    graft.sources.FilteredServe.ensureMeta(spark, sf, srpDir)
    val df = spark.sql(
      s"""SELECT * FROM graft_meta_filtered_search('$srpDir',
         |'$queryText', 5, 'lang', 'de', 'source', 'src11')""".stripMargin)
    assert(Seq("cov_tier", "cov_matching", "cov_w", "cov_ratio")
      .forall(df.columns.contains),
      s"coverage columns missing from ${df.columns.mkString(",")}")
    val r = df.select(col("cov_tier"), col("cov_matching"), col("cov_ratio"))
      .head()
    // this predicate matches exactly 1 row at spec scale → exact tier,
    // full coverage — the per-request record, visible in the row itself
    assert(r.getString(0) == "exact", s"tier=${r.getString(0)}")
    assert(r.getLong(1) ==
      graft.sources.FilteredServe.matchCount(spark, srpDir,
        Seq("lang" -> "de", "source" -> "src11")))
    assert(r.getDouble(2) == 1.0)
  }

  test("batched filtered serve through pure SQL equals the Scala batch, incl. per-query k") {
    import org.apache.spark.sql.functions._
    graft.functions.tvf.register(spark)
    val srpDir = graft.sources.SrpStore.storeFor(spark, sf)
    graft.sources.FilteredServe.ensureMeta(spark, sf, srpDir)
    val emb = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === graft.operators.SrpBanded.Dim)
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    queries.createOrReplaceTempView("tvf_batch_q")
    val got = rows(spark.sql(
      s"""SELECT query_id, neighbor_id, rk, sim
         |FROM graft_filtered_search_batch('$srpDir', 'tvf_batch_q', 5,
         |'lang', 'en')""".stripMargin))
    val want = rows(graft.sources.FilteredServe.searchFilteredBatchFrom(
      spark, srpDir, queries,
      Seq(graft.sources.MetaTerm.Eq("lang", "en")), k = 5))
    assert(got == want && got.nonEmpty,
      s"SQL batch diverged from the Scala batch (sql=${got.size} scala=${want.size})")
    // a `k` column in the view carries each caller's own limit
    val qk = queries.withColumn("k", (lit(2) + col("query_id") % 7 % 4).cast("int"))
    qk.createOrReplaceTempView("tvf_batch_qk")
    val gotK = rows(spark.sql(
      s"""SELECT query_id, neighbor_id, rk, sim
         |FROM graft_filtered_search_batch('$srpDir', 'tvf_batch_qk', 5,
         |'lang', 'en')""".stripMargin))
    val wantK = rows(graft.sources.FilteredServe.searchFilteredBatchFrom(
      spark, srpDir, qk, Seq(graft.sources.MetaTerm.Eq("lang", "en")),
      k = 5, kCol = Some("k")))
    assert(gotK == wantK && gotK.nonEmpty,
      "SQL per-query-k batch diverged from the Scala call")
    // per-query row counts really follow the k column
    val kOf = qk.select(col("query_id"), col("k")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    gotK.groupBy(_.head).foreach { case (qid, rs) =>
      assert(rs.size <= kOf(qid.asInstanceOf[Long]),
        s"query $qid got ${rs.size} rows > its own k=${kOf(qid.asInstanceOf[Long])}")
    }
    // query_text views embed through the seam, same rows as q_vec views
    val qt = queries.join(
      Tables.documents(spark, sf)
        .select(col("doc_id").as("query_id"), col("text").as("query_text")),
      Seq("query_id")).select(col("query_id"), col("query_text"))
    qt.createOrReplaceTempView("tvf_batch_qt")
    val gotT = rows(spark.sql(
      s"""SELECT query_id, neighbor_id, rk, sim
         |FROM graft_filtered_search_batch('$srpDir', 'tvf_batch_qt', 5,
         |'lang', 'en')""".stripMargin))
    val qEmb = qt.select(col("query_id"),
      FakeEmbedder.embedCol(col("query_text")).as("q_vec"))
    val wantT = rows(graft.sources.FilteredServe.searchFilteredBatchFrom(
      spark, srpDir, qEmb,
      Seq(graft.sources.MetaTerm.Eq("lang", "en")), k = 5))
    assert(gotT == wantT && gotT.nonEmpty,
      "query_text batch TVF diverged from the embedded Scala call")
  }
}
