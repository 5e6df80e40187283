package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over the persisted stores — the
  * reference's `find_similar_customer_records` as ONE SQL statement
  * (tools.yaml:22-27's shape) instead of a Scala call. An external
  * session opts in via `spark.sql.extensions=graft.GraftExtensions`
  * (or [[register]] on a live session) and runs
  *
  * {{{
  *   SELECT * FROM graft_hnsw_search('<store_dir>', 'query text', 10)
  * }}}
  *
  * Argument contract: store dirs / query text / k are LITERALS (the
  * tool-statement shape). The reference's tool statements take bind
  * parameters; Spark's table-function registry has no bind surface,
  * so a gateway interpolating USER-CONTROLLED text into the statement
  * MUST escape it through [[sqlLit]] (single-quote doubling — the one
  * escape ANSI string literals need) or skip SQL entirely and call
  * the Scala API, which takes the text as a value and cannot be
  * injected. [[graft.tools.ServeGateway]] demonstrates the Scala
  * path; TvfSpec exercises [[sqlLit]] on quote-bearing text.
  * The builder resolves at analysis time by invoking the store's own
  * serve — a pruned point read against artifacts the session opened
  * once — and splices the resulting plan into the outer query, so the
  * SQL surface and the Scala API cannot diverge: they ARE the same
  * call. Query text is embedded through the [[Embedder]] seam's
  * oracle-pinned default ([[FakeEmbedder]] — swap the seam, not the
  * TVF, for a real encoder).
  */
object tvf {

  /** Escape a runtime string into a SQL string-literal token, wrapped
    * in quotes. The ONE sanctioned way to build a TVF statement from
    * untrusted request text:
    * {{{ s"SELECT * FROM graft_hnsw_search('$dir', ${tvf.sqlLit(userText)}, 10)" }}}
    * Spark's DEFAULT lexer (escapedStringLiterals=false) treats `\\'`
    * as an escaped quote inside a literal, so quote-doubling alone is
    * NOT enough: text ending in a backslash swallows the closing
    * quote, and `\\'` + tail breaks out of the literal entirely.
    * Backslashes are doubled FIRST, then quotes doubled. Under the
    * LEGACY lexer (escapedStringLiterals=true) literals "remain
    * escaped": neither `\\\\` nor `''` collapses (measured on this
    * repo's Spark — `''` stays two quotes), so backslashes must stay
    * RAW and quote-bearing text is UNREPRESENTABLE in a single-quoted
    * legacy literal — sqlLit refuses it loudly (use the Scala API or
    * the default lexer for such text) rather than silently corrupting
    * the query. The active session's conf decides the mode; with no
    * active session the default-mode escaping applies. */
  def sqlLit(s: String): String = {
    val legacyLexer = SparkSession.getActiveSession.exists(
      _.conf.get("spark.sql.parser.escapedStringLiterals", "false").toBoolean)
    if (legacyLexer) {
      require(!s.contains("'"),
        "sqlLit cannot represent a single quote under " +
          "spark.sql.parser.escapedStringLiterals=true (literals remain " +
          "escaped — no collapse for '' or \\'): pass the text through " +
          "the Scala API instead, or use the default lexer")
      // The STRING lexer rule consumes backslash+next-char as a unit in
      // BOTH modes (only the unescaping is conf-gated), so text ending
      // in an ODD backslash run would pair its final backslash with the
      // closing quote and extend the literal past its boundary — a
      // parse break, and a literal-boundary shift when two sqlLit'd
      // values are adjacent in one statement. Mid-string backslashes
      // and even trailing runs lex as self-contained units and stay
      // raw (round-trip measured in TvfSpec), so only the odd-trailing
      // shape is unrepresentable.
      require(s.reverseIterator.takeWhile(_ == '\\').size % 2 == 0,
        "sqlLit cannot represent text ending in an odd run of backslashes " +
          "under spark.sql.parser.escapedStringLiterals=true (the final " +
          "backslash would swallow the closing quote): pass the text " +
          "through the Scala API instead, or use the default lexer")
      "'" + s + "'"
    } else "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def kOf(xs: Seq[Expression], at: Int, dflt: Int): Int =
    if (xs.length > at) litLong(xs(at), "k").toInt else dflt

  private def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Append the serve's per-request COVERAGE to a filtered TVF's
    * output (r16): `cov_tier`, `cov_matching`, `cov_w`, `cov_ratio` —
    * the [[graft.sources.FilteredServe.Coverage]] record the serve
    * just wrote on THIS thread (the TVF builder invokes the serve
    * synchronously at analysis time, so the thread-local read pairs
    * with exactly this request's serve). A W-bound serve is thereby
    * visible to the SQL caller in the row itself, not only in the
    * gateway's global counters. Constant per statement, so the
    * columns cost nothing at scale. */
  private def withCoverage(df: DataFrame): DataFrame = {
    val cov = graft.sources.FilteredServe.lastCoverageHere
    df.select(col("*"),
      org.apache.spark.sql.functions.lit(cov.tier).as("cov_tier"),
      org.apache.spark.sql.functions.lit(cov.matching).as("cov_matching"),
      org.apache.spark.sql.functions.lit(cov.w).as("cov_w"),
      org.apache.spark.sql.functions.lit(cov.ratio).as("cov_ratio"))
  }
  private def col(c: String) = org.apache.spark.sql.functions.col(c)

  /** Trailing predicate literals → the typed-term conjunction every
    * filtered serve takes (ONE parser, so the family TVFs cannot
    * drift). Two spellings per term, mixable in one call:
    *
    *  - `col, val` — equality (the legacy pair shape);
    *  - `col, op, val` — a typed comparison, op ∈
    *    [[graft.sources.MetaTerm.CmpOps]] (`'num_claims', '>=', '22'`
    *    — the reference's range-predicate shape, sql/02_schema.sql's
    *    `num_claims`/`date` through tools.yaml's statement surface).
    *
    * Parsed greedily: after a column, a literal that IS an operator
    * token binds as the operator of a 3-ary term. A predicate VALUE
    * that happens to be an operator token (`val = ">="`) must
    * therefore spell its equality explicitly: `col, '=', '>='`.
    * Semantics split exactly as [[graft.sources.MetaTerm]] does: the
    * pair shape is EXACT string equality ([[graft.sources.MetaTerm.Eq]],
    * partition-class columns only), the 3-ary shape — including
    * explicit `=`/`==` — is the TYPED comparison (numeric when the
    * value parses numeric; legal on range-class columns). */
  private[graft] def termsOf(xs: Seq[Expression]): Seq[graft.sources.MetaTerm] = {
    val out = Seq.newBuilder[graft.sources.MetaTerm]
    var i = 0
    while (i < xs.length) {
      val c = litStr(xs(i), "predicate column")
      require(i + 1 < xs.length,
        s"predicate column '$c' has no value (terms are col,val or col,op,val)")
      val second = litStr(xs(i + 1), "predicate operator or value")
      if (graft.sources.MetaTerm.CmpOps.contains(second)) {
        require(i + 2 < xs.length,
          s"predicate '$c $second' has no value (terms are col,op,val)")
        val v = litStr(xs(i + 2), "predicate value")
        out += graft.sources.MetaTerm.Cmp(c, second, v)
        i += 3
      } else {
        out += graft.sources.MetaTerm.Eq(c, second)
        i += 2
      }
    }
    out.result()
  }

  /** name → (arity range, builder) — one table per serve family, so
    * the injection and the runtime registration share one source */
  private[graft] val builders: Seq[(String, String, Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_hnsw_search",
      "graft_hnsw_search(store_dir, query_text[, k]) - top-k from a persisted HNSW store",
      (xs: Seq[Expression]) => {
        require(xs.length >= 2 && xs.length <= 3,
          s"graft_hnsw_search(store_dir, query_text[, k]): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(graft.sources.HnswStore.search(spark,
          litStr(xs(0), "store_dir"),
          FakeEmbedder.embed(litStr(xs(1), "query_text")), kOf(xs, 2, 10)))
      }),
    ("graft_graph_search",
      "graft_graph_search(srp_dir, edge_dir, query_text[, k]) - cold store-backed graph ANN",
      (xs: Seq[Expression]) => {
        require(xs.length >= 3 && xs.length <= 4,
          s"graft_graph_search(srp_dir, edge_dir, query_text[, k]): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(graft.sources.SrpStore.graphSearchCold(spark,
          litStr(xs(0), "srp_dir"), litStr(xs(1), "edge_dir"),
          FakeEmbedder.embed(litStr(xs(2), "query_text")), k = kOf(xs, 3, 10)))
      }),
    ("graft_code_search",
      "graft_code_search(store_dir, query_text[, k]) - Hamming shortlist + exact rerank from a persisted code store",
      (xs: Seq[Expression]) => {
        require(xs.length >= 2 && xs.length <= 3,
          s"graft_code_search(store_dir, query_text[, k]): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(graft.sources.CodeStore.search(spark,
          litStr(xs(0), "store_dir"),
          FakeEmbedder.embed(litStr(xs(1), "query_text")), k = kOf(xs, 2, 10)))
      }),
    ("graft_filtered_search",
      "graft_filtered_search(corpus_dir, srp_dir, edge_dir, query_text, k, col1, [op1,] val1, ...) - metadata-filtered stored ANN",
      (xs: Seq[Expression]) => {
        require(xs.length >= 7,
          s"graft_filtered_search(corpus_dir, srp_dir, edge_dir, query_text, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(withCoverage(graft.sources.FilteredServe.searchFilteredTerms(spark,
          litStr(xs(0), "corpus_dir"), litStr(xs(1), "srp_dir"),
          litStr(xs(2), "edge_dir"),
          FakeEmbedder.embed(litStr(xs(3), "query_text")), termsOf(xs.drop(5)),
          k = litLong(xs(4), "k").toInt)))
      }),
    ("graft_code_filtered_search",
      "graft_code_filtered_search(code_dir, meta_dir, query_text, k, col1, [op1,] val1, ...) - metadata-filtered code-scan ANN",
      (xs: Seq[Expression]) => {
        require(xs.length >= 6,
          s"graft_code_filtered_search(code_dir, meta_dir, query_text, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(withCoverage(graft.sources.CodeStore.searchFilteredTerms(spark,
          litStr(xs(0), "code_dir"), litStr(xs(1), "meta_dir"),
          FakeEmbedder.embed(litStr(xs(2), "query_text")), termsOf(xs.drop(4)),
          k = litLong(xs(3), "k").toInt)))
      }),
    ("graft_hnsw_filtered_search",
      "graft_hnsw_filtered_search(hnsw_dir, meta_dir, query_text, k, col1, [op1,] val1, ...) - metadata-filtered hierarchical ANN",
      (xs: Seq[Expression]) => {
        require(xs.length >= 6,
          s"graft_hnsw_filtered_search(hnsw_dir, meta_dir, query_text, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(withCoverage(graft.sources.HnswStore.searchFilteredTerms(spark,
          litStr(xs(0), "hnsw_dir"), litStr(xs(1), "meta_dir"),
          FakeEmbedder.embed(litStr(xs(2), "query_text")), termsOf(xs.drop(4)),
          k = litLong(xs(3), "k").toInt)))
      }),
    ("graft_ivfpq_filtered_search",
      "graft_ivfpq_filtered_search(pq_dir, meta_dir, corpus_dir, query_text, k, col1, [op1,] val1, ...) - metadata-filtered quantization ANN",
      (xs: Seq[Expression]) => {
        require(xs.length >= 7,
          s"graft_ivfpq_filtered_search(pq_dir, meta_dir, corpus_dir, query_text, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(withCoverage(graft.sources.IvfPqStore.searchFilteredResidualTerms(spark,
          litStr(xs(0), "pq_dir"), litStr(xs(1), "meta_dir"),
          graft.Tables.embeddings(spark, litStr(xs(2), "corpus_dir")),
          "embedding", "vec_id",
          FakeEmbedder.embed(litStr(xs(3), "query_text")), termsOf(xs.drop(5)),
          k = litLong(xs(4), "k").toInt)))
      }),
    ("graft_meta_filtered_search",
      "graft_meta_filtered_search(meta_dir, query_text, k, col1, [op1,] val1, ...) - filtered ANN from the meta artifacts alone (exact or code tier)",
      (xs: Seq[Expression]) => {
        require(xs.length >= 5,
          s"graft_meta_filtered_search(meta_dir, query_text, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        planOf(withCoverage(graft.sources.FilteredServe.searchFilteredMetaTerms(spark,
          litStr(xs(0), "meta_dir"),
          FakeEmbedder.embed(litStr(xs(1), "query_text")), termsOf(xs.drop(3)),
          k = litLong(xs(2), "k").toInt)))
      }),
    ("graft_filtered_search_batch",
      "graft_filtered_search_batch(meta_dir, query_table, k, col1, [op1,] val1, ...) - the BATCHED filtered serve from SQL: one set-based plan over a registered query table",
      (xs: Seq[Expression]) => {
        require(xs.length >= 5,
          s"graft_filtered_search_batch(meta_dir, query_table, k, col, [op,] val, ...): got ${xs.length} args")
        val spark = SparkSession.active
        // the query table is a VIEW NAME (Spark's table-function
        // registry takes literal args, not table args): rows carry
        // `query_id` plus either `q_vec` (embedding-shaped) or
        // `query_text` (embedded through the seam, exactly like the
        // single-query TVFs); an optional `k` column carries each
        // caller's own limit (tools.yaml:19-21's per-call `limit`) and
        // overrides the statement-level k per query
        val qt = spark.table(litStr(xs(1), "query_table"))
        val base =
          if (qt.columns.contains("q_vec")) qt
          else {
            require(qt.columns.contains("query_text"),
              "query_table must carry 'q_vec' or 'query_text'")
            qt.withColumn("q_vec", FakeEmbedder.embedCol(col("query_text")))
          }
        val kCol = if (qt.columns.contains("k")) Some("k") else None
        val queries = base.select((Seq(col("query_id"), col("q_vec")) ++
          kCol.map(col)): _*)
        planOf(withCoverage(graft.sources.FilteredServe.searchFilteredBatchFrom(
          spark, litStr(xs(0), "meta_dir"), queries, termsOf(xs.drop(3)),
          k = litLong(xs(2), "k").toInt, kCol = kCol)))
      }),
    ("graft_dedup_check",
      "graft_dedup_check(sig_dir, doc_id, text) - near-dups of one document vs the persisted signature store",
      (xs: Seq[Expression]) => {
        require(xs.length == 3,
          s"graft_dedup_check(sig_dir, doc_id, text): got ${xs.length} args")
        val spark = SparkSession.active
        import spark.implicits._
        val batch = Seq((litLong(xs(1), "doc_id"), litStr(xs(2), "text")))
          .toDF("doc_id", "text")
        planOf(graft.sources.SigStore.incrementalNearDup(spark,
          litStr(xs(0), "sig_dir"), batch))
      }))

  /** register the serve TVFs on a live session (temp functions) — the
    * [[vectors.register]] analogue for the table surface */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    builders.foreach { case (name, _, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
