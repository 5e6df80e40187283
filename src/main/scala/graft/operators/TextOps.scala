package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis suite (§2 t1–t4): corpus profiling, quality scoring,
  * token counting, content fingerprinting. All map-side expression
  * work over the documents table — the only shuffles are the final
  * grain aggregates.
  */
object TextOps {

  private[graft] val StopWords = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "data")

  /** t1: per-language corpus profile. */
  def langProfile(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  def langProfileSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** t2: per-document quality scoring — length, stopword ratio, mean
    * token length, composite score. Pure row-level arithmetic (raw
    * IEEE doubles are bit-identical to the oracle's). */
  def qualityScore(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val stopArr = array(StopWords.map(lit): _*)
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(filter(split(col("text"), " "), t => array_contains(stopArr, t))).as("n_stop"),
        length(regexp_replace(col("text"), " ", "")).as("n_letter"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_letter").cast("double") / col("n_tokens")).as("mean_tok_len"))
      .withColumn("quality",
        (lit(1.0) - col("stop_ratio")) * least(lit(1.0), col("n_tokens").cast("double") / lit(50.0)))
      .orderBy(col("doc_id"))
  }

  def qualityScoreSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, n_tokens,
       |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |  CAST(n_letter AS DOUBLE) / n_tokens AS mean_tok_len,
       |  (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) *
       |    least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) AS quality
       |FROM (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), t -> list_contains($stopList, t))) AS n_stop,
       |    length(replace(text, ' ', '')) AS n_letter
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** t3: token counting — whitespace split vs. a BPE-ish regex of
    * letter runs / digit runs / single punctuation. `tok` is the
    * tokenizer seam ([[graft.functions.Tokenizer]]): the gate pins the
    * whitespace default (oracle-green), a deployment swaps in its real
    * tokenizer (e.g. the merges-file-backed
    * [[graft.functions.BpeTokenizer]]) and `ws_tokens` becomes that
    * tokenizer's count — TokenizerSpec proves the swap end-to-end. */
  def tokenCount(spark: SparkSession, d: String,
                 tok: graft.functions.Tokenizer =
                   graft.functions.WhitespaceTokenizer): DataFrame = {
    val docs = Tables.documents(spark, d)
    tok.countFrame(docs, "text", "ws_tokens")
      .select(col("doc_id"), col("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"),
        length(col("text")).as("n_chars_m"))
      .orderBy(col("doc_id"))
  }

  def tokenCountSql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS re_tokens,
      |  length(text) AS n_chars_m
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t4: normalized fingerprint (sorted distinct tokens → md5) — the
    * classic key-collapse dedup key; grouped stats attached. */
  def fingerprint(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val fp = md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))
    val w = Window.partitionBy(col("fingerprint"))
    docs.select(col("doc_id"), fp.as("fingerprint"))
      .select(col("doc_id"), col("fingerprint"),
        count(lit(1)).over(w).as("fp_group_n"),
        min(col("doc_id")).over(w).as("fp_keeper"))
      .orderBy(col("doc_id"))
  }

  def fingerprintSql: String =
    """SELECT doc_id, fingerprint,
      |  count(*) OVER (PARTITION BY fingerprint) AS fp_group_n,
      |  min(doc_id) OVER (PARTITION BY fingerprint) AS fp_keeper
      |FROM (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** t5: greedy sequence packing — assign documents (in doc_id order)
    * to fixed-token-budget packs, the training-batch construction step.
    *
    * The corpus-wide cumulative token count is computed WITHOUT a
    * global window (which would funnel 100 TB through one reducer).
    * Two passes over an order-preserving block key (doc_id ranges,
    * ~8 blocks per shuffle partition):
    *   1. per-block token subtotals — one narrow shuffle whose key
    *      cardinality is O(cluster), not O(data) — are collected
    *      (bounded model state, like k-means centroids) and
    *      prefix-scanned on the driver;
    *   2. the per-doc cumsum is a window PARTITIONED by block (fully
    *      parallel) plus the broadcast block prefix offset.
    * Only (doc_id, n_tokens, blk) ride the shuffles, never the text.
    * At 100 TB the ordering key would be a (file, row) composite with
    * the same block trick. */
  def sequencePack(spark: SparkSession, d: String, budget: Int = 2048,
                   tok: graft.functions.Tokenizer =
                     graft.functions.WhitespaceTokenizer): DataFrame = {
    val docs = Tables.documents(spark, d)
    // token counts come through the tokenizer seam: packing budgets
    // follow whatever tokenizer the training run actually uses
    val toks = tok.countFrame(docs, "text", "n_tokens")
      .select(col("doc_id"), col("n_tokens"))
    // maxId comes from the PRE-seam frame: a mapPartitions-based
    // tokenizer is opaque to column pruning, and aggregating through
    // it would tokenize the whole corpus once just for max(doc_id)
    val maxRow = docs.agg(max(col("doc_id"))).head()
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val targetBlocks = spark.conf.get("spark.sql.shuffle.partitions").toLong * 8
    val blockSize = math.max(1L, (maxId + targetBlocks) / targetBlocks) // ceil((maxId+1)/targetBlocks)
    val blocked = toks.withColumn("blk", floor(col("doc_id") / blockSize).cast("long"))
    // Per-block subtotals: at most targetBlocks rows — prefix-scan on the driver.
    val totals = blocked.groupBy(col("blk")).agg(sum(col("n_tokens")).as("blk_tokens"))
      .orderBy(col("blk")).collect()
    var acc = 0L
    val prefix = totals.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    import spark.implicits._
    val offsets = prefix.toDF("blk", "blk_before")
    val wLocal = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    blocked
      .withColumn("local_before", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(offsets), Seq("blk"))
      .withColumn("tok_before", col("blk_before") + col("local_before"))
      .withColumn("pack_id", (col("tok_before") / budget).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  def sequencePackSql(budget: Int = 2048): String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $budget) AS BIGINT) AS pack_id
       |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** t6: deterministic hash sampling — the train/holdout split for a
    * training-data pipeline. md5 of the id keys the split so it is
    * stable across runs, engines, and re-partitions (no RNG state);
    * sampling 100 TB is a map-only filter. Rate = pct/100 by first
    * two hex chars of the hash. */
  def hashSample(spark: SparkSession, d: String, pct: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, d)
    // hex-prefix compare: lowercase-hex md5 in both engines, so a
    // plain string inequality keys the split with zero cast hazards.
    // The cut is clamped to 2 hex digits — at pct=100, "%02x" of 256
    // would yield the 3-char "100", and lexicographic h < "100" keeps
    // only hashes starting with '0' (~6% instead of all).
    val nBuckets = math.min(256, pct * 256 / 100)
    val cut = if (nBuckets >= 256) "g" else f"$nBuckets%02x" // 'g' > any hex digit
    docs.select(col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
      .filter(col("h") < cut)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  def hashSampleSql(pct: Int = 10): String = {
    val nBuckets = math.min(256, pct * 256 / 100)
    val cut = if (nBuckets >= 256) "g" else f"$nBuckets%02x"
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
       |  FROM documents)
       |WHERE h < '$cut'
       |ORDER BY doc_id""".stripMargin
  }

  /** t7: TF-IDF top terms per language — corpus-statistics shape:
    * explode to (lang, token), two grains of counts, idf from the doc
    * count, per-lang top-5 by window rank. The explode shuffles only
    * (lang, token) pairs; all counting is partial-aggregated. */
  def tfidfTopTerms(spark: SparkSession, d: String, topN: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, d)
    // corpus doc count as a lazy broadcast scalar — an eager .count()
    // here would run a Spark job at DataFrame-construction time
    val nDocs = broadcast(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    val tokens = docs.select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val df = tokens.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
    val tf = tokens.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("term_freq"))
    val scored = tf.join(df, Seq("token")).crossJoin(nDocs)
      .withColumn("tfidf",
        col("term_freq").cast("double") *
          log(col("n_docs") / col("doc_freq").cast("double")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("lang"), col("token"), col("term_freq"), col("doc_freq"), col("rank"))
      .orderBy(col("lang"), col("rank"))
  }

  def tfidfTopTermsSql(topN: Int = 5): String =
    s"""SELECT lang, token, term_freq, doc_freq, rank FROM (
       |  SELECT lang, token, term_freq, doc_freq,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY term_freq * ln((SELECT count(*) FROM documents) / CAST(doc_freq AS DOUBLE)) DESC,
       |      token ASC) AS rank
       |  FROM (
       |    SELECT lang, token, count(*) AS term_freq FROM (
       |      SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS token FROM documents)
       |    GROUP BY lang, token) tf
       |  JOIN (
       |    SELECT token, count(DISTINCT doc_id) AS doc_freq FROM (
       |      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token FROM documents)
       |    GROUP BY token) df USING (token))
       |WHERE rank <= $topN
       |ORDER BY lang, rank""".stripMargin

  /** t8: data-quality profile — the pipeline pre-flight check: row
    * count, null/blank rate, distinctness, metadata consistency
    * (`n_chars` really is `length(text)`), all in one scan. */
  def dqProfile(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L)).as("n_blank_text"),
      countDistinct(col("text")).as("n_distinct_text"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("n_chars_mismatch"))
  }

  def dqProfileSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_text,
      |  count(DISTINCT text) AS n_distinct_text,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatch
      |FROM documents""".stripMargin

  /** Language-ID heuristic (marker-token voting). The synthetic corpus
    * carries ground-truth `lang`, so this is exposed for the pipeline
    * and exercised in specs rather than the oracle. */
  def langIdHeuristic(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val markers = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "die"),
      "es" -> Seq("el", "los", "que"),
      "fr" -> Seq("le", "les", "des"),
      "zh" -> Seq("de", "shi", "le"))
    val toks = split(lower(textCol), " ")
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(size(filter(toks, t => ms.map(m => t === lit(m)).reduce(_ || _))).as("score"),
        lit(lang).as("lang"))
    }
    sort_array(array(scores: _*), asc = false).getItem(0).getField("lang")
  }

  /** t9: language identification as a first-class query — marker-token
    * voting per doc, compared against the corpus ground truth. Ties
    * break deterministically (highest score, then lang descending) in
    * both engines via identical struct-sort semantics. */
  def langId(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), langIdHeuristic(col("text")).as("pred_lang"))
      .withColumn("agree", col("lang") === col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  def langIdSql: String =
    """SELECT doc_id, lang,
      |  (list_reverse_sort([
      |    {s: len(list_filter(toks, t -> t IN ('the','and','of'))), l: 'en'},
      |    {s: len(list_filter(toks, t -> t IN ('der','und','die'))), l: 'de'},
      |    {s: len(list_filter(toks, t -> t IN ('el','los','que'))), l: 'es'},
      |    {s: len(list_filter(toks, t -> t IN ('le','les','des'))), l: 'fr'},
      |    {s: len(list_filter(toks, t -> t IN ('de','shi','le'))), l: 'zh'}]))[1].l AS pred_lang,
      |  lang = pred_lang AS agree
      |FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** t10: per-language top-10 bigram frequencies — n-gram corpus
    * statistics (the n-gram-LM / contamination-check building block).
    * One explode + one (lang, bigram) shuffle; the per-lang top-k is a
    * window over the (small) aggregated counts. */
  def bigramFreq(spark: SparkSession, d: String, topK: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, d)
    val bigrams = docs
      .select(col("lang"), split(col("text"), " ").as("toks"))
      .select(col("lang"), explode(expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0)), (a, b) -> concat(a, ' ', b))")).as("bg"))
    val counts = bigrams.groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bg"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("lang"), col("bg"), col("n"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** t11: stratified deterministic sampling — exactly ⌈10%⌉ of each
    * language stratum, chosen by md5 rank so the sample is stable
    * across runs and engines (the per-stratum quota version of t6's
    * bernoulli hash sample; what a training-mix builder uses to hit
    * per-source token budgets). One shuffle on the stratum key. */
  def stratifiedSample(spark: SparkSession, d: String, frac: Double = 0.1): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("graft-strat:"), col("doc_id").cast("string"))).as("h"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    docs.select(col("doc_id"), col("lang"),
        row_number().over(w).as("rk"), count(lit(1)).over(cw).as("n_stratum"))
      .filter(col("rk") <= ceil(lit(frac) * col("n_stratum")))
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  def stratifiedSampleSql(frac: Double = 0.1): String =
    s"""SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n_stratum
       |  FROM (SELECT doc_id, lang,
       |          md5('graft-strat:' || CAST(doc_id AS VARCHAR)) AS h FROM documents))
       |WHERE rk <= ceiling($frac * n_stratum)
       |ORDER BY lang, rk""".stripMargin

  /** t12: PII scrubbing — regex redaction of email-shaped spans, with
    * a deterministic synthetic address appended per doc so the
    * operator has something to find in the synthetic corpus. Emits the
    * match count and an md5 of the cleaned text (proves byte-level
    * replacement parity without shipping the text). Map-only. */
  def piiRedact(spark: SparkSession, d: String): DataFrame = {
    val pattern = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")).as("raw"))
    // Column-API regexp functions take the pattern verbatim; routing
    // it through expr() would SQL-unescape '\.' to '.' and silently
    // loosen the match relative to clean_md5 and the oracle.
    docs.select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(pattern), lit(0))).as("n_emails"),
        md5(regexp_replace(col("raw"), pattern, "<EMAIL>")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  def piiRedactSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS INTEGER) AS n_emails,
      |  md5(regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g')) AS clean_md5
      |FROM (SELECT doc_id,
      |        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' AS raw
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** t13: unigram log-probability scoring — the perplexity-proxy
    * quality filter: docs whose tokens are corpus-typical score high,
    * gibberish scores low. Two shuffles (vocab count, token join).
    * Cross-engine float discipline: each token's ln(p) is ROUNDED to
    * 6 dp first (Spark and DuckDB ln agree to sub-ulp, so the rounded
    * values are identical), then summed as exact decimals — the sum
    * is order-free, so partial aggregation order can't flake the
    * oracle hash. */
  def unigramLogprob(spark: SparkSession, d: String,
                     tok: graft.functions.Tokenizer =
                       graft.functions.WhitespaceTokenizer): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = tok.tokensFrame(docs.select(col("doc_id"), col("text")), "text", "toks")
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    // corpus total as a lazy broadcast scalar derived from the (small)
    // vocab frame — summing freq avoids a third full scan+explode of
    // documents (and its exchange is shared with the join side)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = broadcast(freq.agg(sum(col("cnt")).cast("double").as("total")))
    toks.join(freq, "tok").crossJoin(total)
      .select(col("doc_id"),
        round(log(col("cnt").cast("double") / col("total")), 6)
          .cast("decimal(18,6)").as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("logp")).cast("double").as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp") / col("n_toks"))
      .orderBy(col("doc_id"))
  }

  def unigramLogprobSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum(logp) AS DOUBLE) AS sum_logp,
      |  CAST(sum(logp) AS DOUBLE) / count(*) AS avg_logp
      |FROM (
      |  SELECT t.doc_id,
      |    CAST(round(ln(CAST(f.cnt AS DOUBLE) / total.n), 6) AS DECIMAL(18,6)) AS logp
      |  FROM toks t JOIN freq f ON t.tok = f.tok, total)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t14: token-length histogram — the sequence-length profile a
    * training-mix planner reads before picking packing budgets.
    * Integer CASE buckets (no float log boundaries to flake on). */
  def lenHistogram(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val n = size(split(col("text"), " "))
    val bucket = when(n < 32, "a_lt32").when(n < 64, "b_32_63")
      .when(n < 128, "c_64_127").when(n < 256, "d_128_255")
      .when(n < 512, "e_256_511").otherwise("f_ge512")
    docs.select(bucket.as("bucket"), n.as("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_toks"),
        max(col("n_tokens")).as("max_toks"),
        expr("cast(sum(n_tokens) as bigint)").as("sum_toks"))
      .orderBy(col("bucket"))
  }

  def lenHistogramSql: String =
    """SELECT bucket, count(*) AS n_docs,
      |  CAST(min(n_tokens) AS INTEGER) AS min_toks,
      |  CAST(max(n_tokens) AS INTEGER) AS max_toks,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_toks
      |FROM (
      |  SELECT CASE WHEN n < 32 THEN 'a_lt32' WHEN n < 64 THEN 'b_32_63'
      |              WHEN n < 128 THEN 'c_64_127' WHEN n < 256 THEN 'd_128_255'
      |              WHEN n < 512 THEN 'e_256_511' ELSE 'f_ge512' END AS bucket,
      |         n AS n_tokens
      |  FROM (SELECT len(string_split(text, ' ')) AS n FROM documents))
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  def bigramFreqSql: String =
    """SELECT lang, bg, n, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT lang, bg, count(*) AS n,
      |    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bg) AS rk
      |  FROM (
      |    SELECT lang, unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i+1])) AS bg
      |    FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
      |  GROUP BY lang, bg)
      |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin

  /** t15: Gopher-style repetition filters (Rae et al. 2021, public) —
    * duplicate-token fraction, top-bigram fraction, top-trigram
    * fraction, and the repetitive flag.
    *
    * Entirely MAP-ONLY: the per-doc n-gram mode is a sorted-array
    * run-length maximum (`array_sort` + one `aggregate` fold) instead
    * of an explode→groupBy, so 100 TB of documents contribute ZERO
    * shuffle rows — the only exchange is the final doc_id order for
    * the gate. The flag compares integers (100·max > thresh·total),
    * never float boundaries, so it cannot flake across engines; the
    * reported fractions are single int/int divisions (exact IEEE in
    * both engines). */
  def repetition(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    // max run length in the sorted n-gram array == mode frequency
    def modeCount(arr: String): String =
      s"""aggregate(array_sort($arr),
         |  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
         |  (a, x) -> named_struct('prev', x,
         |    'run', if(x <=> a.prev, a.run + 1L, 1L),
         |    'best', greatest(a.best, if(x <=> a.prev, a.run + 1L, 1L))),
         |  a -> a.best)""".stripMargin
    val grams = docs.select(col("doc_id"),
      expr("split(text, ' ')").as("ts"))
      .select(col("doc_id"), size(col("ts")).as("n_tokens"),
        size(array_distinct(col("ts"))).as("n_distinct"),
        // size guards: Spark's sequence(1, 0) steps DOWNWARD, so a
        // 1-token doc would index element_at(ts, 0) and throw
        expr(modeCount(
          "if(size(ts) < 2, cast(array() as array<string>), transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))))"))
          .as("max_bg"),
        greatest(size(col("ts")) - 1, lit(0)).cast("long").as("n_bg"),
        expr(modeCount(
          "if(size(ts) < 3, cast(array() as array<string>), transform(sequence(1, size(ts) - 2), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), ' ', element_at(ts, i + 2))))"))
          .as("max_tg"),
        greatest(size(col("ts")) - 2, lit(0)).cast("long").as("n_tg"))
    grams.select(col("doc_id"), col("n_tokens"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_tok_frac"),
        (col("max_bg").cast("double") / col("n_bg")).as("top_bigram_frac"),
        (col("max_tg").cast("double") / col("n_tg")).as("top_trigram_frac"),
        (col("max_bg") * 100 > col("n_bg") * 18 ||
         col("max_tg") * 100 > col("n_tg") * 16).as("repetitive"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin computes the same mode via unnest+group (different
    * plan, identical integers — the oracle checks output, not shape). */
  def repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |base AS (
      |  SELECT doc_id, len(ts) AS n_tokens, len(list_distinct(ts)) AS n_distinct,
      |    greatest(len(ts) - 1, 0) AS n_bg, greatest(len(ts) - 2, 0) AS n_tg
      |  FROM toks),
      |bg AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bg FROM (
      |    SELECT doc_id, count(*) AS c FROM (
      |      SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |        i -> ts[i] || ' ' || ts[i+1])) AS g FROM toks)
      |    GROUP BY doc_id, g) GROUP BY doc_id),
      |tg AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tg FROM (
      |    SELECT doc_id, count(*) AS c FROM (
      |      SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
      |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g FROM toks)
      |    GROUP BY doc_id, g) GROUP BY doc_id),
      |j AS (
      |  SELECT b.doc_id, b.n_tokens, b.n_distinct, b.n_bg, b.n_tg,
      |    coalesce(bg.max_bg, 0) AS max_bg, coalesce(tg.max_tg, 0) AS max_tg
      |  FROM base b LEFT JOIN bg ON b.doc_id = bg.doc_id
      |              LEFT JOIN tg ON b.doc_id = tg.doc_id)
      |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
      |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_tok_frac,
      |  CAST(max_bg AS DOUBLE) / n_bg AS top_bigram_frac,
      |  CAST(max_tg AS DOUBLE) / n_tg AS top_trigram_frac,
      |  (max_bg * 100 > n_bg * 18 OR max_tg * 100 > n_tg * 16) AS repetitive
      |FROM j ORDER BY doc_id""".stripMargin

  /** t16: training-mix weight planner — per-language token shares vs
    * a target mix, producing the over/under-sampling weight a data
    * loader applies. One narrow aggregate (key cardinality = number
    * of languages) plus a 1-row broadcast total — the t7/t13 scalar
    * pattern, nothing data-sized crosses the wire. Weight arithmetic
    * is literal·int/int in a fixed order, so both engines produce
    * bit-identical doubles. */
  def mixWeights(spark: SparkSession, d: String,
                 tok: graft.functions.Tokenizer =
                   graft.functions.WhitespaceTokenizer): DataFrame = {
    val docs = Tables.documents(spark, d)
    val target = typedLit(Map(
      "en" -> 0.40, "zh" -> 0.15, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15))
    // The grand total is a window over the ALREADY-AGGREGATED per-
    // lang rows: one corpus scan, and the unpartitioned window runs
    // over #languages rows (bounded model-sized state, like the q6/t8
    // global finals) — never over the data. The two-branch
    // crossJoin(broadcast(total)) alternative re-scanned the corpus.
    val perLang = tok.countFrame(docs, "text", "n_toks")
      .select(col("lang"), col("n_toks").cast("long").as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("lang_toks"))
    perLang
      .withColumn("total_toks",
        sum(col("lang_toks")).over(Window.partitionBy()))
      .select(col("lang"), col("n_docs"), col("lang_toks"), col("total_toks"),
        (col("lang_toks").cast("double") / col("total_toks")).as("actual_share"),
        element_at(target, col("lang")).as("target_share"))
      .withColumn("weight",
        col("target_share") * col("total_toks") / col("lang_toks"))
      .withColumn("oversample", col("weight") > lit(1.0))
      .drop("total_toks")
      .orderBy(col("lang"))
  }

  def mixWeightsSql: String =
    """WITH per_lang AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS lang_toks
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(lang_toks) AS BIGINT) AS total_toks FROM per_lang),
      |tgt AS (SELECT * FROM (VALUES ('en', 0.40), ('zh', 0.15), ('de', 0.15),
      |  ('es', 0.15), ('fr', 0.15)) AS t(lang, target_share))
      |SELECT p.lang, p.n_docs, p.lang_toks,
      |  CAST(p.lang_toks AS DOUBLE) / total_toks AS actual_share,
      |  CAST(target_share AS DOUBLE) AS target_share,
      |  CAST(target_share AS DOUBLE) * total_toks / p.lang_toks AS weight,
      |  CAST(target_share AS DOUBLE) * total_toks / p.lang_toks > 1.0 AS oversample
      |FROM per_lang p JOIN tgt USING (lang), tot
      |ORDER BY lang""".stripMargin

  /** t17: quality gate — drop the global bottom decile by t2's
    * quality score, the canonical curation cut (CCNet/Gopher-style
    * filtering, done EXACTLY rather than by a sampled quantile). The
    * cut is rank-based with a doc_id tie-break, so it is a total
    * order both engines agree on; what must be found is one order
    * statistic — the ⌈N/10⌉-th smallest (quality, doc_id) pair —
    * and q33's blocked two-pass trick finds it with NO global sort:
    *
    *   1. one scoring scan (map-only expressions), checkpointed so
    *      the later stages don't rescore the corpus;
    *   2. value-range blocks on quality, per-block subtotals
    *      prefix-scanned on the driver (bounded by the block count),
    *      cumulative ranks from a window PARTITIONED by block;
    *   3. the single boundary pair collected (1 row);
    *   4. the verdict is a map-only broadcast compare.
    *
    * Output = every doc with its quality and an integer kept flag
    * (the d11 decision-table shape). */
  def qualityGate(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val scored = qualityScore(spark, d)
      .select(col("doc_id"), col("quality")).localCheckpoint(true)
    try {
      val stats = scored.agg(count(lit(1)),
        min(col("quality")), max(col("quality"))).head()
      val n = stats.getLong(0)
      val cut = (n + 9) / 10 // rows dropped = ceil(N/10)
      if (n == 0) return qualityScore(spark, d)
        .select(col("doc_id"), col("quality"), lit(1).cast("int").as("kept"))
      val (lo, hi) = (stats.getDouble(1), stats.getDouble(2))
      val targetBlocks = spark.conf.get("spark.sql.shuffle.partitions").toLong * 8
      val width = math.max((hi - lo) / targetBlocks, 1e-9)
      val blkCol = least(floor((col("quality") - lit(lo)) / lit(width)),
        lit(targetBlocks - 1)).cast("long")
      val blocked = scored.withColumn("blk", blkCol)
      // subtotals are ≤ targetBlocks rows — driver-sorted instead of a
      // range-partitioning exchange + sampling job (r16, the q33 move)
      val totals = blocked.groupBy(col("blk")).agg(count(lit(1)).as("blk_c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      var acc = 0L
      val prefix = totals.map { case (blk, c) =>
        val o = (blk, acc); acc += c; o
      }
      // only the ONE block containing global rank `cut` can hold the
      // boundary pair (rank = blk_before + within-block rank, so
      // blk_before < cut ≤ blk_before + blk_c) — decided here from the
      // collected subtotals; the rank window then runs over that
      // block's rows alone (r16; the boundary row is unchanged)
      val cumBefore = prefix.toMap
      val boundaryBlk = totals.collectFirst {
        case (blk, c) if cumBefore(blk) < cut && cut <= cumBefore(blk) + c => blk
      }.getOrElse(totals.last._1)
      val offsets = prefix.filter(_._1 == boundaryBlk).toDF("blk", "blk_before")
      val wLocal = Window.partitionBy(col("blk"))
        .orderBy(col("quality"), col("doc_id"))
      // global rank = driver-prefixed block offset + within-block rank
      val boundary = blocked
        .filter(col("blk") === boundaryBlk)
        .withColumn("rnk_local", row_number().over(wLocal))
        .join(broadcast(offsets), Seq("blk"))
        .filter(col("blk_before") + col("rnk_local") === cut)
        .select(col("quality"), col("doc_id"))
        .head()
      val (bq, bid) = (boundary.getDouble(0), boundary.getLong(1))
      // the RETURNED frame rescores from the source (one map-only
      // scan at evaluation time) — it must not reference the
      // checkpoint, which is released before the caller evaluates
      qualityScore(spark, d).select(col("doc_id"), col("quality"),
          when(col("quality") > bq ||
            (col("quality") === bq && col("doc_id") > bid), 1)
            .otherwise(0).cast("int").as("kept"))
        .orderBy(col("doc_id"))
    } finally org.apache.spark.sql.GraftBridge.unpersistPlanRdds(scored)
  }

  /** t17 oracle: the t2 quality CTE + one rank window + the same
    * ceil(N/10) cut. (The oracle MAY sort globally — it is the
    * semantic spec, not the execution strategy.) */
  def qualityGateSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH q AS MATERIALIZED (
       |  SELECT doc_id,
       |    (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) *
       |      least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) AS quality
       |  FROM (
       |    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |      len(list_filter(string_split(text, ' '), t -> list_contains($stopList, t))) AS n_stop
       |    FROM documents)),
       |r AS (
       |  SELECT doc_id, quality,
       |    row_number() OVER (ORDER BY quality, doc_id) AS rnk,
       |    count(*) OVER () AS n
       |  FROM q)
       |SELECT doc_id, quality,
       |  CAST(CASE WHEN rnk > (n + 9) // 10 THEN 1 ELSE 0 END AS INTEGER) AS kept
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** t18: interpolated-bigram log-probability scoring — the stronger
    * perplexity proxy over t13's unigram: token i scores
    * ln(λ·P(wᵢ|wᵢ₋₁) + (1−λ)·P(wᵢ)), the standard Jelinek-Mercer
    * interpolation (λ = 0.7), with the document's first token falling
    * back to its unigram probability. Catches locally-incoherent text
    * (shuffled corpus words) that unigram scoring cannot: each token
    * may be corpus-typical while no ADJACENT pair is.
    *
    * Scale shape: the previous-token column is a lag window keyed on
    * doc_id (the natural partition — no skew, documents are bounded);
    * the count joins are token-keyed shuffles identical to t13's. The
    * model is the corpus itself — both count tables stream map-side
    * partials; nothing is collected.
    *
    * Cross-engine float discipline (t13's, verbatim): per-token ln is
    * rounded to 6 dp — the interpolation is two IEEE double products
    * and an add, spelled identically in both engines, and ln agrees
    * to sub-ulp — then summed as exact decimals, so aggregation order
    * cannot flake the hash. */
  def bigramLogprob(spark: SparkSession, d: String,
                    lambda: Double = 0.7,
                    tok: graft.functions.Tokenizer =
                      graft.functions.WhitespaceTokenizer): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = tok.tokensFrame(docs.select(col("doc_id"), col("text")), "text", "toks")
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val withPrev = toks.withColumn("prev", lag(col("tok"), 1).over(wDoc))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("ucnt"))
    val total = broadcast(uni.agg(sum(col("ucnt")).cast("double").as("total")))
    val bi = withPrev.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("bcnt"))
    val pUni = col("ucnt").cast("double") / col("total")
    val pBi = col("bcnt").cast("double") / col("pucnt").cast("double")
    withPrev
      .join(uni, Seq("tok"))
      .join(uni.select(col("tok").as("prev"), col("ucnt").as("pucnt")), Seq("prev"), "left")
      .join(bi, Seq("prev", "tok"), "left")
      .crossJoin(total)
      .select(col("doc_id"),
        round(log(
          when(col("prev").isNull, pUni)
            .otherwise(lit(lambda) * coalesce(pBi, lit(0.0)) +
              lit(1.0 - lambda) * pUni)), 6)
          .cast("decimal(18,6)").as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("logp")).cast("double").as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp") / col("n_toks"))
      .orderBy(col("doc_id"))
  }

  def bigramLogprobSql(lambda: Double = 0.7): String =
    s"""WITH dl AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tok AS (
       |  SELECT doc_id, i AS pos, toks[i] AS tok,
       |    CASE WHEN i > 1 THEN toks[i - 1] END AS prev
       |  FROM dl, unnest(range(1, len(toks) + 1)) AS t(i)),
       |uni AS (SELECT tok, count(*) AS ucnt FROM tok GROUP BY tok),
       |total AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS n FROM uni),
       |bi AS (SELECT prev, tok, count(*) AS bcnt FROM tok WHERE prev IS NOT NULL GROUP BY prev, tok)
       |SELECT doc_id, count(*) AS n_toks,
       |  CAST(sum(logp) AS DOUBLE) AS sum_logp,
       |  CAST(sum(logp) AS DOUBLE) / count(*) AS avg_logp
       |FROM (
       |  SELECT t.doc_id,
       |    CAST(round(ln(
       |      CASE WHEN t.prev IS NULL THEN CAST(u.ucnt AS DOUBLE) / total.n
       |           ELSE $lambda * coalesce(CAST(b.bcnt AS DOUBLE) / CAST(pu.ucnt AS DOUBLE), 0.0)
       |                + ${1.0 - lambda} * CAST(u.ucnt AS DOUBLE) / total.n END), 6)
       |      AS DECIMAL(18,6)) AS logp
       |  FROM tok t
       |  JOIN uni u ON t.tok = u.tok
       |  LEFT JOIN uni pu ON t.prev = pu.tok
       |  LEFT JOIN bi b ON t.prev = b.prev AND t.tok = b.tok,
       |  total)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
