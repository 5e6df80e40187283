package graft.functions

import org.apache.spark.sql.Column

/** The embedding-model seam — graft's analogue of the reference's
  * `embedding(model, text)` call (tools.yaml:23, sql/04_embeddings.sql:5-7
  * invoke Vertex `text-embedding-005` inside SQL). Everything that
  * turns text into a vector goes through ONE of these two methods:
  *
  *  - [[embed]]: driver-side scalar form — query literals for the
  *    single-query serve paths, micro-batch query sets in the four
  *    probe streams (bounded per trigger, so driver-side is the right
  *    place: one model call per query, no executor model distribution);
  *  - [[embedCol]]: executor-side column form — batch ingestion
  *    ([[graft.sources.Ingest.embedDocuments]]), where N TB of text
  *    flows through a map-only plan.
  *
  * [[FakeEmbedder]] is the default implementation (deterministic
  * trigram hashing — required for the DuckDB oracle gate and the only
  * sane choice in a hermetic build). A real deployment implements this
  * trait over a batched encoder: `embedCol` should wrap the model in
  * `mapPartitions`/`mapInPandas`-style batched inference (amortize
  * model setup per partition, feed it row batches), `embed` calls the
  * same model once. Swapping implementations touches NO operator code:
  * index builds, stores, serves and streams only ever see the
  * resulting `array<float>` column.
  */
trait Embedder extends Serializable {
  /** output vector width (the reference's schema pins vector(768),
    * sql/02_schema.sql:20; the test corpus uses 64) */
  def dim: Int

  /** one text → one vector; deterministic per implementation run so a
    * query literal embedded on the driver matches the same text
    * embedded anywhere else */
  def embed(text: String): Array[Float]

  /** column form for batch ingest: must equal [[embed]] row-wise.
    * Implementations should stay map-only (native expression, or
    * batched inference inside mapPartitions) — never a per-row
    * interpreted UDF on the hot path. */
  def embedCol(text: Column): Column

  /** Frame form — what batch ingest actually calls: append an
    * `embedding` column equal to [[embed]] of `textCol`, row-wise.
    * The default is the map-only column form; a HEAVYWEIGHT encoder
    * overrides this with partition-level batched inference
    * (`mapPartitions` with a per-partition model handle, feeding the
    * model row BATCHES — the m3 decode pattern; see
    * [[FileEmbedder]]), which no `Column => Column` contract can
    * express. Either way the plan stays map-only: no shuffle, no
    * per-row model setup. */
  def embedFrame(df: org.apache.spark.sql.DataFrame,
                 textCol: String = "text"): org.apache.spark.sql.DataFrame =
    df.withColumn("embedding",
      embedCol(org.apache.spark.sql.functions.col(textCol)))
}
