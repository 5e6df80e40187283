package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the write-once / join-forever answer to
  * repeated co-located joins. Two tables bucketed (and sorted) on the
  * join key with the same bucket count join with NO exchange on
  * either side: at 100 TB the entire shuffle (the dominant cost of a
  * fact-fact join) disappears from every downstream query that joins
  * on the bucket key. The price is paid once at write time.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent: with an in-memory catalog a previous JVM's warehouse
    // dir survives while the table entry doesn't — clear both
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // the catalog lowercases identifiers — a mixed-case name would
    // delete the wrong (nonexistent) dir and leave the real stale one
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase(java.util.Locale.ROOT))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** join two same-bucketed tables on their bucket key — plans with
    * zero Exchange nodes (verified in spec) */
  def cooperativeJoin(spark: SparkSession, leftTable: String,
                      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
