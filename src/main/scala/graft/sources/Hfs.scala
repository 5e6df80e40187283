package graft.sources

import org.apache.spark.sql.SparkSession

/** The one Hadoop-FileSystem handle helper every store module shares
  * (eight private copies had accumulated — one per store). */
private[graft] object Hfs {
  def fs(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
