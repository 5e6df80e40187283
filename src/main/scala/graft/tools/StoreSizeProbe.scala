package graft.tools

/** Byte accounting for the store artifacts (task: the `meta/byval`
  * covering layout carries a full embedding copy — measure it rather
  * than guess). Pure filesystem walk, no Spark: prints one JSON line
  * of component → bytes for a corpus/store dir tree (the
  * FilteredScaleProbe layout by default), so PERF.md's size table is
  * reproducible.
  *
  * Usage: runMain graft.tools.StoreSizeProbe [dir]
  */
object StoreSizeProbe {
  private def du(p: java.io.File): Long =
    if (!p.exists()) -1L
    else if (p.isFile) p.length()
    else p.listFiles() match {
      case null => 0L
      case fs => fs.map(du).filter(_ >= 0).sum
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_filtered_scale_1000"))
    val components = Seq(
      "corpus_embeddings" -> "embeddings.parquet",
      "corpus_documents" -> "documents.parquet",
      "srp_banded" -> "srpstore/banded",
      "srp_embed" -> "srpstore/embed",
      "srp_banding" -> "srpstore/banding",
      "edge_store" -> "edgestore",
      "meta_byval" -> "srpstore/meta/byval",
      "meta_byid" -> "srpstore/meta/byid",
      "meta_stats" -> "srpstore/meta/stats")
    val sizes = components.map { case (tag, sub) =>
      tag -> du(new java.io.File(s"$dir/$sub"))
    }
    val body = sizes.map { case (t, b) => s""""$t":$b""" }.mkString(",")
    println(s"""{"metric":"store_bytes","dir":"$dir",$body}""")
  }
}
