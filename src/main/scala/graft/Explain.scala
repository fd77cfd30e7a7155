package graft

/** Dev tool: print the formatted physical plan of the named queries.
  * `sbt "runMain graft.Explain q21_late_suppliers x_tfidf_top_terms"`;
  * honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(defaultCpus = "8", logLevel = "ERROR")
    val sf = LocalSession.sfDir("/root/testdata/sf0.001")
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries.getOrElse(q, sys.error(
        s"unknown query '$q'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
        .apply(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
