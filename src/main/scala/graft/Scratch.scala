package graft


/** Throwaway local runner for iterating on a single query / plan audits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(defaultCpus = "32")
    val d = LocalSession.sfDir()
    val li0 = graft.io.Tables.table(spark, d, "lineitem")
    val li = (1 to 10).map(_ => li0).reduce(_ unionByName _)
    li.count() // warm
    val dir = sys.props("java.io.tmpdir") + "/graft_tput_csv"
    val t0 = System.nanoTime()
    val rows = graft.io.Tables.writeCsvChunks(li, dir, maxRecordsPerFile = 200000L)
    val tw = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val back = graft.io.Tables.readCsvChunks(spark, dir, li.schema).count()
    val tr = (System.nanoTime() - t1) / 1e9
    val gz = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv.gz"))
      .map(_.length).sum
    // uncompressed byte volume = what the reference's COPY pipe moves
    val raw = spark.read.schema(li.schema).option("header", "true")
      .csv(dir).inputFiles.length // just to force list; raw size below
    val rawBytes = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      // decompress-count once
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv.gz")).map { f =>
        val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
        val buf = new Array[Byte](1 << 16)
        var n = 0L; var r = in.read(buf)
        while (r > 0) { n += r; r = in.read(buf) }
        in.close(); n
      }.sum
    }
    println(f"TPUT rows=$rows write=$tw%.2fs read=$tr%.2fs gz=${gz / 1e6}%.1fMB raw=${rawBytes / 1e6}%.1fMB")
    println(f"TPUT write_rate=${rawBytes / 1e9 / (tw / 3600)}%.1f GB/h read_rate=${rawBytes / 1e9 / (tr / 3600)}%.1f GB/h")
    spark.stop()
  }
}
