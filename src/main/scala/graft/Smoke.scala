package graft


/** Local smoke-check of the driver contract's `entry` gate (rows > 0 on
  * sf0.001). Run: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(logLevel = "ERROR")
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
