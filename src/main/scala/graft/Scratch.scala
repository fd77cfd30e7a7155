package graft


/** Throwaway local runner for iterating on a single query / plan audits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build(defaultCpus = "8")
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("s")
    df.createOrReplaceTempView("t")
    val bloom = spark.sql(
      "SELECT bloom_filter_agg(xxhash64(s), CAST(100 AS BIGINT), CAST(8000 AS BIGINT)) AS bf FROM t")
    bloom.createOrReplaceTempView("bf")
    val probe = spark.sql(
      "SELECT s, might_contain((SELECT bf FROM bf), xxhash64(s)) AS hit FROM t")
    probe.show()
    val neg = Seq("zzz").toDF("s")
    neg.createOrReplaceTempView("n")
    spark.sql("SELECT s, might_contain((SELECT bf FROM bf), xxhash64(s)) AS hit FROM n").show()
    spark.stop()
  }
}
