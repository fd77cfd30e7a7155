package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table = Seq(
    (1L, "a"), (2L, "b"), (23L, "c"), (46L, "d"), (46L, "e"), (99L, "f"))
    .toDF("uid", "payload")

  test("forgetRows drops exactly the docket rows; residual re-reports zero") {
    val docket = Seq(23L, 46L).toDF("subject")
    val scrubbed = Privacy.forgetRows(table, "uid", docket)
    assert(scrubbed.select("uid").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 99L))
    // the audit a deletion run must end with: zero residual subject rows
    val residual = Privacy.forgetReport(
      Seq(("t", scrubbed, "uid")), docket).head()
    assert(residual.getAs[Long]("n_deleted") == 0L)
    assert(residual.getAs[Long]("n_before") == 3L)
    assert(residual.getAs[Long]("n_after") == 3L)
  }

  test("report counts are exact and immune to docket duplicates and nulls") {
    // duplicated + null docket entries must not multiply the outer join
    val docket = Seq(Some(23L), Some(23L), Some(46L), None, Some(777L))
      .toDF("subject")
    val r = Privacy.forgetReport(Seq(("t", table, "uid")), docket).head()
    assert(r.getAs[Long]("n_before") == 6L)
    assert(r.getAs[Long]("n_deleted") == 3L) // 23, 46, 46
    assert(r.getAs[Long]("n_after") == 3L)
    // scrub agrees with the report
    assert(Privacy.forgetRows(table, "uid", docket).count() == 3L)
  }

  test("multi-table report fans the same docket across differing key names") {
    val other = Seq((23L, 1.0), (5L, 2.0)).toDF("user_id", "v")
    val docket = Seq(23L).toDF("subject")
    val rows = Privacy.forgetReport(
      Seq(("a", table, "uid"), ("b", other, "user_id")), docket)
      .collect().map(r => r.getAs[String]("table_name") ->
        r.getAs[Long]("n_deleted")).toMap
    assert(rows == Map("a" -> 1L, "b" -> 1L))
  }
}
