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

  test("dpRelease: the noise table is a valid ε=1 discrete-Laplace " +
    "inverse CDF and the release applies exactly its entries") {
    // Table sanity: symmetric support, mode at 0 with probability mass
    // (1−α)/(1+α) ≈ 0.462 → ~118/256 zeros, monotone non-decreasing
    assert(Privacy.dpNoiseTable.size == 256)
    assert(Privacy.dpNoiseTable.min >= -6 && Privacy.dpNoiseTable.max <= 6)
    assert(Privacy.dpNoiseTable.count(_ == 0L) == 118)
    assert(Privacy.dpNoiseTable.sliding(2).forall(p => p(0) <= p(1)),
      "an inverse CDF is monotone in the quantile")
    // Release law: noisy − true == the table entry the key's hash selects
    def idx(key: Long): Int =
      ((((key % 2147483648L) * 2654435761L) % 4294967296L) % 256).toInt
    val keys = (0L until 40L)
    val df = keys.flatMap(k => Seq.fill(10)(k)).toDF("k")
    val out = Privacy.dpRelease(df, "k").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("noisy_n")).toMap
    keys.foreach { k =>
      val expected = math.max(0L, 10L + Privacy.dpNoiseTable(idx(k)))
      assert(out(k) == expected, s"key $k: ${out(k)} != $expected")
    }
    // the mechanism must actually perturb something on this key range
    assert(keys.exists(k => Privacy.dpNoiseTable(idx(k)) != 0L))
    // determinism: a seeded release is reproducible run to run
    val again = Privacy.dpRelease(df, "k").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("noisy_n")).toMap
    assert(again == out)
  }

  test("dpRelease seeds non-numeric keys from the md5 fold instead of a " +
    "failed cast: string-keyed releases are noised, not zeroed") {
    import spark.implicits._
    // pre-fix, cast('en' as long) either threw (ANSI) or nulled the seed,
    // releasing noisy_n = 0 for EVERY group — a destroyed histogram
    val df = Seq.fill(10)("en").union(Seq.fill(7)("de")).toDF("k")
    def strIdx(s: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15)
      val key = java.lang.Long.parseLong(hex, 16)
      ((((key % 2147483648L) * 2654435761L) % 4294967296L) % 256).toInt
    }
    val out = Privacy.dpRelease(df, "k").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("noisy_n")).toMap
    assert(out("en") ==
      math.max(0L, 10L + Privacy.dpNoiseTable(strIdx("en"))))
    assert(out("de") ==
      math.max(0L, 7L + Privacy.dpNoiseTable(strIdx("de"))))
    // numeric-LOOKING strings take the numeric basis (try_cast succeeds),
    // matching what the same value releases under a numeric column type
    val numLike = Privacy.dpRelease(Seq.fill(4)("42").toDF("k"), "k")
      .head().getAs[Long]("noisy_n")
    val numReal = Privacy.dpRelease(Seq.fill(4)(42L).toDF("k"), "k")
      .head().getAs[Long]("noisy_n")
    assert(numLike == numReal)
  }

  test("dpRelease clamps negative releases to 0 and never emits the " +
    "true count") {
    // find a key whose table entry is negative; give it a tiny group
    def idx(key: Long): Int =
      ((((key % 2147483648L) * 2654435761L) % 4294967296L) % 256).toInt
    val negKey = (0L until 256L)
      .find(k => Privacy.dpNoiseTable(idx(k)) <= -2L).get
    val df = Seq(negKey).toDF("k")  // true count 1, noise ≤ −2 → clamp
    val row = Privacy.dpRelease(df, "k").head()
    assert(row.getAs[Long]("noisy_n") == 0L,
      "a negative noisy count is a pure noise giveaway — clamp to 0")
    assert(!Privacy.dpRelease(df, "k").columns.contains("n_true"),
      "the exact histogram must not ride along with its own DP release")
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
