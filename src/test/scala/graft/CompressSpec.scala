package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftCompress

/** Contracts for the native DeflateLength expression and the
  * compressibility screen built on it: the distributed expression equals a
  * driver-side recompute byte-for-byte (the rows-only query's stand-in for
  * a DuckDB oracle), repetitive text lands strictly below natural-ish text,
  * nulls stay null, and the SQL-injected twin resolves.
  */
class CompressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expression equals the plain-Scala recompute; nulls stay null") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab " * 200,
      "x",
      "",
      null)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", GraftCompress.deflateLen($"text").as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expected = Option(t)
        .map(s => GraftCompress.deflatedLength(s.getBytes("UTF-8")))
      assert(got(i.toLong) == expected, s"row $i ('$t')")
    }
  }

  test("repetitive text deflates strictly below distinct-token text of " +
    "the same length; the query flags only the repetitive doc") {
    val rep = Seq.fill(100)("tok").mkString(" ")  // 100 × same token → ~4% ratio
    // high-entropy tokens (md5 hex prefixes) → ~57% ratio, safely above
    // the 45% flag line; sequential "t001 t002 ..." would NOT do — the
    // shared prefix + digit structure deflates below the line too
    val nat = (0 until 100).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    }.mkString(" ")
    val repLen = GraftCompress.deflatedLength(rep.getBytes("UTF-8"))
    val natLen = GraftCompress.deflatedLength(nat.getBytes("UTF-8"))
    assert(repLen < natLen,
      s"repetition must compress better: $repLen vs $natLen")

    val dir = TestSpark.tmpDir("compsf")
    Seq((1L, rep, "en", "s", 0L), (2L, nat, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x_compressibility")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(1L -> true, 2L -> false), s"got $out")
  }

  test("SQL-injected deflate_length resolves and matches the Scala API") {
    val viaSql = spark.sql("SELECT deflate_length('abcabcabc')")
      .head().getLong(0)
    assert(viaSql ==
      GraftCompress.deflatedLength("abcabcabc".getBytes("UTF-8")))
  }
}
