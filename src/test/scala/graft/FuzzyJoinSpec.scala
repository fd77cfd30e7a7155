package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import spark.implicits._

  private def names(ns: String*) = ns.toDF("name")

  test("finds pairs within maxDist via prefix OR suffix blocks") {
    val got = FuzzyJoin.fuzzyPairs(
      names("cold anvil", "old anvil", "cold bolt", "old bolt", "hot gear"),
      "name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    // "cold anvil"/"old anvil" share the suffix block (dist 1);
    // "cold bolt"/"old bolt" likewise. "hot gear" matches nothing.
    assert(got == Set(("cold anvil", "old anvil", 1), ("cold bolt", "old bolt", 1)))
  }

  test("emits each pair once with left < right and never self-pairs") {
    val got = FuzzyJoin.fuzzyPairs(
      names("abcdef", "abcdex", "abcdef"), "name", maxDist = 1)
      .as[(String, String, Int)].collect()
    assert(got.toSeq == Seq(("abcdef", "abcdex", 1)))
  }

  test("documented recall limit: edits in BOTH prefix and suffix escape blocking") {
    // dist("xbcdey","abcdez") = 2 but first-3 and last-3 both differ →
    // never a candidate. This pins the multi-pass blocking trade-off.
    val got = FuzzyJoin.fuzzyPairs(names("xbcdey", "abcdez"), "name", maxDist = 3)
    assert(got.count() == 0)
  }

  test("maxBlock cap drops degenerate blocks instead of exploding pairs") {
    // 50 strings sharing prefix AND suffix blocks → 1225 pairs uncapped;
    // a cap below the block size yields zero candidates from that block.
    val many = (0 until 50).map(i => f"aaa$i%02daaa").toDF("name")
    assert(FuzzyJoin.fuzzyPairs(many, "name", maxDist = 6, maxBlock = 10).count() == 0)
    assert(FuzzyJoin.fuzzyPairs(many, "name", maxDist = 6).count() > 0)
  }

  test("short strings pair via the dedicated pass: below 2·blockLen the " +
    "prefix/suffix regions overlap, so a single mid-string edit changes " +
    "both keys") {
    // dist("abcd","abxd") = 1, but first-3 AND last-3 keys both differ —
    // pre-fix, this distance-1 pair silently escaped blocking entirely
    val got = FuzzyJoin.fuzzyPairs(names("abcd", "abxd"), "name", maxDist = 3)
      .as[(String, String, Int)].collect()
    assert(got.toSeq == Seq(("abcd", "abxd", 1)), s"got ${got.toSeq}")
    // a long string never enters the short pass: 'abcdef' (≥ 2·blockLen)
    // pairs with 'abcdex' only through prefix blocking, and with a short
    // string not at all unless a prefix/suffix key matches
    val cross = FuzzyJoin.fuzzyPairs(names("abcd", "abcdqz"), "name",
      maxDist = 2)
    assert(cross.count() == 1, "short-long still pairs via shared prefix")
  }

  test("null names are ignored") {
    val df = Seq(Some("cold anvil"), Some("old anvil"), None)
      .toDF("name")
    assert(FuzzyJoin.fuzzyPairs(df, "name", maxDist = 2).count() == 1)
  }
}
