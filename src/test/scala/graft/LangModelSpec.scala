package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangModel

/** Bigram-LM scoring laws. The operator is integer-exact by design, so the
  * generative law demands EXACT equality against a plain-Scala recompute —
  * any drift (tokenization, head-count definition, div semantics, the
  * length(bin(..)) surprisal) breaks it.
  */
class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala model: identical tokenization (lowercase whitespace
    * split), bigram counts, head counts, surprisal = binary-string length
    * of c1/c2 (floor division), per-doc integer totals. */
  private def recompute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val bigrams = docs.map { case (id, tx) =>
      val t = tx.toLowerCase.split("\\s+").toSeq
      id -> t.zip(t.drop(1))
    }
    val all = bigrams.flatMap(_._2)
    val c2 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    bigrams.collect { case (id, bs) if bs.nonEmpty =>
      val nll = bs.map(b =>
        java.lang.Long.toBinaryString(c1(b._1) / c2(b)).length.toLong).sum
      id -> ((bs.size.toLong, nll, nll * 100 / bs.size))
    }.toMap
  }

  test("generative law: operator scores equal the plain-Scala recompute " +
    "on random corpora (incl. empty/single-token docs)") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    (0 until 3).foreach { round =>
      val docs = (0 until 40).map { i =>
        val n = rnd.nextInt(12) // 0 and 1-token docs exercise exclusion
        (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = LangModel.bigramLmScores(docs.toDF("doc_id", "text"),
        "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == recompute(docs), s"round $round diverged from recompute")
    }
  }

  test("fluency signal: a templated corpus scores fewer bits per bigram " +
    "than a token-salad corpus") {
    // 20 copies of one sentence → every bigram is its head's dominant
    // continuation (c1/c2 small); salads over the same vocab spread each
    // head across many continuations (c1/c2 large). The filter's reason
    // to exist, asserted end-to-end.
    val template = (0 until 20).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat too"))
    val rnd = new scala.util.Random(7)
    val words = "the cat sat on mat and dog too".split(" ")
    val salad = (100 until 120).map(i =>
      (i.toLong, Vector.fill(11)(words(rnd.nextInt(words.length))).mkString(" ")))
    val scores = LangModel.bigramLmScores((template ++ salad).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val tAvg = template.map(d => scores(d._1)).sum.toDouble / template.size
    val sAvg = salad.map(d => scores(d._1)).sum.toDouble / salad.size
    assert(tAvg < sAvg,
      s"templated corpus must score lower: template=$tAvg salad=$sAvg")
  }

  test("fluency band: registered query keeps exactly the [p05, p95] " +
    "score band of the plain-Scala recompute") {
    val rnd = new scala.util.Random(31)
    val words = "the cat sat on mat and dog too".split(" ")
    val docs =
      // templated block: low bits/bigram
      (0 until 15).map(i => (i.toLong, "the cat sat on the mat and the dog sat too")) ++
      // salads: high bits/bigram
      (100 until 115).map(i =>
        (i.toLong, Vector.fill(11)(words(rnd.nextInt(words.length))).mkString(" "))) ++
      // no-bigram docs: unscored, never in any band
      Seq((200L, "solo"), (201L, ""))
    val sf = TestSpark.tmpDir("fluencysf")
    docs.map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val scores = recompute(docs).view.mapValues(_._3).toMap
    val n = scores.size
    def bound(q: Double): Long = {
      val k = math.ceil(q * n).toLong
      val sorted = scores.values.toSeq.sorted
      sorted.zipWithIndex.collectFirst {
        case (v, i) if i + 1 >= k => v }.get
    }
    val (lo, hi) = (bound(0.05), bound(0.95))
    val expected = scores.filter { case (_, v) => v >= lo && v <= hi }
    val got = SparkEntry.queries("x_filter_fluency_band")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"band [$lo, $hi] over $n scored docs diverged")
  }

  test("ppl buckets: per-lang partition obeys the lower-quantile thirds " +
    "law and is tie-stable (same score, same bucket)") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_ppl_buckets")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty && rows.map(_._4).toSet.subsetOf(
      Set("head", "middle", "tail")))
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      def k(q: Int) = (n * q + 2) / 3 // ⌈q·n/3⌉ for q = 1, 2
      // tie-stability: a score maps to exactly one bucket within its lang
      assert(rs.groupBy(_._3).values.forall(_.map(_._4).distinct.length == 1),
        s"$lang: one score split across buckets")
      // score ordering: every head score < every middle score < every tail
      val by = rs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for (h <- by.get("head"); m <- by.get("middle"))
        assert(h.max < m.min, s"$lang: head/middle overlap")
      for (m <- by.get("middle"); t <- by.get("tail"))
        assert(m.max < t.min, s"$lang: middle/tail overlap")
      // lower-quantile law: head holds ≥ ⌈n/3⌉ docs, but removing its
      // topmost score class drops below ⌈n/3⌉ (b1 is the SMALLEST score
      // whose cumulative count reaches the third); same at 2n/3
      val head = by.getOrElse("head", Array.empty[Long])
      val hm = head.length + by.getOrElse("middle", Array.empty[Long]).length
      assert(head.length >= k(1) &&
        head.length - head.count(_ == head.max) < k(1),
        s"$lang: head bound not minimal (|head|=${head.length}, n=$n)")
      assert(hm >= k(2) &&
        (by.get("middle") match {
          case Some(m) => hm - m.count(_ == m.max) < k(2)
          case None    => true // middle empty ⇒ b2 = b1, bound vacuous
        }), s"$lang: middle bound not minimal")
    }
  }

  test("degenerate shapes: no-bigram docs are absent; repeated single " +
    "bigram scores 1 bit per pair") {
    val docs = Seq(
      (1L, ""),               // empty text
      (2L, "solo"),           // single token — no bigram evidence
      (3L, "go go go go go")) // one bigram (go,go) ×4: c1=c2=4 → 1 bit
    val got = LangModel.bigramLmScores(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(3L -> ((4L, 4L, 100L))))
  }
}
