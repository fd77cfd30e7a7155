package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationFunnel
import graft.queries.Pipeline

/** Funnel-report laws. The report is pure integer counting, so the
  * generative law demands EXACT equality against a plain-Scala recompute of
  * all six stages, including the fingerprint-dedup window's
  * first-surviving-copy semantics.
  */
class CurationFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (doc_id, text, lang) corpus → the six (stage, n_out) counts. */
  private def recompute(docs: Seq[(Long, String, String)]): Seq[Long] = {
    val emailRe = Pipeline.EmailRe.r
    val st = docs.map { case (id, text, lang) =>
      val toks = text.toLowerCase.split("\\s+").toSeq
      val shl = if (toks.size < 3) Seq(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      val rep = 1.0 - shl.distinct.size.toDouble / shl.size
      val s1 = lang == "en"
      val s2 = s1 && toks.size >= 20 && toks.size <= 90
      val s3 = s2 && rep <= 0.05
      val s4 = s3 && emailRe.findFirstIn(text).isEmpty
      (id, text, s1, s2, s3, s4)
    }
    val kept = st.filter(_._6).groupBy(_._2).map { case (_, g) =>
      g.map(_._1).min
    }.toSet
    Seq(st.size.toLong, st.count(_._3).toLong, st.count(_._4).toLong,
      st.count(_._5).toLong, st.count(_._6).toLong, kept.size.toLong)
  }

  private def run(docs: Seq[(Long, String, String)]): Seq[(Int, String, Long, Long)] =
    CurationFunnel.funnelReport(
      docs.toDF("doc_id", "text", "lang"), "en", Pipeline.EmailRe)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("generative law: stage counts equal the plain-Scala recompute on " +
    "random corpora with planted duplicates, PII, and salads") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector.tabulate(40)(i => s"tok$i")
    (0 until 3).foreach { round =>
      val base = (0 until 60).map { i =>
        val n = rnd.nextInt(110) // spans both length-band edges
        val toks = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
        val withPii = if (rnd.nextInt(10) == 0)
          (toks :+ "reach.me@example.com").mkString(" ")
        else toks.mkString(" ")
        val lang = Seq("en", "en", "en", "de", "fr")(rnd.nextInt(5))
        (i.toLong, withPii, lang)
      }
      // planted exact duplicates: same text, later ids — dedup must keep
      // only the first surviving copy per fingerprint
      val dups = (0 until 10).map(k =>
        (1000L + k, base(rnd.nextInt(base.size))._2, "en"))
      val docs = base ++ dups
      val got = run(docs)
      assert(got.map(_._3) == recompute(docs), s"round $round n_out diverged")
      // conservation: drops telescope back to the ingest count
      assert(got.head._3 == got.map(_._4).sum + got.last._3,
        s"round $round drops do not telescope")
      // monotonicity: a funnel never grows
      assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
        s"round $round funnel grew")
    }
  }

  test("stage order and labels are the canonical six") {
    val got = run(Seq((1L, Vector.fill(30)("w").mkString(" "), "en")))
    assert(got.map(g => (g._1, g._2)) == Seq(0 -> "ingest", 1 -> "lang",
      2 -> "length_band", 3 -> "repetition", 4 -> "pii", 5 -> "exact_dedup"))
  }

  test("null text and null lang fail their stages instead of poisoning " +
    "the boolean chain") {
    val docs = Seq[(java.lang.Long, String, String)](
      (1L, null, "en"),   // null text: fails length band, not an NPE
      (2L, Vector.fill(25)("w").mkString(" "), null), // null lang: dropped at lang
      (3L, ("a b c d e f g h i j k l m n o p q r s t u v"), "en"))
    val got = CurationFunnel.funnelReport(
      docs.toDF("doc_id", "text", "lang"), "en", Pipeline.EmailRe)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got("ingest") == 3 && got("lang") == 2 &&
      got("length_band") == 1 && got("exact_dedup") == 1)
  }
}
