package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}

/** Text-analysis operators: token counting, quality facets, language ID,
  * fingerprints, and the multimodal metadata/decode plumbing.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tf-idf search: planted tf/df produce the exact log2-bin scores in " +
    "rank order") {
    val sf = TestSpark.tmpDir("tfidf")
    Seq(
      (1L, "join join merge xyz", "en", "s", 0L),
      (2L, "stream stream stream other", "en", "s", 0L),
      (3L, "nothing relevant here", "en", "s", 0L),
      (4L, "join stream", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    // N=4; df(join)=2, df(merge)=1, df(stream)=2 →
    // idf_bits: join = len(bin(2)) = 2, merge = len(bin(4)) = 3, stream = 2
    // scores: d1 = 2·2 + 1·3 = 7, d2 = 3·2 = 6, d4 = 1·2 + 1·2 = 4; d3 out
    val got = SparkEntry.queries("x_search_tfidf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L), (2L, 6L), (4L, 4L)), s"got $got")
  }

  test("length-band filter keeps exactly the [p05, p95] lower-quantile band") {
    val sf = TestSpark.tmpDir("lenband")
    // 100 docs with n_chars 1..100: kLo = ceil(5) = 5, kHi = ceil(95) = 95
    (1L to 100L).map(i => (i, "x" * i.toInt, "en", "s", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val kept = SparkEntry.queries("x_filter_length_band")(spark, sf)
      .collect().map(_.getLong(1))
    assert(kept.min == 5L && kept.max == 95L && kept.length == 91,
      s"expected lengths 5..95, got ${kept.min}..${kept.max} (${kept.length})")
    // duplicated-length mass moves the cumulative bound, not the rank:
    // 96 copies of length 10 + lengths 1..4 → cum(10) ≥ 5 → lo = 10
    val sf2 = TestSpark.tmpDir("lenband2")
    ((1L to 4L).map(i => (i, "x" * i.toInt, "en", "s", i)) ++
      (5L to 100L).map(i => (i, "x" * 10, "en", "s", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf2/documents.parquet")
    val kept2 = SparkEntry.queries("x_filter_length_band")(spark, sf2)
      .collect().map(_.getLong(1))
    assert(kept2.forall(_ == 10L) && kept2.length == 96,
      s"the histogram bound must land on the heavy length, got " +
        s"${kept2.distinct.toSeq} (${kept2.length})")
  }

  test("repetition ratio: repeated trigrams counted beyond first occurrence") {
    val sf = TestSpark.tmpDir("repratio")
    Seq(
      (1L, "a b a b a b a b", "en", "s", 15L), // trigrams: "a b a"×3, "b a b"×3
      (2L, "t1 t2 t3 t4 t5", "en", "s", 14L),  // all distinct
      (3L, "x y", "en", "s", 3L))               // <3 tokens → no trigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("x_repetition_ratio")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 4L, 4.0 / 6)),
      s"looping doc: 6 trigrams, 4 repeats, got ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0)), s"distinct doc, got ${out(2L)}")
    assert(!out.contains(3L), "sub-trigram docs drop like the oracle")
  }

  test("n-gram language ID discriminates crafted sentences") {
    val out = Seq(
      (1L, "the cat and the dog are singing in the garden"),
      (2L, "der hund und die katze schlafen schon in der schule"),
      (3L, "el perro que corre y el gato que duerme en la habitación"),
      (4L, "le chien et le chat sont heureux tous les deux"),
      (5L, null.asInstanceOf[String])) // null text → deterministic fallback
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langIdNgram(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en", s"got ${out(1L)}")
    assert(out(2L) == "de", s"got ${out(2L)}")
    assert(out(3L) == "es", s"got ${out(3L)}")
    assert(out(4L) == "fr", s"got ${out(4L)}")
    assert(out(5L) == "fr", "null text falls through every WHEN to the " +
      "otherwise branch — same in DuckDB's CASE")
  }

  test("token counts: whitespace vs BPE-ish subword") {
    val out = Seq((1L, "Hello world, it's 42 degrees!"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishCount(col("text")).as("bpe"))
      .collect().head
    assert(out.getLong(0) == 5)
    // Hello|world|,|it|'|s|42|degrees|! → 9 subword pieces
    assert(out.getLong(1) == 9)
  }

  test("quality facets are exact integers and exact ratios") {
    val out = TextAnalysis.qualityFacets(
      Seq((1L, "the cat sat. the mat!")).toDF("doc_id", "text"), "text")
      .collect().head
    assert(out.getAs[Long]("n_tokens") == 5)
    assert(out.getAs[Long]("n_punct") == 2) // '.' and '!'
    assert(out.getAs[Long]("n_stop") == 1)  // distinct stopword 'the'
    assert(out.getAs[Double]("stop_ratio") == 1.0 / 5)
  }

  test("langId picks the marker-dominant language deterministically") {
    val out = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist hier"),
      (3L, "el perro y la casa es grande"),
      (4L, "le chien et un chat est grand"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr"))
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val fps = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("BPE merge rounds: driver fast path equals the forced-distributed " +
    "loop (the pageRankInt equality pattern)") {
    val sf = "/root/testdata/sf0.001"
    def run(): Seq[(Long, String, Long)] =
      graft.queries.Pipeline.bpeMergeRounds(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val driver = run() // default gate (64 MB of parquet) → driver loop
    spark.conf.set("graft.bpe.driverMaxBytes", "0")
    val distributed = try run() finally
      spark.conf.unset("graft.bpe.driverMaxBytes")
    assert(driver == distributed,
      s"driver/distributed BPE recurrences diverged:\n$driver\n$distributed")
    assert(driver.map(_._1) == Seq(1L, 2L, 3L), "three rounds, in order")
    assert(driver.forall(_._3 > 0), "every merge has a positive count")
  }

  test("utf8Lt matches Spark's UTF8String ordering — ScalaCheck property " +
    "incl. above-BMP code points where UTF-16 compareTo diverges") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.unsafe.types.UTF8String
    // generator biased toward the divergence zone: mix ASCII, U+E000..FFFF
    // (sorts HIGH in UTF-16 code units, low-ish in code points), and
    // supplementary planes (surrogate pairs in UTF-16, 4-byte in UTF-8)
    val codePoint = Gen.frequency(
      5 -> Gen.chooseNum(0x20, 0x7e),
      2 -> Gen.chooseNum(0xe000, 0xfffd),
      2 -> Gen.chooseNum(0x10000, 0x10ffff),
      1 -> Gen.chooseNum(0x80, 0xd7ff))
    val str = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, codePoint).map(cps =>
        new String(cps.toArray, 0, cps.length)))
    val prop = Prop.forAll(str, str) { (a, b) =>
      graft.queries.Pipeline.utf8Lt(a, b) ==
        (UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), prop)
    assert(res.passed, s"utf8Lt diverged from UTF8String order: ${res.status}")
    // the motivating witness: U+FFFD sorts after U+10000 in UTF-16 code
    // units but before it in UTF-8 bytes / code points
    assert(graft.queries.Pipeline.utf8Lt("�", new String(Array(0x10000), 0, 1)))
    assert("�".compareTo(new String(Array(0x10000), 0, 1)) > 0,
      "Java compareTo must disagree here or the UTF-8 comparator is unmotivated")
  }

  test("htmlToText: script/style bodies never leak, entities decode once " +
    "(&amp;lt; stays literal), block tags separate words") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script body contains markup-looking text — must vanish WITH the
      // block, not survive tag-stripping
      (1L, """<p>keep</p><script>var a = "<p>leak</p>";</script><p>too</p>"""),
      (2L, "<style>p{color:red}</style><b>bold</b> text"),
      // double-decode guard: &amp;lt; is the TEXT "&lt;", never "<"
      (3L, "<p>a &amp;lt; b &amp; c &lt;tag&gt; d&nbsp;e</p>"),
      // block boundaries must become spaces, not concatenation
      (4L, "<div>alpha</div><div>beta</div>"),
      (5L, "  <p>  spaced   out  </p>  "))
    val out = cases.toDF("id", "html")
      .select(col("id"), TextAnalysis.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "keep too", s"script body leaked: '${out(1L)}'")
    assert(out(2L) == "bold text", s"style body leaked: '${out(2L)}'")
    assert(out(3L) == "a &lt; b & c <tag> d e",
      s"entity decode wrong: '${out(3L)}'")
    assert(out(4L) == "alpha beta", s"blocks concatenated: '${out(4L)}'")
    assert(out(5L) == "spaced out", s"whitespace not collapsed: '${out(5L)}'")
  }

  test("sftFormat: short docs drop, template renders verbatim with case " +
    "preserved, over-budget docs truncate at the context cap") {
    val mk = (n: Int) => (1 to n).map(i => s"W$i").mkString(" ")
    val docs = Seq(
      (1L, mk(15)),  // < 12 + 4 → dropped
      (2L, mk(16)),  // minimal keeper: 4-token completion, no truncation
      (3L, mk(80)))  // over the 76-token budget → truncated
      .toDF("doc_id", "text")
    val out = TextAnalysis.sftFormat(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(!out.contains(1L), "15-token doc yields a trivial completion")
    assert(out(2L)._1 ==
      "<|user|>\n" + (1 to 12).map(i => s"W$i").mkString(" ") +
      "\n<|assistant|>\n" + (13 to 16).map(i => s"W$i").mkString(" ") +
      "\n<|end|>", s"template mismatch: ${out(2L)._1}")
    assert(out(2L)._2 == 16L && !out(2L)._3)
    assert(out(3L)._1.endsWith(
      (13 to 76).map(i => s"W$i").mkString(" ") + "\n<|end|>") &&
      out(3L)._2 == 76L && out(3L)._3,
      "completion must stop at token 76 and flag truncation")
  }

  test("needle insertion: depth/offset/haystack equal a plain-Scala " +
    "recompute and the needle is findable at exactly char_offset") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = (1 to 15).map(i => s"t$i")
    val sf = TestSpark.tmpDir("needlesf")
    Seq((7L, toks.mkString(" "), "en", "s", 0L),
        (9L, "a b c", "en", "s", 0L)) // < 4 tokens → out of scope
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("x_needle_insert")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(!out.contains(9L))
    val (depth, n, off, bp, fp) = out(7L)
    val eDepth = java.lang.Long.parseLong(md5hex("7:needle").take(8), 16) %
      (toks.length + 1)
    assert(depth == eDepth && n == 15 && bp == depth * 10000 / 15)
    val needle = s"the magic number is ${7 * 7 + 13}"
    val hay = (toks.take(depth.toInt) ++ Seq(needle) ++
      toks.drop(depth.toInt)).mkString(" ")
    assert(fp == md5hex(hay), "haystack reassembly diverged")
    assert(hay.indexOf(needle) == off,
      s"needle not at char_offset $off in '$hay'")
  }

  test("epoch shuffle manifest: a true permutation — every doc exactly " +
    "once, per-shard positions dense from 1") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_shuffle_epoch")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == total && rows.map(_._1).distinct.length == total,
      "every doc appears exactly once")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.head == 1L && ps.last == rs.length &&
        ps.distinct.length == rs.length,
        s"shard $shard positions not dense: ${ps.take(5).mkString(",")}…") }
    assert(rows.map(_._2).distinct.length > 1, "multiple shards in use")
  }

  test("hybrid search: rrf equals the per-leg recompute, output is " +
    "rank-sorted, and a two-leg doc outranks an equal single-leg rank") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_hybrid_search")(spark, sf).collect()
      .map { r =>
        val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
        val rv = if (r.isNullAt(2)) None else Some(r.getLong(2))
        (r.getLong(0), rl, rv, r.getLong(3))
      }
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (id, rl, rv, rrf) =>
      val expect = rl.map(r => 10000 / (60 + r)).getOrElse(0L) +
        rv.map(r => 10000 / (60 + r)).getOrElse(0L)
      assert(rrf == expect, s"doc $id rrf $rrf != $expect") }
    assert(rows.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    }, "fusion output must be rrf-sorted")
    // fusion property: two-leg evidence at worst-leg rank r beats any
    // single leg at rank ≥ r (10000/(60+r) is positive and decreasing)
    val twoLeg = rows.filter(r => r._2.isDefined && r._3.isDefined)
    val oneLeg = rows.filter(r => r._2.isEmpty || r._3.isEmpty)
    for {
      t <- twoLeg
      o <- oneLeg
      worst = math.max(t._2.get, t._3.get)
      oRank = o._2.orElse(o._3).get
      if oRank >= worst
    } assert(t._4 > o._4, s"two-leg $t must outrank one-leg $o")
  }

  test("FIM transform: cut bounds keep all three parts non-empty and the " +
    "PSM fingerprint equals a plain-Scala recompute") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = (1 to 20).map(i => s"t$i")
    val sf = TestSpark.tmpDir("fimsf")
    Seq((7L, toks.mkString(" "), "en", "s", 0L),
        (8L, "too short", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("x_fim_transform")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(!out.contains(8L), "sub-12-token docs are out of scope")
    val (n, a, b, fp) = out(7L)
    assert(n == 20 && 1 <= a && a < b && b <= n - 1, s"bounds: a=$a b=$b")
    // plain-Scala recompute of the SAME md5-derived cuts and PSM string
    val h1 = java.lang.Long.parseLong(md5hex("7:a").take(8), 16)
    val h2 = java.lang.Long.parseLong(md5hex("7:b").take(8), 16)
    val ea = h1 % (n - 2) + 1
    val eb = ea + 1 + h2 % (n - ea - 1)
    assert(a == ea && b == eb, s"cuts: got ($a,$b) expected ($ea,$eb)")
    val expect = "<|fim_pre|> " + toks.take(a.toInt).mkString(" ") +
      " <|fim_suf|> " + toks.drop(b.toInt).mkString(" ") +
      " <|fim_mid|> " + toks.slice(a.toInt, b.toInt).mkString(" ")
    assert(fp == md5hex(expect), "PSM reordering diverged from recompute")
  }

  test("watermark detector: a greedily green-sampled doc flags, a " +
    "half-green doc does not, and counts equal a plain-Scala recompute") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def green(a: String, b: String) =
      java.lang.Long.parseLong(md5hex(s"$a|$b").take(4), 16) % 2 == 0
    // watermarked: from each token, greedily pick a continuation whose
    // pair hash is green — exactly how a green-list sampler biases text
    val vocab = (0 until 10).map(i => s"w$i")
    val wm = Iterator.iterate(List("w0")) { acc =>
      vocab.find(green(acc.head, _)).get :: acc
    }.drop(40).next().reverse
    assert(wm.sliding(2).forall { case Seq(a, b) => green(a, b) })
    // natural: alternate green/red continuations → rate ≈ ½, z² small
    val nat = Iterator.iterate((List("w0"), true)) { case (acc, wantGreen) =>
      (vocab.find(green(acc.head, _) == wantGreen).get :: acc, !wantGreen)
    }.drop(40).next()._1.reverse
    val sf = TestSpark.tmpDir("wmsf")
    Seq((1L, wm.mkString(" "), "en", "s", 0L),
        (2L, nat.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("x_watermark_detect")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == 40L && out(1L)._2 == 40L && out(1L)._3,
      s"all-green doc must flag: ${out(1L)}")
    val natGreens = nat.sliding(2).count { case Seq(a, b) => green(a, b) }
    assert(out(2L)._2 == natGreens && !out(2L)._3,
      s"half-green doc must not flag: ${out(2L)} vs recompute $natGreens")
  }

  test("foldUnicode generative laws: idempotent on random unicode mixes; " +
    "foldable-only input always lands in pure ASCII") {
    val rnd = new scala.util.Random(42)
    val ascii = (0x20 to 0x7e).map(_.toChar)
    val foldable = TextAnalysis.UnicodeFoldFrom.toSeq :+ '…'
    val cjk = "中文字符データ".toSeq
    val ws = Seq(' ', '\t', '\n')
    def mk(pools: Seq[Seq[Char]], n: Int): String =
      (0 until n).map { _ =>
        val p = pools(rnd.nextInt(pools.length)); p(rnd.nextInt(p.length))
      }.mkString
    val mixed = (0 until 150).map(i =>
      (i.toLong, mk(Seq(ascii, foldable, cjk, ws), rnd.nextInt(30)), false))
    val foldOnly = (0 until 150).map(i =>
      ((1000 + i).toLong, mk(Seq(ascii, foldable, ws), rnd.nextInt(30)), true))
    val out = (mixed ++ foldOnly).toDF("id", "s", "foldOnly")
      .select(col("id"), col("foldOnly"),
        TextAnalysis.foldUnicode(col("s")).as("f1"))
      .select(col("id"), col("foldOnly"), col("f1"),
        TextAnalysis.foldUnicode(col("f1")).as("f2"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) == r.getString(3),
        s"not idempotent: '${r.getString(2)}' -> '${r.getString(3)}'")
      if (r.getBoolean(1))
        assert(r.getString(2).forall(_ < 0x80),
          s"foldable-only input left non-ASCII: '${r.getString(2)}'")
    }
  }

  test("canonicalUrl metamorphic law: host case, www, tracking params, " +
    "fragments, and trailing slashes are noise — canonical(u + noise) == " +
    "canonical(u) on generated URLs") {
    val rnd = new scala.util.Random(7)
    val bases = (0 until 200).map { i =>
      val host = s"Host${rnd.nextInt(20)}.example.org"
      val path = s"/P${rnd.nextInt(5)}/q${rnd.nextInt(7)}"
      val keep = if (rnd.nextBoolean()) s"?id=${rnd.nextInt(9)}&x=1" else ""
      (i.toLong, s"https://$host$path$keep")
    }
    def noisy(u: String): String = {
      val (pre, q) = u.span(_ != '?')
      val withCase = "https://" +
        (if (rnd.nextBoolean()) "WWW." else "www.") +
        pre.stripPrefix("https://").toUpperCase.takeWhile(_ != '/') +
        pre.stripPrefix("https://").dropWhile(_ != '/') +
        (if (rnd.nextBoolean()) "///" else "") + q
      val sep = if (q.isEmpty) "?" else "&"
      withCase + sep + "utm_source=g&fbclid=z" +
        (if (rnd.nextBoolean()) "#frag" else "")
    }
    val out = bases.map { case (i, u) => (i, u, noisy(u)) }
      .toDF("id", "u", "nu")
      .select(graft.operators.Dedup.canonicalUrl(col("u")).as("cu"),
        graft.operators.Dedup.canonicalUrl(col("nu")).as("cnu"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"noise changed the canonical: '${r.getString(0)}' vs '${r.getString(1)}'"))
  }

  test("mixed-lang detection: a code-switched doc flags, monolingual and " +
    "sub-evidence docs do not, and half-scoring uses the shared classifier") {
    // operator-level: langIdFromToks must agree with langId on full text
    val texts = Seq((1L, "the cat and the dog is a pet"),
      (2L, "der hund und die katze ist da"))
    val both = texts.toDF("id", "t").select(
      TextAnalysis.langId(col("t")).as("a"),
      TextAnalysis.langIdFromToks(TextAnalysis.tokens(col("t"))).as("b"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
    // query-level at sf0.001: every flagged doc is an injected %7 seam,
    // every injected non-German doc IS flagged with lang_b = de
    val rows = SparkEntry.queries("x_mixed_lang")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(rows.exists(_._4) && rows.exists(!_._4))
    rows.filter(_._4).foreach { case (id, _, b, _) =>
      assert(id % 7 == 0 && b == "de",
        s"doc $id flagged mixed without an injected German half") }
    rows.filter(r => r._1 % 7 == 0 && r._2 != "de").foreach { r =>
      assert(r._4, s"injected seam missed: $r") }
  }

  test("foldUnicode: accents, curly punctuation, NBSP, and ellipsis fold " +
    "to ASCII; CJK passes through; fold is idempotent") {
    val cases = Seq(
      (1L, "Résumé naïve Ångström"),
      (2L, "“Smart” ‘quotes’ – and — dashes…"),
      (3L, "non breaking space"),
      (4L, "  Mixed   WHITE\tspace "),
      (5L, "中文 текст stays"))    // CJK/Cyrillic untouched (not folded)
    val out = cases.toDF("id", "t")
      .select(col("id"), TextAnalysis.foldUnicode(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "resume naive angstrom", s"'${out(1L)}'")
    assert(out(2L) == "\"smart\" 'quotes' - and - dashes...", s"'${out(2L)}'")
    assert(out(3L) == "non breaking space", s"'${out(3L)}'")
    assert(out(4L) == "mixed white space", s"'${out(4L)}'")
    assert(out(5L) == "中文 текст stays",
      "non-Latin scripts are not transliterated")
    // idempotence law: folding a folded string is the identity
    val twice = cases.toDF("id", "t")
      .select(TextAnalysis.foldUnicode(col("t")).as("n"))
      .select(col("n"), TextAnalysis.foldUnicode(col("n")).as("nn"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not a fixpoint: '${r.getString(0)}'"))
  }

  test("seedAffinityScores: disjoint-vocab corpora separate perfectly; a " +
    "mixed doc lands by its dominant vocabulary; corpus confusion matrix " +
    "has all four cells (the classifier genuinely disagrees with its seed)") {
    val goodVocab = (1 to 10).map(i => s"good$i")
    val junkVocab = (1 to 10).map(i => s"junk$i")
    val docs = (
      (1L to 4L).map(i => (i, goodVocab.mkString(" "), true)) ++
      (5L to 8L).map(i => (i, junkVocab.mkString(" "), false)) :+
      // doc 9: unseeded but 8/10 of its token mass is seed vocabulary —
      // the generalization case the learned filter exists for
      ((9L, (goodVocab.take(8) ++ junkVocab.take(2)).mkString(" "), false)))
      .toDF("doc_id", "text", "seed")
    val out = TextAnalysis.seedAffinityScores(docs, "doc_id", "text", "seed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // good9/good10 score 1000‰; good1..good8 dilute through doc 9's use
    // (4 of 5 occurrences in seed docs → 800‰), so docs 1-4 score 840
    assert((1L to 4L).forall(out(_)._4), "seed-vocab docs must lean seed-ward")
    assert((5L to 8L).forall(i => out(i)._2 == 0 && !out(i)._4),
      "junk-vocab docs score 0 and fail the verdict")
    assert(out(9L)._4, "the mostly-seed-vocab doc generalizes to pred_good")
    // baseline = corpus seed token mass share: 40 of 90 tokens
    assert(out(1L)._3 == 444L, s"baseline ${out(1L)._3} != 444")
    // the full-corpus query disagrees with its own seed in BOTH directions
    val sf = "/root/testdata/sf0.001"
    val cm = SparkEntry.queries("x_quality_classifier")(spark, sf)
      .groupBy("seed", "pred_good").count().collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    assert(cm == Set((false, false), (false, true), (true, false), (true, true)),
      s"confusion matrix missing cells: $cm")
  }

  test("multimodal metadata + stub decode are deterministic functions of bytes") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "different")).toDF("doc_id", "text")
    val meta = Multimodal.withPayloadMeta(df, "text").collect()
    assert(meta(0).getAs[Long]("n_bytes") == 3)
    assert(meta(0).getAs[String]("digest") == meta(1).getAs[String]("digest"))
    assert(meta(0).getAs[String]("digest") != meta(2).getAs[String]("digest"))

    val dec = Multimodal.decodeFeatures(spark, df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(dec(0).getInt(1) == dec(1).getInt(1), "same bytes → same width")
    assert(dec.forall(r => r.getInt(1) >= 16 && r.getInt(1) < 32))
    assert(dec(0).getAs[Double]("hex_mean") == dec(1).getAs[Double]("hex_mean"))
  }
}
