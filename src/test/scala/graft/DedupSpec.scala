package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup operator semantics on planted duplicates: exact survivors,
  * MinHash/LSH recall on near-identical docs, Jaccard verification,
  * SimHash stability, embedding near-dup bucketing.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river shore"), // near dup of 1
    (4L, "completely different text about spark catalyst optimizer rules engine"),
    (5L, "another unrelated document mentioning parquet columnar storage layout"),
    (6L, "THE  QUICK brown fox jumps over the lazy dog near the river bank")) // ws/case variant of 1
    .toDF("doc_id", "text")

  test("exact dedup: one survivor per normalized fingerprint") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    // 1,2,6 share a fingerprint (lowercased, whitespace-normalized)
    val dupGroup = out.find(_.getLong(1) == 3L)
    assert(dupGroup.isDefined, "the planted triple collapses to one group")
    assert(dupGroup.get.getLong(0) == 1L, "min id survives")
    assert(out.length == 4, "4 distinct fingerprints")
  }

  test("minhash signature match rate estimates true shingle Jaccard " +
    "(accuracy law)") {
    // The LSH machinery is only as good as the estimator under it:
    // E[matching components / k] = J(shingles_a, shingles_b). Build 20
    // doc pairs with CONTROLLED overlap (shared prefix of a generated
    // vocabulary), compute the exact 3-gram Jaccard in plain Scala (the
    // same sliding window as shinglesFromTokens), and check the 16-hash
    // estimate per pair (binomial, sd ≈ 0.125) and its mean bias.
    val rnd = new scala.util.Random(7)
    def word(i: Int) = s"w${i}x${rnd.nextInt(10)}"
    val pairs = (0 until 20).map { p =>
      val vocab = Vector.tabulate(40)(i => word(p * 100 + i))
      val shared = 5 + rnd.nextInt(30) // tokens 0..shared-1 shared
      val a = vocab.take(35)
      val b = vocab.take(shared) ++ Vector.tabulate(35 - shared)(i =>
        word(p * 100 + 50 + i))
      (p, a.mkString(" "), b.mkString(" "))
    }
    def shingleSet(text: String): Set[String] = {
      val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (t.length < 3) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val docsAB = pairs.flatMap { case (p, a, b) =>
      Seq((p * 2L, a), (p * 2L + 1, b)) }.toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docsAB, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (0 until 16).map(i => r.getInt(i + 1))).toMap
    val errs = pairs.map { case (p, a, b) =>
      val sa = shingleSet(a); val sb = shingleSet(b)
      val j = (sa & sb).size.toDouble / (sa | sb).size
      val est = sig(p * 2L).lazyZip(sig(p * 2L + 1))
        .count { case (x, y) => x == y } / 16.0
      assert(math.abs(est - j) <= 0.35,
        f"pair $p: estimate $est%.2f far from true J $j%.2f")
      est - j
    }
    val bias = errs.sum / errs.size
    assert(math.abs(bias) <= 0.08,
      f"minhash estimator is biased: mean(est - J) = $bias%.3f over 20 pairs")
  }

  test("minhash candidates find the planted near-dup pair without cross join") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), "exact dups always collide")
    assert(cands.contains((1L, 3L)), "one-token-changed doc shares bands")
    assert(!cands.contains((4L, 5L)), "unrelated docs do not collide")
  }

  test("jaccard verification scores candidates exactly") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(pairs(1L -> 2L) == 1.0, "identical token sets → jaccard 1")
    val near = pairs.get(1L -> 3L)
    assert(near.exists(j => j > 0.5 && j < 1.0),
      s"near-dup strictly between 0.5 and 1, got $near")
  }

  test("containment surfaces a short-in-long pair that jaccard dilutes away") {
    // doc 7 = doc 1 plus a distinct tail: token jaccard is diluted to
    // |1|/|7| < 0.8, but every token of doc 1 appears in doc 7 →
    // containment exactly 1.0. The asymmetric denominator is the point.
    val docs7 = docs.union(Seq((7L,
      "the quick brown fox jumps over the lazy dog near the river bank " +
        "with six extra trailing filler words appended")).toDF("doc_id", "text"))
    val cont = Dedup.containmentPairs(docs7, "doc_id", "text", threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val (nInter, nA, nB, c) = cont.getOrElse(1L -> 7L,
      fail("the contained pair (1,7) must survive the LSH candidate pass"))
    assert(c == 1.0, s"full containment, got $c")
    assert(nInter == nA.min(nB) && nA < nB,
      s"intersection equals the short side: inter=$nInter a=$nA b=$nB")
    // ...and the union-normalized jaccard verify misses the same pair
    val jac = Dedup.jaccardPairs(docs7, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains(1L -> 7L),
      "jaccard@0.8 must NOT report the short-in-long pair — that gap is " +
        "what containment exists to close")
  }

  test("containment law: operator scores equal a plain-Scala recompute " +
    "over every surfaced pair, and dominate jaccard") {
    // Generated corpus with planted short-in-long pairs (doc 100+i = doc
    // i's text plus a random tail). For EVERY pair the operator surfaces,
    // recompute |A∩B| / |A| / |B| from the raw strings in plain Scala and
    // require exact agreement, plus the dominance law containment ≥
    // jaccard (min(|A|,|B|) ≤ |A∪B| always). Seeded → deterministic.
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(60)(i => s"v$i")
    val base = (0 until 24).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(8 + rnd.nextInt(20)).mkString(" "))
    }
    val planted = (0 until 6).map { i =>
      (100L + i, base(i)._2 + " " + rnd.shuffle(vocab).take(6).mkString(" "))
    }
    val all = base ++ planted
    val toks = all.map { case (id, tx) =>
      id -> tx.split("\\s+").toSet }.toMap
    val out = Dedup.containmentPairs(all.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.0).collect()
    assert(out.nonEmpty, "the planted near-dups must produce candidates")
    out.foreach { r =>
      val (ta, tb) = (toks(r.getLong(0)), toks(r.getLong(1)))
      val inter = (ta & tb).size
      assert(r.getLong(2) == inter && r.getLong(3) == ta.size &&
        r.getLong(4) == tb.size,
        s"set sizes diverge from recompute for (${r.getLong(0)},${r.getLong(1)})")
      val c = r.getDouble(5)
      assert(c == inter.toDouble / math.min(ta.size, tb.size))
      assert(c >= inter.toDouble / (ta | tb).size - 1e-12,
        "containment must dominate jaccard")
    }
    // at least one planted pair surfaces as full containment of the
    // strictly-smaller side — the signal the operator exists for
    assert(out.exists(r => r.getDouble(5) == 1.0 &&
      r.getLong(3) != r.getLong(4)),
      "a planted short-in-long pair must score containment 1.0")
  }

  test("incremental dedup triages a batch with the logged reasons") {
    val longA = "the quick brown fox jumps over the lazy dog near the " +
      "quiet river bank under bright morning sun"
    val longB = "spark catalyst rewrites declarative logical plans into " +
      "efficient physical stages using cost estimates and runtime statistics"
    val existing = Seq(
      (0L, longA),
      (2L, "exact corpus text about parquet columnar layouts and encodings"),
      (4L, "unrelated corpus document mentioning broadcast hash joins"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "exact corpus text about parquet columnar layouts and encodings"),
      (13L, "fresh batch text about adaptive query execution planning"),
      (15L, "fresh batch text about adaptive query execution planning"),
      (17L, longA.replace("sun", "light")),
      (19L, "totally new standalone content"),
      (21L, longB),
      (23L, longB.replace("spark", "tungsten"))) // leading-word variant —
      // picked because its md5 band signature provably collides with 21's
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(
      11L -> "exact_vs_existing",
      13L -> "kept",              // first copy inside the batch survives
      15L -> "exact_vs_batch",
      17L -> "near_vs_existing",  // one-token variant of corpus doc 0
      19L -> "kept",
      21L -> "kept",              // smaller id of the in-batch near pair
      23L -> "near_vs_batch"), s"got $out")
  }

  test("incrementalDedup null-text probe is null-safe: a NULL fingerprint " +
    "matches the corpus's NULL fingerprint, agreeing with batch dedup") {
    import spark.implicits._
    // pre-fix, the vs-existing semi-join never matched NULL fingerprints
    // while the in-batch window DID partition them together — the triage
    // disagreed with Dedup.exact on exactly the null-text docs
    val existing = Seq((0L, null: String),
      (2L, "real corpus text")).toDF("doc_id", "text")
    val incoming = Seq((11L, null: String), (13L, null: String),
      (15L, "brand new text")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(
      11L -> "exact_vs_existing",
      13L -> "exact_vs_existing",
      15L -> "kept"), s"got $out")
  }

  test("dupStats: cluster-size histogram over exact fingerprints") {
    val stats = Dedup.dupStats(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // fixture: {1,2,6} collapse, {3} {4} {5} are singletons
    assert(stats.toSeq == Seq((1L, 3L, 3L), (3L, 1L, 3L)),
      s"got ${stats.toSeq}")
    // conservation: sum of n_docs equals the corpus size
    assert(stats.map(_._3).sum == docs.count())
  }

  test("hot-bucket cap drops mega-cluster buckets from pair generation") {
    // every candidate pair needs a bucket of >= 2 members, so cap=1 must
    // yield zero pairs while the default finds the planted dups
    assert(Dedup.minhashCandidates(docs, "doc_id", "text",
      maxBucket = 1).count() == 0)
    assert(Dedup.simhashPairs(docs, "doc_id", "text",
      maxBucket = 1).count() == 0)
    assert(Dedup.minhashCandidates(docs, "doc_id", "text").count() > 0)
  }

  test("simhash: identical docs hash identically, different docs differ") {
    val hs = Dedup.simhash32(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(4L))
  }

  test("simhash pairs: banded candidates + exact hamming verify") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 0, "identical docs at hamming 0")
    assert(out.contains((1L, 6L)), "case/ws variant tokenizes identically")
    assert(!out.contains((4L, 5L)), "unrelated docs filtered by hamming")
  }

  test("dedup clusters: chains collapse transitively to the min id " +
    "(driver union-find path)") {
    import spark.implicits._
    // components: {1,2,3,9} via chain 9-1, 1-2, 2-3; {5,7}; pairs only
    val pairs = Seq((1L, 9L), (1L, 2L), (2L, 3L), (5L, 7L)).toDF("a", "b")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L))
  }

  test("dedup clusters: distributed path emits identical clusters to the " +
    "union-find fast path") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).toDF("a", "b")
    def run(): Map[Long, Long] = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run()
    spark.conf.set("graft.clusters.driverMaxEdges", "0")
    try {
      val distributed = run()
      assert(distributed == fast)
    } finally spark.conf.unset("graft.clusters.driverMaxEdges")
  }

  test("indexed containment: a short doc fully inside a long one scores " +
    "est 10000 in the containing direction regardless of length ratio — " +
    "deterministically, no banding lottery") {
    import spark.implicits._
    // the long doc embeds the short doc verbatim plus 60 filler tokens —
    // a length ratio where minhash LSH recall has decayed; bottom-k
    // probing is immune: ALL of the short doc's shingles are in the long
    // doc, so every probe hits, deterministically
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = short + " " + (1 to 60).map(i => s"filler$i").mkString(" ")
    val planted = Seq((1L, short), (2L, long), (3L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentIndexed(planted, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val fwd = out((1L, 2L))
    assert(fwd._1 == fwd._2 && fwd._3 == 10000L,
      s"short-in-long must hit on every probe: $fwd")
    // the reverse direction (long ⊄ short) must NOT reach the threshold:
    // most of the long doc's bottom-k shingles are filler
    assert(!out.contains((2L, 1L)), s"asymmetry violated: $out")
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("indexed containment: bottom-k estimate tracks true shingle " +
    "containment (accuracy law, the bottom-k twin of the minhash law)") {
    // est_e4/10⁴ is a k=8 binomial estimate of c = |sh(A)∩sh(B)|/|sh(A)|:
    // per-pair sd = sqrt(c(1-c)/8) ≤ 0.18, so 0.45 per pair is a ~2.5σ
    // bound; the mean bias over 20 pairs must be near zero. Containment is
    // planted CONTIGUOUSLY (B embeds a prefix of A) so A's shingle set
    // intersects B's in exactly the prefix-interior shingles — computable
    // in closed form; junction shingles mix fresh tokens and cannot
    // collide.
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 20).map { p =>
      val a = Vector.tabulate(40)(i => s"w${p * 200 + i}")
      val cTok = 5 + rnd.nextInt(34)
      val b = a.take(cTok) ++ Vector.tabulate(40)(i => s"w${p * 200 + 100 + i}")
      (p, a, b, (cTok - 2).toDouble / 38.0)
    }
    import spark.implicits._
    val corpus = pairs.flatMap { case (p, a, b, _) =>
      Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" "))) }
      .toDF("doc_id", "text")
    val est = Dedup.containmentIndexed(corpus, "doc_id", "text",
      thresholdE4 = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val errs = pairs.map { case (p, _, _, c) =>
      val e = est.getOrElse((p * 2L, p * 2L + 1), 0L) / 10000.0
      assert(math.abs(e - c) <= 0.45,
        f"pair $p: estimate $e%.2f far from true containment $c%.2f")
      e - c
    }
    val bias = errs.sum / errs.size
    assert(math.abs(bias) <= 0.10,
      f"bottom-k estimator is biased: mean(est - c) = $bias%.3f over 20 pairs")
  }

  test("edit verify: distances and sim_e4 equal a plain-Scala levenshtein " +
    "recompute over the corpus's LSH candidates; exact dups score 10000") {
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val cost = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = prev(j); prev(j) = cost
        }
      }
      prev(b.length)
    }
    val sf = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.table(spark, sf, "documents")
    val out = SparkEntry.queries("x_dedup_edit_verify")(spark, sf).collect()
    assert(out.nonEmpty, "fixture has no candidate pairs — law untested")
    val pfx = docs
      .select(col("doc_id"),
        substring(coalesce(col("text"), lit("")), 1, 200).as("pfx"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val d = lev(pfx(a), pfx(b)).toLong
      val m = math.max(pfx(a).length, pfx(b).length).toLong
      val sim = if (m == 0) 10000L else 10000L - d * 10000L / m
      assert(r.getLong(2) == d && r.getLong(3) == sim,
        s"pair ($a,$b): got (${r.getLong(2)},${r.getLong(3)}), want ($d,$sim)")
    }
    // planted exact duplicates are GUARANTEED candidates (identical
    // shingle sets → identical signatures → same buckets — no banding
    // lottery) and must score dist 0 / sim 10000
    import spark.implicits._
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content about something else entirely here"))
      .toDF("doc_id", "text")
    val dup = Dedup.editVerifyPairs(planted, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dup.contains((1L, 2L, 0L, 10000L)), s"got ${dup.mkString(",")}")
  }

  test("leakage-safe split: dedup clusters are split-atomic and no minhash " +
    "candidate pair straddles train/val/test") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x_split_leakage_safe")(spark, sf).collect()
    val split = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    // (a) cluster atomicity: every cluster maps to exactly one split
    out.groupBy(_.getLong(1)).foreach { case (c, rows) =>
      assert(rows.map(_.getString(2)).distinct.length == 1,
        s"cluster $c straddles splits")
    }
    // (b) the guarantee the operator exists for, asserted on the raw pair
    // table (not via the cluster column): no near-dup candidate straddles.
    // Guard that the fixture actually exercises it.
    val pairs = Dedup.minhashCandidates(
      graft.io.Tables.table(spark, sf, "documents"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — property untested")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a,$b) split across ${split(a)}/${split(b)}")
    }
    // (c) cluster-correlated assignment still lands near the declared
    // 90/5/5 (clusters are small relative to the corpus)
    val n = out.length.toDouble
    val train = out.count(_.getString(2) == "train") / n
    assert(math.abs(train - 0.90) < 0.06, s"train fraction $train far from 0.90")
  }

  test("dedup clusters: graft.checkpointDir switches to reliable checkpoints") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("ckpt")
    spark.conf.set("graft.checkpointDir", dir)
    spark.conf.set("graft.clusters.driverMaxEdges", "0") // force distributed
    try {
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      val out = Dedup.dedupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty,
        "reliable checkpoint data lands in graft.checkpointDir")
    } finally {
      spark.conf.unset("graft.checkpointDir")
      spark.conf.unset("graft.clusters.driverMaxEdges")
    }
  }

  test("dedup clusters: the driverMaxEdges crossover is seamless — at " +
    "exactly gate and gate-1 edges the driver and distributed paths emit " +
    "identical clusters") {
    import spark.implicits._
    // a mixed topology (chain + triangle + isolated pair + a join edge)
    // so min-label propagation does real work on both paths
    val rnd = new scala.util.Random(13)
    val edges = ((1L to 40L).sliding(2).map(p => (p(0), p(1))).toSeq ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L), (200L, 201L),
        (40L, 100L)) ++
      (0 until 20).map(_ => { val x = 300L + rnd.nextInt(30)
        (x, 300L + rnd.nextInt(30)) })).distinct
      .filter(e => e._1 != e._2)
    val pairs = edges.toDF("a", "b")
    val n = pairs.count()
    def run(gate: Long): Map[Long, Long] = {
      spark.conf.set("graft.clusters.driverMaxEdges", gate.toString)
      try Dedup.dedupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("graft.clusters.driverMaxEdges")
    }
    val driverSide = run(n)      // nPairs <= gate → driver union-find
    val distributed = run(n - 1) // nPairs >  gate → pointer doubling
    assert(driverSide == distributed,
      s"paths diverge at the crossover (n=$n): " +
        s"driver=${driverSide.toSeq.sorted.take(8)}... " +
        s"distributed=${distributed.toSeq.sorted.take(8)}...")
    assert(driverSide.values.toSet.size >= 3,
      "fixture yields multiple non-trivial components")
  }

  test("dedup clusters: non-convergence at maxIter throws instead of " +
    "returning partial labels") {
    import spark.implicits._
    spark.conf.set("graft.clusters.driverMaxEdges", "0") // force distributed
    try {
      // a 6-hop chain cannot converge in one round
      val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
        .toDF("a", "b")
      intercept[IllegalStateException] {
        Dedup.dedupClusters(chain, maxIter = 1)
      }
      val full = Dedup.dedupClusters(chain).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(full.values.toSet == Set(1L), "with budget, the chain collapses")
    } finally spark.conf.unset("graft.clusters.driverMaxEdges")
  }

  test("passage dedup finds repeated 8-token spans across documents") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$span unique tail one two three four five six seven eight"),
      (2L, s"$span other ending nine ten eleven twelve thirteen fourteen fifteen sixteen"),
      (3L, "completely different words with no shared passage at all here now"))
      .toDF("doc_id", "text")
    val out = Dedup.passageDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L)),
      "the shared leading passage (docs 1+2) is the only duplicate")
  }

  test("substring spans: longest shared n-gram run equals the planted span") {
    import spark.implicits._
    val w = (1 to 40).map(i => s"w$i")
    // doc 2 embeds tokens w5..w24 of doc 1 (a 20-token verbatim span) inside
    // otherwise-disjoint text; doc 3 shares nothing 8 tokens long
    val docs = Seq(
      (1L, w.take(30).mkString(" ")),
      (2L, (Seq("x1", "x2", "x3", "x4", "x5") ++ w.slice(4, 24) ++
        Seq("y1", "y2", "y3", "y4", "y5")).mkString(" ")),
      (3L, (31 to 45).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, "doc_id", "text",
      n = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 20L)),
      "exactly the planted 20-token span, measured exactly")
  }

  test("substring spans: a sub-threshold span and a df-capped gram emit " +
    "nothing") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"s$i")
    val short = Seq(
      (1L, w.take(18).mkString(" ")),
      // only 10 shared tokens (< minSpanTokens=16) → pair must not surface
      (2L, (w.slice(0, 10) ++ Seq("a1", "a2", "a3", "a4", "a5", "a6", "a7",
        "a8")).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(short, "doc_id", "text",
      n = 8, minSpanTokens = 16).isEmpty,
      "a 10-token overlap is below the 16-token span threshold")
    // boilerplate guard: the same span in MANY docs exceeds maxDf and is
    // dropped before pairing (license-header immunity)
    val boiler = (1L to 6L).map(i => (i, w.mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.substringSpans(boiler, "doc_id", "text",
      n = 8, minSpanTokens = 16, maxDf = 5).isEmpty,
      "grams present in >maxDf docs never pair")
  }

  test("substring removal mask: ranges land on the higher id and merge " +
    "across partners") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      (1L, w.mkString(" ")), // the surviving original
      (2L, w.mkString(" ")), // full copy → whole doc masked
      // copies w5..w24 behind a 5-token prefix: the span sits at 6..25,
      // reported by BOTH partners (1,3) and (2,3) → must merge to one range
      (3L, (Seq("x1", "x2", "x3", "x4", "x5") ++ w.slice(4, 24) ++
        Seq("y1", "y2", "y3", "y4", "y5")).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.substringRemovalRanges(docs, "doc_id", "text",
      n = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq((2L, 1L, 30L), (3L, 6L, 20L)),
      "doc 2 fully masked; doc 3's twice-reported span merges to one range")
  }

  test("decontamination mask cuts exactly the eval-matching span from the " +
    "train doc") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i")
    val evalDocs = Seq((100L, w.mkString(" "))).toDF("doc_id", "text")
    val train = Seq(
      // 3-token prefix, then eval tokens w1..w16, then a 4-token tail:
      // the mask must be [4, 19] (st 4, len 16), nothing else
      (1L, (Seq("a1", "a2", "a3") ++ w.take(16) ++
        Seq("b1", "b2", "b3", "b4")).mkString(" ")),
      (2L, (1 to 20).map(i => s"u$i").mkString(" "))) // no overlap
      .toDF("doc_id", "text")
    val out = graft.operators.Contamination
      .decontaminationMask(evalDocs, train, "doc_id", "text",
        n = 8, minSpanTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 4L, 16L)),
      "one mask, on the train doc, at the planted offset and length")
  }

  test("ngram overlap flags the contaminated eval/train pair only") {
    import spark.implicits._
    val leak = "one two three four five six seven eight nine ten eleven twelve"
    val train = Seq(
      (100L, s"$leak plus extra training material words here"),
      (101L, "unrelated training doc with entirely different content words"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (200L, s"prefix words then $leak and a suffix"),
      (201L, "clean eval doc sharing nothing with training data at all"))
      .toDF("doc_id", "text")
    val out = graft.operators.Contamination
      .ngramOverlapPairs(eval_, train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((200L, 100L)), "only the leaked pair surfaces")
    assert(out((200L, 100L)) == 5,
      "12 shared tokens in a run → 5 shared 8-grams")
  }

  test("ngram overlap: boilerplate above maxDocFreq stops producing hits") {
    import spark.implicits._
    val boiler = "one two three four five six seven eight"
    // the same 8-gram in BOTH train docs → docfreq 2
    val train = Seq((100L, s"$boiler alpha beta"), (101L, s"$boiler gamma delta"))
      .toDF("doc_id", "text")
    val eval_ = Seq((200L, s"$boiler prefix suffix")).toDF("doc_id", "text")
    val loose = graft.operators.Contamination
      .ngramOverlapPairs(eval_, train, "doc_id", "text", maxDocFreq = 2)
      .count()
    val capped = graft.operators.Contamination
      .ngramOverlapPairs(eval_, train, "doc_id", "text", maxDocFreq = 1)
      .count()
    assert(loose > 0, "shared 8-gram matches when under the cap")
    assert(capped == 0, "8-grams over the docfreq cap carry no signal")
  }

  test("bloom-gated overlap law: exactly the ungated result on a corpus " +
    "with planted leaks, boilerplate, and clean docs — and a tight filter " +
    "whose false positives must be scrubbed by the exact confirm") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def sent(seed: Int) =
      (0 until 30).map(i => s"w${seed}_$i").mkString(" ")
    val leak = sent(999)
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val train = ((0 until 40).map(i =>
      (i.toLong, s"${sent(i)} $boiler")) ++ Seq(
      (100L, s"${sent(100)} $leak tail tail2"),
      (101L, s"$leak ${sent(101)}"))).toDF("doc_id", "text")
    val eval_ = Seq(
      (200L, s"head words then $leak closing"),
      (201L, sent(500))).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)
    val exact = graft.operators.Contamination
      .ngramOverlapPairs(eval_, train, "doc_id", "text", maxDocFreq = 8)
      .collect().map(key).toMap
    val gated = graft.operators.Contamination
      .bloomGatedOverlapPairs(eval_, train, "doc_id", "text", maxDocFreq = 8)
      .collect().map(key).toMap
    assert(exact.nonEmpty, "the planted leak must surface")
    assert(gated == exact, s"bloom gate changed the result: $gated vs $exact")
    // a deliberately TINY filter (64 bits for hundreds of grams) is nearly
    // all-pass — false positives flood the gate and the exact confirm
    // must scrub every one of them
    val tiny = graft.operators.Contamination
      .bloomGatedOverlapPairs(eval_, train, "doc_id", "text", maxDocFreq = 8,
        expectedItems = 4L, numBits = 64L)
      .collect().map(key).toMap
    assert(tiny == exact, "false positives must die at the exact join")
  }

  test("bloom gate's empty-eval no-op keeps the INPUT id types: a " +
    "string-id corpus gets a string-typed empty frame, unionable with a " +
    "populated run") {
    import spark.implicits._
    val train = Seq(("t1", "some training text here with words")).toDF("doc_id", "text")
    val eval_ = Seq.empty[(String, String)].toDF("doc_id", "text")
    val out = graft.operators.Contamination
      .bloomGatedOverlapPairs(eval_, train, "doc_id", "text")
    assert(out.count() == 0)
    // pre-fix, the early return hardcoded BIGINT ids — this union threw
    val populated = Seq(("e1", "t1", 3L)).toDF("eval_id", "train_id", "n_shared")
    assert(populated.unionByName(out).count() == 1)
  }

  test("embedding near-dup finds identical vectors within a cell") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f, -0.25f, 0.75f), 7),
      (2L, Array(1.0f, 0.5f, -0.25f, 0.75f), 7),  // identical, same cell
      (3L, Array(-1.0f, 0.5f, 0.25f, -0.75f), 7), // dissimilar, same cell
      (4L, Array(1.0f, 0.5f, -0.25f, 0.75f), 8))  // identical but other cell
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", "label", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)),
      "only the same-cell identical pair qualifies (cells are hard shards)")
  }

  test("substring removal mask: a span shared with TWO lower-id partners " +
    "emits one merged cut, same as with one partner (duplicate-interval " +
    "merge invariance — the law that lets the oracle DISTINCT its ranges)") {
    // span sits at position 3 in the copier, so both partners contribute
    // the IDENTICAL (st, en) range — at sf1 this duplicate-interval shape
    // made the DuckDB oracle's two-stage window merge nondeterministic
    // (tie order differed between the flag pass and the sum pass) until
    // the oracle deduped; Spark's single-window merge was already stable
    val span = (1 to 16).map(i => s"tok$i").mkString(" ")
    def doc(id: Long, prefix: String) = (id, s"$prefix x$id y$id $span")
    val two = Seq(doc(1, "alpha"), doc(2, "beta"), doc(9, "gamma"))
      .toDF("doc_id", "text")
    val one = Seq(doc(1, "alpha"), doc(9, "gamma"))
      .toDF("doc_id", "text")
    def cuts(df: org.apache.spark.sql.DataFrame) =
      Dedup.substringRemovalRanges(df, "doc_id", "text")
        .where(col("doc_id") === 9)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val withTwo = cuts(two)
    assert(withTwo == cuts(one),
      s"duplicate ranges from a second partner must not change the merge: $withTwo")
    assert(withTwo.size == 1 && withTwo.head._2 >= 16L,
      s"the shared 16-token span must merge to one cut: $withTwo")
  }

  test("embedding near-dup: the hot-bucket cap drops a semantic " +
    "mega-cluster from pairing while small clusters still pair") {
    // 40 identical vectors = every (cell, table, bucket) holds 40 rows;
    // with maxBucket=8 the mega-cluster must emit ZERO pairs, while the
    // planted 2-member cluster in another cell still pairs
    val mega = (1L to 40L).map(i => (i, Array(1.0f, 0.5f, -0.25f, 0.75f), 7))
    val smallPair = Seq(
      (100L, Array(0.5f, -1.0f, 0.75f, 0.25f), 8),
      (101L, Array(0.5f, -1.0f, 0.75f, 0.25f), 8))
    val vecs = (mega ++ smallPair).toDF("vec_id", "embedding", "label")
    val capped = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", "label",
        0.95, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"mega-cluster must be dropped by the cap, small cluster kept: $capped")
    val uncapped = Dedup.embeddingNearDup(vecs, "vec_id", "embedding",
        "label", 0.95, maxBucket = Int.MaxValue)
      .count()
    assert(uncapped == 40L * 39 / 2 + 1,
      s"uncapped control must pair the full mega-cluster: $uncapped")
  }

  test("within-doc passage dedup: a repeated 8-token passage collapses to " +
    "its first occurrence; the kept fingerprint is the deduped sequence") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("wdsf")
    val p1 = (1 to 8).map(i => s"a$i").mkString(" ")  // passage 1
    val p2 = (1 to 8).map(i => s"b$i").mkString(" ")  // passage 2
    // doc 1: p1 p2 p1 — the third passage repeats the first verbatim;
    // doc 2: all distinct
    Seq((1L, s"$p1 $p2 $p1", "en", "s", 0L),
      (2L, s"$p1 $p2", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x_dedup_within_doc")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 3L && out(1L)._2 == 2L,
      s"repeat must collapse: ${out(1L)}")
    assert(out(2L)._1 == 2L && out(2L)._2 == 2L)
    // doc 1's kept sequence == doc 2's full sequence (p1 p2)
    assert(out(1L)._3 == out(2L)._3,
      "kept fingerprint must equal the first-occurrence sequence")
  }

  test("URL canonicalization: each rule fires, canonical is idempotent, " +
    "urlDedup keeps the min id per canonical URL") {
    import spark.implicits._
    val urls = Seq(
      // 1 and 2 differ by: host case, www, trailing noise params, fragment
      (1L, "HTTPS://WWW.News.Example.COM/Docs/A?id=1&utm_source=x&fbclid=z#frag"),
      (2L, "https://news.example.com/Docs/A?id=1"),
      (3L, "https://news.example.com/docs/a?id=1"), // path CASE differs → distinct
      (4L, "http://Example.com/p/?utm_medium=z&gclid=1&ref=tw"), // all params tracking
      (5L, "https://example.com/p///"),             // trailing slashes
      (6L, "https://example.com/p"),
      (7L, "https://example.com/p?b=2&a=1"),        // param ORDER preserved (no resort)
      (8L, "https://example.com:443/p"),            // explicit default port
      (9L, "http://example.com:80/p"),
      (10L, "https://example.com:8080/p"),          // NON-default port → distinct
      (11L, "https://example.com/a%2fb?k=%3dv"),    // escape hex case folds
      (12L, "https://example.com/a%2Fb?k=%3Dv"),
      (13L, "https://example.com/100%zz"))          // invalid escape untouched
      .toDF("id", "url")
    val out = Dedup.urlDedup(urls, "id", "url").collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(out(1L)._1 == "https://news.example.com/Docs/A?id=1")
    assert(out(1L)._1 == out(2L)._1, "case/www/tracking/fragment erased")
    assert(out(3L)._1 != out(2L)._1, "path stays case-sensitive")
    assert(out(4L)._1 == "http://example.com/p",
      "all-tracking query drops entirely (no dangling '?'), slash stripped")
    assert(out(5L)._1 == out(6L)._1, "trailing slashes erased")
    assert(out(7L)._1 == "https://example.com/p?b=2&a=1",
      "kept params preserve their original order")
    assert(out(8L)._1 == out(6L)._1 && out(9L)._1 == "http://example.com/p",
      "explicit default ports (:443 https, :80 http) canonicalize away")
    assert(out(10L)._1 == "https://example.com:8080/p",
      "a NON-default port is a distinct origin and must survive")
    assert(out(11L)._1 == "https://example.com/a%2Fb?k=%3Dv" &&
      out(11L)._1 == out(12L)._1,
      "%-escape hex folds uppercase in path AND query")
    assert(out(13L)._1 == "https://example.com/100%zz",
      "a bare '%' that opens no hex escape is left untouched, not corrupted")
    // keep-first verdicts: min id per canonical keeps
    assert(out(1L)._3 && !out(2L)._3 && out(1L)._2 == 2L)
    assert(out(5L)._3 && !out(6L)._3)
    assert(out(3L)._3 && out(4L)._3 && out(7L)._3, "singletons keep")
    // idempotence law: canonicalizing a canonical URL is the identity
    val canon = urls.select(Dedup.canonicalUrl(col("url")).as("c"))
    val twice = canon.select(col("c"),
      Dedup.canonicalUrl(col("c")).as("cc")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1),
      s"canonical not a fixpoint: '${r.getString(0)}' → '${r.getString(1)}'"))
  }

  test("URL canonicalization generative law: random decoration with every " +
    "equivalence-preserving variant never changes the canonical form, and " +
    "canonical is a fixpoint on all of them") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randCase(s: String): String =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    val cases = (1 to 300).map { i =>
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val host = s"site${rnd.nextInt(5)}.example.com"
      val params = Seq("x=1", "y=2%3D3").take(rnd.nextInt(3))
      val expected = s"$scheme://$host/a/b%2Fc" +
        (if (params.nonEmpty) "?" + params.mkString("&") else "")
      // decorate with every rule the canonicalizer must erase
      val port =
        if (rnd.nextBoolean()) (if (scheme == "https") ":443" else ":80")
        else ""
      val www = if (rnd.nextBoolean()) "www." else ""
      val trackers = Seq("utm_source=x", "fbclid=1", "ref=tw", "gclid=9")
        .filter(_ => rnd.nextBoolean())
      // tracking params interleave at random positions among the kept ones
      val q = rnd.shuffle(trackers).foldLeft(params) { (acc, t) =>
        val at = rnd.nextInt(acc.length + 1)
        acc.take(at) ++ Seq(t) ++ acc.drop(at)
      }
      val decorated = randCase(scheme) + "://" + www + randCase(host) + port +
        "/a/b%" + (if (rnd.nextBoolean()) "2F" else "2f") + "c" +
        "/" * rnd.nextInt(3) +
        (if (q.nonEmpty) "?" + q.mkString("&") else "") +
        (if (rnd.nextBoolean()) "#frag" else "")
      (i.toLong, decorated, expected)
    }
    val out = cases.toDF("id", "url", "expected")
      .select(col("expected"), Dedup.canonicalUrl(col("url")).as("c"))
      .withColumn("cc", Dedup.canonicalUrl(col("c"))).collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"decorated URL canonicalized to '${r.getString(1)}', " +
          s"expected '${r.getString(0)}'")
      assert(r.getString(2) == r.getString(1), "fixpoint law")
    }
  }

  test("domainCap: host variants collapse before ranking, each host keeps " +
    "its cap lowest ids, smaller hosts keep everything") {
    import spark.implicits._
    // 5 pages on host a.com spread across www/case/tracking variants (the
    // cap must see ONE host of 5, not 3 hosts of ≤2), 2 pages on b.com
    val urls = Seq(
      (1L, "https://a.com/p1"),
      (2L, "HTTPS://WWW.A.COM/p2"),
      (3L, "https://a.com/p3?utm_source=x"),
      (4L, "https://www.a.com/p4#frag"),
      (5L, "https://a.com/p5"),
      (6L, "https://b.com/q1"),
      (7L, "https://B.com/q2")).toDF("id", "url")
    val out = Dedup.domainCap(urls, "id", "url", cap = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.values.map(_._1).toSet == Set("a.com", "b.com"),
      s"variants must collapse to one canonical host: ${out.values.map(_._1)}")
    assert((1L to 3L).forall(out(_)._3) && !out(4L)._3 && !out(5L)._3,
      "host a keeps exactly its 3 lowest ids")
    assert(out(6L)._3 && out(7L)._3, "under-cap host keeps everything")
    assert(out(5L)._2 == 5L, "rank is within the collapsed host")
  }

  test("domainCap dirty-data keys: unparseable URLs become singleton " +
    "hosts (never one shared '' bucket), NULL urls id-keyed singletons") {
    import spark.implicits._
    // pre-fix, every unparseable URL fell into ONE shared ''-host window
    // partition — a single cap applied across unrelated rows and an
    // unbounded sort on a dirty crawl
    val urls = Seq(
      (1L, "relative/path/only"),
      (2L, "also not a url"),
      (3L, "//protocol-relative.com/x"),
      (4L, null: String),
      (5L, null: String),
      (6L, "https://ok.com/p")).toDF("id", "url")
    val out = Dedup.domainCap(urls, "id", "url", cap = 1L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    // cap=1 would strike all but one of a pooled bucket; singletons all live
    assert(out.values.forall(_._3), s"every dirty row must survive: $out")
    assert(out.values.forall(_._2 == 1L), "each singleton ranks first")
    val hosts = out.map { case (id, (h, _, _)) => id -> h }
    assert(hosts.values.toSet.size == 6, s"six distinct host keys: $hosts")
    assert(hosts(4L) == "__nourl__#4" && hosts(5L) == "__nourl__#5")
    assert(hosts(6L) == "ok.com")
  }

  test("semantic decontamination: a train vector identical to an eval " +
    "vector flags at cosine 1; an orthogonal one stays clean; eval-eval " +
    "pairs never flag") {
    val sf = TestSpark.tmpDir("semdecon")
    val v = Array.fill(8)(0.5f)
    val orth = Array.tabulate(8)(i => if (i % 2 == 0) 0.5f else -0.5f)
    Seq(
      (10L, v, 1),          // eval (id % 10 == 0)
      (11L, v, 1),          // train, identical to eval 10 → must flag
      (12L, orth, 1),       // train, orthogonal → clean
      (20L, v, 1))          // a second eval identical to 10 — eval-eval
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$sf/embeddings.parquet")
    val out = SparkEntry.queries("x_decontaminate_semantic")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out.keySet == Set(11L),
      s"exactly the identical train vector flags: ${out.keySet}")
    assert(out(11L)._1 == 2 && math.abs(out(11L)._2 - 1.0) < 1e-9,
      s"train 11 must hit BOTH identical evals at cosine 1: ${out(11L)}")
  }

  test("robots policy filter: denial is exactly (even-numbered host AND " +
    "denied prefix); hosts join case-folded") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x_robots_block")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, host, path, allowed) =>
      val num = host.stripPrefix("src").takeWhile(_.isDigit).toLong
      val expectDeny = num % 2 == 0 && path.startsWith("/Docs")
      assert(allowed == !expectDeny, s"doc $id host $host path $path")
      assert(host == host.toLowerCase, "canonical host must be lowercased")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "the policy must genuinely split the corpus")
  }

  test("line dedup: corpus-frequent boilerplate lines are struck from " +
    "every doc, unique body lines survive in order") {
    import spark.implicits._
    // 12 docs share a nav line (df=12 > maxDf=3) and a footer (df=12);
    // each has a unique body line; docs 1-2 ALSO share one body line
    // (df=2 ≤ 3 → kept — frequency, not mere sharing, is the verdict)
    val docs = (1L to 12L).map { i =>
      val sharedBody = if (i <= 2) "\nshared section text" else ""
      // doc 12's nav differs in case + spacing — normalization must fold
      // it into the same frequency bucket (df still 12)
      val nav = if (i == 12) "nav  HOME about" else "NAV   Home About"
      (i, s"$nav\nbody text number $i$sharedBody\nCopyright Footer")
    }.toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", maxDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(5L)._1 == 3 && out(5L)._2 == 1, s"doc 5: ${out(5L)}")
    assert(out(1L)._1 == 4 && out(1L)._2 == 2,
      s"doc 1 keeps its unique body AND the df=2 shared line: ${out(1L)}")
    // kept fingerprint = md5 of the kept line sequence, original order/case
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(5L)._3 == md5hex("body text number 5"))
    assert(out(1L)._3 == md5hex("body text number 1\nshared section text"),
      "kept lines join in document order with original bytes")
    // normalization: case/extra-space variants of the nav line still
    // count into one frequency bucket (all 12 struck despite 'NAV   Home')
    assert(out.values.forall(_._2 < out(1L)._1),
      "no doc kept its nav/footer")
  }

  test("NCD verify: identical pair scores near zero, a diverged near-dup " +
    "scores strictly higher; values equal the plain-Scala recompute") {
    import spark.implicits._
    import graft.functions.GraftCompress.deflatedLength
    val base = (0 until 60).map(i => s"w$i common body token").mkString(" ")
    // ids 1/2: byte-identical; ids 3/4: share the shingle set (candidates)
    // but 4 carries a large diverged tail the compressor must encode anew
    // 20 tokens keeps Jaccard ≈ 0.92 so the pair stays an LSH candidate
    val tail4 = (0 until 20).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"t$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
    ).mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, base),
      (4L, base + " " + tail4)).toDF("doc_id", "text")
    val rows = Dedup.ncdVerifyPairs(docs, "doc_id", "text").collect()
    val out = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(r.fieldIndex("ca")), r.getLong(r.fieldIndex("cb")),
        r.getLong(r.fieldIndex("cab")),
        r.getLong(r.fieldIndex("ncd_e4"))))).toMap
    // every reported value must equal the driver-side recompute — this
    // spec IS the correctness pin for the deflate readout columns, which
    // the driver-hashed query surface prunes (implementation-defined
    // lengths; x_dedup_ncd_verify oracle-checks the deterministic half)
    val texts = Map(1L -> base, 2L -> base, 3L -> base,
      4L -> (base + " " + tail4))
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(r.fieldIndex("n_a_pfx")) ==
        texts(a).take(2000).getBytes("UTF-8").length &&
        r.getLong(r.fieldIndex("n_b_pfx")) ==
          texts(b).take(2000).getBytes("UTF-8").length,
        s"prefix byte sizes must match the compressor's input on ($a,$b)")
    }
    out.foreach { case ((a, b), (ca, cb, cab, ncd)) =>
      def c(s: String) = deflatedLength(s.getBytes("UTF-8"))
      assert(ca == c(texts(a).take(2000)) && cb == c(texts(b).take(2000)) &&
        cab == c(texts(a).take(2000) + texts(b).take(2000)),
        s"recompute mismatch on ($a,$b)")
      assert(ncd == (cab - math.min(ca, cb)) * 10000 / math.max(ca, cb))
    }
    val identical = out((1L, 2L))._4
    val diverged = out.collectFirst {
      case ((a, 4L), v) if a < 4L => v._4
      case ((4L, b), v) if b < 4L => v._4
    }.getOrElse(fail("no candidate pair with the diverged doc"))
    // short texts carry fixed deflate-block overhead, so "near zero" is
    // ~0.11 in e4 units here, not literally 0 — the law is the ORDER
    assert(identical < 2000,
      s"identical docs must score low NCD, got $identical")
    assert(diverged > identical + 1000,
      s"diverged tail must raise NCD: $diverged vs $identical")
  }

  test("gramHashes law: short docs emit ONE whole-array fingerprint, long " +
    "docs emit tokens-n+1, equal sequences agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "a b c"),                       // 3 tokens < n=8 -> whole-array fp
      (2L, "a b c"),                       // identical short doc
      (3L, "one two three four five six seven eight nine")) // 9 -> 2 grams
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.Dedup.gramHashes(
          graft.operators.TextAnalysis.tokens(col("text")), 8).as("fps"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).size == 1, "short doc emits exactly one fingerprint")
    assert(rows(3L).size == 2, "9 tokens at n=8 emit 2 positional grams")
    assert(rows(1L) == rows(2L), "equal token sequences hash equal")
    // cross-length aliasing is PROBABILISTIC, not impossible (r14 reword):
    // XXH64 over an array carries no length prefix, so this example only
    // witnesses the ~2^-64 collision odds holding for these inputs — the
    // structural claim the string form had does not carry over
    assert(rows(3L).intersect(rows(1L)).isEmpty,
      "length-3 whole-array fp collided with an 8-slice fp (2^-64 event " +
        "or a hashing regression — investigate either way)")
  }

  test("native gramHashes == composed xxhash64(slice) form (generative law: " +
    "random token arrays spanning empty / short / long, unicode tokens)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "δelta", "ε", "zz", "q")
    val rows = (0 until 200).map { i =>
      val len = Seq(0, 1, 7, 8, 9, 40)(i % 6)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "toks")
    Seq(3, 8).foreach { n =>
      val bad = df.select(
        graft.operators.Dedup.gramHashes(col("toks"), n).as("native"),
        graft.operators.Dedup.composedGramHashes(col("toks"), n).as("ref"))
        .where(not(col("native") <=> col("ref"))).count()
      assert(bad == 0L, s"native gramHashes != composed for n=$n")
    }
  }

  // ── r14: within-doc gram-repeat cap (VERDICT r13 ask #1) ────────────────
  // heavyGrams caps DISTINCT-doc frequency only, so before the cap ONE
  // pathological repetitive document (df=1..2 for its dominant 8-gram,
  // never "heavy") put every position into a single spanRuns collect_list
  // row, and the in-row pair explosion against a partner doc was
  // unbounded: this exact fixture — two 100k-repeat docs — meant a 10^10-
  // pair explode (timeout/OOM) pre-fix. Post-fix: 32×32 pairs, instant.

  test("degenerate 100k-repeat doc pair completes and spans cap at K=32") {
    val k = Dedup.MaxGramRepeatsPerDoc
    val reps = 100000
    val degen = Seq(
      (1L, ("x " * reps).trim),
      (2L, ("x " * reps).trim))
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(degen, "doc_id", "text",
      n = 8, minSpanTokens = 16).collect()
    // capped postings per doc = positions 1..K of the single repeated
    // gram; the diff=0 diagonal carries the longest run (K) → span K+7.
    // Uncapped, the span would be the full doc (100000 tokens).
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, (k + 7).toLong)),
      s"expected one pair with span ${k + 7}, got ${out.mkString(",")}")
  }

  test("gram-repeat cap keeps the FIRST K positions by pos (not the last)") {
    val k = Dedup.MaxGramRepeatsPerDoc
    // doc 1 (low id, survives): the 8-token probe gram, exactly once.
    // doc 2 (high id, gets the cuts): the same gram repeated 33 times
    // (40 identical tokens → grams at pos 1..33, one over the cap).
    val docs2 = Seq(
      (1L, "x x x x x x x x"),
      (2L, ("x " * (k + 8)).trim)) // k+8 tokens → k+1 identical grams
      .toDF("doc_id", "text")
    val cuts = Dedup.substringRemovalRanges(docs2, "doc_id", "text",
      n = 8, minSpanTokens = 8).collect()
    // kept positions on doc 2 must be 1..K: merged cut range starts at 1
    // (keeping the LAST K would start at 2) and ends at K+7 (keeping all
    // K+1 would end at K+8), so cut_len == K+7 pins both count and side
    assert(cuts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 1L, (k + 7).toLong)),
      s"expected cut (2,1,${k + 7}), got ${cuts.mkString(",")}")
  }

  test("no-bind law: no (doc, 8-gram) on the corpus reaches the repeat cap") {
    // the cap exists for dirty-data robustness; on natural text a ≥32-fold
    // within-doc repeat of one 8-gram IS boilerplate and does not occur in
    // the driver corpus — so r14's cap provably changes nothing there
    // (CHECK results stay byte-identical to r13's uncapped family)
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
    val maxRepeat = docs
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("toks")) - 7),
          i => xxhash64(slice(col("toks"), i, lit(8))))).as("h"))
      .groupBy("doc_id", "h").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxRepeat < Dedup.MaxGramRepeatsPerDoc,
      s"corpus has a $maxRepeat-fold within-doc gram repeat — the cap " +
        "binds and the substring-family results are no longer " +
        "cap-free; re-baseline the oracles")
  }

  test("autoBitsPerTable: smallest b with n <= cells*occupancy*2^b, " +
    "integer-exact at power-of-two boundaries") {
    // the law the oracle's length(bin(m-1)) twin must agree with; the
    // boundary cases are exactly where a floating ceil(log2) could round
    // differently per engine
    val occ = Dedup.DefaultTargetBucketOccupancy // 16
    def bits(n: Long, cells: Int): Int = Dedup.autoBitsPerTable(
      spark.range(n).select(col("id"), (col("id") % cells).as("cell"))
        .toDF("id", "cell"), "cell")
    def law(n: Long, cells: Int): Int = {
      var b = 1
      while (cells.toLong * occ * (1L << b) < n && b < 20) b += 1
      b
    }
    for ((n, c) <- Seq((5L, 1), (16L, 1), (17L, 1), (2048L, 1), (2049L, 1),
      (2000L, 20), (60000L, 20))) {
      assert(bits(n, c) == law(n, c),
        s"n=$n cells=$c: got ${bits(n, c)}, law says ${law(n, c)}")
    }
    // the r13 saturation scenario: 60k vectors / 20 cells must auto-derive
    // the width the measured sweep found healthy (8), not the manual 4
    assert(bits(60000L, 20) == 8)
  }
}
