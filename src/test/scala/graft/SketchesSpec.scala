package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Semantic checks on the deterministic sketch operators — tolerance of
  * the HLL estimate, exact quantile selection, and profile null/distinct
  * accounting — on data small enough to verify by hand.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL estimate lands within 15% of exact at raw-regime cardinality") {
    // 8000 distinct values ≈ 31×m — inside the raw-estimator regime
    val df = (1 to 8000).map(i => ("g", i.toLong)).toDF("grp", "v")
    val row = Sketches.approxDistinctHll(df, "grp", "v").head()
    val est = row.getAs[Long]("hll_est")
    assert(math.abs(est - 8000.0) / 8000.0 < 0.15, s"est=$est")
  }

  test("HLL register table is bounded by m per group regardless of rows") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "v")
    val out = Sketches.approxDistinctHll(df, "grp", "v").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("n_reg") <= 256))
  }

  test("native HLL aggregate is bit-identical to the relational form " +
    "across any partitioning (merge path exercised)") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "v")
    val relational = Sketches.approxDistinctHll(df, "grp", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_reg"), r.getAs[Long]("sum_scaled"), r.getAs[Long]("hll_est"))).toMap
    // 7 skewed partitions force non-trivial partial buffers per partition
    val native = df.repartition(7, col("v") % 2)
      .groupBy("grp")
      .agg(graft.functions.HllRegisterAgg.hllSketch(col("v")).as("h"))
      .select(col("grp"), col("h.n_reg"), col("h.sum_scaled"), col("h.hll_est"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(native == relational)
  }

  test("native HLL aggregate ignores NULLs and plans as ObjectHashAggregate") {
    val df = Seq(Some(1L), None, Some(2L), Some(2L), None)
      .toDF("v").withColumn("grp", lit("g"))
    val agg = df.groupBy("grp")
      .agg(graft.functions.HllRegisterAgg.hllSketch(col("v")).as("h"))
      .select(col("h.n_reg"))
    // a TypedImperativeAggregate must run in the object hash aggregate,
    // which supports partial aggregation (map-side combine before shuffle)
    assert(agg.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.head().getLong(0) == 2, "two distinct non-null values → 2 registers")
  }

  test("HLL parity holds ON NULL-BEARING INPUT: the relational form " +
    "filters NULLs like the native aggregate (COUNT DISTINCT semantics)") {
    // pre-fix, a NULL value fabricated a (j=NULL, m_j=NULL) register row
    // in the relational form only — n_reg and sum_scaled diverged from
    // the native twin on any dirty column
    val df = ((1 to 200).map(i => (s"g${i % 2}", Some(i.toLong))) ++
      Seq(("g0", None: Option[Long]), ("g1", None: Option[Long])))
      .toDF("grp", "v")
    val relational = Sketches.approxDistinctHll(df, "grp", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_reg"), r.getAs[Long]("sum_scaled"),
          r.getAs[Long]("hll_est"))).toMap
    val native = df.groupBy("grp")
      .agg(graft.functions.HllRegisterAgg.hllSketch(col("v")).as("h"))
      .select(col("grp"), col("h.n_reg"), col("h.sum_scaled"),
        col("h.hll_est"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(native == relational,
      s"NULL input must not split the twins: $native vs $relational")
  }

  test("property: native HLL and CMS estimates are invariant under " +
    "arbitrary partition splits (the merge law, ScalaCheck)") {
    // merge(a, b) must commute with the single-buffer path for ANY way the
    // input lands across partitions — the property a 1000-executor cluster
    // depends on. Generator drives value multiset AND split count; the
    // repartition(p) shuffle hands the aggregate p partial buffers to merge
    // vs the repartition(1) single-pass buffer. (VERDICT r5 next-6.)
    val gen = for {
      n <- Gen.chooseNum(1, 300)
      vals <- Gen.listOfN(n, Gen.chooseNum(0L, 40L)) // dups + collisions
      parts <- Gen.chooseNum(2, 17)
    } yield (vals, parts)
    val prop = Prop.forAll(gen) { case (vals, parts) =>
      val df = vals.toDF("v")
      def hll(p: Int): Seq[Any] = df.repartition(p)
        .agg(graft.functions.HllRegisterAgg.hllSketch(col("v")).as("h"))
        .select(col("h.n_reg"), col("h.sum_scaled"), col("h.hll_est"))
        .head().toSeq
      def cms(p: Int): Seq[Long] = df.repartition(p)
        .agg(graft.functions.CmsSketchAgg.cmsSketch(col("v")).as("sk"))
        .head().getSeq[Long](0)
      hll(1) == hll(parts) && cms(1) == cms(parts)
    }
    // each case runs 4 Spark jobs — keep the sample bounded
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop).passed)
  }

  test("HLL is insensitive to duplication — same estimate for 1x and 10x copies") {
    val base = (1 to 2000).map(i => ("g", i.toLong))
    val dup = Seq.fill(10)(base).flatten
    val e1 = Sketches.approxDistinctHll(base.toDF("grp", "v"), "grp", "v")
      .head().getAs[Long]("hll_est")
    val e2 = Sketches.approxDistinctHll(dup.toDF("grp", "v"), "grp", "v")
      .head().getAs[Long]("hll_est")
    assert(e1 == e2)
  }

  test("quantilesDisc picks the exact ceil(p*n) order statistic") {
    // values 10,20,...,1000 (n=100): p50 -> rn 50 -> 500; p99 -> rn 99 -> 990
    val df = (1 to 100).map(i => ("g", i * 10L, i.toLong)).toDF("grp", "v", "id")
    val row = Sketches.quantilesDisc(df, "grp", "v", "id", Seq(25, 50, 75, 99)).head()
    assert(row.getAs[Long]("p25_v") == 250L)
    assert(row.getAs[Long]("p50_v") == 500L)
    assert(row.getAs[Long]("p75_v") == 750L)
    assert(row.getAs[Long]("p99_v") == 990L)
  }

  test("quantilesDisc ties break on the tie column, making selection total") {
    // all values equal: any percentile must return that value, not NULL
    val df = (1 to 10).map(i => ("g", 7L, i.toLong)).toDF("grp", "v", "id")
    val row = Sketches.quantilesDisc(df, "grp", "v", "id", Seq(50)).head()
    assert(row.getAs[Long]("p50_v") == 7L)
  }

  test("CMS estimates never undercount and are exact without collisions") {
    // 20 distinct keys with known multiplicities 1..20 — far below width
    // 1024, so collisions are unlikely but not impossible: assert the
    // one-sided error bound exactly and equality for the majority
    val rows = (1 to 20).flatMap(k => Seq.fill(k)((s"key_$k", 1)))
    val df = rows.toDF("k", "one")
    val sketch = Sketches.cmsSketch(df, "k")
    assert(sketch.count() <= 4L * 1024)
    val keys = (1 to 20).map(k => s"key_$k").toDF("k")
    val est = Sketches.cmsEstimate(sketch, keys, "k").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_est")).toMap
    (1 to 20).foreach { k =>
      assert(est(s"key_$k") >= k, s"CMS undercounted key_$k")
    }
    assert((1 to 20).count(k => est(s"key_$k") == k) >= 15,
      "most estimates should be collision-free at this load factor")
  }

  test("CMS estimates a never-seen key as 0, not dropped or inflated") {
    val sketch = Sketches.cmsSketch(Seq.fill(9)("present").toDF("k"), "k")
    val est = Sketches.cmsEstimate(sketch,
      Seq("present", "never_seen").toDF("k"), "k").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_est")).toMap
    assert(est("present") == 9L)
    assert(est.contains("never_seen"), "absent key must not vanish")
    assert(est("never_seen") == 0L, "empty counters are 0")
  }

  test("CMS sketches merge by summation") {
    val a = Seq.fill(5)("x").toDF("k")
    val b = Seq.fill(7)("x").toDF("k")
    val merged = Sketches.cmsSketch(a, "k").unionByName(Sketches.cmsSketch(b, "k"))
      .groupBy("i", "bucket").agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val est = Sketches.cmsEstimate(merged, Seq("x").toDF("k"), "k")
      .head().getAs[Long]("n_est")
    assert(est == 12L)
  }

  test("zValue interleaves bits and preserves tile locality") {
    import graft.operators.ZOrder
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
    val out = df.withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("z")).toMap
    assert(out((0L, 0L)) == 0L)
    assert(out((1L, 0L)) == 1L, "x occupies even bit positions")
    assert(out((0L, 1L)) == 2L, "y occupies odd bit positions")
    // 3=0b11, 5=0b101 → interleaved x@even y@odd: 0b100111 = 39
    assert(out((3L, 5L)) == 39L)
    assert(out((255L, 255L)) == 65535L, "full 8-bit range packs into 16 bits")
  }

  test("bloom filter passes every member and is bounded by 4*65536 rows") {
    val members = (1 to 500).map(i => s"m$i").toDF("k")
    val bits = Sketches.bloomBits(members, "k")
    assert(bits.count() <= 4L * 65536)
    val probes = ((1 to 500).map(i => s"m$i") ++ (1 to 500).map(i => s"x$i"))
      .toDF("k")
    val pass = Sketches.bloomMightContain(bits, probes, "k")
      .collect().map(_.getString(0)).toSet
    assert((1 to 500).forall(i => pass(s"m$i")), "no false negatives, ever")
    val fps = (1 to 500).count(i => pass(s"x$i"))
    assert(fps <= 5, s"FP rate at 3% fill should be ~0, got $fps/500")
  }

  test("profile counts nulls and distincts per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("num", "txt")
    val out = Sketches.profile(df, Seq("num" -> col("num"), "txt" -> col("txt")))
      .collect().map(r => r.getAs[String]("col") -> r).toMap
    assert(out("num").getAs[Long]("n") == 4)
    assert(out("num").getAs[Long]("n_null") == 1)
    assert(out("num").getAs[Long]("n_distinct") == 2)
    assert(out("num").getAs[String]("min_v") == "1")
    assert(out("num").getAs[String]("max_v") == "2")
    assert(out("txt").getAs[Long]("n_null") == 1)
    assert(out("txt").getAs[Long]("n_distinct") == 2)
  }

  test("homogeneity attack: k-anonymous class can still fail l-diversity") {
    // Class A: 5 members, ALL segment "s1" — clears k=5, fails l=2
    // (everyone in A leaks their segment). Class B: 5 members, 3 distinct
    // segments — clears both. Class C: 2 members, 2 distinct — fails k,
    // clears l. A release must demand BOTH audits green.
    val rows = Seq.fill(5)(("A", "s1")) ++
      Seq(("B", "s1"), ("B", "s1"), ("B", "s2"), ("B", "s2"), ("B", "s3")) ++
      Seq(("C", "s1"), ("C", "s2"))
    val df = rows.toDF("qi", "seg")
    val k = Sketches.kAnonymity(df, Seq("qi"), k = 5L)
      .collect().map(r => r.getAs[String]("qi") -> r.getAs[Boolean]("k_anonymous")).toMap
    val l = Sketches.lDiversity(df, Seq("qi"), "seg", l = 2L)
      .collect().map(r => r.getAs[String]("qi") ->
        (r.getAs[Long]("l_distinct"), r.getAs[Boolean]("l_diverse"))).toMap
    assert(k == Map("A" -> true, "B" -> true, "C" -> false))
    assert(l == Map("A" -> (1L, false), "B" -> (3L, true), "C" -> (2L, true)))
  }

  test("skewness attack: a k-anonymous AND l-diverse class can still fail " +
    "t-closeness; a class mirroring the global distribution scores TVD 0") {
    // Global: 12×s1, 6×s2, 6×s3 (N=24, mix ½:¼:¼). Class M (8 members,
    // 4:2:2) mirrors the global mix exactly → TVD 0, t-close at any t.
    // Class S (6 members, 1×s1, 4×s2, 1×s3): clears k=5 and l=3, but its
    // distribution (1/6, 4/6, 1/6) vs global (½, ¼, ¼) has
    // TVD = ½(|1/6−½| + |4/6−¼| + |1/6−¼|) = 10/24 ≈ 0.417 > 1/5 —
    // the audit must reject it. Class T (the rest) fills the global mix.
    val mirror = Seq.fill(4)(("M", "s1")) ++ Seq.fill(2)(("M", "s2")) ++
      Seq.fill(2)(("M", "s3"))
    val skewed = Seq.fill(1)(("S", "s1")) ++ Seq.fill(4)(("S", "s2")) ++
      Seq.fill(1)(("S", "s3"))
    val rest = Seq.fill(7)(("T", "s1")) ++ Seq.fill(0)(("T", "s2")) ++
      Seq.fill(3)(("T", "s3"))
    val df = (mirror ++ skewed ++ rest).toDF("qi", "seg")
    // global = 12×s1, 6×s2, 6×s3; N = 24
    val t = Sketches.tCloseness(df, Seq("qi"), "seg", tNum = 1L, tDen = 5L)
      .collect().map(r => r.getAs[String]("qi") ->
        ((r.getAs[Long]("tvd_num"), r.getAs[Long]("denom")),
          r.getAs[Boolean]("t_close"))).toMap
    // M mirrors exactly → numerator 0
    assert(t("M") == ((0L, 2L * 8 * 24), true), s"mirror class: ${t("M")}")
    // S: TVD = 10/24 → num/den must reduce to 10/24 and fail t=1/5
    val ((sn, sd), sClose) = t("S")
    assert(!sClose, s"skewed class must fail t-closeness: ${t("S")}")
    assert(BigInt(sn) * 24 == BigInt(10) * sd,
      s"S TVD must equal 10/24 exactly: $sn/$sd")
    // S clears k=5 AND l=3 — the attack t-closeness uniquely catches
    val kOk = Sketches.kAnonymity(df, Seq("qi"), k = 5L).collect()
      .map(r => r.getAs[String]("qi") -> r.getAs[Boolean]("k_anonymous")).toMap
    val lOk = Sketches.lDiversity(df, Seq("qi"), "seg", l = 3L).collect()
      .map(r => r.getAs[String]("qi") -> r.getAs[Boolean]("l_diverse")).toMap
    assert(kOk("S") && lOk("S"))
  }

  test("t-closeness counts sensitive values ABSENT from the class: a " +
    "single-value class's TVD includes the missing global mass") {
    // Global: 4×a, 4×b (N=8). Class U: 2×a only. p_c = (1, 0);
    // p_g = (½, ½). TVD = ½(|1−½| + |0−½|) = ½ — the |0−½| term comes
    // entirely from the absent-value correction.
    val df = (Seq.fill(2)(("U", "a")) ++ Seq.fill(2)(("V", "a")) ++
      Seq.fill(4)(("V", "b"))).toDF("qi", "seg")
    val u = Sketches.tCloseness(df, Seq("qi"), "seg", 1L, 2L)
      .where(col("qi") === "U").head()
    // num/den = ½ exactly: num = |2·8 − 4·2| + (8−4)·2 = 8+8 = 16;
    // den = 2·2·8 = 32
    assert(u.getAs[Long]("tvd_num") == 16L)
    assert(u.getAs[Long]("denom") == 32L)
    assert(u.getAs[Boolean]("t_close"), "TVD ½ ≤ t=½ boundary is inclusive")
  }

  test("t-closeness is null-safe on the sensitive value: a class's NULL " +
    "mass joins the global NULL group instead of vanishing") {
    import spark.implicits._
    // one QI class = the whole table: 5 NULL + 5 'x' → the class
    // distribution IS the global one, so TVD must be exactly 0. The
    // pre-fix equi-join dropped the (class, NULL) row (NULL never equals
    // NULL), undercounting group_n to 5 and reporting TVD ½.
    val df = (Seq.fill(5)(("c", null: String)) ++ Seq.fill(5)(("c", "x")))
      .toDF("qi", "seg")
    val r = Sketches.tCloseness(df, Seq("qi"), "seg", 1L, 5L).head()
    assert(r.getAs[Long]("group_n") == 10L, "class size must include NULLs")
    assert(r.getAs[Long]("tvd_num") == 0L,
      "class distribution equals global → TVD 0")
    assert(r.getAs[Long]("denom") == 200L)
    assert(r.getAs[Boolean]("t_close"))
  }
}
