package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Functions
import graft.operators.Sketches
import graft.queries.Relational.{Q, t, usec}

/** Data-profiling / approximate-analytics queries: the "know your corpus
  * before you train on it" toolkit — deterministic HLL cardinality,
  * discrete quantiles, per-column profiles, log2 length histograms, and
  * integer tf-idf salient terms. All arithmetic is cross-engine exact
  * (md5 bits, BIGINT shifts and division, row-number selection), so every
  * query hash-matches its DuckDB oracle.
  */
object Analytics {

  /** Conversion-funnel and cohort-retention — the two canonical
    * product-analytics workloads a warehouse engine gets pointed at. Both
    * stay integer-exact (epoch-µs step times, floor-divided week offsets).
    */
  private val FunnelWindowUs = 3L * 86400000000L // 3-day conversion window

  /** ONE oracle for the daily-spike alarm, shared by the batch readout
    * (`x_event_spikes`) and its streaming twin (`stream_event_spikes` in
    * queries.Pipeline) — the lockstep rule: at drain end the streamed
    * per-(type, day) counters must equal the batch daily counts, so the
    * two queries answer to the same SQL.
    */
  private[queries] val eventSpikesSql: String =
    """WITH sp_d AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) AS day_us,
      |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      |sp_r AS (SELECT *,
      |    row_number() OVER (PARTITION BY event_type ORDER BY c, day_us) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM sp_d),
      |sp_m AS (SELECT event_type,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med
      |  FROM sp_r GROUP BY 1)
      |SELECT d.event_type, d.day_us, d.c, m.med,
      |  d.c * 2 > m.med * 5 AS spike
      |FROM sp_d d JOIN sp_m m ON d.event_type = m.event_type""".stripMargin

  /** ONE oracle for last-touch attribution, shared by the batch window
    * query (`x_attribution_last_touch`) and its stateful streaming twin
    * (`stream_attribution` in queries.Pipeline) — the lockstep rule.
    * The tie column is `coalesce(event_id, Long.MinValue)` in all three
    * places (this SQL, the batch window, the streaming fold): the
    * streaming side must coalesce (its Long decode is non-nullable), 0
    * would collide with a genuine event 0, and a bare NULL sorts in a
    * different slot per engine (DuckDB nulls-last vs Spark ASC
    * nulls-first) — the shared sentinel pins one tie order everywhere.
    */
  private[queries] val attributionSql: String =
    """WITH at_e AS (SELECT user_id, ts, event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN event_type IN ('view', 'click') THEN event_type END AS touch
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |at_w AS (SELECT *,
      |    last_value(touch IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts, coalesce(event_id, -9223372036854775808)
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
      |  FROM at_e)
      |SELECT coalesce(attr, '(none)') AS channel,
      |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS cents
      |FROM at_w WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val funnelQ = Q(
    (s, d) => {
      val ev = t(s, d, "events")
      // step 1: first signup per user; steps 2/3 are the first qualifying
      // event STRICTLY AFTER the previous step and within the conversion
      // window (without the window every user converts in this corpus —
      // a vacuous funnel) — each stage is one filtered agg joined on
      // user_id (the survivor side shrinks every step)
      val s1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(usec(col("ts"))).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, "user_id").where(usec(col("ts")) > col("t1") &&
          usec(col("ts")) <= col("t1") + lit(FunnelWindowUs))
        .groupBy("user_id").agg(min(usec(col("ts"))).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, "user_id").where(usec(col("ts")) > col("t2") &&
          usec(col("ts")) <= col("t2") + lit(FunnelWindowUs))
        .groupBy("user_id").agg(min(usec(col("ts"))).as("t3"))
      s1.join(s2.select(col("user_id"), lit(1L).as("reached2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), lit(1L).as("reached3")), Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_signup"),
          sum(coalesce(col("reached2"), lit(0L))).as("n_click_after"),
          sum(coalesce(col("reached3"), lit(0L))).as("n_purchase_after"))
    },
    Some(s"""WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      |    AND epoch_us(e.ts) <= s1.t1 + $FunnelWindowUs GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      |    AND epoch_us(e.ts) <= s2.t2 + $FunnelWindowUs GROUP BY 1)
      |SELECT count(*) AS n_signup,
      |  CAST(sum(CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
      |  CAST(sum(CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin))

  private val cohortQ = Q(
    (s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), usec(col("ts")).as("us"))
      val cohort = ev.groupBy("user_id")
        .agg(expr("min(us) div 604800000000").as("cohort_week"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (expr("us div 604800000000") - col("cohort_week")).as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH c AS (SELECT user_id,
      |  min(epoch_us(ts)) // 604800000000 AS cohort_week
      |  FROM events GROUP BY 1),
      |act AS (SELECT DISTINCT e.user_id, c.cohort_week,
      |  epoch_us(e.ts) // 604800000000 - c.cohort_week AS week_offset
      |  FROM events e JOIN c ON e.user_id = c.user_id)
      |SELECT cohort_week, week_offset, count(*) AS n_active
      |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** PageRank iteration count — shared by the Spark query and the
    * generated oracle CTE chain (lockstep rule). */
  private val PrIters = 5

  /** The oracle mirrors Graphs.pageRankInt round for round: same node set,
    * same teleport scalar, same `//` floor-division points. Generated
    * programmatically so the iteration count can never drift from the
    * Spark side. */
  private def pageRankOracle: String = {
    val base = """WITH sup AS (
      |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS n
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |st AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS npairs FROM sup),
      |e AS (SELECT src, dst FROM sup, st WHERE n * npairs > tot
      |      AND src IS NOT NULL AND dst IS NOT NULL),
      |nodes AS (SELECT DISTINCT src AS node FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |cnt AS (SELECT count(*) AS n FROM nodes),
      |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
      |it0 AS (SELECT node, 1000000000 // (SELECT n FROM cnt) AS rank FROM nodes)""".stripMargin
    val iters = (1 to PrIters).map { k =>
      s"""it$k AS (SELECT nodes.node,
         |  (150000000 // (SELECT n FROM cnt))
         |    + (85 * coalesce(s.incoming, 0)) // 100 AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank // od.outdeg) AS BIGINT) AS incoming
         |    FROM it${k - 1} r JOIN e ON r.node = e.src JOIN od ON e.src = od.src
         |    GROUP BY 1) s ON nodes.node = s.node)""".stripMargin
    }
    (base +: iters).mkString(",\n") +
      s"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM it$PrIters ORDER BY rank DESC, node"
  }

  /** ONE oracle per sketch family, shared by the relational form and its
    * native-aggregate twin (the lockstep rule the CDC/spikes/attribution
    * oracles already follow): the "registers/counters are bit-identical"
    * claim is structurally true only while both queries compare against
    * the SAME string — two copies silently desynchronize on edit. */
  private val hllOracleSql: String =
    """WITH h AS (
      |  SELECT l_returnflag,
      |         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h60
      |  FROM lineitem WHERE l_orderkey IS NOT NULL
      |), reg AS (
      |  SELECT l_returnflag, h60 % 256 AS j,
      |         max(CASE WHEN h60 // 256 = 0 THEN 53
      |             ELSE 53 - length(bin(h60 // 256)) END) AS m_j
      |  FROM h GROUP BY 1, 2
      |), agg AS (
      |  SELECT l_returnflag,
      |         CAST(sum(CASE WHEN 20 - m_j > 0 THEN 1 << (20 - m_j) ELSE 1 END) AS BIGINT)
      |           + (256 - count(*)) * 1048576 AS sum_scaled,
      |         count(*) AS n_reg
      |  FROM reg GROUP BY 1
      |), ex AS (
      |  SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact FROM lineitem GROUP BY 1
      |)
      |SELECT agg.l_returnflag, CAST(n_reg AS BIGINT) AS n_reg, sum_scaled,
      |       CAST((CAST(7213 AS BIGINT) * 256 * 256 * 1048576) // (10000 * sum_scaled) AS BIGINT) AS hll_est,
      |       CAST(n_exact AS BIGINT) AS n_exact
      |FROM agg JOIN ex ON agg.l_returnflag = ex.l_returnflag
      |ORDER BY agg.l_returnflag""".stripMargin

  private val cmsOracleSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents
      |), ii AS (SELECT unnest([0,1,2,3]) AS i),
      |sketch AS (
      |  SELECT i, CAST('0x' || substr(md5(tok), 4*i+1, 4) AS BIGINT) % 1024 AS bucket,
      |         count(*) AS cnt
      |  FROM tok, ii GROUP BY 1, 2
      |), exact AS (
      |  SELECT tok, count(*) AS n_exact FROM tok GROUP BY 1
      |  ORDER BY n_exact DESC, tok LIMIT 10
      |), est AS (
      |  SELECT e.tok, min(cnt) AS n_est
      |  FROM (SELECT tok, i, CAST('0x' || substr(md5(tok), 4*i+1, 4) AS BIGINT) % 1024 AS bucket
      |        FROM exact, ii) e
      |  JOIN sketch USING (i, bucket) GROUP BY e.tok
      |)
      |SELECT exact.tok, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_est AS BIGINT) AS n_est
      |FROM exact JOIN est ON exact.tok = est.tok
      |ORDER BY n_exact DESC, exact.tok""".stripMargin

  val all: Map[String, Q] = Map(

    // ── Deterministic HyperLogLog: distinct orders per returnflag. The
    //    register table is ≤ 3×256 rows however large lineitem gets — the
    //    point of the sketch at 100 TB (exact count-distinct shuffles every
    //    key; this shuffles 256 per group) ───────────────────────────────────
    "x_approx_distinct_hll" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val est = Sketches.approxDistinctHll(li, "l_returnflag", "l_orderkey")
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        est.join(exact, "l_returnflag").orderBy("l_returnflag")
      },
      Some(hllOracleSql)),

    // ── The same HLL as a NATIVE TypedImperativeAggregate: one 256-byte
    //    register buffer per (group, partition) instead of an exploded
    //    (group, j, rho) row per input row — the map side keeps 3 buffers,
    //    not a rows-sized hash table, and the shuffle carries groups×256
    //    bytes at any corpus size. Same oracle: the registers are
    //    bit-identical to the relational form ─────────────────────────────────
    "x_hll_native" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val est = li.groupBy("l_returnflag")
          .agg(graft.functions.HllRegisterAgg.hllSketch(col("l_orderkey")).as("h"))
          .select(col("l_returnflag"), col("h.n_reg").as("n_reg"),
            col("h.sum_scaled").as("sum_scaled"), col("h.hll_est").as("hll_est"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        est.join(exact, "l_returnflag").orderBy("l_returnflag")
      },
      Some(hllOracleSql)),

    // ── Discrete quantiles of order value per priority: the value AT row
    //    ceil(p·n) — no interpolation, so the result is a data value both
    //    engines agree on exactly ─────────────────────────────────────────────
    "x_quantiles_disc" -> Q(
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            Functions.cents(col("o_totalprice")).as("cents"))
        Sketches.quantilesDisc(o, "o_orderpriority", "cents", "o_orderkey",
          Seq(25, 50, 75, 99))
          .orderBy("o_orderpriority")
      },
      Some("""WITH v AS (
        |  SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY CAST(round(o_totalprice*100) AS BIGINT), o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |)
        |SELECT o_orderpriority,
        |  CAST(max(CASE WHEN rn = (n*25 + 99) // 100 THEN cents END) AS BIGINT) AS p25_cents,
        |  CAST(max(CASE WHEN rn = (n*50 + 99) // 100 THEN cents END) AS BIGINT) AS p50_cents,
        |  CAST(max(CASE WHEN rn = (n*75 + 99) // 100 THEN cents END) AS BIGINT) AS p75_cents,
        |  CAST(max(CASE WHEN rn = (n*99 + 99) // 100 THEN cents END) AS BIGINT) AS p99_cents
        |FROM v GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── Per-column profile of orders: nulls / distincts / min / max. Money
    //    profiled in cents (the engine's canonical exact representation) ─────
    "x_profile_table" -> Q(
      (s, d) => {
        val o = t(s, d, "orders")
        Sketches.profile(o, Seq(
          "o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"),
          "o_orderstatus" -> col("o_orderstatus"),
          "o_totalprice" -> Functions.cents(col("o_totalprice")),
          "o_orderpriority" -> col("o_orderpriority")))
      },
      Some(Seq(
        ("o_orderkey", "o_orderkey"),
        ("o_custkey", "o_custkey"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_totalprice", "CAST(round(o_totalprice*100) AS BIGINT)"),
        ("o_orderpriority", "o_orderpriority")).map { case (name, e) =>
        s"SELECT '$name' AS col, count(*) AS n, count(*) - count($e) AS n_null, " +
          s"CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct, " +
          s"CAST(min($e) AS VARCHAR) AS min_v, CAST(max($e) AS VARCHAR) AS max_v " +
          "FROM orders"
      }.mkString("", " UNION ALL ", " ORDER BY col"))),

    // ── Log2-bucketed document-length histogram per language: bucket =
    //    length(bin(n)) = floor(log2 n)+1, integer-exact in both engines ─────
    "x_hist_log2" -> Q(
      (s, d) => t(s, d, "documents")
        .where(col("n_chars") > 0)
        .groupBy(col("lang"),
          length(bin(col("n_chars").cast("long"))).cast("long").as("log2_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy("lang", "log2_bucket"),
      Some("SELECT lang, CAST(length(bin(CAST(n_chars AS BIGINT))) AS BIGINT) AS log2_bucket, " +
        "count(*) AS n, CAST(min(n_chars) AS BIGINT) AS min_chars, " +
        "CAST(max(n_chars) AS BIGINT) AS max_chars " +
        "FROM documents WHERE n_chars > 0 GROUP BY 1, 2 ORDER BY 1, 2")),

    // ── Count-min frequency estimates for the exact top-10 tokens: the
    //    sketch is ≤ 4×1024 counters however large the corpus (frequency
    //    twin of the HLL query); estimates only overcount, and the oracle
    //    rebuilds the identical md5-chunk sketch ─────────────────────────────
    "x_freq_cms" -> Q(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
        val sketch = Sketches.cmsSketch(toks, "tok")
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
          .orderBy(desc("n_exact"), asc("tok")).limit(10)
        exact.join(Sketches.cmsEstimate(sketch, exact.select("tok"), "tok"), "tok")
          .orderBy(desc("n_exact"), asc("tok"))
      },
      Some(cmsOracleSql)),

    // ── The same CMS as a NATIVE TypedImperativeAggregate: one flat 4×1024
    //    counter array per (group, partition) — update is one md5 + four
    //    increments, merge is elementwise summation, and the shuffle moves
    //    a fixed 32 KB buffer per partition instead of the relational
    //    form's 4-rows-per-token explode. The finished single-row buffer is
    //    flattened back to the (i, bucket, cnt) relation (posexplode of ONE
    //    4096-slot row) so the probe is the exact same broadcastable
    //    equi-join as the relational form — a hash join the plan audit
    //    accepts, not the nested-loop plan a scalar crossJoin would make
    //    (a literal-key join constant-folds straight back to BNLJ). Same
    //    oracle as x_freq_cms — the counters are bit-identical ──────────────
    "x_freq_cms_native" -> Q(
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
        val sketch = toks.agg(graft.functions.CmsSketchAgg.cmsSketch(col("tok")).as("sk"))
        // buffer slot p holds counter (i = p div width, bucket = p mod width)
        val table = sketch
          .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
          .select(expr(s"pos div ${Sketches.CmsWidth}").cast("int").as("i"),
            expr(s"pos % ${Sketches.CmsWidth}").cast("long").as("bucket"),
            col("cnt"))
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
          .orderBy(desc("n_exact"), asc("tok")).limit(10)
        exact.join(Sketches.cmsEstimate(table, exact.select("tok"), "tok"), "tok")
          .orderBy(desc("n_exact"), asc("tok"))
      },
      Some(cmsOracleSql)),

    // ── Bloom join pruning: filter bits built from the high-value orders'
    //    customer keys, every customer probed through them. Members always
    //    pass; the pass count bounds the false-positive trickle the real
    //    join would then absorb. All three counts are deterministic (md5
    //    positions), so the oracle rebuilds the identical filter ─────────────
    "x_bloom_prefilter" -> Q(
      (s, d) => {
        // persisted: the bits build, the nTrue count, and (via bits) the
        // probe all read members — unpersisted, the orders scan+distinct
        // ran once per action, pure timing noise charged to the operator
        val members = graft.operators.CacheRegistry.register(t(s, d, "orders")
          .where(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("key")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val bits = Sketches.bloomBits(members, "key")
        val pass = Sketches.bloomMightContain(
          bits, t(s, d, "customer").select(col("c_custkey")), "c_custkey")
        val nTrue = members.count()
        val nPass = pass.count()
        val nProbed = t(s, d, "customer").count()
        import s.implicits._
        Seq((nTrue, nPass, nProbed)).toDF("n_true", "n_bloom_pass", "n_probed")
      },
      Some("""WITH ii AS (SELECT unnest([0,1,2,3]) AS i),
        |members AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 400000),
        |bits AS (
        |  SELECT DISTINCT i,
        |    CAST('0x'||substr(md5(CAST(key AS VARCHAR)), 4*i+1, 4) AS BIGINT) % 65536 AS pos
        |  FROM members, ii
        |),
        |probe AS (
        |  SELECT c_custkey, i,
        |    CAST('0x'||substr(md5(CAST(c_custkey AS VARCHAR)), 4*i+1, 4) AS BIGINT) % 65536 AS pos
        |  FROM customer, ii
        |),
        |pass AS (
        |  SELECT c_custkey FROM probe JOIN bits USING (i, pos)
        |  GROUP BY c_custkey HAVING count(*) = 4
        |)
        |SELECT CAST((SELECT count(*) FROM members) AS BIGINT) AS n_true,
        |       CAST((SELECT count(*) FROM pass) AS BIGINT) AS n_bloom_pass,
        |       CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_probed""".stripMargin)),

    // ── Incremental aggregate maintenance: a pre-aggregated "materialized"
    //    slice (event_id ≤ watermark) is combined with the delta's partial
    //    aggregate by re-aggregating the UNION of partials — sum/count are
    //    associative, so the maintained result is bit-identical to a full
    //    recompute, which is exactly what the oracle computes (the hash
    //    match IS the proof). At 100 TB this is the difference between
    //    re-scanning the corpus per refresh and scanning only the delta ─────
    "x_incr_agg" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            Functions.cents(col("value")).as("cents"))
        val Array(mn, mx) = ev.agg(min("event_id"), max("event_id")).head()
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val wm = mx - (mx - mn) / 10 // last ~10% is "new since refresh"
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("event_type")
            .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        partial(ev.where(col("event_id") <= wm))
          .unionByName(partial(ev.where(col("event_id") > wm)))
          .groupBy("event_type")
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY event_type ORDER BY event_type")),

    // ── Mergeable histogram quantiles: per-group log2-bucket counts (≤ 64
    //    rows of state per group, a plain sum to merge across partitions or
    //    refreshes), quantile = upper bound of the first bucket whose
    //    cumulative count reaches ceil(p·n). Coarse by construction (one
    //    power of two), exact integer arithmetic throughout ─────────────────
    "x_approx_quantile_hist" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = t(s, d, "orders")
          .where(col("o_totalprice") > 0)
          .groupBy(col("o_orderpriority").as("pri"),
            length(bin(Functions.cents(col("o_totalprice")))).as("b"))
          .agg(count(lit(1)).as("n"))
        val c = h
          .withColumn("cum", sum(col("n")).over(
            Window.partitionBy(col("pri")).orderBy(col("b"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("total", sum(col("n")).over(Window.partitionBy(col("pri"))))
        def ub(p: Int) = min(when(col("cum") * 100 >= col("total") * p,
          expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) AS BIGINT)") - 1))
          .as(s"p${p}_ub_cents")
        c.groupBy(col("pri"))
          .agg(max(col("total")).as("n"), ub(50), ub(90), ub(99))
          .orderBy("pri")
      },
      Some("""WITH h AS (
        |  SELECT o_orderpriority AS pri,
        |         length(bin(CAST(round(o_totalprice*100) AS BIGINT))) AS b,
        |         count(*) AS n
        |  FROM orders WHERE o_totalprice > 0 GROUP BY 1, 2
        |), c AS (
        |  SELECT pri, b, n,
        |         sum(n) OVER (PARTITION BY pri ORDER BY b
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(n) OVER (PARTITION BY pri) AS total
        |  FROM h
        |)
        |SELECT pri, CAST(max(total) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum*100 >= total*50 THEN (1 << b) - 1 END) AS BIGINT) AS p50_ub_cents,
        |  CAST(min(CASE WHEN cum*100 >= total*90 THEN (1 << b) - 1 END) AS BIGINT) AS p90_ub_cents,
        |  CAST(min(CASE WHEN cum*100 >= total*99 THEN (1 << b) - 1 END) AS BIGINT) AS p99_ub_cents
        |FROM c GROUP BY pri ORDER BY pri""".stripMargin)),

    // ── Key-skew diagnostic: the 10 hottest join/shuffle keys with integer
    //    basis-point share — the pre-flight check before deciding to salt
    //    (x_skew_distinct_tokens) or let AQE split a skewed partition ────────
    "x_skew_report" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, d, "orders")
        val total = o.count()
        // top-10 FIRST via distributed TakeOrdered, so the global
        // row_number window only ever ranks 10 rows — a rank-then-filter
        // would funnel every key through one window partition at scale
        o.groupBy(col("o_custkey").as("key"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share_bp", expr(s"(n * 10000) div CAST($total AS BIGINT)"))
          .orderBy(desc("n"), asc("key")).limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(desc("n"), asc("key"))).cast("long"))
          .orderBy("rk")
      },
      Some("""WITH k AS (SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders)
        |SELECT key, CAST(n AS BIGINT) AS n,
        |       CAST(n * 10000 // total AS BIGINT) AS share_bp,
        |       CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rk
        |FROM k, t ORDER BY rk LIMIT 10""".stripMargin)),

    // ── Z-order layout audit: interleave (custkey, orderkey) into a Morton
    //    code and show each z-bucket covers one axis-aligned tile of BOTH
    //    key ranges — the multi-dimension file-skipping layout. Sorting the
    //    table by zval is the write-side move; this query verifies tile
    //    locality (max_x-min_x stays one tile wide per bucket) ──────────────
    "x_zorder_layout" -> Q(
      (s, d) => {
        val z = t(s, d, "orders").select(
          (col("o_custkey") % 256).as("x"), (col("o_orderkey") % 256).as("y"))
          .withColumn("zval",
            graft.operators.ZOrder.zValue(Seq(col("x"), col("y")), bits = 8))
        z.groupBy(expr("zval div 4096").as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).cast("long").as("min_x"), max(col("x")).cast("long").as("max_x"),
            min(col("y")).cast("long").as("min_y"), max(col("y")).cast("long").as("max_y"))
          .orderBy("zbucket")
      },
      Some {
        val zx = (0 until 8).map(i =>
          s"((((o_custkey % 256) >> $i) & 1) << ${2 * i})").mkString(" + ")
        val zy = (0 until 8).map(i =>
          s"((((o_orderkey % 256) >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
        s"""WITH z AS (SELECT o_custkey % 256 AS x, o_orderkey % 256 AS y,
           |  CAST($zx AS BIGINT) + CAST($zy AS BIGINT) AS zval FROM orders)
           |SELECT zval // 4096 AS zbucket, count(*) AS n,
           |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ── Corpus-mix diversity: Gini impurity of the source distribution per
    //    language, quantized to basis points. Shares are s_bp = n·10⁴ div
    //    total (≤ 10⁴), gini_bp = 10⁴ − Σ s_bp² div 10⁴ — every
    //    intermediate is bounded by ~10⁸·n_sources whatever the corpus
    //    size (a raw total² formulation overflows BIGINT past ~3·10⁹ rows
    //    per language, i.e. exactly at the 100 TB scale this targets).
    //    Floor division quantizes identically in both engines ───────────────
    "x_gini_mix" -> Q(
      (s, d) => t(s, d, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .withColumn("s_bp", expr("(n * 10000) div total"))
        .groupBy("lang")
        .agg(max(col("total")).as("total"),
          count(lit(1)).as("n_sources"),
          (lit(10000L) - sum(expr("(s_bp * s_bp) div 10000"))).as("gini_bp"))
        .orderBy("lang"),
      Some("""WITH n AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (SELECT lang, n, sum(n) OVER (PARTITION BY lang) AS total,
        |             (n * 10000) // sum(n) OVER (PARTITION BY lang) AS s_bp
        |      FROM n)
        |SELECT lang, CAST(max(total) AS BIGINT) AS total,
        |       count(*) AS n_sources,
        |       CAST(10000 - sum((s_bp * s_bp) // 10000) AS BIGINT) AS gini_bp
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── Integer tf-idf: score = tf · n_docs div df (BIGINT division — no
    //    float logs), top-3 salient terms per source. The per-source window
    //    ranks over the source's VOCABULARY (bounded), not its corpus ────────
    "x_tfidf_top_terms" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val nDocs = docs.agg(countDistinct(col("doc_id"))).head().getLong(0)
        val toks = docs
          .select(col("source"), col("doc_id"),
            explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
          .where(length(col("tok")) >= 3)
        val tf = toks.groupBy("source", "tok").agg(count(lit(1)).as("tf"))
        val df_ = toks.groupBy("tok")
          .agg(countDistinct(col("doc_id")).as("df"))
        val scored = tf.join(df_, "tok")
          .withColumn("score", expr(s"(tf * CAST($nDocs AS BIGINT)) div df"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(desc("score"), asc("tok"))))
          .where(col("rk") <= 3)
        scored.select(col("source"), col("tok"), col("tf"), col("score"),
          col("rk").cast("long").as("rk"))
          .orderBy("source", "rk")
      },
      Some("""WITH tok2 AS (
        |  SELECT source, doc_id, tok
        |  FROM (SELECT source, doc_id,
        |          unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |        FROM documents)
        |  WHERE length(tok) >= 3
        |), tf AS (
        |  SELECT source, tok, count(*) AS tf FROM tok2 GROUP BY 1, 2
        |), df AS (
        |  SELECT tok, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1
        |), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT source, tf.tok AS tok, tf,
        |         CAST(tf * (SELECT n_docs FROM nd) // df AS BIGINT) AS score,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY CAST(tf * (SELECT n_docs FROM nd) // df AS BIGINT) DESC, tf.tok) AS rk
        |  FROM tf JOIN df ON tf.tok = df.tok
        |)
        |SELECT source, tok, CAST(tf AS BIGINT) AS tf, score, CAST(rk AS BIGINT) AS rk
        |FROM scored WHERE rk <= 3 ORDER BY source, rk""".stripMargin)),

    // ── Link-graph ranking: scaled-integer PageRank over the trade graph
    //    (customer nation → supplier nation). The edge aggregation is the
    //    distributed heavy part; the power iteration runs on the aggregated
    //    domain graph — the crawl-quality signal a sampling policy weights
    //    by. operators/Graphs.scala; oracle = 5 chained CTE iterations with
    //    identical BIGINT floor division ────────────────────────────────────
    "x_pagerank_trade" -> Q(
      (s, d) => {
        val support = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        // keep only ABOVE-MEAN-support edges (integer cross-multiplication
        // over the tiny aggregated edge table): the raw trade graph is
        // complete — uniform rank is its exact fixed point, which would
        // make any iteration count pass vacuously. The thresholded graph
        // is sparse and asymmetric at every SF, so the ranks genuinely
        // exercise the recurrence.
        val w = Window.partitionBy()
        val edges = support
          .withColumn("tot", sum(col("n")).over(w))
          .withColumn("npairs", count(lit(1)).over(w))
          .where(col("n") * col("npairs") > col("tot"))
          .select("src", "dst")
        graft.operators.Graphs.pageRankInt(edges, iters = PrIters)
          .orderBy(desc("rank"), asc("node"))
      },
      Some(pageRankOracle)),

    // ── Robust outlier detection: IQR fences on exact discrete quartiles
    //    (integer cents; fence arithmetic in BIGINT — no float stddev whose
    //    summation order diverges across engines). The quality-screen shape
    //    for numeric telemetry columns ──────────────────────────────────────
    "x_outlier_iqr" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            col("event_id"))
        val qs = Sketches.quantilesDisc(ev, "event_type", "cents", "event_id",
          Seq(25, 75))
          .withColumn("iqr", col("p75_cents") - col("p25_cents"))
          .withColumn("fence_lo", col("p25_cents") - expr("(3 * iqr) div 2"))
          .withColumn("fence_hi", col("p75_cents") + expr("(3 * iqr) div 2"))
        ev.join(qs, "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            max(col("fence_lo")).as("fence_lo"),
            max(col("fence_hi")).as("fence_hi"),
            sum(when(col("cents") < col("fence_lo") ||
              col("cents") > col("fence_hi"), 1L).otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events),
        |rk AS (SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev WHERE cents IS NOT NULL),
        |qs AS (SELECT event_type,
        |  max(CASE WHEN rn = (n * 25 + 99) // 100 THEN cents END) AS q1,
        |  max(CASE WHEN rn = (n * 75 + 99) // 100 THEN cents END) AS q3
        |  FROM rk GROUP BY 1),
        |f AS (SELECT event_type, q1 - (3 * (q3 - q1)) // 2 AS fence_lo,
        |             q3 + (3 * (q3 - q1)) // 2 AS fence_hi FROM qs)
        |SELECT ev.event_type, count(*) AS n, max(fence_lo) AS fence_lo,
        |  max(fence_hi) AS fence_hi,
        |  CAST(sum(CASE WHEN cents < fence_lo OR cents > fence_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ev JOIN f ON ev.event_type = f.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Conversion funnel: signup → first later click → first later
    //    purchase, one filtered agg per stage, each stage joined on the
    //    shrinking survivor set ────────────────────────────────────────────
    "x_funnel_steps" -> funnelQ,

    // ── Cohort retention: users bucketed by first-seen week × activity
    //    week offset — integer epoch-week division, distinct-then-count ────
    "x_retention_cohort" -> cohortQ,

    // ── Ingest monitoring: daily-volume spike detection per event type —
    //    a day is flagged when its count exceeds 2.5× the type's MEDIAN
    //    daily count (exact lower-median order statistic, not a float
    //    mean that one spike inflates; the 2.5× test is the integer
    //    cross-multiplication c·2 > med·5). The readout a training-data
    //    ingest pipeline alarms on before a bad crawl batch poisons the
    //    corpus. Scale: one (type, day) count shuffle collapses the input
    //    to ~types×days rows; the median window runs on that tiny
    //    aggregate, never on raw events ─────────────────────────────────────
    "x_event_spikes" -> Q(
      (s, d) => {
        val daily = t(s, d, "events")
          .select(col("event_type"),
            usec(date_trunc("DAY", col("ts"))).as("day_us"))
          .groupBy("event_type", "day_us").agg(count(lit(1)).as("c"))
        val byType = Window.partitionBy(col("event_type"))
        val w = byType.orderBy(col("c"), col("day_us"))
        val med = daily
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(byType))
          .groupBy("event_type")
          .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("c")))
            .as("med"))
        daily.join(med, "event_type")
          .select(col("event_type"), col("day_us"), col("c"), col("med"),
            (col("c") * 2 > col("med") * 5).as("spike"))
      },
      Some(eventSpikesSql)),

    // ── Last-touch attribution: every purchase is credited to the nearest
    //    STRICTLY-preceding marketing touch (view/click) by the same user;
    //    purchases with no prior touch land in the '(none)' bucket. One
    //    ignore-nulls running window over user-partitioned event order —
    //    a single user_id exchange, no join, no as-of machinery; at 100 TB
    //    the window state is one carried string per user partition. The
    //    readout is the marketing-mix table: conversions + revenue cents
    //    per credited channel ───────────────────────────────────────────────
    "x_attribution_last_touch" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"),
            coalesce(col("event_id"), lit(Long.MinValue)))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .where(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            when(col("event_type").isin("view", "click"), col("event_type"))
              .as("touch"))
          .withColumn("attr", last(col("touch"), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .groupBy(coalesce(col("attr"), lit("(none)")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).as("cents"))
          .orderBy("channel")
      },
      Some(attributionSql)))

}
