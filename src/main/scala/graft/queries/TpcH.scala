package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.queries.Relational.{Q, revE4, revE4Sql, t, usec}

/** TPC-H-shaped breadth queries beyond the round-2/3 set. With q1/q3/q4/q5/
  * q17/q18 living in Relational, this module completes ALL 22 TPC-H query
  * shapes, each exercising a distinct plan pattern: min-cost-supplier
  * correlated MIN (q2), single filtered agg (q6), nation-pair disjunctive
  * join filters (q7), share-of-total CASE aggregation over a 7-way star
  * (q8), profit rollup over a 5-way star (q9), grouped top-k over a 3-way
  * fact join (q10), global-fraction HAVING threshold (q11), join-condition
  * range arithmetic (q12), zero-preserving left-join histogram (q13),
  * single-row ratio aggregates (q14), revenue-view max-scalar selection
  * (q15), count-distinct with an anti-joined exclusion list (q16),
  * OR-of-ANDs pushdown (q19), nested semi-joins with a grouped HAVING
  * (q20), the "only late supplier" double-aggregate semi pattern (q21),
  * and a global scalar threshold + anti join (q22).
  *
  * The testdata star lacks `partsupp` and lineitem's commit/receipt dates
  * (TESTDATA.md), so q2/q9/q11/q12/q16/q20/q21 are adapted to the available
  * columns with identical plan shapes: lateness is `l_shipdate >
  * o_orderdate + N days`, the part↔supplier relation is the distinct
  * (l_partkey, l_suppkey) pairs in lineitem, supply cost surrogates come
  * from s_acctbal / p_retailprice, and q22's country code is the
  * customer's nation key.
  *
  * Determinism follows SURVEY §7.4: integer-cents money, epoch-µs dates,
  * exact-integer scalar comparisons (q22 compares `bal*cnt > total` instead
  * of dividing), numerator+denominator instead of ratios (q8, q14).
  */
object TpcH {

  val all: Map[String, Q] = Map(

    // ── Q7 shape: bidirectional nation-pair volume. Nations are prefiltered
    //    onto supplier/customer BEFORE the fact join (at 100 TB the 2-nation
    //    filter kills ~92% of both dims pre-shuffle); only the cross-pair
    //    disjunction remains post-join ─────────────────────────────────────
    "q7_volume_shipping" -> Q(
      (s, d) => {
        val pair = Seq(3, 7)
        val sn = t(s, d, "nation").select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
        val cn = t(s, d, "nation").select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
        // broadcast() only on nation (25 rows, bounded); supplier/customer
        // scale with SF — Catalyst/AQE picks broadcast at small scale and
        // shuffle at 100 TB (a forced hint would hit the 8 GB limit there)
        val sp = t(s, d, "supplier").where(col("s_nationkey").isin(pair: _*))
          .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")
        val cu = t(s, d, "customer").where(col("c_nationkey").isin(pair: _*))
          .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
          .select("c_custkey", "cust_nation")
        val li = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        li.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(cu, col("o_custkey") === col("c_custkey"))
          .join(sp, col("l_suppkey") === col("s_suppkey"))
          .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        s"CAST(sum($revE4Sql) AS BIGINT) AS revenue_e4 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation cn ON c_nationkey = cn.n_nationkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation sn ON s_nationkey = sn.n_nationkey " +
        "WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7') " +
        "    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')) " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")),

    // ── Q8 shape: market share as numerator+denominator (no double
    //    division); region restricts the customer side, the CASE tags the
    //    supplier side ──────────────────────────────────────────────────────
    "q8_market_share" -> Q(
      (s, d) => {
        val euroNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region").where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))
        val cu = t(s, d, "customer")
          .join(broadcast(euroNations), col("c_nationkey") === col("cn_key"), "left_semi")
          .select("c_custkey")
        val sn = t(s, d, "nation").select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
        // part/supplier scale with SF — no forced broadcast (see q7 note);
        // euroNations stays hinted (bounded by the 25-nation table)
        val sp = t(s, d, "supplier")
          .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")
        val pt = t(s, d, "part").where(col("p_type") === "ECONOMY").select("p_partkey")
        val or = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        t(s, d, "lineitem")
          .join(pt, col("l_partkey") === col("p_partkey"))
          .join(or, col("l_orderkey") === col("o_orderkey"))
          .join(cu, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(sp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_5",
              revE4(col("l_extendedprice"), col("l_discount"))).otherwise(0L))
              .as("nation_rev_e4"),
            sum(revE4(col("l_extendedprice"), col("l_discount"))).as("total_rev_e4"))
          .orderBy("o_year")
      },
      Some("SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN $revE4Sql ELSE 0 END) AS BIGINT) AS nation_rev_e4, " +
        s"CAST(sum($revE4Sql) AS BIGINT) AS total_rev_e4 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation cn ON c_nationkey = cn.n_nationkey " +
        "JOIN region ON cn.n_regionkey = r_regionkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation sn ON s_nationkey = sn.n_nationkey " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1 ORDER BY 1")),

    // ── Q10 shape: returned-item revenue per customer, grouped top-20.
    //    Fact-to-fact shuffle join (orders×lineitem), customer joined after
    //    the group-by keys demand it ────────────────────────────────────────
    "q10_returned_items" -> Q(
      (s, d) => {
        val or = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val li = t(s, d, "lineitem").where(col("l_returnflag") === "R")
        t(s, d, "customer")
          .join(or, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_custkey", "c_name")
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
            count(lit(1)).as("n_items"))
          .orderBy(desc("revenue_e4"), asc("c_custkey")).limit(20)
      },
      Some("SELECT c_custkey, c_name, " +
        s"CAST(sum($revE4Sql) AS BIGINT) AS revenue_e4, count(*) AS n_items " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' " +
        "GROUP BY 1, 2 ORDER BY revenue_e4 DESC, c_custkey LIMIT 20")),

    // ── Q12 shape: range arithmetic inside the join condition (late shipment
    //    = shipped >90 days after order), CASE-bucketed priority counts ─────
    "q12_priority_late" -> Q(
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t(s, d, "orders")
          .join(t(s, d, "lineitem"),
            col("o_orderkey") === col("l_orderkey") &&
              usec(col("l_shipdate")) > usec(col("o_orderdate")) + lit(90L * 86400000000L))
          .groupBy("l_linestatus")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("SELECT l_linestatus, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE epoch_us(l_shipdate) > epoch_us(o_orderdate) + 7776000000000 " +
        "GROUP BY l_linestatus ORDER BY l_linestatus")),

    // ── Q14 shape: promo share of one month's revenue, numerator and
    //    denominator as exact longs (caller divides if a ratio is wanted) ───
    "q14_promo_revenue" -> Q(
      (s, d) => {
        val pt = t(s, d, "part").select("p_partkey", "p_type")
        t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(pt, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              revE4(col("l_extendedprice"), col("l_discount"))).otherwise(0L))
              .as("promo_rev_e4"),
            sum(revE4(col("l_extendedprice"), col("l_discount"))).as("total_rev_e4"))
      },
      Some("SELECT " +
        s"CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revE4Sql ELSE 0 END) AS BIGINT) AS promo_rev_e4, " +
        s"CAST(sum($revE4Sql) AS BIGINT) AS total_rev_e4 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'")),

    // ── Q16 shape: suppliers-per-part-profile count-distinct with an
    //    anti-joined exclusion list (negative-balance suppliers stand in for
    //    the reference's complaint suppliers; partsupp absent → lineitem
    //    provides the part↔supplier facts) ──────────────────────────────────
    "q16_supplier_cnt" -> Q(
      (s, d) => {
        val pt = t(s, d, "part")
          .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "MEDIUM" &&
            col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 36))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        val excl = t(s, d, "supplier").where(col("s_acctbal") < 0).select("s_suppkey")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(pt, col("l_partkey") === col("p_partkey"))
          .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
      },
      Some("SELECT p_brand, p_type, p_size, " +
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM' " +
        "AND p_size IN (1,5,9,14,20,25,30,36) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")),

    // ── Q19 shape: disjunction of brand/size/quantity conjunctions — the
    //    classic OR-of-ANDs Catalyst must keep as a join post-filter while
    //    still pushing the common p_partkey equi key ────────────────────────
    "q19_disjunctive" -> Q(
      (s, d) => {
        val pt = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
        t(s, d, "lineitem")
          .join(pt, col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 10) &&
              col("l_quantity").between(1, 15)) ||
            (col("p_brand") === "Brand#12" && col("p_size").between(5, 20) &&
              col("l_quantity").between(10, 25)) ||
            (col("p_brand") === "Brand#20" && col("p_size").between(10, 35) &&
              col("l_quantity").between(20, 40)))
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
            count(lit(1)).as("n"))
      },
      Some(s"SELECT CAST(sum($revE4Sql) AS BIGINT) AS revenue_e4, count(*) AS n " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15) " +
        "OR (p_brand = 'Brand#12' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 25) " +
        "OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 35 AND l_quantity BETWEEN 20 AND 40)")),

    // ── Q21 shape: "the only late supplier on a multi-supplier order" —
    //    the correlated EXISTS/NOT-EXISTS pair becomes two per-order
    //    distinct-supplier aggregates joined back to the late facts (no
    //    correlated subqueries, no row explosion; all joins on l_orderkey) ──
    "q21_late_suppliers" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        val ordF = t(s, d, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        // ONE pass over lineitem instead of three (r14): the old shape ran
        // the late join PLUS two full countDistinct shuffles PLUS two
        // semi-joins back onto the late rows. Here a LEFT join tags each
        // lineitem row late/not (non-F orders tag false, so per-order
        // supplier counts still cover every order, as the all-lineitem
        // aggregate did), and two stacked aggregations on l_orderkey —
        // (order, supplier) then (order) — derive n_supp / n_late / the
        // single late supplier / its late-row count. The join is pinned
        // SHUFFLE_HASH: orders is NOT a bounded dim (an AQE broadcast at
        // toy scale would strand lineitem unpartitioned and force BOTH
        // aggregations to shuffle), and a sort-merge join would sort the
        // full lineitem side that the downstream HASH aggregates never
        // need sorted; with SHJ the join's l_orderkey hash partitioning
        // satisfies both groupBys' distributions, so the whole query
        // rides ONE lineitem-sized exchange and zero sorts.
        val flagged = li
          .join(ordF.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"), "left")
          .select(col("l_orderkey"), col("l_suppkey"),
            coalesce(usec(col("l_shipdate")) >
              usec(col("o_orderdate")) + lit(60L * 86400000000L),
              lit(false)).as("late"))
        val perSupp = flagged.groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("late")).as("supp_late"),
            sum(when(col("late"), 1L).otherwise(0L)).as("supp_late_rows"))
        val perOrder = perSupp.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"),
            sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late"),
            min(when(col("supp_late"), col("l_suppkey"))).as("late_supp"),
            sum(when(col("supp_late"), col("supp_late_rows"))
              .otherwise(0L)).as("late_rows"))
        perOrder.where(col("n_late") === 1 && col("n_supp") > 1)
          .join(t(s, d, "supplier"), col("late_supp") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(sum(col("late_rows")).cast("long").as("numwait"))
          .orderBy(desc("numwait"), asc("s_name")).limit(25)
      },
      Some("WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem " +
        "JOIN orders ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F' " +
        "AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + 5184000000000), " +
        "per_order AS (SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp " +
        "FROM lineitem GROUP BY 1), " +
        "late_per_order AS (SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_late " +
        "FROM late GROUP BY 1) " +
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM late " +
        "JOIN per_order ON late.l_orderkey = per_order.ok " +
        "JOIN late_per_order ON late.l_orderkey = late_per_order.ok " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE n_supp > 1 AND n_late = 1 " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25")),

    // ── Q22 shape: above-average balances with no recent orders. The global
    //    average is ONE scalar agg job collected to the driver (the
    //    watermark pattern — not a 1-row broadcast nested-loop join), and
    //    the comparison is exact integer cross-multiplication, never a
    //    double division ─────────────────────────────────────────────────────
    "q22_idle_customers" -> Q(
      (s, d) => {
        val cu = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            Functions.cents(col("c_acctbal")).as("bal_cents"),
            col("c_acctbal"))
        val stats = cu.where(col("c_acctbal") > 0)
          .agg(sum(col("bal_cents")).as("total"), count(lit(1)).as("cnt"))
          .head()
        // empty customer table: sum is NULL — degrade to (0, 0) so the
        // threshold predicate selects nothing, matching the oracle's
        // NULL-comparison result
        val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
        val cnt = stats.getLong(1)
        val recent = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey")
        cu.where(col("bal_cents") * lit(cnt) > lit(total))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totacctbal_cents"))
          .orderBy("c_nationkey")
      },
      Some("WITH stats AS (SELECT " +
        "CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_cents, " +
        "count(*) AS cnt FROM customer WHERE c_acctbal > 0) " +
        "SELECT c_nationkey, count(*) AS numcust, " +
        "CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents " +
        "FROM customer, stats " +
        "WHERE CAST(round(c_acctbal*100) AS BIGINT) * cnt > total_cents " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY c_nationkey ORDER BY c_nationkey")),

    // ── Q2 shape: min-cost supplier per part. partsupp is absent, so the
    //    part↔supplier relation is the DISTINCT (l_partkey, l_suppkey)
    //    pairs observed in lineitem and "cost" is the supplier balance in
    //    cents. The signature move survives: a per-part grouped MIN joined
    //    back (Spark side) ≡ the correlated scalar subquery (oracle side) —
    //    all equi-joins, dims filtered before the fact join ────────────────
    "q2_min_cost_supplier" -> Q(
      (s, d) => {
        // filter BEFORE the distinct (r14): the old shape deduped ALL
        // (l_partkey, l_suppkey) pairs — the full lineitem pair volume
        // through one exchange — then joined the ~2% of parts with
        // p_size = 15, and recomputed that whole chain a second time for
        // the grouped-MIN join-back. Here the size-15 part join prunes
        // the pair stream first (Catalyst/AQE broadcasts the filtered
        // part side at small scale, shuffles at 100 TB — part is not a
        // bounded dim, so no forced hint), the distinct dedups only the
        // surviving ~2%, and the per-part MIN is a window over the
        // already-partitioned candidates instead of a groupBy + self-join
        // that recomputes its own input.
        val pa = t(s, d, "part").where(col("p_size") === 15)
          .select("p_partkey", "p_type")
        val eurNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region").where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val sup = t(s, d, "supplier")
          .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            Functions.cents(col("s_acctbal")).as("bal_cents"))
        val ps = t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(pa, col("l_partkey") === col("p_partkey"))
          .select("p_partkey", "p_type", "l_suppkey")
          .distinct()
        val cand = ps.join(sup, col("l_suppkey") === col("s_suppkey"))
        val perPart = org.apache.spark.sql.expressions.Window
          .partitionBy("p_partkey")
        cand
          .withColumn("min_bal", min(col("bal_cents")).over(perPart))
          .where(col("bal_cents") === col("min_bal"))
          .select("p_partkey", "p_type", "s_name", "n_name", "bal_cents")
          .orderBy(desc("bal_cents"), asc("s_name"), asc("p_partkey"))
          .limit(100)
      },
      Some("WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), " +
        "sup AS (SELECT s_suppkey, s_name, n_name, " +
        "  CAST(round(s_acctbal*100) AS BIGINT) AS bal_cents " +
        "  FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), " +
        "cand AS (SELECT p_partkey, p_type, s_name, n_name, bal_cents " +
        "  FROM ps JOIN part ON l_partkey = p_partkey AND p_size = 15 " +
        "  JOIN sup ON l_suppkey = s_suppkey) " +
        "SELECT p_partkey, p_type, s_name, n_name, bal_cents FROM cand c " +
        "WHERE bal_cents = (SELECT min(bal_cents) FROM cand m " +
        "                   WHERE m.p_partkey = c.p_partkey) " +
        "ORDER BY bal_cents DESC, s_name, p_partkey LIMIT 100")),

    // ── Q6 shape: the forecasting-revenue single filtered agg — pure scan →
    //    filter → one-row sum, the canonical pushdown probe. The discount
    //    band compares integer percent (round(d*100)), not raw floats ──────
    "q6_forecast_revenue" -> Q(
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          round(col("l_discount") * 100).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round(col("l_discount") * 100).cast("long")).as("revenue_e4")),
      Some("SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * " +
        "CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_e4 " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7 " +
        "AND l_quantity < 24")),

    // ── Q9 shape: product profit by supplier nation × order year. Supply
    //    cost is surrogated from p_retailprice (no partsupp); profit stays
    //    numerator-exact: revenue_e4 − cost_e4 in BIGINT ───────────────────
    "q9_product_profit" -> Q(
      (s, d) => {
        val pa = t(s, d, "part").where(col("p_name").like("%red%"))
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100).cast("long").as("cost_cents"))
        val li = t(s, d, "lineitem")
          .join(pa, col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        li.groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount")) -
            col("cost_cents") * lit(100L) * col("l_quantity").cast("long"))
            .as("profit_e4"))
          .orderBy(asc("nation"), desc("o_year"))
      },
      Some("SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"CAST(sum($revE4Sql - " +
        "CAST(round(p_retailprice*100) AS BIGINT) * 100 * CAST(l_quantity AS BIGINT)) " +
        "AS BIGINT) AS profit_e4 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%' " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2 DESC")),

    // ── Q11 shape: important-stock — per-part value vs a global-fraction
    //    threshold. The total is ONE scalar agg collected to the driver
    //    (q22's watermark pattern) and the HAVING is exact integer
    //    cross-multiplication: value·10000 > total ─────────────────────────
    "q11_important_stock" -> Q(
      (s, d) => {
        val natSup = t(s, d, "supplier").where(col("s_nationkey") === 5)
          .select("s_suppkey")
        val pa = t(s, d, "part")
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100).cast("long").as("price_cents"))
        val vals = t(s, d, "lineitem")
          .join(natSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(pa, col("l_partkey") === col("p_partkey"))
          .groupBy("p_partkey")
          .agg(sum(col("l_quantity").cast("long") * col("price_cents"))
            .as("value_cents"))
        // persisted: the driver-scalar total AND the final filter read
        // vals - unpersisted, the whole lineitem join+agg chain ran twice
        // (the q21/q2 one-pass rule applied here). vals is part-sized:
        // dimension-scale cache however big the fact table.
        val valsP = graft.operators.CacheRegistry.register(vals
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // coalesce: an empty survivor set (tiny SF, no nation-5 suppliers)
        // must yield total=0 and an empty result, not a NULL getLong crash
        val total = valsP.agg(coalesce(sum(col("value_cents")), lit(0L)))
          .head().getLong(0)
        valsP.where(col("value_cents") * lit(10000L) > lit(total))
          .orderBy(desc("value_cents"), asc("p_partkey"))
      },
      Some("WITH vals AS (SELECT p_partkey, " +
        "  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "  FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 5) " +
        "  GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total FROM vals) " +
        "SELECT p_partkey, value_cents FROM vals, tot " +
        "WHERE value_cents * 10000 > total " +
        "ORDER BY value_cents DESC, p_partkey")),

    // ── Q13 shape: customer order-count distribution — LEFT join so
    //    zero-order customers survive into the histogram, then a second
    //    aggregation over the first's result ───────────────────────────────
    "q13_custdist" -> Q(
      (s, d) => {
        // "1-URGENT" (the corpus literal): a bare "URGENT" matched every
        // row, so the defining exclusion of the Q13 shape was vacuous and
        // the filtered left join degenerated to an unfiltered one
        val ord = t(s, d, "orders").where(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey")
        t(s, d, "customer")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_custkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("SELECT c_count, count(*) AS custdist FROM (" +
        "  SELECT c_custkey, count(o_custkey) AS c_count " +
        "  FROM customer LEFT JOIN orders " +
        "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' " +
        "  GROUP BY c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC")),

    // ── Q15 shape: top supplier by quarterly revenue — the revenue "view"
    //    aggregated once, its max taken as one driver scalar (never a 1-row
    //    nested-loop join), equality filter returns every tied supplier ────
    "q15_top_supplier" -> Q(
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount")))
            .as("total_revenue_e4"))
        // persisted: the max scalar and the equality filter both read rev
        // (supplier-sized) - one lineitem pass instead of two
        val revP = graft.operators.CacheRegistry.register(rev
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // Long.MinValue sentinel on an empty quarter: matches no supplier
        // (revenues are positive), mirroring the oracle's NULL-= semantics
        val maxRev = revP.agg(coalesce(max(col("total_revenue_e4")), lit(Long.MinValue)))
          .head().getLong(0)
        revP.where(col("total_revenue_e4") === maxRev)
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue_e4")
          .orderBy("s_suppkey")
      },
      Some("WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
        s"  CAST(sum($revE4Sql) AS BIGINT) AS total_revenue_e4 " +
        "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, total_revenue_e4 " +
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
        "WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue) " +
        "ORDER BY s_suppkey")),

    // ── Q20 shape: nested semi-joins — suppliers who moved a significant
    //    volume of promotable ('%red%') parts in a year. part-filter semi
    //    into the lineitem agg, HAVING threshold, then semi into supplier —
    //    no fact row ever widens ───────────────────────────────────────────
    "q20_promotable_suppliers" -> Q(
      (s, d) => {
        val redParts = t(s, d, "part").where(col("p_name").like("%red%"))
          .select("p_partkey")
        val bigMovers = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          // exact centi-units, summed THEN compared: the old per-row
          // cast("long") truncated each quantity before the sum while the
          // oracle summed raw doubles - a latent cross-engine parity break
          // on any fractional quantity (the file-wide convention is
          // sum-then-convert; q20 was the one outlier)
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"))
          .where(col("qty_c") > 5000)
          .select("l_suppkey").distinct()
        t(s, d, "supplier")
          .join(bigMovers, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .where(col("s_nationkey") < 20)
          .select("s_suppkey", "s_name")
          .orderBy("s_name")
      },
      Some("SELECT s_suppkey, s_name FROM supplier " +
        "WHERE s_suppkey IN (" +
        "  SELECT l_suppkey FROM lineitem " +
        "  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') " +
        "  AND l_shipdate >= TIMESTAMP '1996-01-01' " +
        "  AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "  GROUP BY l_suppkey, l_partkey HAVING sum(CAST(round(l_quantity*100) AS BIGINT)) > 5000) " +
        "AND s_nationkey < 20 ORDER BY s_name")))
}
