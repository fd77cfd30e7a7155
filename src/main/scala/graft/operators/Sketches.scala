package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate / order-statistic aggregates built only from
  * cross-engine-deterministic primitives (md5 bits, integer shifts, exact
  * row-number selection) so the same math can be mirrored in any warehouse
  * SQL dialect bit-for-bit — unlike engine-native sketches
  * (`approx_count_distinct`'s HLL++ or t-digest percentiles) whose register
  * layouts and interpolation differ per engine and can never hash-match an
  * oracle.
  *
  * Scale: every operator here is one or two hash-partitioned aggregations —
  * the HLL register table is at most `groups × m` rows regardless of input
  * size, and the quantile window partitions by the group key.
  */
object Sketches {

  /** HyperLogLog distinct-count estimate with integer-only arithmetic.
    *
    * Per value: a 60-bit md5 prefix splits into a register index (low 8
    * bits, m=256) and a 52-bit tail whose leading-zero rank is
    * `53 - length(bin(tail))` — the binary-string length IS the integer
    * floor(log2)+1, avoiding float logs. The harmonic sum is scaled by 2^20
    * (terms below 2^-20 clamp to 1 — irrelevant at the raw-estimator
    * cardinalities this targets and identical in any mirroring engine), and
    * the estimate is a single BIGINT division with alpha≈0.7213 carried as
    * the exact rational 7213/10000.
    *
    * Raw-regime caveat: no small-range linear-counting correction (its
    * `m·ln(m/V)` needs a float log); accurate for n ≳ 10·m distinct.
    *
    * Output: one row per group — n_reg (non-empty registers), sum_scaled
    * (diagnostic), hll_est.
    */
  def approxDistinctHll(df: DataFrame, groupCol: String, valueCol: String)
  : DataFrame = {
    val m = 256
    val h60 = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = shiftright(h60, 8) // h60 div 256, nonneg
    val rho = when(w === 0, lit(53))
      .otherwise(lit(53) - length(bin(w)))
    // NULLs are excluded: COUNT DISTINCT semantics ignore NULL, and the
    // native HllRegisterAgg twin skips them — without this filter a NULL
    // value fabricated a (j=NULL, m_j=NULL) register row that inflated
    // n_reg and skewed sum_scaled, silently breaking the documented
    // bit-for-bit parity between the two forms on dirty data
    val reg = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol), (h60 % m).as("j"), rho.as("rho"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("rho")).as("m_j"))
    reg.groupBy(col(groupCol))
      .agg(
        (sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(greatest(20 - m_j, 0) AS INT)) AS BIGINT)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << 20)).as("sum_scaled"),
        count(lit(1)).as("n_reg"))
      .select(col(groupCol), col("n_reg"), col("sum_scaled"),
        expr(s"(CAST(7213 AS BIGINT) * $m * $m * ${1L << 20}) " +
          "div (10000 * sum_scaled)").as("hll_est"))
  }

  /** Discrete (non-interpolating) per-group percentiles: the value at row
    * ceil(p·n) of the group's sort order — exact row selection, so any
    * engine that sorts the same way returns the identical data value. The
    * tie-break column makes the row order total. NULL values are dropped
    * up front: Spark sorts NULLS FIRST ascending where most dialects
    * (DuckDB included) default NULLS LAST, so keeping them would shift
    * every rank by the group's null count in one engine only.
    */
  def quantilesDisc(df: DataFrame, groupCol: String, valueCol: String,
                    tieCol: String, percents: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .select(col(groupCol), col(valueCol), col(tieCol))
      .where(col(valueCol).isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = percents.map(p =>
      max(when(col("rn") === expr(s"(n * $p + 99) div 100"), col(valueCol)))
        .as(s"p${p}_${valueCol}"))
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Count-min sketch: depth×width integer counters addressed by disjoint
    * 16-bit md5 chunks (the same hash family as the minhash operators).
    * The sketch is ≤ depth·width rows whatever the input size — the
    * frequency twin of [[approxDistinctHll]] — and merges by plain
    * summation. Estimates only ever overcount (min over depth rows).
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Build the (row, bucket) → count table for one value column. */
  def cmsSketch(df: DataFrame, valueCol: String): DataFrame = {
    val coords = (0 until CmsDepth).map { i =>
      struct(lit(i).as("i"),
        (conv(substring(md5(col(valueCol).cast("string")), 4 * i + 1, 4), 16, 10)
          .cast("long") % CmsWidth).as("bucket"))
    }
    df.select(explode(array(coords: _*)).as("c"))
      .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each key in `keys(keyCol)`: min over
    * the depth rows the key hashes to. The sketch side is tiny (≤ 4096
    * rows) — Catalyst broadcasts it; the probe never shuffles the corpus.
    * An empty counter is 0, so a key the sketch never saw estimates 0 (a
    * LEFT join — an inner join would silently drop never-seen keys or,
    * worse, take the min over only their colliding coordinates).
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val probes = (0 until CmsDepth).map { i =>
      struct(lit(i).as("i"),
        (conv(substring(md5(col(keyCol).cast("string")), 4 * i + 1, 4), 16, 10)
          .cast("long") % CmsWidth).as("bucket"))
    }
    keys.select(col(keyCol), explode(array(probes: _*)).as("c"))
      .select(col(keyCol), col("c.i").as("i"), col("c.bucket").as("bucket"))
      .join(sketch, Seq("i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Bloom filter as a relation: the distinct (hash-row, bit-position)
    * pairs a key set lights up — ≤ depth·2¹⁶ rows however large the set,
    * same md5-chunk hash family as the CMS. The canonical 100 TB use is
    * JOIN PRUNING: build the filter from the join key's small-but-too-big-
    * to-broadcast side, semi-join the huge fact table against it (bits
    * broadcast), and feed only survivors (members + a bounded
    * false-positive trickle) to the real join.
    */
  val BloomHashes = 4
  val BloomBits = 65536

  private def bloomPositions(keyCol: String) =
    (0 until BloomHashes).map { i =>
      struct(lit(i).as("i"),
        (conv(substring(md5(col(keyCol).cast("string")), 4 * i + 1, 4), 16, 10)
          .cast("long") % BloomBits).as("pos"))
    }

  /** The filter: distinct lit bit positions of `df(keyCol)`. */
  def bloomBits(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(array(bloomPositions(keyCol): _*)).as("c"))
      .select(col("c.i").as("i"), col("c.pos").as("pos"))
      .distinct()

  /** Keys of `probe(keyCol)` that MIGHT be members: all `BloomHashes`
    * positions present in the filter (exact members always pass; a
    * non-member passes only on a full hash collision).
    */
  def bloomMightContain(bits: DataFrame, probe: DataFrame, keyCol: String)
  : DataFrame =
    probe.select(col(keyCol), explode(array(bloomPositions(keyCol): _*)).as("c"))
      .select(col(keyCol), col("c.i").as("i"), col("c.pos").as("pos"))
      .join(bits, Seq("i", "pos"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__hits"))
      .where(col("__hits") === BloomHashes)
      .select(col(keyCol))

  /** Per-column table profile: count / nulls / distinct / min / max, one
    * row per requested column (min/max rendered as strings so numeric and
    * text columns union into one result). Each column is an independent
    * single-pass aggregate; Spark scans the table once per column but reads
    * only that column thanks to parquet pruning.
    */
  /** k-anonymity audit over a quasi-identifier combination — the privacy
    * check run before releasing a dataset with user-adjacent attributes:
    * every row whose quasi-identifier tuple is shared by fewer than `k`
    * rows is re-identifiable by joining on those attributes. One report
    * row per equivalence class: its size, whether it clears `k`, and the
    * rows that would need suppression or generalization.
    *
    * Scale: ONE hash aggregation on the quasi-identifier tuple — the
    * report is equivalence-class-sized (≤ the attribute domain product),
    * never row-sized; the per-row suppress verdict is derivable by
    * joining the report back (the class key is the join key the release
    * pipeline already groups on).
    */
  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String],
                 k: Long = 5L): DataFrame = {
    val keys = quasiIdCols.map(col)
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("n_suppress",
        when(col("group_n") >= k, 0L).otherwise(col("group_n")))
  }

  /** Distinct l-diversity audit — the companion check k-anonymity can't
    * express: a class may clear `k` members yet still leak the sensitive
    * attribute if every member SHARES its value (homogeneity attack — an
    * adversary who places a target in the class learns the attribute
    * without re-identifying the row). One report row per equivalence
    * class: size, number of distinct sensitive values, and whether it
    * clears `l`. A release passes only when every class is BOTH
    * k-anonymous and l-diverse.
    *
    * Scale: same ONE hash aggregation as [[kAnonymity]] — count-distinct
    * of the sensitive column rides the existing exchange as a partial
    * (map-side) distinct, and the report stays equivalence-class-sized.
    */
  def lDiversity(df: DataFrame, quasiIdCols: Seq[String],
                 sensitiveCol: String, l: Long = 2L): DataFrame = {
    val keys = quasiIdCols.map(col)
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /** t-closeness audit — the skewness-attack companion l-diversity can't
    * express (Li, Li & Venkatasubramanian, ICDE 2007): a class may hold
    * `l` distinct sensitive values yet still leak if its DISTRIBUTION
    * over them diverges from the table's (an adversary's posterior jumps
    * from the global prior to the class distribution). Verdict: the total
    * variation distance between each class's sensitive-value distribution
    * and the global one must stay ≤ t.
    *
    * Integer-exact so the verdict can hash-match any mirroring engine:
    * with class-value counts n_cv, class size n_c, global value counts
    * g_v and table size N,
    *   TVD = [ Σ_{v∈class} |n_cv·N − g_v·n_c| + (N − Σ_{v∈class} g_v)·n_c ]
    *         / (2·n_c·N)
    * (the second term is the mass of values ABSENT from the class — TVD
    * must count them, or a class concentrated on one rare value would
    * score too close). The report carries the exact numerator and
    * denominator; `t_close` compares cross-multiplied against t = tNum/tDen,
    * so no floats anywhere. BIGINT products bound the audit frame at
    * N ≲ 3×10⁹ rows — beyond that ANSI mode fails loudly (never silently
    * wraps); swap the products to decimal(38,0) for a larger release.
    *
    * Scale: one hash aggregation on (QI, sensitive), one window + final
    * aggregation on the QI tuple (the groupBy reuses the window's
    * exchange), and a broadcast of the sensitive-domain-sized global
    * distribution (its grand total rides a single-partition window over
    * domain-count rows, never the corpus). The report stays
    * equivalence-class-sized.
    */
  def tCloseness(df: DataFrame, quasiIdCols: Seq[String],
                 sensitiveCol: String, tNum: Long = 1L,
                 tDen: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = quasiIdCols.map(col)
    val cv = df.groupBy(keys :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("n_cv"))
    val gd = df.groupBy(col(sensitiveCol).as("__s"))
      .agg(count(lit(1)).as("g_v"))
      .withColumn("n_total", sum("g_v").over(Window.partitionBy()))
    val w = Window.partitionBy(keys: _*)
    // null-SAFE join (<=>): groupBy above collapses NULL sensitive values
    // into one group on BOTH sides, but a plain equi-join would drop the
    // class's NULL mass (NULL never equals NULL), undercounting group_n
    // and corrupting the TVD verdict for any class with NULL sensitive
    // rows. kAnonymity/lDiversity never join on the sensitive value, so
    // this was the one null-unsafe member of the family.
    cv.join(broadcast(gd), col(sensitiveCol) <=> col("__s"))
      .drop("__s")
      .withColumn("group_n", sum("n_cv").over(w))
      .withColumn("g_present", sum("g_v").over(w))
      .groupBy(keys: _*)
      .agg(max("group_n").as("group_n"),
        (sum(abs(col("n_cv") * col("n_total") - col("g_v") * col("group_n"))) +
          (max("n_total") - max("g_present")) * max("group_n")).as("tvd_num"),
        (max("group_n") * max("n_total") * 2).as("denom"))
      .withColumn("t_close", col("tvd_num") * tDen <= col("denom") * tNum)
  }

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    cols.map { case (name, c) =>
      df.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(c)).as("n_null"),
        countDistinct(c).as("n_distinct"),
        min(c).cast("string").as("min_v"),
        max(c).cast("string").as("max_v"))
        .select(lit(name).as("col"), col("n"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _).orderBy("col")
}
