package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables

/** Sources & sinks: gzip CSV chunk round-trip (header, schema pinning,
  * rollover, row cap) and the footer-driven ns-timestamp repair.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv chunks round-trip values incl. timestamps; rollover splits files") {
    val df = (1 to 100).map(i =>
      (i.toLong, s"name $i", 1.5 * i, Timestamp.valueOf(s"2022-01-01 00:00:${i % 60}")))
      .toDF("id", "name", "amount", "updated")
    val dir = TestSpark.tmpDir("csv") + "/chunks"
    Tables.writeCsvChunks(df.repartition(1), dir, maxRecordsPerFile = 30L)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".csv.gz"))
    assert(files.length >= 4, s"100 rows / 30-row cap → ≥4 chunks, got ${files.length}")
    val back = Tables.readCsvChunks(spark, dir, df.schema)
    assert(back.count() == 100)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet,
      "values round-trip exactly (incl. µs timestamps)")
  }

  test("jsonl chunks round-trip values incl. timestamps, with observed count") {
    val df = (1 to 50).map(i =>
      (i.toLong, s"name $i", 1.5 * i, Timestamp.valueOf(s"2022-01-01 00:00:${i % 60}")))
      .toDF("id", "name", "amount", "updated")
    val dir = TestSpark.tmpDir("jsonl") + "/chunks"
    val n = Tables.writeJsonlChunks(df.repartition(1), dir, maxRecordsPerFile = 20L)
    assert(n == 50, "observed in-job count")
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(files.length >= 2, s"50 rows / 20-row cap → ≥2 chunks, got ${files.length}")
    val back = Tables.readJsonlChunks(spark, dir, df.schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet,
      "values round-trip exactly (incl. µs timestamps)")
  }

  test("compressed chunk writes widen narrow inputs to the session " +
    "parallelism; near-wide inputs keep their layout (the 2× guard)") {
    // gzip encode is CPU-bound and inherits input narrowness: a
    // 1-partition frame on this local[4] session must fan out to 4
    // writer tasks (4 chunk files with no rollover cap in play), while a
    // 3-partition frame (3·2 > 4) must NOT pick up the repartition — a
    // <2× encode speedup never pays for re-shuffling the written rows.
    val df = (1 to 80).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    def gzCount(dir: String) =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".csv.gz"))
    val narrow = TestSpark.tmpDir("widen1") + "/c"
    Tables.writeCsvChunks(df.repartition(1), narrow)
    assert(gzCount(narrow) == spark.sparkContext.defaultParallelism,
      "1-partition input widens to one chunk per core")
    val nearWide = TestSpark.tmpDir("widen3") + "/c"
    Tables.writeCsvChunks(df.repartition(3), nearWide)
    assert(gzCount(nearWide) == 3,
      "3 partitions on 4 cores stay unshuffled (2× guard)")
  }

  test("widenForEncode never executes the plan to learn its width: " +
    "repartition widths are read statically, shuffle-bearing frames pass " +
    "through untouched") {
    // A frame whose plan contains a shuffle (groupBy) must come back the
    // SAME reference: probing its width via df.rdd would force AQE's
    // final plan and eagerly run every upstream shuffle stage, which the
    // subsequent write's fresh QueryExecution then re-runs — a duplicate
    // source pass the one-scan extract contract forbids (r14 review
    // find). Reference equality proves neither a probe-repartition nor
    // any plan surgery happened.
    val agg = (1 to 40).map(i => (i % 4, i.toLong)).toDF("k", "v")
      .groupBy("k").count()
    assert(Tables.widenForEncode(agg) eq agg,
      "shuffle-bearing plan keeps its layout, by reference")
    // An explicit narrow repartition is widened WITHOUT execution — the
    // width comes off the logical Repartition node.
    val narrow = (1 to 40).toDF("v").repartition(2)
    val widened = Tables.widenForEncode(narrow)
    assert(widened ne narrow, "repartition(2) on 4 cores must widen")
  }

  test("maxRecords caps the extract, like the reference's max_records") {
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val dir = TestSpark.tmpDir("csvcap") + "/chunks"
    val written = Tables.writeCsvChunks(df, dir, maxRecords = Some(12L))
    assert(written == 12L, "observed in-job count reports the capped rows")
    assert(Tables.readCsvChunks(spark, dir, df.schema).count() == 12)
  }

  test("writeCsvChunks reports the written row count from inside the " +
    "write job — no second source scan needed") {
    val df = (1 to 77).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val dir = TestSpark.tmpDir("csvcount") + "/chunks"
    assert(Tables.writeCsvChunks(df, dir) == 77L)
  }

  test("empty-DataFrame writes return 0 without hanging (observed-count " +
    "guard, round-9 advice ask #4)") {
    // Observation.get blocks on job completion; a 0-row (and, worse, a
    // 0-task) write must still return promptly. Cover all three observed
    // writers, including a filtered-to-empty frame (the shape a no-delta
    // incremental extract produces).
    val empty = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS v")
    val filteredEmpty = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .where(col("id") < 0)
    assert(Tables.writeCsvChunks(empty, TestSpark.tmpDir("e1") + "/c") == 0L)
    assert(Tables.writeJsonlChunks(filteredEmpty,
      TestSpark.tmpDir("e2") + "/c") == 0L)
    assert(Tables.writeOrc(empty, TestSpark.tmpDir("e3") + "/c") == 0L)
  }

  test("observedCount falls back to the sink recount when the metric " +
    "never fires (cancelled-job shape) instead of blocking forever") {
    // simulate the pathological case directly: an Observation whose job
    // never delivers metrics — the guard must hit its fallback, not hang.
    // (Deadline is 30s in prod, shortened here; the fallback value proves
    // the path taken. A plain obs.get would block this test forever.)
    val obs = org.apache.spark.sql.Observation()
    val t0 = System.nanoTime()
    assert(Tables.observedCount(obs, -42L, timeoutSec = 2) == -42L,
      "fallback value returned")
    assert(System.nanoTime() - t0 < 20L * 1000 * 1000 * 1000)
  }

  test("versioned snapshots: atomic publish, pinned + latest reads, " +
    "vacuum reclaims oldest, crashed stage dirs are inert") {
    import spark.implicits._
    val root = TestSpark.tmpDir("vsnap") + "/tbl"
    assert(Tables.listVersions(spark, root).isEmpty)
    assert(Tables.publishVersion(spark,
      Seq(1L, 2L, 3L).toDF("x"), root) == 1L)
    assert(Tables.publishVersion(spark, Seq(1L, 2L).toDF("x"), root) == 2L)
    // a crashed publish leaves only a stage dir — it must neither surface
    // as a version nor block the next publish
    new java.io.File(s"$root/.stage_v99").mkdirs()
    assert(Tables.listVersions(spark, root) == Seq(1L, 2L))
    assert(Tables.publishVersion(spark, Seq(9L).toDF("x"), root) == 3L)
    // time travel: pinned reads see history, default sees latest
    assert(Tables.readVersion(spark, root, Some(1L)).count() == 3L)
    assert(Tables.readVersion(spark, root, Some(2L)).count() == 2L)
    assert(Tables.readVersion(spark, root).count() == 1L)
    // vacuum keeps the newest `keep`; reclaimed versions are unreachable
    assert(Tables.vacuumVersions(spark, root, keep = 2) == Seq(1L))
    assert(Tables.listVersions(spark, root) == Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      Tables.readVersion(spark, root, Some(1L))
    }
    // publishing after vacuum continues the numbering, never reuses
    assert(Tables.publishVersion(spark, Seq(7L).toDF("x"), root) == 4L)
  }

  test("bucketed tables join with zero shuffle on either side") {
    val left = (1 to 200).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("id", "rv")
    Tables.writeBucketed(left, "b_left", "id", 4)
    Tables.writeBucketed(right, "b_right", "id", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left").join(spark.table("b_right"), "id")
      assert(joined.count() == 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // S8 managed-table drop cleans both up
    graft.catalog.Catalog.dropTable(spark, "b_left")
    graft.catalog.Catalog.dropTable(spark, "b_right")
    assert(!spark.catalog.tableExists("b_left"))
    assert(!spark.catalog.tableExists("b_right"))
  }

  test("every parquet timestamp flavor surfaces as TimestampType") {
    // The loader's contract mirrors the reference's deliberate timestamp
    // leniency (clickhouse_backend.py:134-138 best-effort parse): whatever
    // flavor the corpus was generated with — TIMESTAMP_NS (pre-r8 corpus,
    // repaired from nanosAsLong longs via the footer), naive µs
    // (TIMESTAMP_NTZ under inferTimestampNTZ, r8+ corpus), or plain LTZ —
    // callers always see TimestampType with UTC-wall-clock instants.
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType,
      "events.ts surfaces as TimestampType whatever the parquet flavor")
    assert(ev.where(col("ts").isNull).count() == 0)
    val li = Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.schema("l_shipdate").dataType == TimestampType,
      "naive/NTZ columns are repaired, not passed through")
    // no flavor in the whole corpus escapes the repair
    for (t <- Seq("orders", "lineitem", "events", "documents"))
      assert(!Tables.table(spark, "/root/testdata/sf0.001", t).schema.fields
        .exists(_.dataType == org.apache.spark.sql.types.TimestampNTZType),
        s"$t still exposes a TIMESTAMP_NTZ column")
  }

  test("drift sentinel: every corpus table at every SF loads with repaired " +
    "types and identical schemas across scale factors") {
    // Round-8 lesson: the driver regenerates /root/testdata between rounds
    // and the timestamp flavor has already changed once (ns → naive µs).
    // This canary fails loudly on the NEXT flavor drift instead of letting
    // 12 queries crash at construction: whatever the parquet files hold,
    // the loader must surface no NTZ, no raw ns-longs-that-were-timestamps,
    // and the same schema at sf0.001/0.01/0.1.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    for (t <- tables) {
      val schemas = sfs.map { sf =>
        val df = Tables.table(spark, s"/root/testdata/$sf", t)
        assert(!df.schema.fields.exists(_.dataType ==
          org.apache.spark.sql.types.TimestampNTZType),
          s"$sf/$t exposes TIMESTAMP_NTZ through the loader")
        sf -> df.schema.map(f => f.name -> f.dataType)
      }
      assert(schemas.map(_._2).distinct.size == 1,
        s"$t schema drifts across scale factors: $schemas")
    }
  }

  test("NTZ repair holds even in a session that infers NTZ (belt-and-braces)") {
    // A session WITHOUT inferTimestampNTZ=false (e.g. a user's default
    // Spark 4 session) must still get TimestampType out of the loader —
    // the repair can't depend on our session config being present.
    val prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
      assert(ev.schema("ts").dataType == TimestampType)
      // and the values are the same instants as the config-off read
      val a = ev.agg(org.apache.spark.sql.functions.max(col("ts"))).head().get(0)
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val b = Tables.table(spark, "/root/testdata/sf0.001", "events")
        .agg(org.apache.spark.sql.functions.max(col("ts"))).head().get(0)
      assert(graft.sync.Watermark.asSqlTimestamp(a) ==
        graft.sync.Watermark.asSqlTimestamp(b),
        "instant is flavor-invariant under UTC session TZ")
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
  }

  test("refreshPartitions rewrites ONLY changed partitions, adds new ones, " +
    "deletes removed ones, and leaves untouched partition files alone") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("partrefresh") + "/t.parquet"
    def rows(tag: String, parts: (String, Int)*): org.apache.spark.sql.DataFrame =
      parts.flatMap { case (pt, n) =>
        (1 to n).map(i => (pt, i.toLong, s"$tag-$pt-$i")) }
      .toDF("day", "id", "payload")
    val v1 = rows("v1", "d1" -> 3, "d2" -> 4, "d3" -> 2)
    val first = Tables.refreshPartitions(spark, v1, dir, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first == Map("day=d1" -> "new", "day=d2" -> "new", "day=d3" -> "new"))
    val d2Files = new java.io.File(s"$dir/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    // v2: d1 content changes, d2 untouched, d3 removed, d4 appears
    val v2 = rows("v2", "d1" -> 3, "d4" -> 1)
      .unionByName(rows("v1", "d2" -> 4))
    val second = Tables.refreshPartitions(spark, v2, dir, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(second == Map("day=d1" -> "changed", "day=d2" -> "unchanged",
      "day=d3" -> "removed", "day=d4" -> "new"), s"got $second")
    val after = spark.read.parquet(dir)
    assert(after.where(col("day") === "d1" &&
      col("payload").startsWith("v2")).count() == 3, "d1 rewritten to v2")
    assert(after.where(col("day") === "d2").count() == 4)
    assert(!new java.io.File(s"$dir/day=d3").exists(), "removed dir deleted")
    assert(after.where(col("day") === "d4").count() == 1)
    val d2After = new java.io.File(s"$dir/day=d2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(d2After == d2Files,
      "the unchanged partition's files must be byte-level untouched")
    // idempotence: a second refresh with the same source is all-unchanged
    val third = Tables.refreshPartitions(spark, v2, dir, Seq("day"))
      .collect().map(r => r.getString(1)).toSet
    assert(third == Set("unchanged"))
  }

  test("refreshPartitions dirty-key safety: NULL partition values take " +
    "the Hive sentinel (a removed null partition deletes ONLY its own " +
    "dir, never the table) and inference-normalized string values like " +
    "'01' stay stable instead of churning") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("partnull") + "/t.parquet"
    def rows(parts: (Option[String], Int)*): org.apache.spark.sql.DataFrame =
      parts.flatMap { case (pt, n) =>
        (1 to n).map(i => (pt.orNull, i.toLong, s"p-$i")) }
      .toDF("day", "id", "payload")
    // v1: a null-valued partition, a leading-zero string partition, a
    // normal one — pre-fix the null key component made concat_ws drop it
    // (key "", whose removal deleted the WHOLE table) and "01" re-read
    // as int 1, churning new+removed forever
    val v1 = rows(None -> 2, Some("01") -> 3, Some("d1") -> 1)
    val first = Tables.refreshPartitions(spark, v1, dir, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first == Map("day=__HIVE_DEFAULT_PARTITION__" -> "new",
      "day=01" -> "new", "day=d1" -> "new"), s"got $first")
    // same source again: all unchanged (no inference churn on "01")
    val second = Tables.refreshPartitions(spark, v1, dir, Seq("day"))
      .collect().map(r => r.getString(1)).toSet
    assert(second == Set("unchanged"), s"got $second")
    // drop the null partition: ONLY its sentinel dir goes; 01 and d1 live
    val v2 = rows(Some("01") -> 3, Some("d1") -> 1)
    val third = Tables.refreshPartitions(spark, v2, dir, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(third == Map("day=__HIVE_DEFAULT_PARTITION__" -> "removed",
      "day=01" -> "unchanged", "day=d1" -> "unchanged"), s"got $third")
    assert(!new java.io.File(s"$dir/day=__HIVE_DEFAULT_PARTITION__").exists())
    assert(new java.io.File(s"$dir/day=01").exists())
    assert(spark.read.parquet(dir).count() == 4,
      "surviving partitions keep every row")
  }
}
