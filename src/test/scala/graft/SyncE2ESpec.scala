package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{GraftConfig, ReloadSpec, TableOpts, Warehouse}
import graft.schema.PgTypeMapper

/** End-to-end port of the reference's seven pytest shapes
  * (/root/reference/pgwarehouse/tests/test_postgres.py:88-187) over a
  * parquet source/warehouse pair driven by the CLI controller. Fixtures
  * mirror tests/pg_setup.sql + tests/data/: users10 (serial PK, append-only),
  * my_orders (bigserial PK + last_modified upsert, M/D/YYYY dates),
  * local_parks (no PK, enum column, space-in-column-name — the degraded,
  * reload-only path).
  */
class SyncE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sourceDir = TestSpark.tmpDir("src")
  private val warehouseDir = TestSpark.tmpDir("wh")
  private val dataDir = TestSpark.tmpDir("data")

  private def cfg(maxRecords: Option[Long] = None) = GraftConfig(
    sourceDir, warehouseDir, dataDir, maxRecords,
    scala.collection.immutable.ListMap(
      "users10" -> TableOpts(primaryKey = Some("id")),
      "my_orders" -> TableOpts(primaryKey = Some("id"),
        lastModified = Some("order_updated")),
      "local_parks" -> TableOpts(reload = ReloadSpec.Always)))

  private def wh(maxRecords: Option[Long] = None) =
    new Warehouse(spark, cfg(maxRecords))

  private def writeSource(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$sourceDir/$name.parquet")

  private def ts(s: String) = Timestamp.valueOf(s)

  private def users(n: Int, from: Int = 1): DataFrame =
    (from until from + n).map(i =>
      (i.toLong, s"user$i", s"u$i@example.com", 20 + i % 50))
      .toDF("id", "name", "email", "age")

  private def orders(rows: Seq[(Long, Int, String, Double, String)]): DataFrame = {
    val raw = rows.toDF("id", "user_id", "order_date_raw", "order_amount",
      "order_updated_raw")
    // order_date arrives in the fixture's M/D/YYYY form → best-effort parse
    raw.select(col("id"), col("user_id"),
      graft.functions.Functions.bestEffortTimestamp(col("order_date_raw"))
        .cast("date").as("order_date"),
      col("order_amount"),
      col("order_updated_raw").cast("timestamp").as("order_updated"))
  }

  private val baseOrders: Seq[(Long, Int, String, Double, String)] =
    (1 to 30).map(i => (i.toLong, i % 7, s"${1 + i % 12}/${1 + i % 28}/2022",
      10.0 * i, s"2022-11-0${1 + i % 9} 08:00:00"))

  private def parks(): DataFrame = {
    // "park state" exercises the sanitize path; park_type is the enum →
    // string degradation (pg_setup.sql:19,28)
    val raw = Seq(
      ("Golden Gate", "urban", 1017, 37.76, -122.45, "CA"),
      ("Central", "urban", 843, 40.78, -73.96, "NY"),
      ("Bark Field", "dog", 12, 41.0, -87.0, "IL"))
      .toDF("park_name", "park_type", "park_size",
        "park_location_lat", "park_location_lon", "park state")
    raw.toDF(raw.columns.map(PgTypeMapper.sanitizeName): _*)
  }

  private def setupSources(): Unit = {
    writeSource("users10", users(20))
    writeSource("my_orders", orders(baseOrders))
    writeSource("local_parks", parks())
  }

  test("t1 list: source catalog shows all three tables with sizes") {
    setupSources()
    val listed = wh().list().collect()
    assert(listed.map(_.getString(0)).toSet ==
      Set("users10", "my_orders", "local_parks"))
    assert(listed.forall(_.getLong(1) > 0), "every table has bytes")
  }

  test("t2 extract: chunk dir exists and is non-empty") {
    setupSources()
    val (files, records) = wh().extract("users10")
    assert(files >= 1)
    assert(records == 20)
  }

  test("t3 extract+load: row-count parity per table") {
    setupSources()
    val w = wh()
    Seq("users10", "my_orders", "local_parks").foreach { t =>
      w.extract(t)
      val loaded = w.load(t)
      assert(loaded == w.sourceTable(t).count(), s"parity for $t")
    }
    // cell-level: the sanitized space-name column round-trips through CSV
    val parksBack = spark.read.parquet(s"$warehouseDir/local_parks.parquet")
    assert(parksBack.columns.contains("park_state"))
    assert(parksBack.where(col("park_state") === "CA").count() == 1)
  }

  test("t4 reload: drop + full reload keeps parity") {
    setupSources()
    val w = wh()
    assert(w.reload("my_orders") == 30)
    assert(w.reload("my_orders") == 30, "reload is repeatable")
  }

  test("t5 basic sync: bootstrap all three tables to parity") {
    setupSources()
    // fresh warehouse
    Seq("users10", "my_orders", "local_parks").foreach(t =>
      graft.catalog.Catalog.dropPath(spark, s"$warehouseDir/$t.parquet"))
    val w = wh()
    val failures = w.forAll(t => { w.sync(t); () }).collect { case (t, Some(e)) => t }
    assert(failures.isEmpty, s"no table may fail: $failures")
    Seq("users10", "my_orders", "local_parks").foreach { t =>
      assert(w.warehouseTable(t).get.count() == w.sourceTable(t).count(),
        s"parity for $t")
    }
  }

  test("t6 incremental sync: new source rows appear after re-sync") {
    setupSources()
    val w = wh()
    w.sync("users10")
    writeSource("users10", users(22)) // 2 new rows, ids 21..22
    w.sync("users10")
    val sink = w.warehouseTable("users10").get
    assert(sink.count() == 22)
    assert(sink.where(col("id") > 20).count() == 2)
  }

  test("t7 last-modified sync: updates + insert land, cell-level checks") {
    setupSources()
    val w = wh()
    w.sync("my_orders")
    // update rows 18,19 (amount 9999.9, bumped order_updated), insert 31 —
    // the reference's exact scenario (test_postgres.py:156-187)
    val updated = baseOrders.map {
      case (id, u, d, _, _) if id == 18 || id == 19 =>
        (id, u, d, 9999.9, "2022-12-25 10:00:00")
      case other => other
    } :+ (31L, 3, "12/26/2022", 123.45, "2022-12-26 09:00:00")
    writeSource("my_orders", orders(updated))
    w.sync("my_orders")
    val sink = w.warehouseTable("my_orders").get
    assert(sink.count() == 31, "original + 1 inserted")
    assert(sink.where(col("order_amount") === 9999.9).count() == 2,
      "updated amounts round-trip")
    assert(sink.where(col("id") === 31L && col("order_amount") === 123.45)
      .count() == 1, "new row findable by predicate")
  }

  test("t12 composite-key sync through the CLI path: two-column PK upsert " +
    "keeps parity across an incremental run") {
    // The reference REJECTS composite keys (README.md:255-257 documents
    // single-column PKs only); "a,b" in primary_key is this engine's
    // documented upgrade (Warehouse.pks). MergeSpec proves the merge
    // identity; this drives it through the same config→strategy→sync spine
    // as t6/t7.
    def lines(rows: Seq[(Long, Int, Double, String)]): DataFrame =
      rows.toDF("order_id", "line_no", "amount", "updated_raw")
        .select(col("order_id"), col("line_no"), col("amount"),
          col("updated_raw").cast("timestamp").as("updated_at"))
    val base = for (o <- 1L to 10L; l <- 1 to 3) yield
      (o, l, o * 10.0 + l, s"2022-11-0${1 + (o + l) % 9} 08:00:00")
    writeSource("order_lines", lines(base))
    val w = new Warehouse(spark, cfg().copy(tables =
      scala.collection.immutable.ListMap(
        "order_lines" -> TableOpts(primaryKey = Some("order_id,line_no"),
          lastModified = Some("updated_at")))))
    w.sync("order_lines")
    assert(w.warehouseTable("order_lines").get.count() == 30)
    // incremental: update one line of order 4, add a 4th line to order 7,
    // add a whole new order 11 — same shape as the reference's t7 scenario
    // but resolvable only on the FULL composite key (order 4 keeps lines
    // 1 and 3 untouched)
    val changed = base.map {
      case (4L, 2, _, _) => (4L, 2, 9999.9, "2022-12-25 10:00:00")
      case other => other
    } ++ Seq((7L, 4, 77.7, "2022-12-26 09:00:00"),
      (11L, 1, 111.1, "2022-12-26 09:00:00"))
    writeSource("order_lines", lines(changed))
    w.sync("order_lines")
    val sink = w.warehouseTable("order_lines").get
    assert(sink.count() == 32, "30 + new line + new order")
    val keys = sink.select("order_id", "line_no").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(keys.length == keys.distinct.length, "one row per composite key")
    assert(sink.where(col("order_id") === 4L && col("line_no") === 2 &&
      col("amount") === 9999.9).count() == 1, "the updated line won")
    assert(sink.where(col("order_id") === 4L).count() == 3,
      "order 4's other lines survive — resolution is on the full key")
    assert(sink.where(col("order_id") === 11L).count() == 1)
  }

  test("t13 F7 now(): touchNow stamps mutated rows query-constant and " +
    "drives the last-modified incremental sync") {
    // the reference's t7 scenario driven by now() itself (test_postgres.py
    // :173-175 uses `SET order_updated = now()`) instead of hand-picked
    // timestamps — proves the F7 surface end-to-end where a DuckDB hash
    // oracle cannot (non-deterministic)
    setupSources()
    val w = wh()
    w.sync("my_orders")
    val before = new Timestamp(System.currentTimeMillis() - 1000)
    val mutated = graft.functions.Functions.touchNow(
      w.sourceTable("my_orders").withColumn("order_amount",
        when(col("id").isin(18L, 19L), lit(8888.8))
          .otherwise(col("order_amount"))),
      "order_updated", col("id").isin(18L, 19L))
      // materialize + cut lineage BEFORE overwriting the parquet the plan
      // reads from (and pin the now() evaluation to one instant)
      .localCheckpoint(true)
    writeSource("my_orders", mutated)
    w.sync("my_orders")
    val sink = w.warehouseTable("my_orders").get
    assert(sink.where(col("order_amount") === 8888.8).count() == 2,
      "the now()-stamped updates moved through the incremental sync")
    val stamps = sink.where(col("id").isin(18L, 19L))
      .select("order_updated").collect().map(_.getTimestamp(0))
    assert(stamps.forall(t => !t.before(before)),
      "stamp is the mutation-time clock")
    assert(stamps.distinct.length == 1,
      "current_timestamp is query-constant, like SQL now()")
  }

  test("t8 max_records caps the extract path") {
    setupSources()
    val (_, records) = wh(maxRecords = Some(7L)).extract("users10")
    assert(records == 7)
  }

  test("t9 skip strategy leaves the warehouse untouched") {
    setupSources()
    val w = new Warehouse(spark, cfg().copy(tables =
      scala.collection.immutable.ListMap(
        "users10" -> TableOpts(primaryKey = Some("id"), skip = true))))
    assert(w.sync("users10") == "skip")
  }

  test("t11 load works from the schema capture file without source access") {
    setupSources()
    val w = wh()
    w.extract("my_orders")
    // sever the source: load must succeed purely from chunks + schema file
    graft.catalog.Catalog.dropPath(spark, s"$sourceDir/my_orders.parquet")
    try assert(w.load("my_orders") == 30)
    finally writeSource("my_orders", orders(baseOrders))
    val back = spark.read.parquet(s"$warehouseDir/my_orders.parquet")
    assert(back.schema("order_updated").dataType.typeName == "timestamp",
      "typed schema came from the capture file, not inference")
  }

  test("t10 chunks archive after load; replaying load is a no-op") {
    setupSources()
    val w = wh()
    w.extract("users10")
    assert(w.load("users10") == 20)
    val dir = new java.io.File(s"$dataDir/users10_data")
    assert(!dir.listFiles.exists(_.getName.endsWith(".csv.gz")),
      "loaded chunks moved out of the data dir")
    assert(new java.io.File(dir, "archive").listFiles
      .count(_.getName.endsWith(".csv.gz")) >= 1, "chunks live in archive/")
    assert(w.load("users10") == 20,
      "load with no pending chunks must not wipe the table")
  }

  test("t12 load(dropTable) with zero pending chunks never wipes the table") {
    setupSources()
    val w = wh()
    w.extract("users10")
    assert(w.load("users10") == 20)
    // chunks are now archived; a dropTable load (reload path) with nothing
    // to replay must leave the existing table intact, not drop-then-bail
    assert(w.load("users10", dropTable = true) == 20,
      "empty-chunk reload returns the surviving table's rows")
    assert(w.warehouseTable("users10").get.count() == 20)
  }

  test("t12b crash recovery: a table stranded at .__old (writeAtomic died " +
    "between its two renames) is restored by the next read or write") {
    setupSources()
    val w = wh()
    w.extract("users10")
    assert(w.load("users10") == 20)
    // simulate the crash window: live moved aside, stage never renamed in
    val live = new java.io.File(s"$warehouseDir/users10.parquet")
    val old = new java.io.File(s"$warehouseDir/users10.parquet.__old")
    assert(live.renameTo(old), "test setup: move live aside")
    assert(!live.exists() && old.exists())
    // the next reader restores the preserved copy instead of reporting
    // the table absent (pre-fix: a watch() merge bootstrapped from one
    // micro-batch here and the next writeAtomic deleted the history)
    assert(w.warehouseTable("users10").get.count() == 20,
      "reader restores the .__old copy")
    assert(live.exists() && !old.exists(), "live path back, old consumed")
    // and the writer path recovers too (so history feeds the rewrite)
    assert(live.renameTo(old), "test setup: strand it again")
    assert(w.reload("users10") == 20)
    assert(live.exists() && !old.exists())
  }

  test("t13 ddl command emits dialect DDL for a source table's schema") {
    setupSources()
    val w = wh()
    val ch = w.ddl("users10", "clickhouse")
    assert(ch.startsWith("CREATE TABLE IF NOT EXISTS users10 ("))
    assert(ch.contains("ENGINE = MergeTree() ORDER BY (id)"),
      "configured PK drives the MergeTree key")
    assert(ch.contains("name Nullable(String)"))
    val duck = w.ddl("local_parks", "duckdb")
    assert(duck.contains("park_state VARCHAR"), "space-sanitized column")
    assert(!duck.contains("PRIMARY KEY"), "no configured PK → no key clause")
    intercept[IllegalArgumentException] { w.ddl("users10", "oracle9i") }
  }

  test("t14 compact bin-packs small files, preserves rows, swaps atomically") {
    val w = wh()
    writeSource("users10", users(200))
    // fragment the warehouse table into many tiny files
    val frag = spark.read.parquet(s"$sourceDir/users10.parquet").repartition(16)
    frag.write.mode(SaveMode.Overwrite).parquet(s"$warehouseDir/users10.parquet")
    val (before, after, rows) = w.compact("users10")
    assert(before == 16, s"fragmented table should start at 16 files, got $before")
    assert(after == 1, "tiny table packs to one file at the default target")
    assert(rows == 200)
    val back = spark.read.parquet(s"$warehouseDir/users10.parquet")
    assert(back.count() == 200, "values survive the rewrite")
  }

  test("t15 watch drains only files landed since the checkpoint; " +
    "a no-news re-run syncs 0 rows") {
    // a directory-source landing zone (watch rejects single-file tables)
    val landing = new java.io.File(s"$sourceDir/feed.parquet")
    assert(landing.mkdirs())
    def land(name: String, df: DataFrame): Unit = {
      val stage = TestSpark.tmpDir(s"watchstage_$name")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, s"$name.parquet").toPath)
    }
    val w = wh()
    land("f1", users(4))
    assert(w.watch("feed") == 4L, "first drain syncs the landed file")
    assert(w.watch("feed") == 0L, "no new files → 0 rows, no re-sync")
    land("f2", users(3, from = 100))
    assert(w.watch("feed") == 3L, "second drain syncs ONLY the new file")
    val total = spark.read.parquet(s"$warehouseDir/feed.parquet").count()
    assert(total == 7L, s"warehouse holds the union, got $total")
  }

  test("t15b watch honors skip: a skip-configured table lands NOTHING " +
    "(the batch sync's do-not-touch contract holds on the watch path)") {
    val landing = new java.io.File(s"$sourceDir/skipfeed.parquet")
    assert(landing.mkdirs())
    val stage = TestSpark.tmpDir("watchstage_skip")
    users(4).coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(landing, "s1.parquet").toPath)
    val skipCfg = cfg().copy(tables = cfg().tables +
      ("skipfeed" -> TableOpts(skip = true)))
    val w = new Warehouse(spark, skipCfg)
    assert(w.watch("skipfeed") == 0L, "skip must drain nothing")
    assert(!new java.io.File(s"$warehouseDir/skipfeed.parquet").exists(),
      "skip must not create the warehouse table")
  }

  test("t16 watch composes with batch writers: no _spark_metadata, rows " +
    "from both paths stay visible, replays stay exactly-once") {
    // the round-9 advice scenario: watch used a FileStreamSink whose
    // _spark_metadata log made every later BATCH read resolve only
    // stream-committed files — hiding load/sync rows in the same table
    val landing = new java.io.File(s"$sourceDir/feed2.parquet")
    assert(landing.mkdirs())
    def land(name: String, df: DataFrame): Unit = {
      val stage = TestSpark.tmpDir(s"watchstage2_$name")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, s"$name.parquet").toPath)
    }
    val w = wh()
    land("g1", users(5))
    assert(w.watch("feed2") == 5L)
    val whDir = new java.io.File(s"$warehouseDir/feed2.parquet")
    assert(!new java.io.File(whDir, "_spark_metadata").exists(),
      "watch must not leave a FileStreamSink metadata log")
    // a batch writer appends into the same table directory (what load/sync
    // do); under the old sink these rows were silently invisible
    users(2, from = 500).coalesce(1).write.mode(SaveMode.Append)
      .parquet(whDir.toString)
    assert(spark.read.parquet(whDir.toString).count() == 7L,
      "batch-written rows visible next to stream-committed ones")
    // and the next drain still appends exactly the new file's rows
    land("g2", users(3, from = 900))
    assert(w.watch("feed2") == 3L)
    assert(spark.read.parquet(whDir.toString).count() == 10L,
      "union of batch + both drains; no re-sync, no hidden rows")
    // committed batch files carry the deterministic replay prefix
    assert(whDir.listFiles().exists(_.getName.startsWith("b")),
      "stream batches land under b<batchId>- names for idempotent replay")
  }

  test("t19 snapshot lifecycle: publish after each sync, time-travel " +
    "reads see pre-delete history, vacuum reclaims") {
    setupSources()
    val w = wh()
    w.sync("users10")
    val n1 = w.warehouseTable("users10").get.count()
    assert(w.snapshotPublish("users10") == 1L)
    // grow the source past the live watermark (earlier tests may have
    // appended arbitrary ids), re-sync, snapshot again
    val maxId = w.warehouseTable("users10").get
      .agg(max(col("id"))).head().getLong(0)
    writeSource("users10", users(5, from = maxId.toInt + 1))
    w.sync("users10")
    val n2 = w.warehouseTable("users10").get.count()
    assert(n2 > n1, "re-sync after source growth must append")
    assert(w.snapshotPublish("users10") == 2L)
    assert(w.snapshotVersions("users10") == Seq(1L, 2L))
    // pinned reads: v1 is the pre-growth table, latest is current
    assert(w.snapshotRead("users10", Some(1L)).count() == n1)
    assert(w.snapshotRead("users10").count() == n2)
    // the live table is untouched by snapshot reads
    assert(w.warehouseTable("users10").get.count() == n2)
    // vacuum to 1: history beyond the newest is reclaimed
    assert(w.snapshotVacuum("users10", keep = 1) == Seq(1L))
    assert(w.snapshotVersions("users10") == Seq(2L))
    intercept[IllegalArgumentException] {
      w.snapshotRead("users10", Some(1L))
    }
    // snapshotting a never-synced table refuses loudly
    intercept[IllegalArgumentException] {
      w.snapshotPublish("never_synced")
    }
  }

  test("all loop isolates a failing table and reports it") {
    setupSources()
    val broken = cfg().copy(tables = scala.collection.immutable.ListMap(
      "no_such_table" -> TableOpts(reload = ReloadSpec.Always),
      "users10" -> TableOpts(primaryKey = Some("id"))))
    val w = new Warehouse(spark, broken)
    val results = w.forAll(t => { w.sync(t); () })
    assert(results.collectFirst { case ("no_such_table", e) => e }.get.isDefined,
      "missing table reported as failed")
    assert(results.collectFirst { case ("users10", e) => e }.get.isEmpty,
      "healthy table still synced")
  }

  test("t18 watch on a keyed table MERGES each drained batch: updates " +
       "replace in place, replay is idempotent, unkeyed landing unchanged") {
    val landing = new java.io.File(s"$sourceDir/kfeed.parquet")
    assert(landing.mkdirs() || landing.isDirectory)
    def land(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val df = rows.toDF("id", "payload", "updated_raw")
        .select(col("id"), col("payload"),
          col("updated_raw").cast("timestamp").as("updated_at"))
      val stage = TestSpark.tmpDir(s"kwatch_$name")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, s"$name.parquet").toPath)
    }
    val w = new Warehouse(spark, cfg().copy(tables =
      scala.collection.immutable.ListMap(
        "kfeed" -> TableOpts(primaryKey = Some("id"),
          lastModified = Some("updated_at")))))
    land("b1", Seq((1L, "v1", "2024-01-01 00:00:00"),
      (2L, "w1", "2024-01-01 00:00:00")))
    assert(w.watch("kfeed") == 2L)
    // update row 1 (newer lm), add row 3
    land("b2", Seq((1L, "v2", "2024-02-01 00:00:00"),
      (3L, "x1", "2024-02-01 00:00:00")))
    assert(w.watch("kfeed") == 2L, "second drain reads only the new file")
    val sink = spark.read.parquet(s"$warehouseDir/kfeed.parquet")
    assert(sink.count() == 3L, "merge, not append: 3 keys, not 4 rows")
    val byId = sink.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(1L -> "v2", 2L -> "w1", 3L -> "x1"),
      s"updated cell replaced in place: $byId")
    assert(w.watch("kfeed") == 0L, "no news → no rows, table unchanged")
    assert(spark.read.parquet(s"$warehouseDir/kfeed.parquet").count() == 3L)
  }

  test("t17 scheduled reload: a day-matched sync reroutes to full reload; " +
       "a non-matched day stays incremental (README.md:211-215 'shoppers')") {
    setupSources()
    // shoppers shape: last_modified upsert normally, full reload on Sundays
    val scheduled = cfg().copy(tables = scala.collection.immutable.ListMap(
      "my_orders" -> TableOpts(primaryKey = Some("id"),
        lastModified = Some("order_updated"),
        reload = ReloadSpec.parse("[sun]"))))
    val sunday = java.time.LocalDate.of(2026, 8, 16)
    val monday = sunday.plusDays(1)

    graft.catalog.Catalog.dropPath(spark, s"$warehouseDir/my_orders.parquet")
    val wMon = new Warehouse(spark, scheduled, () => monday)
    wMon.sync("my_orders") // bootstrap
    assert(wMon.sync("my_orders") == "merge",
      "non-matched weekday keeps the incremental last-modified strategy")

    val wSun = new Warehouse(spark, scheduled, () => sunday)
    assert(wSun.sync("my_orders") == "reload",
      "Sunday sync reroutes to a full reload")
    assert(wSun.warehouseTable("my_orders").get.count() == 30,
      "reloaded table is at source parity")

    // day-of-month form through the same path
    val dom = cfg().copy(tables = scala.collection.immutable.ListMap(
      "my_orders" -> TableOpts(primaryKey = Some("id"),
        lastModified = Some("order_updated"),
        reload = ReloadSpec.parse("16"))))
    assert(new Warehouse(spark, dom, () => sunday).strategyFor("my_orders") ==
      graft.sync.SyncStrategy.Reload, "Aug 16 matches day-of-month 16")
    assert(new Warehouse(spark, dom, () => monday).strategyFor("my_orders") !=
      graft.sync.SyncStrategy.Reload, "Aug 17 does not")
  }
}
