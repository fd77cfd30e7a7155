package graft.cli

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.Catalog
import graft.io.Tables
import graft.sync.{SyncEngine, SyncStrategy}

/** The command controller: the Spark-native equivalent of the reference's
  * `PGWarehouse` class (reference pgwarehouse.py:40-124) — one method per
  * CLI command, a per-table strategy resolver, and the `all` loop with
  * per-table error isolation (pgwarehouse.py:97-110 swallows a failing
  * table and continues with the rest).
  *
  * Source and warehouse are directories of parquet tables; extract/load
  * move rows through the reference's gzip-CSV interchange format
  * (`{data_dir}/{table}_data`, pgwarehouse.py:167-168).
  */
class Warehouse(spark: SparkSession, cfg: GraftConfig,
                /** Injectable clock so `reload: [sun]` / `reload: 15`
                  * schedules are testable on any wall-clock day. */
                today: () => java.time.LocalDate = () => java.time.LocalDate.now()) {

  private val engine = new SyncEngine(spark)

  private def warehousePath(name: String) = s"${cfg.warehouseDir}/$name.parquet"
  private def chunkDir(name: String) = s"${cfg.dataDir}/${name}_data"

  def sourceTable(name: String): DataFrame =
    Tables.table(spark, cfg.sourceDir, name)

  def warehouseTable(name: String): Option[DataFrame] = {
    recoverIfCrashed(warehousePath(name))
    if (Catalog.tableExists(spark, cfg.warehouseDir, name))
      Some(Tables.table(spark, cfg.warehouseDir, name))
    else None
  }

  /** Strategy resolution, mirroring `get_table_opts` + `sync` dispatch
    * (pgwarehouse.py:72-80, 180-189): skip > reload > last-modified upsert >
    * append-only; tables with no primary key are reload-only (the
    * local_parks degraded path, tests/pg_setup.sql:22-29).
    */
  def strategyFor(name: String): SyncStrategy = {
    val opts = cfg.tables.getOrElse(name, TableOpts())
    // "a,b" in the config's primary_key is a composite key (an upgrade over
    // the reference, which is single-key-only for incremental strategies)
    def pks(pk: String): Seq[String] =
      pk.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (opts.skip) SyncStrategy.Skip
    else if (opts.reload.applies(today())) SyncStrategy.Reload
    else (opts.primaryKey, opts.lastModified) match {
      case (Some(pk), Some(lm)) => SyncStrategy.Upsert(pks(pk), lm)
      case (Some(pk), None)     => SyncStrategy.AppendOnly(pks(pk))
      case _                    => SyncStrategy.Reload
    }
  }

  /** `extract`: source table → chunked gzip CSV under the data dir
    * (pgwarehouse.py:254-303). Returns (chunk files, records extracted).
    */
  def extract(name: String): (Long, Long) = extractFiltered(name, None)

  /** Filtered extract — the incremental-delta path: the predicate lands
    * in the source scan exactly like the reference injects its watermark
    * into `\copy (select * from t where ...)` (duckdb_backend.py:157,167;
    * pgwarehouse.py:275), so only the delta crosses the wire.
    */
  def extractFiltered(name: String,
                      filter: Option[org.apache.spark.sql.Column]): (Long, Long) = {
    val src = filter.foldLeft(sourceTable(name))(_ where _)
    // records written comes from an observed metric inside the write job
    // (Tables.writeCsvChunks) — ONE source scan per extract; a separate
    // count() would be a second full read on a JDBC source
    val records = Tables.writeCsvChunks(src, chunkDir(name),
      maxRecords = cfg.maxRecords)
    // persist the captured schema next to the chunks (the reference's
    // {table}.schema dump, pgwarehouse.py:248-252) so `load` can run
    // without source access — true two-phase extract/load
    writeSchemaFile(name, src.schema)
    val p = new Path(chunkDir(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).count(_.getPath.getName.endsWith(".csv.gz"))
    (files.toLong, records)
  }

  /** `load`: replay the CSV chunks into the warehouse table, schema pinned
    * from the capture file written at extract time (the reference trusts
    * DDL, never infers; duckdb_backend.py:107). `dropTable` recreates from
    * scratch (pgwarehouse.py:176-178).
    */
  def load(name: String, dropTable: Boolean = false): Long = {
    // no chunks (all archived or never extracted) → no-op, like replaying
    // the reference's chunk loop over an empty dir — never wipe the table,
    // so the guard runs BEFORE any drop: a reload whose extract produced
    // zero chunks must not destroy existing data
    if (pendingChunks(name).isEmpty)
      return warehouseTable(name).map(_.count()).getOrElse(0L)
    if (dropTable) Catalog.dropPath(spark, warehousePath(name))
    // schema comes from the capture file written at extract time (source
    // access is NOT required to load, matching the reference's two-phase
    // contract); fall back to the live source only if the file is missing
    val schema = readSchemaFile(name).getOrElse(sourceTable(name).schema)
    val df = Tables.readCsvChunks(spark, chunkDir(name), schema)
    writeAtomic(df, warehousePath(name))
    archiveChunks(name)
    spark.read.parquet(warehousePath(name)).count()
  }

  private def schemaFile(name: String) = s"${cfg.dataDir}/$name.schema.json"

  private def writeSchemaFile(name: String,
                              schema: org.apache.spark.sql.types.StructType): Unit = {
    val p = new Path(schemaFile(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  private def readSchemaFile(name: String): Option[org.apache.spark.sql.types.StructType] = {
    val p = new Path(schemaFile(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val text = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        Some(org.apache.spark.sql.types.DataType.fromJson(text)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      } finally in.close()
    }
  }

  private def pendingChunks(name: String): Seq[Path] = {
    val dir = new Path(chunkDir(name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".csv.gz")).toSeq
  }

  /** After a successful load, chunks move to `archive/` so a crashed or
    * repeated load never double-ingests (the reference's resumability
    * contract: clickhouse_backend.py:163-171, README.md:229-238).
    */
  private def archiveChunks(name: String): Unit = {
    val dir = new Path(chunkDir(name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val archive = new Path(dir, "archive")
    fs.mkdirs(archive)
    pendingChunks(name)
      .foreach(f => fs.rename(f, new Path(archive, f.getName)))
  }

  /** `sync`: one incremental step per the table's strategy — bootstrap on
    * missing, watermark delta, merge-or-append (the reference's
    * `update_table` control flow, clickhouse_backend.py:189-243).
    * Returns the action taken.
    */
  def sync(name: String): String = {
    val res = engine.sync(sourceTable(name), warehouseTable(name),
      strategyFor(name))
    if (res.action != "skip") writeAtomic(res.table, warehousePath(name))
    res.action
  }

  /** `reload`: full extract + load with drop (pgwarehouse.py:191-194). */
  def reload(name: String): Long = {
    extract(name)
    load(name, dropTable = true)
  }

  /** `ddl`: the CREATE TABLE a warehouse backend would issue for this
    * table's captured schema, in the requested dialect (reference
    * clickhouse_backend.py:143-159 / duckdb_backend.py:89-92 /
    * snowflake_backend.py:131-133 — there executed against a live server,
    * here emitted for the operator to run or review).
    */
  def ddl(name: String, dialect: String): String = {
    val d = graft.schema.WarehouseDdl.dialects.getOrElse(dialect.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown dialect '$dialect' (expected one of " +
          s"${graft.schema.WarehouseDdl.dialects.keys.mkString(", ")})"))
    val pk = cfg.tables.get(name).flatMap(_.primaryKey).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    // captured schema first (two-phase contract: works with the source
    // detached, same as load); live source only as fallback
    val schema = readSchemaFile(name).getOrElse(sourceTable(name).schema)
    d.createTable(name, schema, pk)
  }

  /** `profile`: per-column null/distinct/min/max report for a source
    * table — the pre-sync data-quality check (no reference analog; the
    * operator equivalent of eyeballing `SELECT *` before a backfill).
    */
  def profile(name: String): DataFrame = {
    val df = sourceTable(name)
    graft.operators.Sketches.profile(df,
      df.schema.fields.map(f =>
        f.name -> org.apache.spark.sql.functions.col(f.name)).toSeq)
  }

  /** `list`: source tables with sizes (pgwarehouse.py:218-237). */
  def list(): DataFrame =
    Catalog.listWithSizes(spark, cfg.sourceDir,
      Catalog.listTables(spark, cfg.sourceDir))

  /** `listwh`: warehouse tables with sizes (SHOW TABLES analogs). */
  def listwh(): DataFrame =
    Catalog.listWithSizes(spark, cfg.warehouseDir,
      Catalog.listTables(spark, cfg.warehouseDir))

  /** The `all` loop: run `cmd` for every configured table, isolating
    * per-table failures exactly like the reference (pgwarehouse.py:97-110:
    * log and continue). Returns (table → error-if-failed).
    */
  def forAll(cmd: String => Unit): Seq[(String, Option[Throwable])] =
    cfg.tables.keys.toSeq.map { name =>
      name -> (try { cmd(name); None } catch {
        case e: Exception =>
          System.err.println(s"[graft] table $name failed: ${e.getMessage}")
          Some(e)
      })
    }

  /** Overwrite a parquet table that may also be an input of `df`: stage to
    * a sibling tmp path, then swap — Spark cannot overwrite a path it is
    * reading from, and a mid-job crash must not destroy the old table.
    */
  /** `compact`: bin-pack a warehouse table's small files to ~`targetBytes`
    * parquet files (the maintenance op every incremental-append table
    * eventually needs — each sync appends its own files until scans pay a
    * per-file open cost). Rewrites through the same atomic staged swap as
    * load, so readers never see a partial table. Returns (files before,
    * files after, rows).
    */
  def compact(name: String, targetBytes: Long = 128L * 1024 * 1024)
  : (Long, Long, Long) = {
    val path = warehousePath(name)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no warehouse table $name")
    def dataFiles = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // row count observed INSIDE the rewrite job — a read-back count()
    // would scan the whole compacted table a second time. Bounded wait +
    // degenerate-path fallback via Tables.observedCount (never hang the
    // maintenance command on a zero-task or cancelled job).
    val obs = org.apache.spark.sql.Observation()
    writeAtomic(spark.read.parquet(path).repartition(nFiles)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")), path)
    val rows = Tables.observedCount(obs, spark.read.parquet(path).count())
    (before.length.toLong, dataFiles.length.toLong, rows)
  }

  // ── Snapshots: versioned, immutable copies of a warehouse table for
  //    time travel and pre-migration audits (graft's extension — the
  //    reference's reload/upsert destroys history in place). Backed by
  //    Tables.publishVersion's atomic-rename store, rooted beside the
  //    live table ───────────────────────────────────────────────────────

  private def snapshotRoot(name: String) =
    s"${cfg.warehouseDir}/$name.snapshots"

  /** Publish the CURRENT warehouse table as the next snapshot version. */
  def snapshotPublish(name: String): Long = {
    val path = warehousePath(name)
    require(Catalog.tableExists(spark, cfg.warehouseDir, name),
      s"no warehouse table $name to snapshot")
    Tables.publishVersion(spark, spark.read.parquet(path),
      snapshotRoot(name))
  }

  /** Published snapshot versions of a table, ascending. */
  def snapshotVersions(name: String): Seq[Long] =
    Tables.listVersions(spark, snapshotRoot(name))

  /** A pinned snapshot version (or the latest) as a DataFrame. */
  def snapshotRead(name: String, version: Option[Long] = None): DataFrame =
    Tables.readVersion(spark, snapshotRoot(name), version)

  /** Keep the newest `keep` versions; returns the reclaimed ones. */
  def snapshotVacuum(name: String, keep: Int): Seq[Long] =
    Tables.vacuumVersions(spark, snapshotRoot(name), keep)

  /** `watch`: the reference's cron-poll incremental loop (README.md:217-225
    * tells users to re-run `sync` on a schedule) as ONE checkpointed
    * streaming query — newly landed source files since the last invocation
    * append to the warehouse table exactly once, with the stream
    * checkpoint replacing the reference's high-watermark bookkeeping (file
    * progress survives restarts; a re-run after no new files syncs 0
    * rows). AvailableNow drains-and-stops, so the command composes with
    * any scheduler; a continuous deployment strips the trigger.
    *
    * The landing mode follows the table's configured strategy:
    *  - `primary_key` + `last_modified` → each micro-batch MERGES into
    *    the warehouse table (last-writer by the lm column, the same
    *    `Merge.merge` the batch sync uses) with an atomic staged swap.
    *    Merge is idempotent, so a crash-replayed batch lands unchanged —
    *    the exactly-once story needs no batch log here.
    *  - `primary_key` only → pk anti-join append (already-landed keys
    *    drop, so replay is idempotent the same way).
    *  - unconfigured / reload-only → raw file landing under per-batch
    *    prefixes (the original append shape; no row ever rewrites).
    */
  def watch(name: String): Long = {
    val src = s"${cfg.sourceDir}/$name.parquet"
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.getFileStatus(p).isDirectory,
      s"watch needs a directory source (a landing zone): $src")
    val ckpt = s"${cfg.dataDir}/${name}_watch_ckpt"
    // The merge/append land functions reference the micro-batch on BOTH
    // sides of their plan (anti-join + union), which double-counts the
    // file source's numInputRows — so these paths count drained rows
    // themselves (one cached count per batch; the write reuses the cache)
    // instead of trusting the listener total.
    def landVia(land: DataFrame => DataFrame): Long = {
      val drained = new java.util.concurrent.atomic.AtomicLong(0)
      graft.streaming.StreamingSync.incrementalFileSyncVia(spark, src, ckpt) {
        (batch, _) =>
          val b = batch.persist()
          try {
            drained.addAndGet(b.count())
            writeAtomic(land(b), warehousePath(name))
          } finally { b.unpersist(); () }
      }
      drained.get
    }
    strategyFor(name) match {
      case SyncStrategy.Upsert(pks, lm) => landVia { batch =>
        warehouseTable(name) match {
          case Some(tgt) => graft.sync.Merge.merge(tgt, batch, pks, lm)
          case None => graft.sync.Merge.merge(
            batch.limit(0), batch, pks, lm) // bootstrap: in-batch dedup only
        }
      }
      case SyncStrategy.AppendOnly(pks) => landVia { batch =>
        warehouseTable(name) match {
          case Some(tgt) =>
            tgt.unionByName(batch.join(tgt, pks, "left_anti"))
          case None => batch
        }
      }
      // skip is the operator's do-not-touch instruction — the batch
      // `sync` honors it, and so must the watch path (it previously fell
      // into the raw-landing branch and appended anyway)
      case SyncStrategy.Skip => 0L
      case _ =>
        graft.streaming.StreamingSync.incrementalFileSync(spark, src,
          warehousePath(name), ckpt)
    }
  }

  // ───────────────────────── DuckDB warehouse ─────────────────────────
  // The reference's in-process warehouse (duckdb_backend.py) driven end
  // to end: the SAME extract/chunk/schema plumbing as the parquet path,
  // with the warehouse side executed by a real engine. Enabled via
  // `--backend duckdb` (or `warehouse.duckdb_path` in the config).

  private def pksFor(name: String): Seq[String] =
    cfg.tables.get(name).flatMap(_.primaryKey).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** `load --backend duckdb`: replay pending chunks into the DuckDB
    * table (create-if-missing from the captured schema), archive them,
    * return the table's row count (duckdb_backend.py:78-110).
    *
    * Default semantics are FULL REPLACE (documented in the CLI usage):
    * the pending chunks (a full extract) BECOME the table. This matches
    * the parquet `load` path but deliberately deviates from the
    * reference's append-into-existing default (pgwarehouse.py:176-184,
    * duckdb_backend.py:78-110 with drop_table=False) — a bare re-create
    * + COPY on top of existing rows doubled a no-PK table and aborted a
    * keyed one with a duplicate-key error; same CLI, different results
    * per backend. The reference's append behavior stays available as
    * `load <table> --mode append` (`append = true`): chunks COPY into
    * the existing table untouched — the caller owns de-duplication, and
    * a keyed table raises the engine's duplicate-key error exactly as
    * the reference would.
    */
  def loadDuck(name: String, duck: graft.warehouse.DuckDbBackend,
               append: Boolean = false): Long = {
    if (pendingChunks(name).isEmpty)
      return if (duck.tableExists(name)) duck.count(name) else 0L
    // The empty-chunks guard above protects existing data when an
    // extract produced nothing.
    if (!append) duck.dropTable(name)
    if (!append || !duck.tableExists(name)) {
      val schema = readSchemaFile(name).getOrElse(sourceTable(name).schema)
      duck.createTable(name, schema, pksFor(name))
    }
    duck.loadChunks(name, chunkDir(name))
    archiveChunks(name)
    duck.count(name)
  }

  /** `watch --backend duckdb`: the same checkpointed drain-and-stop as
    * `watch`, but each micro-batch lands in the live DuckDB table —
    * batch → gzip CSV chunks (the engine's interchange format) →
    * transactional batch-logged COPY. The stream checkpoint makes file
    * progress survive restarts; the backend's batch log makes a crash
    * replay of an already-committed batch a no-op, so rows land exactly
    * once (the reference's cron-poll `sync` loop, README.md:217-225,
    * pointed at a real warehouse engine).
    */
  def watchDuck(name: String, duck: graft.warehouse.DuckDbBackend): Long = {
    // same do-not-touch contract as watch(): a skipped table must not
    // even be created in the warehouse engine
    if (strategyFor(name) == SyncStrategy.Skip) return 0L
    val src = s"${cfg.sourceDir}/$name.parquet"
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.getFileStatus(p).isDirectory,
      s"watch needs a directory source (a landing zone): $src")
    val schema = readSchemaFile(name).getOrElse(sourceTable(name).schema)
    duck.createTable(name, schema, pksFor(name))
    // keyed tables land via `INSERT OR REPLACE` (the engine resolves on
    // the table's PRIMARY KEY), mirroring the parquet watch's strategy
    // routing; unkeyed tables COPY-append
    val keyed = strategyFor(name) match {
      case SyncStrategy.Upsert(_, _) | SyncStrategy.AppendOnly(_) =>
        Some(schema)
      case _ => None
    }
    graft.streaming.StreamingSync.incrementalFileSyncVia(spark, src,
      s"${cfg.dataDir}/${name}_watch_duck_ckpt") { (batch, batchId) =>
      val chunks = s"${cfg.dataDir}/${name}_watch_duck_b$batchId"
      Tables.writeCsvChunks(batch, chunks)
      duck.appendBatchIdempotent(name, batchId, chunks, keyed)
      val cp = new Path(chunks)
      cp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(cp, true)
    }
  }

  /** `reload --backend duckdb`: drop + full extract/load. */
  def reloadDuck(name: String, duck: graft.warehouse.DuckDbBackend): Long = {
    extract(name)
    loadDuck(name, duck)
  }

  /** `sync --backend duckdb`: the reference's `update_table` control flow
    * (duckdb_backend.py:129-197) — bootstrap-on-missing, watermark read
    * from the WAREHOUSE side, delta-only extract, then COPY-append or
    * `INSERT OR REPLACE` merge. Returns the action taken.
    */
  def syncDuck(name: String, duck: graft.warehouse.DuckDbBackend): String = {
    import org.apache.spark.sql.functions.{col, lit}
    val schema = readSchemaFile(name).getOrElse(sourceTable(name).schema)
    def fullLoad(drop: Boolean): Unit = {
      extract(name)
      if (drop) duck.dropTable(name)
      duck.createTable(name, schema, pksFor(name))
      duck.loadChunks(name, chunkDir(name))
      archiveChunks(name)
    }
    strategyFor(name) match {
      case SyncStrategy.Skip => "skip"
      case SyncStrategy.Reload => fullLoad(drop = true); "reload"
      case _ if !duck.tableExists(name) => fullLoad(drop = false); "bootstrap"
      case SyncStrategy.AppendOnly(pks) =>
        // watermark needs ONE monotone key, like the reference
        // (duckdb_backend.py:143-144); the parquet engine's composite
        // anti-join delta has no warehouse-side analog without reading
        // the whole duck table back out
        require(pks.size == 1,
          s"duckdb append-only sync needs a single-column pk, got " +
            s"${pks.mkString(",")} (reference parity, duckdb_backend.py:143-144)")
        val wm = duck.maxScalar(name, pks.head)
        val (_, n) =
          extractFiltered(name, wm.map(v => col(pks.head) > lit(v)))
        if (n == 0) "noop"
        else {
          duck.loadChunks(name, chunkDir(name)); archiveChunks(name)
          "append"
        }
      case SyncStrategy.Upsert(_, lm) =>
        // `>=` watermark: boundary-instant rows re-extract and the keyed
        // INSERT OR REPLACE dedups them — same idempotence argument as
        // the parquet merge path (duckdb_backend.py:167,190-197)
        val wm = duck.maxScalar(name, lm)
        val (_, n) = extractFiltered(name, wm.map(v => col(lm) >= lit(v)))
        if (n == 0) "noop"
        else {
          duck.mergeChunks(name, chunkDir(name), schema)
          archiveChunks(name)
          "merge"
        }
    }
  }

  /** Staged swap with the old table preserved until the new one is
    * live: write stage → move live aside → rename stage in → drop the
    * old copy. The previous delete-then-rename form had two loss modes
    * this sequence closes: `fs.rename` reports most failures by
    * RETURNING FALSE (ignored, the warehouse table vanished silently —
    * the same contract StreamingSync.incrementalFileSync and
    * Tables.publishVersion already `require`), and a crash between the
    * delete and the rename left no table at all. Now every window
    * leaves either the live table or its `.__old` copy on disk, and any
    * rename failure raises instead of returning success.
    */
  private def writeAtomic(df: DataFrame, path: String): Unit = {
    recoverIfCrashed(path)
    val tmp = path + ".__tmp"
    df.write.mode("overwrite").parquet(tmp)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + ".__old")
    fs.delete(old, true)
    if (fs.exists(p))
      require(fs.rename(p, old), s"cannot move live table aside: $p")
    require(fs.rename(new Path(tmp), p),
      s"rename $tmp -> $p failed; previous table preserved at $old")
    fs.delete(old, true)
    ()
  }

  /** Crash recovery for [[writeAtomic]]'s one exposed window: a crash
    * between rename(live, .__old) and rename(.__tmp, live) leaves the
    * history ONLY at `.__old` — and before this hook, the next command
    * silently treated the table as absent (a watch() merge then
    * bootstrapped from one micro-batch and the following writeAtomic
    * deleted the preserved copy, discarding history for good). On entry,
    * if the live path is missing but `.__old` exists, rename it back —
    * both the readers ([[warehouseTable]]) and the writer
    * ([[writeAtomic]]) call this, so whichever touches the table first
    * after the crash restores it.
    */
  private def recoverIfCrashed(path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + ".__old")
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p),
        s"crash recovery: cannot restore preserved table $old -> $p")
  }
}
