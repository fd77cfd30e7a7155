package graft.warehouse

import java.sql.{Connection, DriverManager, Statement}

import org.apache.spark.sql.types.StructType

import graft.schema.WarehouseDdl

/** In-process DuckDB warehouse backend — the reference's
  * `duckdb_backend.py` as a REAL executable backend, not just DDL parity:
  * create table (duckdb_backend.py:89-97), bulk-load gzip CSV chunks via
  * `COPY ... (HEADER)` (:105-110), keyed upsert via
  * `INSERT OR REPLACE ... FROM read_csv(...)` (:190-197), watermark
  * scalars off the warehouse side (:147-167), and the
  * exists/count/list/drop catalog surface (:69-120).
  *
  * Written against plain `java.sql` — the engine has NO compile-time
  * dependency on the DuckDB driver; `DriverManager` discovers it via
  * ServiceLoader from whatever classpath the deployment (or the test
  * suite) provides. That keeps the production classpath identical to
  * every other round while making the backend executable wherever the
  * one jar is present.
  *
  * Role in the Spark architecture: DuckDB is a SINGLE-NODE warehouse —
  * the 100 TB path stays Spark-native parquet/JDBC; this backend serves
  * the reference's local-analytics deployment shape (duck.db next to the
  * sync config) and gives the e2e suite a real warehouse engine to prove
  * count parity and cell-level upserts against. Each operation opens a
  * short-lived connection: DuckDB shares one embedded database instance
  * per path within the process, and the CLI's command-per-invocation
  * lifecycle has no connection reuse to win.
  */
class DuckDbBackend(val dbPath: String) {

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(s"jdbc:duckdb:$dbPath")
    try f(c) finally c.close()
  }

  private def withStmt[A](f: Statement => A): A =
    withConn { c =>
      val s = c.createStatement()
      try f(s) finally s.close()
    }

  /** Table identifier hygiene: every name interpolated into backend SQL
    * must be a plain identifier (the reference interpolates raw config
    * strings — a config-injection hazard this port refuses).
    */
  private def ident(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"illegal table/column identifier: '$name'")
    name
  }

  /** CREATE TABLE IF NOT EXISTS from a Spark schema via the shared DuckDb
    * dialect. Single-column keys render column-level `PRIMARY KEY`
    * (reference parity, duckdb_backend.py:72-76); composite keys get a
    * table-level constraint — the reference cannot express them, and
    * `INSERT OR REPLACE` needs the constraint to resolve conflicts. The
    * composite form now lives IN the dialect, so the `ddl` CLI command
    * prints the same legal statement this backend executes.
    */
  def createTable(table: String, schema: StructType,
                  primaryKey: Seq[String]): Unit =
    withStmt(_.execute(
      WarehouseDdl.DuckDb.createTable(ident(table), schema, primaryKey)))

  def dropTable(table: String): Unit =
    withStmt(_.execute(WarehouseDdl.DuckDb.dropTable(ident(table))))

  def tableExists(table: String): Boolean =
    withStmt { s =>
      val rs = s.executeQuery(
        "SELECT count(*) FROM information_schema.tables " +
          s"WHERE table_name = '${ident(table)}'")
      rs.next() && rs.getLong(1) > 0
    }

  def count(table: String): Long =
    withStmt { s =>
      val rs = s.executeQuery(s"SELECT count(*) FROM ${ident(table)}")
      rs.next(); rs.getLong(1)
    }

  def listTables(): Seq[String] =
    withStmt { s =>
      val rs = s.executeQuery("SHOW TABLES")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
    }.sorted

  /** Warehouse-side watermark scalar: `SELECT max(col)` (reference
    * duckdb_backend.py:150,159). None on empty/NULL → caller degrades to
    * full load. Returns whatever the JDBC driver maps the column to
    * (Long for BIGINT, java.sql.Timestamp for TIMESTAMP) — the same
    * orderable values Spark's `lit` can push into a source filter.
    */
  def maxScalar(table: String, column: String): Option[Any] =
    withStmt { s =>
      val rs = s.executeQuery(
        s"SELECT max(${ident(column)}) FROM ${ident(table)}")
      rs.next()
      Option(rs.getObject(1)).map {
        case t: java.time.LocalDateTime =>
          java.sql.Timestamp.from(t.toInstant(java.time.ZoneOffset.UTC))
        case other => other
      }
    }

  /** The schema-pinned `columns={...}` spec for read_csv — ONE builder
    * for both upsert paths, so a quoting/type-mapping fix can't diverge
    * between them.
    */
  private def colSpec(schema: StructType): String =
    schema.fields.map(f =>
      s"'${WarehouseDdl.DuckDb.quoteName(f.name)}': " +
        s"'${WarehouseDdl.DuckDb.colType(WarehouseDdl.pgName(f.dataType))}'")
      .mkString("{", ", ", "}")

  private def chunkFiles(chunkDir: String): Seq[java.io.File] = {
    val dir = new java.io.File(chunkDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv.gz"))
      .sortBy(_.getName).toSeq
  }

  /** Bulk-load every pending gzip CSV chunk: `COPY t FROM 'chunk'
    * (HEADER)` per file (duckdb_backend.py:105-110; DuckDB decompresses
    * by extension). Chunk column order is the table's column order — both
    * derive from the same captured schema. Returns chunks loaded.
    */
  def loadChunks(table: String, chunkDir: String): Long = {
    val files = chunkFiles(chunkDir)
    withStmt { s =>
      files.foreach { f =>
        s.execute(s"COPY ${ident(table)} FROM '${f.getAbsolutePath}' (HEADER)")
      }
    }
    files.size.toLong
  }

  /** Keyed upsert of every pending chunk: `INSERT OR REPLACE INTO t
    * SELECT * FROM read_csv(...)` (duckdb_backend.py:190-197) — DuckDB
    * resolves conflicts on the table's PRIMARY KEY. Unlike the
    * reference's `read_csv_auto`, the read is schema-PINNED via a
    * `columns={...}` spec built from the captured schema (the engine-wide
    * rule: interchange reads never re-infer).
    */
  def mergeChunks(table: String, chunkDir: String,
                  schema: StructType): Long = {
    val spec = colSpec(schema)
    val files = chunkFiles(chunkDir)
    withStmt { s =>
      files.foreach { f =>
        s.execute(s"INSERT OR REPLACE INTO ${ident(table)} SELECT * FROM " +
          s"read_csv('${f.getAbsolutePath}', header=true, columns=$spec)")
      }
    }
    files.size.toLong
  }

  /** Exactly-once append of one `watch` micro-batch: COPY every chunk in
    * `chunkDir` into `table` inside ONE transaction that also claims
    * (table, batchId) in a batch-log table. foreachBatch is at-least-once
    * on crash replay; a replayed batch finds its id already claimed and
    * is skipped whole, so rows land exactly once. The claim and the COPYs
    * commit together — a crash mid-batch rolls both back, and the replay
    * then re-lands cleanly. Returns true if the batch was applied, false
    * if it was a replay of an already-committed batch.
    *
    * (Single-writer is a DuckDB file-level guarantee, so check-then-insert
    * needs no cross-process race handling.)
    */
  def appendBatchIdempotent(table: String, batchId: Long,
                            chunkDir: String,
                            /** Some(schema) → keyed landing: `INSERT OR
                              * REPLACE` from schema-pinned read_csv (the
                              * watch-merge mode); None → plain COPY append. */
                            mergeSchema: Option[StructType] = None): Boolean =
    withConn { c =>
      c.setAutoCommit(false)
      val s = c.createStatement()
      try {
        s.execute("CREATE TABLE IF NOT EXISTS _graft_watch_log (" +
          "watch_table VARCHAR, batch_id BIGINT, " +
          "PRIMARY KEY (watch_table, batch_id))")
        val rs = s.executeQuery("SELECT count(*) FROM _graft_watch_log " +
          s"WHERE watch_table = '${ident(table)}' AND batch_id = $batchId")
        rs.next()
        if (rs.getLong(1) > 0) { c.rollback(); false }
        else {
          s.execute("INSERT INTO _graft_watch_log VALUES " +
            s"('${ident(table)}', $batchId)")
          mergeSchema match {
            case None =>
              chunkFiles(chunkDir).foreach { f =>
                s.execute(
                  s"COPY ${ident(table)} FROM '${f.getAbsolutePath}' (HEADER)")
              }
            case Some(schema) =>
              val spec = colSpec(schema)
              chunkFiles(chunkDir).foreach { f =>
                s.execute(
                  s"INSERT OR REPLACE INTO ${ident(table)} SELECT * FROM " +
                    s"read_csv('${f.getAbsolutePath}', header=true, " +
                    s"columns=$spec)")
              }
          }
          c.commit(); true
        }
      } catch { case e: Throwable => c.rollback(); throw e }
      finally s.close()
    }

  /** Read a full table back ordered by `orderBy` — the spec's cell-level
    * verification surface (small tables only; this is a test/debug aid,
    * not a data path).
    */
  def selectAll(table: String, orderBy: String): Seq[Seq[Any]] =
    withStmt { s =>
      val rs = s.executeQuery(
        s"SELECT * FROM ${ident(table)} ORDER BY ${ident(orderBy)}")
      val n = rs.getMetaData.getColumnCount
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (1 to n).map(r.getObject(_)).toList).toList
    }
}
