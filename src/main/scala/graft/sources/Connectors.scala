package graft.sources

import java.sql.{DriverManager, Types}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** Connector builders for the reference's source/sink surface beyond
  * parquet (SURVEY §2.1): JDBC (S1-S4, S8-S10), CSV (S15), Kafka batch
  * writes (S13 harness side). JDBC/Kafka have no test infrastructure in
  * this container — the builders mirror the reference's options and are
  * exercised only for CSV here.
  */
object Connectors {

  /** JDBC scan; `partitionColumn` enables the reference's 4-way parallel
    * range read (spark_extract.py:74-81). At scale, numPartitions should
    * track executor count and bounds should come from a min/max probe.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 1L,
      upperBound: Long = 1000000L,
      numPartitions: Int = 4): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn
      .map(c => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions))
      .getOrElse(base)
      .load()
  }

  /** JDBC pushdown scan: arbitrary SQL evaluated at the source
    * (spark_extract.py:128-163).
    */
  def readJdbcQuery(spark: SparkSession, url: String, sql: String,
      user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", sql)
      .option("user", user).option("password", password)
      .load()

  /** JDBC batch sink (spark_load.py:28-65). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, mode: SaveMode = SaveMode.Append): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Keyed JDBC upsert (MERGE semantics) — the sink the reference's
    * stream-agg table actually needs: its PRIMARY KEY (window_start,
    * device_id, device_type) (create_stream_tables.sql:19-23) is
    * violated by plain append the second time update mode re-emits a
    * window. Dialect-aware: Postgres `INSERT .. ON CONFLICT`, MySQL
    * `ON DUPLICATE KEY UPDATE`, Derby ANSI `MERGE` — one statement per
    * row, batched `MergeBatchSize` rows per round trip; any other URL
    * (or `portableOnly = true`) falls back to engine-portable
    * update-else-insert per row inside the same transaction scope.
    *
    * Scale notes: runs distributed — each partition holds one
    * connection and one transaction; parallelism = partition count, and
    * rows never funnel through the driver. Upstream should be the
    * (small) per-batch aggregate delta, not raw events.
    */
  /** The per-row merge plumbing shared by the upsert sinks. When the
    * dialect supports a single-statement merge, `single` carries
    * (sql, param order) and rows flow as ONE batched round-trip per
    * `MergeBatchSize` instead of two statements per row — at scale the
    * row-at-a-time update-else-insert pays one server round trip per
    * statement, which dominates sink throughput.
    */
  private[graft] val MergeBatchSize = 500
  private case class MergeSql(cols: Seq[String], valCols: Seq[String], keyCols: Seq[String],
      updateSql: String, insertSql: String, colIdx: Map[String, Int],
      single: Option[(String, Seq[String])]) {
    private def set(ps: java.sql.PreparedStatement, order: Seq[String], row: Row): Unit =
      order.zipWithIndex.foreach { case (c, i) =>
        val v = row.get(colIdx(c))
        if (v == null) ps.setNull(i + 1, Types.NULL) else ps.setObject(i + 1, v)
      }
    def apply(conn: java.sql.Connection, rows: Iterator[Row]): Unit = single match {
      case Some((sql, order)) =>
        val ps = conn.prepareStatement(sql)
        var pending = 0
        rows.foreach { row =>
          set(ps, order, row)
          ps.addBatch()
          pending += 1
          if (pending == MergeBatchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
      case None =>
        val upd = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        rows.foreach { row =>
          set(upd, valCols ++ keyCols, row)
          if (upd.executeUpdate() == 0) {
            set(ins, cols, row)
            ins.executeUpdate()
          }
        }
    }
  }

  /** ANSI SQL type for a CAST inside Derby's MERGE source-row VALUES
    * (Derby cannot infer `?` parameter types there).
    */
  private def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case _ => "VARCHAR(4000)"
    }
  }

  /** Dialect-keyed single-statement merge (None → portable two-statement
    * fallback). Postgres/MySQL upsert against the table's unique key;
    * Derby (the embedded engine JdbcSpec proves against) gets a real
    * ANSI MERGE with typed source casts.
    */
  private def singleStatementMerge(df: DataFrame, url: String, table: String,
      cols: Seq[String], valCols: Seq[String], keyCols: Seq[String]): Option[(String, Seq[String])] = {
    def q(c: String) = s""""$c""""
    val placeholders = cols.map(_ => "?").mkString(", ")
    if (url.startsWith("jdbc:postgresql:"))
      Some((
        s"""INSERT INTO $table (${cols.map(q).mkString(", ")}) VALUES ($placeholders)
           | ON CONFLICT (${keyCols.map(q).mkString(", ")})
           | DO UPDATE SET ${valCols.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}""".stripMargin,
        cols))
    else if (url.startsWith("jdbc:mysql:"))
      // backtick quoting: MySQL treats double quotes as strings unless
      // ANSI_QUOTES is on. CAVEAT: ON DUPLICATE KEY UPDATE fires on ANY
      // unique constraint of the target, not just keyCols — a table with
      // extra unique indexes diverges from the ON CONFLICT(keyCols) /
      // portable paths; route such tables through portableOnly=true.
      // Row-alias form (`AS new`, MySQL 8.0.19+) replaces the
      // VALUES(col) syntax deprecated in 8.0.20.
      Some((
        s"""INSERT INTO $table (${cols.map(c => s"`$c`").mkString(", ")}) VALUES ($placeholders) AS new
           | ON DUPLICATE KEY UPDATE ${valCols.map(c => s"`$c` = new.`$c`").mkString(", ")}""".stripMargin,
        cols))
    else if (url.startsWith("jdbc:derby:")) {
      // Derby's MERGE source must be a base table, so the one-row
      // SYSIBM.SYSDUMMY1 carries each row's parameters (typed CASTs —
      // Derby cannot infer bare `?` types inside MERGE clauses).
      // Parameter order: keys (ON), values (UPDATE), all cols (INSERT).
      val types = df.schema.fields.map(f => f.name -> sqlType(f.dataType)).toMap
      def p(c: String) = s"CAST(? AS ${types(c)})"
      Some((
        s"""MERGE INTO $table T USING SYSIBM.SYSDUMMY1
           | ON ${keyCols.map(c => s"T.${q(c)} = ${p(c)}").mkString(" AND ")}
           | WHEN MATCHED THEN UPDATE SET ${valCols.map(c => s"${q(c)} = ${p(c)}").mkString(", ")}
           | WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
           |   VALUES (${cols.map(p).mkString(", ")})""".stripMargin,
        keyCols ++ valCols ++ cols))
    } else None
  }

  private def mergeSql(df: DataFrame, table: String, keyCols: Seq[String],
      url: String = "", portableOnly: Boolean = false): MergeSql = {
    val cols = df.schema.fieldNames.toSeq
    val valCols = cols.filterNot(keyCols.contains)
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), s"bad keyCols $keyCols for $cols")
    require(valCols.nonEmpty, "upsertJdbc needs at least one non-key column")
    def q(c: String) = s""""$c""""
    MergeSql(
      cols, valCols, keyCols,
      s"""UPDATE $table SET ${valCols.map(c => s"${q(c)} = ?").mkString(", ")}
         | WHERE ${keyCols.map(c => s"${q(c)} = ?").mkString(" AND ")}""".stripMargin,
      s"INSERT INTO $table (${cols.map(q).mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})",
      cols.zipWithIndex.toMap,
      if (portableOnly) None else singleStatementMerge(df, url, table, cols, valCols, keyCols))
  }

  /** Keyed MERGE upsert. Dialect fast paths (Postgres ON CONFLICT,
    * MySQL ON DUPLICATE KEY, Derby MERGE) assume keyCols is the table's
    * ONLY unique constraint; for MySQL targets carrying additional
    * unique indexes pass portableOnly=true (the two-statement fallback
    * matches on exactly keyCols).
    */
  def upsertJdbc(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      user: String, password: String, portableOnly: Boolean = false): Unit = {
    val m = mergeSql(df, table, keyCols, url, portableOnly)
    // Hash-partition on the merge key so a key lands in exactly ONE
    // transaction: two partitions carrying the same key would otherwise
    // race update-else-insert across parallel connections (double-insert
    // on a PK-less table, duplicate-key abort on a PK'd one).
    df.repartition(keyCols.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          m(conn, rows)
          conn.commit()
        } catch {
          case e: Throwable =>
            // release locks before close — an in-transaction close can
            // leak them (and in embedded engines block the retry)
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
      }
  }

  /** Exactly-once micro-batch apply: the batch-id check, every row
    * merge, and the batch-id record run in ONE transaction on ONE
    * connection — a crash at any point either commits the whole batch
    * with its progress marker or none of it, so a replayed batch (even
    * one whose rows differ, from a non-deterministic upstream) is
    * skipped atomically and can never double-apply or half-apply.
    *
    * Scale contract: the batch funnels through one connection
    * (coalesce(1)), which is exactly right for its intended input — the
    * per-trigger AGGREGATE delta (windows × devices), never raw events.
    * For large idempotent batches use `upsertJdbc` (parallel,
    * per-partition transactions) without the progress marker.
    * Returns true when the batch was applied, false when skipped.
    */
  def upsertJdbcOnce(batch: DataFrame, batchId: Long, url: String, table: String,
      progressTable: String, keyCols: Seq[String], user: String, password: String): Boolean = {
    // DDL first, on its own autocommit connection (not transactional in
    // most engines anyway). Only "object already exists" SQLStates are
    // swallowed (Derby X0Y32, Postgres 42P07, MySQL/SQLServer 42S01);
    // a genuine DDL failure (permissions, bad identifier, connectivity)
    // surfaces HERE, not later as a confusing SELECT failure inside the
    // batch transaction.
    val existsStates = Set("X0Y32", "42P07", "42S01")
    val c0 = DriverManager.getConnection(url, user, password)
    try c0.createStatement().execute(
      s"""CREATE TABLE $progressTable ("sink" VARCHAR(128) NOT NULL,
         | "batch_id" BIGINT NOT NULL, PRIMARY KEY ("sink", "batch_id"))""".stripMargin)
    catch {
      case e: java.sql.SQLException if existsStates.contains(e.getSQLState) => ()
    } finally c0.close()

    // Whether the batch was applied is decided from the DATABASE, not
    // from task-side signalling: a task can commit the transaction and
    // die before reporting (or be retried/speculated), in which case an
    // accumulator would read 0 for a batch that is durably applied.
    // applied := marker absent before the call AND present after it.
    def markerExists(): Boolean = {
      val c = DriverManager.getConnection(url, user, password)
      try {
        val chk = c.prepareStatement(
          s"""SELECT 1 FROM $progressTable WHERE "sink" = ? AND "batch_id" = ?""")
        chk.setString(1, table); chk.setLong(2, batchId)
        chk.executeQuery().next()
      } finally c.close()
    }
    val presentBefore = markerExists()

    val m = mergeSql(batch, table, keyCols, url)
    batch.coalesce(1).foreachPartition { rows: Iterator[Row] =>
      val conn = DriverManager.getConnection(url, user, password)
      try {
        conn.setAutoCommit(false)
        val chk = conn.prepareStatement(
          s"""SELECT 1 FROM $progressTable WHERE "sink" = ? AND "batch_id" = ?""")
        chk.setString(1, table); chk.setLong(2, batchId)
        if (!chk.executeQuery().next()) {
          m(conn, rows)
          val rec = conn.prepareStatement(
            s"""INSERT INTO $progressTable ("sink", "batch_id") VALUES (?, ?)""")
          rec.setString(1, table); rec.setLong(2, batchId)
          rec.executeUpdate()
          conn.commit()
        } else conn.rollback()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally conn.close()
    }
    !presentBefore && markerExists()
  }

  /** CSV with header + schema inference off by default (deterministic). */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = false): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** JSON-lines source. Schema-explicit by default: at 100 TB schema
    * inference is a full extra pass over the data, and inferred types
    * drift with the sample — production readers must pin the schema.
    */
  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(path)

  def writeJsonLines(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC source/sink (column-pruned + predicate-pushdown, like parquet). */
  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Kafka batch producer (test-harness side of S13). */
  def writeKafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
}
