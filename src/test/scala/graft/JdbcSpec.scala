package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Connectors

/** JDBC connector round-trip against embedded Derby (ships with the
  * Spark distribution) — exercises S1-S4/S8 semantics: plain scan,
  * partitioned parallel scan, query pushdown, batch sink.
  */
class JdbcSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc write, plain read, partitioned read, and query pushdown") {
    // device is numeric: Derby maps StringType to CLOB, which cannot be grouped
    val df = (1 to 100).map(i => (i.toLong, i % 7, i * 1.5)).toDF("id", "device", "reading")
    Connectors.writeJdbc(df, url, "readings", user = "", password = "")

    val plain = Connectors.readJdbc(spark, url, "readings", "", "")
    assert(plain.count() == 100)

    val partitioned = Connectors.readJdbc(spark, url, "readings", "", "",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 100, numPartitions = 4)
    assert(partitioned.rdd.getNumPartitions == 4)
    assert(partitioned.count() == 100)

    // Spark's JDBC writer quotes (case-sensitive) identifiers — raw pushdown
    // SQL against Derby must quote them the same way.
    val pushed = Connectors.readJdbcQuery(spark, url,
      """SELECT "device", COUNT(*) AS n FROM readings WHERE "reading" > 75 GROUP BY "device"""", "", "")
    val total = pushed.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(total == df.filter($"reading" > 75).count())
  }

  test("keyed upsert MERGEs a re-emitted window into the PK'd agg table") {
    import java.sql.{DriverManager, Timestamp}
    // The reference's stream-agg table shape: PRIMARY KEY (window_start,
    // device_id, device_type) — plain append dies on the second emission
    // of a window; upsertJdbc must update in place.
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE stream_agg (
        |  "window_start" TIMESTAMP NOT NULL,
        |  "device_id" VARCHAR(32) NOT NULL,
        |  "device_type" VARCHAR(32) NOT NULL,
        |  "reading_count" BIGINT,
        |  "avg_value" DOUBLE,
        |  PRIMARY KEY ("window_start", "device_id", "device_type"))""".stripMargin)
    conn.close()
    val w1 = new Timestamp(1704067200000L)
    val keys = Seq("window_start", "device_id", "device_type")

    // first emission of the window
    Connectors.upsertJdbc(
      Seq((w1, "d1", "temperature", 2L, 15.0), (w1, "d2", "temperature", 1L, 9.0))
        .toDF("window_start", "device_id", "device_type", "reading_count", "avg_value"),
      url, "stream_agg", keys, "", "")
    // late data re-emits the same window for d1 (update) and adds d3 (insert)
    Connectors.upsertJdbc(
      Seq((w1, "d1", "temperature", 3L, 20.0), (w1, "d3", "humidity", 1L, 55.0))
        .toDF("window_start", "device_id", "device_type", "reading_count", "avg_value"),
      url, "stream_agg", keys, "", "")

    val got = Connectors.readJdbc(spark, url, "stream_agg", "", "")
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("d1", "temperature") -> ((3L, 20.0)), // updated in place, no PK violation
      ("d2", "temperature") -> ((1L, 9.0)), // untouched
      ("d3", "humidity") -> ((1L, 55.0)))) // inserted
  }

  test("Derby MERGE fast path and portable fallback converge, past the batch boundary") {
    import java.sql.DriverManager
    val n = Connectors.MergeBatchSize + 57 // force a ragged final executeBatch
    for (t <- Seq("merge_fast", "merge_portable")) {
      val conn = DriverManager.getConnection(url)
      conn.createStatement().execute(
        s"""CREATE TABLE $t ("k" BIGINT NOT NULL, "v" DOUBLE, "s" VARCHAR(64),
           |  PRIMARY KEY ("k"))""".stripMargin)
      conn.close()
    }
    val first = (1 to n).map(i => (i.toLong, i * 1.5, s"row$i")).toDF("k", "v", "s")
    // second wave updates the odd keys and inserts a tail past n
    val second = ((1 to n by 2).map(i => (i.toLong, -1.0, "upd")) ++
      Seq((n + 1L, 9.9, "new"))).toDF("k", "v", "s")
    Connectors.upsertJdbc(first, url, "merge_fast", Seq("k"), "", "")
    Connectors.upsertJdbc(second, url, "merge_fast", Seq("k"), "", "")
    Connectors.upsertJdbc(first, url, "merge_portable", Seq("k"), "", "", portableOnly = true)
    Connectors.upsertJdbc(second, url, "merge_portable", Seq("k"), "", "", portableOnly = true)
    def snap(t: String) = Connectors.readJdbc(spark, url, t, "", "")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val fast = snap("merge_fast")
    assert(fast == snap("merge_portable"))
    assert(fast.size == n + 1)
    assert(fast.contains((1L, -1.0, "upd")) && fast.contains((2L, 3.0, "row2"))
      && fast.contains((n + 1L, 9.9, "new")))
  }

  test("batch-id tracking skips a replayed micro-batch") {
    import java.sql.DriverManager
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE once_agg ("k" BIGINT NOT NULL PRIMARY KEY, "v" DOUBLE)""")
    conn.close()
    val keys = Seq("k")
    val b0 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    assert(Connectors.upsertJdbcOnce(b0, 0L, url, "once_agg", "once_progress", keys, "", ""))
    // crash-replay of batch 0 delivers DIFFERENT data (e.g. a
    // non-deterministic upstream); tracking must skip it entirely
    val b0replay = Seq((1L, 999.0)).toDF("k", "v")
    assert(!Connectors.upsertJdbcOnce(b0replay, 0L, url, "once_agg", "once_progress", keys, "", ""))
    assert(Connectors.upsertJdbcOnce(Seq((3L, 30.0)).toDF("k", "v"),
      1L, url, "once_agg", "once_progress", keys, "", ""))
    val got = Connectors.readJdbc(spark, url, "once_agg", "", "")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)) // replay had no effect
  }

  test("a failing batch rolls back atomically: no rows, no progress marker") {
    import java.sql.DriverManager
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE atomic_agg ("k" BIGINT NOT NULL PRIMARY KEY, "v" DOUBLE NOT NULL)""")
    conn.close()
    // second row violates NOT NULL mid-transaction → the whole batch
    // (including the progress record) must vanish
    val bad = Seq((1L, Some(10.0)), (2L, None)).toDF("k", "v")
    intercept[Exception] {
      Connectors.upsertJdbcOnce(bad, 0L, url, "atomic_agg", "atomic_progress", Seq("k"), "", "")
    }
    assert(Connectors.readJdbc(spark, url, "atomic_agg", "", "").count() == 0)
    // the replay of batch 0 with good data is NOT skipped — nothing was recorded
    assert(Connectors.upsertJdbcOnce(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"),
      0L, url, "atomic_agg", "atomic_progress", Seq("k"), "", ""))
    assert(Connectors.readJdbc(spark, url, "atomic_agg", "", "").count() == 2)
  }
}
