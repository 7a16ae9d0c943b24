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
}
