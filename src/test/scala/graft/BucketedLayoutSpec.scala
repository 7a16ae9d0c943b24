package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.BucketedLayout

/** Proves the bucketed layout eliminates the join/agg shuffle — the
  * physical-plan property that makes repeated fact-to-fact joins viable
  * at 100 TB.
  */
class BucketedLayoutSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous JVM's managed-table location survives catalog restarts
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      import java.util.Comparator
      java.nio.file.Files.walk(loc.toPath)
        .sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("join of two tables bucketed on the key plans with no Exchange") {
    dropTable("bkt_left")
    dropTable("bkt_right")
    val left = (1L to 1000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "x")
    val right = (1L to 500L).map(i => (i % 97, i, i * 3.0)).toDF("k", "rid", "y")
    BucketedLayout.writeBucketed(left, "bkt_left", numBuckets = 8, keys = Seq("k"))
    BucketedLayout.writeBucketed(right, "bkt_right", numBuckets = 8, keys = Seq("k"))

    val l = BucketedLayout.table(spark, "bkt_left")
    val r = BucketedLayout.table(spark, "bkt_right")
    // Disable broadcast so the planner's only shuffle-free option is the
    // bucket co-location (a broadcast join would also have 0 Exchange,
    // proving nothing).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = l.join(r, "k")
      assert(countExchanges(joined) == 0, joined.queryExecution.executedPlan.toString.take(2000))
      assert(joined.count() > 0)

      // aggregation on the bucket key also skips its shuffle
      val agg = l.groupBy("k").agg(sum("x"))
      assert(countExchanges(agg) == 0)
      assert(agg.count() == 97)

      // sanity: the same join over non-bucketed views DOES shuffle
      val plainL = left.hint("merge")
      val plain = plainL.join(right, "k")
      assert(countExchanges(plain) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
