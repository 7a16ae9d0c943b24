package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Num
import graft.operators.{SensorAdapter, Skew}
import graft.sources.Tables
import graft.warehouse.Views

class ViewsSkewSpec extends AnyFunSuite with TestSpark {

  private lazy val readings =
    SensorAdapter.fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"))

  test("warehouse views are queryable via spark.sql") {
    Views.register(spark, readings)
    val latest = spark.sql("SELECT * FROM v_latest_readings")
    assert(latest.count() == readings.select("device_id").distinct().count())
    val health = spark.sql(
      "SELECT device_id, reading_count FROM v_device_health_24h WHERE reading_count > 0")
    assert(health.count() > 0)
    val trend = spark.sql(
      "SELECT * FROM v_anomaly_trends_7d WHERE anomaly_rate_pct > 0")
    assert(trend.count() > 0)
  }

  test("salted two-phase aggregation is bit-identical to direct aggregation") {
    // skewed input: one hot key with most of the rows
    import spark.implicits._
    val hot = Seq.fill(5000)(("hot", scala.util.Random.nextInt(1000) / 100.0))
    val cold = (1 to 50).map(i => (s"k$i", i / 7.0))
    val df = (hot ++ cold).toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count("v").as("n"), Num.dsum($"v").as("sum_value"),
        (Num.dsum($"v") / count("v")).as("avg_value"))
      .orderBy("k").collect()
    val salted = Skew.saltedStats(df, Seq("k"), "v").orderBy("k").collect()
    assert(direct.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("salted join is row-identical to the plain join under skew") {
    import spark.implicits._
    // 6000 probe rows on one hot key + a cold tail; build side is a dim
    val probe = ((1 to 6000).map(i => (1L, i.toLong)) ++ (1 to 60).map(i => (i.toLong, -i.toLong)))
      .toDF("k", "row_id").repartition(8)
    val build = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain = probe.join(build, Seq("k"))
      .orderBy("k", "row_id").collect()
    val salted = Skew.saltedJoin(probe, build, Seq("k"), r = 7, spread = $"row_id")
      .select("k", "row_id", "attr")
      .orderBy("k", "row_id").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
    // negative spread values must still land in [0, r) — pmod, not %
    assert(salted.length == plain.length)
  }

  test("salted join keeps rows whose spread value is NULL") {
    import spark.implicits._
    val probe = Seq((1L, Some(10L)), (2L, Option.empty[Long])).toDF("k", "row_id")
    val build = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val out = Skew.saltedJoin(probe, build, Seq("k"), r = 5, spread = $"row_id")
      .select("k", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "b"))) // NULL spread routes to salt 0, row survives
  }
}
