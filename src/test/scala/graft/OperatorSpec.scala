package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnomalyDetection, RollingStats}

class OperatorSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000) // 2024-01-01 UTC

  private val series = Seq(
    ("d1", ts(0), 1.0, 1L),
    ("d1", ts(100), 2.0, 2L),
    ("d1", ts(200), 3.0, 3L),
    ("d1", ts(400), 4.0, 4L),
    ("d2", ts(0), 10.0, 5L)
  ).toDF("device_id", "time", "value", "event_id")

  test("rolling 5-min range frame includes exactly the trailing 300s") {
    val r = RollingStats
      .withRollingStats(series)
      .select("event_id", "rolling_avg_5min", "n_5min")
      .collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getLong(2)))
      .toMap
    assert(r(1L) == (1.0, 1L))
    assert(r(2L) == (1.5, 2L))
    assert(r(3L) == (2.0, 3L)) // 0,100,200 all within 300s
    assert(r(4L) == (3.0, 3L)) // 100,200,400 (t=0 is 400s back, excluded)
    assert(r(5L) == (10.0, 1L)) // separate device partition
  }

  test("lag features and delta") {
    val r = RollingStats
      .withLagFeatures(series)
      .filter($"device_id" === "d1")
      .orderBy("event_id")
      .select("value_lag_1", "value_change")
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getDouble(0) == 1.0 && r(1).getDouble(1) == 1.0)
    assert(r(3).getDouble(0) == 3.0 && r(3).getDouble(1) == 1.0)
  }

  test("z-score: constant series guarded (null z, no anomaly)") {
    val const = Seq(("d", "t", 5.0), ("d", "t", 5.0), ("d", "t", 5.0))
      .toDF("device_id", "device_type", "value")
    val r = AnomalyDetection.withZScore(const).select("z_score", "is_anomaly_zscore").collect()
    r.foreach { row => assert(row.isNullAt(0) && !row.getBoolean(1)) }
  }

  test("z-score flags a 3-sigma outlier") {
    val vals = Seq.fill(30)(10.0) ++ Seq(9.0, 11.0, 10.5, 9.5) ++ Seq(30.0)
    val df = vals.map(v => ("d", "t", v)).toDF("device_id", "device_type", "value")
    val flagged = AnomalyDetection.withZScore(df)
      .filter($"is_anomaly_zscore").select("value").collect()
    assert(flagged.map(_.getDouble(0)).toSeq == Seq(30.0))
  }

  test("latestPerKey picks the newest row per device") {
    val r = RollingStats.latestPerKey(series)
      .select("device_id", "value").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r == Map("d1" -> 4.0, "d2" -> 10.0))
  }
}
