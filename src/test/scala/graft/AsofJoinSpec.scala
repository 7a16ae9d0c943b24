package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1704067200000L + sec * 1000)

  test("asof backward: latest at-or-before match, ties right-before-left, no-match null") {
    val left = Seq(
      (1L, ts(100), 10L), // after clicks at 50 and 100 → tie: click at 100 wins
      (1L, ts(60), 11L), // between clicks → click at 50
      (1L, ts(10), 12L), // before all clicks → null
      (2L, ts(500), 13L) // other user, own click
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(50), 100L, 1.0),
      (1L, ts(100), 101L, 2.0),
      (2L, ts(400), 102L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val r = AsofJoin.asofBackward(left, right, "user_id", "ts", "event_id", Seq("event_id", "value"))
      .select("event_id", "asof_event_id", "asof_value").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some((x.getLong(1), x.getDouble(2)))))
      .toMap
    assert(r(10L).contains((101L, 2.0))) // equal-timestamp click matches (<=)
    assert(r(11L).contains((100L, 1.0)))
    assert(r(12L).isEmpty)
    assert(r(13L).contains((102L, 3.0)))
  }

  test("sessionize splits on the idle gap and aggregates per session") {
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(600), 2L), (1L, ts(1200), 3L), // session 1 (gaps 600s)
      (1L, ts(4000), 4L), // > 1800s idle → session 2
      (2L, ts(0), 5L)
    ).toDF("user_id", "ts", "event_id")
    val r = AsofJoin.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(5)))
      .toMap
    assert(r((1L, 1L)) == ((3L, 1200L))) // 3 events, 1200s duration
    assert(r((1L, 2L)) == ((1L, 0L)))
    assert(r((2L, 1L)) == ((1L, 0L)))
  }
}
