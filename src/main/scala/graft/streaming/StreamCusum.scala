package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.model.SensorEvent

/** Custom stateful streaming operator #3: per-device two-sided CUSUM
  * change-point detection (Page 1954, Biometrika — "Continuous
  * inspection schemes") with mapGroupsWithState — the sequential
  * monitor that accumulates SMALL persistent mean shifts until they
  * cross a decision threshold, catching the slow drifts StreamDrift's
  * per-reading EWMA band-alarm smooths over (EWMA alarms on one big
  * deviation; CUSUM alarms on many small ones in the same direction).
  *
  * Self-starting: the first `warmup` readings set the reference mean
  * μ0 (their running mean — no training pass); from then on
  *   S⁺ = max(0, S⁺ + (x − μ0 − slack)),
  *   S⁻ = max(0, S⁻ + (μ0 − x − slack)),
  * and a side crossing `h` counts one alarm and resets that side (the
  * standard restart-after-signal scheme).
  *
  * Scale/ordering contract is StreamDrift's exactly: constant-size
  * state per key (one struct, millions of keys fine), batch events
  * sorted by (time, value) before folding so the trajectory is
  * shuffle-order-proof, and the distributed batch twin folds each key
  * in one pass over sorted partitions — no per-key history buffering.
  * The q217 oracle replays the identical fold as a recursive CTE (the
  * q138 discipline), so the online monitor's arithmetic is hash-checked.
  */
object StreamCusum {

  case class CusumState(n: Long, sum: Double, sp: Double, sn: Double, alarms: Long)

  case class DeviceCusum(
      device_id: String,
      n_events: Long,
      mu0: Double,
      sp: Double,
      sn: Double,
      n_alarms: Long)

  val Warmup = 5L
  val Slack = 50.0
  val Threshold = 300.0

  def detectStream(
      events: Dataset[SensorEvent],
      warmup: Long = Warmup,
      slack: Double = Slack,
      h: Double = Threshold): Dataset[DeviceCusum] = {
    implicit val outEnc = Encoders.product[DeviceCusum]
    implicit val stateEnc = Encoders.product[CusumState]
    implicit val stringEnc = Encoders.STRING
    events
      .groupByKey(_.device_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn(warmup, slack, h))
  }

  /** Distributed batch twin — sorted-partition fold, the q138 shape. */
  def detectBatchDs(
      events: Dataset[SensorEvent],
      warmup: Long = Warmup,
      slack: Double = Slack,
      h: Double = Threshold): Dataset[DeviceCusum] = {
    import org.apache.spark.sql.functions.col
    implicit val outEnc = Encoders.product[DeviceCusum]
    val sorted = events
      .repartition(col("device_id"))
      .sortWithinPartitions(col("device_id"), col("time"), col("value"))
    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[DeviceCusum] {
        def hasNext: Boolean = buf.hasNext
        def next(): DeviceCusum = {
          val id = buf.head.device_id
          var s = CusumState(0L, 0.0, 0.0, 0.0, 0L)
          while (buf.hasNext && buf.head.device_id == id)
            s = step(s, buf.next().value, warmup, slack, h)
          out(id, s, warmup)
        }
      }
    }
  }

  /** Local fold over explicit rows — the spec/backfill reference. */
  def detectBatch(events: Seq[SensorEvent], warmup: Long = Warmup,
      slack: Double = Slack, h: Double = Threshold): Map[String, DeviceCusum] =
    events.groupBy(_.device_id).map { case (id, es) =>
      val sorted = es.sortBy(e => (e.time.getTime, e.value))
      val s = sorted.foldLeft(CusumState(0L, 0.0, 0.0, 0.0, 0L))(
        (acc, e) => step(acc, e.value, warmup, slack, h))
      id -> out(id, s, warmup)
    }

  private def out(id: String, s: CusumState, warmup: Long): DeviceCusum =
    DeviceCusum(id, s.n,
      if (s.n >= warmup) s.sum / warmup.toDouble
      else if (s.n > 0) s.sum / s.n.toDouble else 0.0,
      s.sp, s.sn, s.alarms)

  /** One observation. Warmup rows only accumulate the reference sum. */
  private def step(s: CusumState, x: Double, warmup: Long,
      slack: Double, h: Double): CusumState =
    if (s.n < warmup) CusumState(s.n + 1, s.sum + x, 0.0, 0.0, s.alarms)
    else {
      val mu0 = s.sum / warmup.toDouble
      val spNew = math.max(0.0, s.sp + (x - mu0 - slack))
      val snNew = math.max(0.0, s.sn + (mu0 - x - slack))
      val alarmP = spNew > h
      val alarmN = snNew > h
      CusumState(s.n + 1, s.sum,
        if (alarmP) 0.0 else spNew,
        if (alarmN) 0.0 else snNew,
        s.alarms + (if (alarmP) 1L else 0L) + (if (alarmN) 1L else 0L))
    }

  private def updateFn(warmup: Long, slack: Double, h: Double)(
      deviceId: String,
      events: Iterator[SensorEvent],
      state: GroupState[CusumState]): DeviceCusum = {
    val sorted = events.toSeq.sortBy(e => (e.time.getTime, e.value))
    val s = sorted.foldLeft(state.getOption.getOrElse(CusumState(0L, 0.0, 0.0, 0.0, 0L)))(
      (acc, e) => step(acc, e.value, warmup, slack, h))
    state.update(s)
    out(deviceId, s, warmup)
  }
}
