package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.SensorEvent

/** Custom stateful streaming operator: gap-based sessionization with
  * flatMapGroupsWithState (KeyValueGroupedDataset custom state — beyond
  * the reference's aggregation-only streaming surface).
  *
  * State per device is one open session; events extend it or close it
  * (gap exceeded → the closed session is emitted and a new one opens).
  * Idle devices are closed by an event-time timeout when the watermark
  * passes session_end + gap, so state is strictly bounded: one small
  * struct per active device, evicted on emit — the shape that survives
  * millions of keys on a real cluster.
  */
object StreamSessions {

  case class OpenSession(startMs: Long, endMs: Long, n: Long, sumValue: Double)

  case class ClosedSession(
      device_id: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  def sessionizeStream(
      events: Dataset[SensorEvent],
      gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val stringEnc = Encoders.STRING

    val src =
      if (events.isStreaming) events.withWatermark("time", watermarkDelay) else events

    src
      .groupByKey(_.device_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateFn(gapSeconds * 1000L))
  }

  private def updateFn(gapMs: Long)(
      deviceId: String,
      events: Iterator[SensorEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {

    def close(s: OpenSession): ClosedSession =
      ClosedSession(deviceId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.sumValue)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toSeq
      state.remove()
      out.iterator
    } else {
      val sorted = events.toSeq.sortBy(e => (e.time.getTime, e.device_id))
      val closed = Seq.newBuilder[ClosedSession]
      var open = state.getOption
      sorted.foreach { e =>
        val t = e.time.getTime
        open = open match {
          case None => Some(OpenSession(t, t, 1L, e.value))
          case Some(s) if t - s.endMs > gapMs =>
            closed += close(s)
            Some(OpenSession(t, t, 1L, e.value))
          case Some(s) =>
            Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1, sumValue = s.sumValue + e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // Timeout when the watermark passes end+gap; must stay ahead of
        // the current watermark or Spark rejects it.
        val target = s.endMs + gapMs
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(target, floor))
      }
      closed.result().iterator
    }
  }
}
