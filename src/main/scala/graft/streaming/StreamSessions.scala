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

  /** Distributed batch twin of the gap fold — the backfill path, shaped
    * for scale: repartition on the key, sort WITHIN partitions by
    * (key, time, value), one streaming pass per partition holding a
    * single open-session struct (sessions emit lazily as the gap or the
    * key breaks — never a per-device buffer). Session arithmetic (ms
    * gap test, extend/close transitions, ordered value sum) matches the
    * streaming updateFn; a fully-drained stream whose watermark passed
    * every session closes the same set. q139's DuckDB oracle rebuilds
    * the sessions INDEPENDENTLY (lag + running break-sum windows), so
    * the cross-engine check covers the fold semantics, not a mirrored
    * implementation.
    */
  def sessionizeBatch(events: Dataset[SensorEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    import org.apache.spark.sql.functions.col
    implicit val closedEnc = Encoders.product[ClosedSession]
    val gapMs = gapSeconds * 1000L
    val sorted = events
      .repartition(col("device_id"))
      .sortWithinPartitions(col("device_id"), col("time"), col("value"))
    sorted.mapPartitions { rows =>
      var open: Option[(String, OpenSession)] = None
      def close(id: String, s: OpenSession): ClosedSession =
        ClosedSession(id, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.sumValue)
      val body = rows.flatMap { e =>
        val t = e.time.getTime
        open match {
          case None =>
            open = Some((e.device_id, OpenSession(t, t, 1L, e.value)))
            Iterator.empty
          case Some((id, s)) if id != e.device_id || t - s.endMs > gapMs =>
            open = Some((e.device_id, OpenSession(t, t, 1L, e.value)))
            Iterator.single(close(id, s))
          case Some((id, s)) =>
            open = Some((id, s.copy(endMs = math.max(s.endMs, t), n = s.n + 1,
              sumValue = s.sumValue + e.value)))
            Iterator.empty
        }
      }
      // lazy tail: `open` is read only after `body` drains, flushing the
      // partition's final session
      body ++ new Iterator[ClosedSession] {
        def hasNext: Boolean = open.isDefined
        def next(): ClosedSession = {
          val (id, s) = open.get
          open = None
          close(id, s)
        }
      }
    }
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
