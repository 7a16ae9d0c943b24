package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.SensorEvent

/** Custom stateful streaming operator #2: per-device EWMA drift
  * detection with mapGroupsWithState (the one-row-per-group-per-batch
  * sibling of the sessionizer's flatMapGroupsWithState) — the online
  * data-quality monitor a sensor/training-data ingest runs to catch a
  * device (or upstream source) whose readings drift away from their
  * smoothed history.
  *
  * State per device is one (count, ewma, driftCount) struct — constant
  * size, so the state store holds exactly one small row per device
  * forever: the shape that survives millions of keys. Within a batch,
  * events are sorted by (time, value) before folding, so the EWMA is
  * deterministic regardless of shuffle arrival order; a stream cut at
  * time-ordered micro-batch boundaries folds to the identical state as
  * one batch pass (proven by StreamDriftSpec). Events arriving late
  * across a boundary absorb in arrival order — the standard behavior
  * of an online EWMA monitor, which reacts to what it has seen.
  *
  * A reading is flagged as drift when |value − ewma_before| exceeds
  * `threshold` once the device has `minHistory` prior readings; the
  * EWMA then absorbs the reading either way (standard EWMA monitoring:
  * alarm, don't censor).
  */
object StreamDrift {

  case class DriftState(n: Long, ewma: Double, driftCount: Long)

  case class DeviceDrift(
      device_id: String,
      n_events: Long,
      ewma: Double,
      n_drift: Long)

  def detectStream(
      events: Dataset[SensorEvent],
      alpha: Double = 0.125,
      threshold: Double = 30.0,
      minHistory: Long = 3L): Dataset[DeviceDrift] = {
    implicit val outEnc = Encoders.product[DeviceDrift]
    implicit val stateEnc = Encoders.product[DriftState]
    implicit val stringEnc = Encoders.STRING
    events
      .groupByKey(_.device_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        updateFn(alpha, threshold, minHistory))
  }

  /** The same fold on a plain batch — the parity reference for specs
    * and the backfill path (one pass over history, same arithmetic).
    */
  def detectBatch(events: Seq[SensorEvent], alpha: Double = 0.125,
      threshold: Double = 30.0, minHistory: Long = 3L): Map[String, DeviceDrift] =
    events.groupBy(_.device_id).map { case (id, es) =>
      val s = fold(DriftState(0L, 0.0, 0L), sortBatch(es), alpha, threshold, minHistory)
      id -> DeviceDrift(id, s.n, s.ewma, s.driftCount)
    }

  /** Distributed batch twin of the stream fold — the backfill path,
    * shaped for scale: repartition on the key, sort WITHIN partitions
    * by (key, time, value), then ONE streaming pass per partition with
    * a single constant-size fold state (no per-device buffering — a
    * device with a billion readings costs one struct, where a
    * groupByKey + sort twin would collect its whole history). The
    * arithmetic per event is the identical [[step]] the streaming
    * operator applies, so stream ≡ batch is structural; q138's DuckDB
    * oracle replays the fold via an ordered list_reduce.
    */
  def detectBatchDs(
      events: Dataset[SensorEvent],
      alpha: Double = 0.125,
      threshold: Double = 30.0,
      minHistory: Long = 3L): Dataset[DeviceDrift] = {
    import org.apache.spark.sql.functions.col
    implicit val outEnc = Encoders.product[DeviceDrift]
    val sorted = events
      .repartition(col("device_id"))
      .sortWithinPartitions(col("device_id"), col("time"), col("value"))
    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[DeviceDrift] {
        def hasNext: Boolean = buf.hasNext
        def next(): DeviceDrift = {
          val id = buf.head.device_id
          var s = DriftState(0L, 0.0, 0L)
          while (buf.hasNext && buf.head.device_id == id)
            s = step(s, buf.next(), alpha, threshold, minHistory)
          DeviceDrift(id, s.n, s.ewma, s.driftCount)
        }
      }
    }
  }

  private def sortBatch(es: Seq[SensorEvent]): Seq[SensorEvent] =
    es.sortBy(e => (e.time.getTime, e.value))

  /** One EWMA observation: flag BEFORE absorbing (alarm, don't censor). */
  private def step(s: DriftState, e: SensorEvent, alpha: Double,
      threshold: Double, minHistory: Long): DriftState = {
    val drift = s.n >= minHistory && math.abs(e.value - s.ewma) > threshold
    val ewma = if (s.n == 0L) e.value else alpha * e.value + (1.0 - alpha) * s.ewma
    DriftState(s.n + 1, ewma, s.driftCount + (if (drift) 1L else 0L))
  }

  private def fold(init: DriftState, sorted: Seq[SensorEvent], alpha: Double,
      threshold: Double, minHistory: Long): DriftState =
    sorted.foldLeft(init)(step(_, _, alpha, threshold, minHistory))

  private def updateFn(alpha: Double, threshold: Double, minHistory: Long)(
      deviceId: String,
      events: Iterator[SensorEvent],
      state: GroupState[DriftState]): DeviceDrift = {
    val s = fold(
      state.getOption.getOrElse(DriftState(0L, 0.0, 0L)),
      sortBatch(events.toSeq), alpha, threshold, minHistory)
    state.update(s)
    DeviceDrift(deviceId, s.n, s.ewma, s.driftCount)
  }
}
