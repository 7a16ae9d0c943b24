package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming observability: a StreamingQueryListener that keeps the
  * per-query ingest/latency counters the reference logs ad hoc
  * (processed-count prints in its foreachBatch), exposed as a queryable
  * snapshot instead of log lines.
  *
  * Driver-side only and O(1) per progress event — safe on a cluster at
  * any rate (listeners run on the driver's listener bus, never in the
  * hot path).
  */
class StreamMetrics extends StreamingQueryListener {

  case class QuerySnapshot(
      name: String,
      batches: Long,
      totalInputRows: Long,
      lastInputRows: Long,
      lastProcessedRowsPerSecond: Double,
      lastBatchDurationMs: Long)

  private val state = mutable.Map[String, QuerySnapshot]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val prev = state.get(name)
    state(name) = QuerySnapshot(
      name = name,
      batches = prev.map(_.batches).getOrElse(0L) + 1,
      totalInputRows = prev.map(_.totalInputRows).getOrElse(0L) + p.numInputRows,
      lastInputRows = p.numInputRows,
      lastProcessedRowsPerSecond = p.processedRowsPerSecond,
      lastBatchDurationMs = p.batchDuration)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def snapshot(name: String): Option[QuerySnapshot] = synchronized(state.get(name))

  def snapshots: Seq[QuerySnapshot] = synchronized(state.values.toSeq)
}

object StreamMetrics {

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: StreamMetrics): Unit =
    spark.streams.removeListener(m)
}
