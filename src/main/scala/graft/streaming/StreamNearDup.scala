package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.{Hashes, Text}
import graft.operators.Dedup.{MinhashBands, MinhashK}

/** Streaming MinHash-LSH near-duplicate detection — the ONLINE half of
  * the q43 batch operator: a live document feed surfaces its near-dup
  * pairs as they arrive, instead of waiting for the nightly batch pass.
  *
  * Two-stage shape:
  *  1. STATELESS signature + banding: the batch operator's
  *     explode→groupBy signature becomes [[MinhashK]] `array_min` folds
  *     over the per-row shingle set (identical values — the min over the
  *     same md5 stream), so no aggregation state exists before the
  *     bucket stage and the narrow stage scales with ingest.
  *  2. STATEFUL bucket join: band rows group by (band_id, band_val) in
  *     `flatMapGroupsWithState`; each bucket's state is the (doc_id,
  *     signature) list of residents, new arrivals emit a pair against
  *     every resident with the estimated Jaccard (matching signature
  *     components / k — exact dyadic k/16 values, so stream and batch
  *     agree bit-for-bit). Event-time timeout evicts a bucket once the
  *     watermark passes its newest arrival + the delay, so state is
  *     bounded by the watermark horizon — the q43 within-horizon
  *     contract.
  *
  * Emission contract: a pair surfaces ONCE PER COLLIDING BAND
  * (multiplicity ≤ [[MinhashBands]], tagged `band_id`); consumers dedup
  * by (d1, d2) — a cross-band stateful dedup would spend a second state
  * store on what a downstream `dropDuplicates` does for free in batch
  * post-processing, and the multiplicity itself is signal (more
  * colliding bands ⇒ higher similarity). [[BucketCap]] bounds a hot
  * bucket (boilerplate shingle sets) the way GraphBlockCap bounds the
  * batch graph generators: residents beyond the cap stop accumulating,
  * so one viral template cannot grow unbounded state or quadratic
  * emission.
  */
object StreamNearDup {

  val BucketCap = 1000

  case class BandRow(band_id: Int, band_val: String, doc_id: Long,
      ts: Timestamp, sig: Seq[Long])
  case class NearDupPair(d1: Long, d2: Long, est_jaccard: Double, band_id: Int)

  private val RowsPerBand = MinhashK / MinhashBands

  /** Stateless per-row signature + band rows (doc_id, ts, text →
    * band_id, band_val, doc_id, ts, sig). Works identically on batch
    * and streaming frames.
    */
  def bandRows(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sh = array_distinct(Text.shingles(col(textCol)))
    val sig = array((0 until MinhashK).map(i =>
      array_min(transform(sh, s => Hashes.md5Long32(concat(lit(s"$i:"), s))))): _*)
    val bands = (0 until MinhashBands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("|", (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*).as("band_val"))
    }
    docs.withColumn("sig", sig)
      .withColumn("band", explode(array(bands: _*)))
      .select(col("band.band_id"), col("band.band_val"),
        col("doc_id"), col("ts"), col("sig"))
  }

  /** The live detector: near-dup pairs within the watermark horizon.
    * `evictMs` is the state lifetime past a bucket's newest arrival
    * (default = 10 min, matching the default delay).
    */
  def detect(docs: DataFrame, delay: String = "10 minutes",
      evictMs: Long = 600000L, textCol: String = "text"): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    bandRows(docs, textCol)
      .withWatermark("ts", delay)
      .as[BandRow]
      .groupByKey(r => (r.band_id, r.band_val))
      .flatMapGroupsWithState[List[(Long, Seq[Long])], NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandId, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val incoming = rows.toList
            // deterministic emission: new docs in id order, re-deliveries
            // of a resident are ignored (idempotent per doc per bucket)
            var present = state.getOption.getOrElse(Nil)
            val newDocs = incoming.map(r => (r.doc_id, r.sig)).distinct
              .filterNot(d => present.exists(_._1 == d._1))
              .sortBy(_._1)
            val out = List.newBuilder[NearDupPair]
            for ((id, sg) <- newDocs) {
              if (present.size < BucketCap) {
                for ((pid, psig) <- present) {
                  val m = (0 until MinhashK).count(i => sg(i) == psig(i))
                  out += NearDupPair(math.min(id, pid), math.max(id, pid),
                    m.toDouble / MinhashK, bandId)
                }
                present = (id, sg) :: present
              }
            }
            state.update(present)
            state.setTimeoutTimestamp(incoming.map(_.ts.getTime).max + evictMs)
            out.result().iterator
          }
      }
  }
}
