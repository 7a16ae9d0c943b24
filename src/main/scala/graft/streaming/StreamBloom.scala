package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sketch

/** Stateless Bloom gate for a stream against a STATIC membership set —
  * the streaming twin of the q250 shuffled-semi-join pre-filter.
  *
  * The filter itself is a 1 KB literal: the member keys fold into one
  * [[graft.functions.expressions.BloomSketch]] word array, collected
  * ONCE on the driver (64 longs — the same bounded-collect class as
  * the DoReMi weight vectors) and shipped inside the task binary as a
  * typed literal. The stream side then needs NO state store, no
  * broadcast join, and no per-batch recomputation: the probe is a pure
  * codegen'd expression (one md5 per event), so most non-member events
  * die in the stream's stateless projection stage. The trailing
  * stream-static left-semi join removes the bloom's false positives —
  * output ≡ the unfiltered stream-static semi join, the same
  * zero-false-negative contract q249/q250 pin under the batch oracle.
  *
  * At 100 TB-scale ingest the economics are the batch case amplified:
  * the join's shuffle/broadcast per micro-batch is the cost center,
  * and the 1 KB literal cuts its input by the non-member share with
  * zero added state.
  */
object StreamBloom {

  /** The member set's bloom filter as a typed literal column. ONE
    * driver-side aggregation of the static frame (64 longs, 1 KB) —
    * never call with a streaming frame.
    */
  def bloomLiteral(members: DataFrame, key: String): Column = {
    require(!members.isStreaming,
      "members must be a static frame: bloomLiteral folds it with an eager " +
        "driver-side collect, which cannot run on a streaming DataFrame")
    val words = members.agg(Sketch.bloomMd5(col(key)).as("bf"))
      .head().getSeq[Long](0).toArray
    typedlit(words)
  }

  /** `events` (streaming or batch) gated to rows whose `key` is in
    * `members` (static): literal-bloom pre-filter, then the exact
    * stream-static left-semi join. Result is identical to the plain
    * semi join for any filter sizing.
    */
  def gate(events: DataFrame, members: DataFrame, key: String): DataFrame =
    events
      .filter(Sketch.bloomMaybeContains(bloomLiteral(members, key), col(key)))
      .join(members.select(col(key)), Seq(key), "left_semi")
}
