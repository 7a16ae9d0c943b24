package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k best (score, id)
  * pairs under the total order (score DESC, id ASC) in an O(k) buffer.
  *
  * Why this beats the window idiom at 100 TB: `row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k` must shuffle EVERY row of
  * every group and sort whole partitions before discarding all but k.
  * As a mergeable aggregate, top-k gets map-side partial aggregation
  * like any sum: each task ships at most k pairs per group into the
  * shuffle — the per-group TakeOrderedAndProject analog. Merge is
  * associative/commutative and the order is total (unique ids), so the
  * result is partition-order-proof and bit-reproducible — the DuckDB
  * window oracle hash-matches it exactly.
  *
  * Buffer: an unsorted ArrayBuffer compacted to the k best whenever it
  * exceeds 4k (amortized O(log k) per row), compacted again on
  * merge/serialize/eval. Output: array<struct<score double, id long>>
  * sorted by (score DESC, id ASC).
  */
case class TopKByScore(
    left: Expression, // score: double
    right: Expression, // id: long (unique — makes the order total)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
    with BinaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // Analysis-time typing: numeric inputs coerce to (double, long); a
  // non-castable call fails in the analyzer, not as a per-task
  // ClassCastException on a 100 TB job.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  // (score DESC, id ASC): a is strictly better than b. Score comparison
  // replicates Spark SQL's DoubleType ordering exactly (`x == y` first,
  // so -0.0 ties 0.0, then Double.compare): the sortWith comparator
  // contract holds and the order stays TOTAL. NaN/NULL scores never
  // reach this comparator — update() excludes them before ranking —
  // so on NaN inputs the aggregate DIVERGES from a raw row_number
  // window (which would rank NaN greatest); on NaN-free input the two
  // idioms match exactly.
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = if (a._1 == b._1) 0 else java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(better)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  // NULL and NaN scores are excluded HERE, inside the aggregate,
  // rather than by a Filter above it: a pre-filter on the score column
  // gets predicate-pushed through the scoring projection, so the score
  // expression (an interpreted HOF distance, a 16-term decimal ADC
  // tree) is evaluated TWICE per scored pair — once in the pushed
  // filter, once for the aggregate. Skipping degenerate scores in
  // update() costs one branch and keeps the ranking semantics: a group
  // with fewer than k rankable candidates returns fewer rows, and NaN
  // (which the comparator would rank greatest) never enters a buffer.
  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length > 4 * k) compact(buf)
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    a ++= b
    compact(a)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val t = compact(buf)
    val bb = ByteBuffer.allocate(4 + t.length * 16)
    bb.putInt(t.length)
    t.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n + 1)
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}
