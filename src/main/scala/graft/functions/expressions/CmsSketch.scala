package graft.functions.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic Count-Min Sketch as a custom TypedImperativeAggregate —
  * the engine's mergeable frequency sketch (heavy-hitter estimation over
  * a key space too large to hold exactly). Like
  * [[graft.functions.expressions.HllSketch]], every ingredient is exact
  * integer math on an md5-derived hash, so the approximate counts
  * themselves hash-match a DuckDB oracle bit-for-bit.
  *
  * Layout: `Depth` = 4 rows x `Width` = 256 buckets. The row-r bucket of
  * a value is byte r of the value's 60-bit md5 hash
  * (graft.functions.Hashes.md5Long60 semantics): bucket_r =
  * (h >>> 8·r) & 255. The four bucket functions are nibbles of ONE md5
  * — not independent hashes in the classical CMS analysis — which is the
  * price of cross-engine determinism; md5's avalanche keeps them
  * uncorrelated in practice and the estimate keeps the one-sided
  * guarantee that matters (est >= exact, always).
  *
  * The buffer is a Depth·Width long array of bucket counters; update
  * adds 1 to one bucket per row, merge is element-wise sum — both
  * associative/commutative, so the result is partition-order-proof. The
  * aggregate evaluates to the raw counter array (array<bigint>); point
  * estimates are then `min` over the value's Depth buckets via
  * `element_at`, computed in plain codegen'd expressions (see
  * Sketch.cmsEstimate).
  */
case class CmsSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CmsSketch.{Depth, Width}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_md5"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  // One digest per deserialized (= per-task, single-threaded) aggregate.
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md.digest(v.toString.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4 // top 60 bits, non-negative — md5Long60 semantics
      var r = 0
      while (r < Depth) {
        buf(r * Width + ((h >>> (8 * r)) & (Width - 1)).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {
  val Depth = 4
  val Width = 256

  /** Canonical constructor: pins the hashed value to the SQL string
    * rendering. A non-string child is wrapped in CAST(child AS STRING),
    * so the sketch buckets on exactly what md5Long60/cmsEstimate (and
    * the DuckDB twin) hash — a raw internal value (timestamp micros,
    * date epoch-day) would bucket differently and silently break the
    * one-sided est >= exact guarantee.
    */
  def forInput(child: Expression): CmsSketch =
    CmsSketch(if (child.dataType == StringType) child else Cast(child, StringType))
}
