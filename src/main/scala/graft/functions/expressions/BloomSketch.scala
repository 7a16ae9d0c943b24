package graft.functions.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic Bloom filter (Bloom 1970, CACM 13(7)) as a mergeable
  * TypedImperativeAggregate — the membership sketch the engine's other
  * sketches cannot stand in for: HLL/KMV answer "how many distinct",
  * CMS answers "how often", but only a bit-vector answers "might this
  * key be in the set" with zero false NEGATIVES — the contract a
  * semi-join pre-filter needs (every qualifying row must survive;
  * false positives only cost a wasted probe, never a wrong result).
  * The 100 TB shape this exists for: build the filter over the SMALL
  * join side (one [[Words]]-long array per group, mergeable map-side),
  * broadcast it, and drop most of the BIG side's rows before the
  * shuffle a semi-join would otherwise pay on the full fact table —
  * the same role Spark's own `BloomFilterAggregate` plays under its
  * runtime-filter rule (InjectRuntimeFilter), rebuilt here on the
  * engine's portable md5 hash so the DuckDB oracle replays the exact
  * bit pattern and the false-positive census is hash-checkable.
  *
  * Hashing (Kirsch & Mitzenmacher 2006's observation that k derived
  * hashes suffice, taken one step simpler): the [[K]] probe positions
  * are disjoint 12-bit slices of the SAME 60-bit md5 prefix the
  * HLL/CMS/KMV sketches use — `pos_i = (h >> 12·i) & (M-1)` — so the
  * whole filter derives from one md5 per key and the oracle replay is
  * a shift-and-mask away. Slice independence is exactly the md5
  * assumption the sibling sketches already make.
  *
  * Determinism: bit-OR is associative/commutative/idempotent, so the
  * word array is partition-order-proof and duplicate-input-proof —
  * build order can never change a bit, and the output hash-matches a
  * set-of-positions replay in SQL.
  *
  * Scale contract: each map task ships exactly [[Words]] longs (1 KB)
  * per group into the shuffle regardless of input rows — no
  * distinct-key pre-shuffle, no per-key state.
  *
  * Output: array<bigint> of [[Words]] little-endian bit words; bit
  * `pos` of the filter is word `pos / 64`, bit `pos % 64`. Probing
  * lives in the caller ([[graft.functions.Sketch.bloomMaybeContains]])
  * as pure codegen'd shift/mask arithmetic over the array.
  */
case class BloomSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import BloomSketch.{K, M, Words}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_md5"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Words)

  // One digest instance per deserialized (= per-task, single-threaded)
  // aggregate; digest() resets it for the next row.
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md.digest(v.toString.getBytes("UTF-8"))
      // Top 60 bits of the first 8 bytes, big endian — the value
      // Long.parseLong(hex.take(15), 16) yields (the md5Long60
      // convention shared by HllSketch/CmsSketch/KmvSketch).
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      i = 0
      while (i < K) {
        val pos = ((h >>> (12 * i)) & (M - 1)).toInt
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box(_): Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Words * 8)
    var i = 0
    while (i < Words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Words)
    var i = 0
    while (i < Words) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

object BloomSketch {

  /** Filter width in bits. 4096 = 12 address bits per probe, so [[K]]
    * probes consume 48 of the hash's 60 bits with no overlap. At the
    * classic ~1.44·m/n sizing this is comfortable for ~500-key build
    * sides (fp ≈ 2%) and degrades gracefully (measurably, per the
    * false-positive census query) toward n ≈ m.
    */
  val M = 4096
  /** Words in the bit array (64 bits each). */
  val Words: Int = M / 64
  /** Probe positions per key. */
  val K = 4

  /** Canonical constructor: SQL string rendering, not the internal
    * value (the HllSketch.forInput convention) — an integer child must
    * hash its rendered form or the bit pattern diverges from the
    * md5-based oracle.
    */
  def forInput(child: Expression): BloomSketch =
    BloomSketch(if (child.dataType == StringType) child else Cast(child, StringType))

  /** DuckDB CTE yielding (pos) — the DISTINCT set bit positions of the
    * filter built over `keyExpr` in `rowsSql` — the oracle twin of the
    * bit array, generated next to the implementation so the two cannot
    * drift. A probe then checks its [[K]] positions against this set.
    */
  def oraclePosCte(rowsSql: String, keyExpr: String): String = {
    val h = graft.functions.Hashes.O.md5Long60(s"CAST($keyExpr AS VARCHAR)")
    s"""SELECT DISTINCT ($h >> (12 * kk.i)) & ${M - 1} AS pos
       |FROM ($rowsSql) CROSS JOIN (SELECT unnest(range(0, $K)) AS i) kk""".stripMargin
  }
}
