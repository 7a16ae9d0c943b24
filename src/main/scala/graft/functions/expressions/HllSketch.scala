package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Deterministic HyperLogLog distinct-count sketch as a custom
  * TypedImperativeAggregate — the engine's own mergeable sketch where
  * Spark's built-in `approx_count_distinct` cannot be cross-checked:
  * every ingredient here (md5 hash, register index, trailing-zero rank,
  * scaled-integer register sum) is exact integer math that a DuckDB
  * oracle reproduces bit-for-bit, so even the approximate answer
  * hash-matches across engines.
  *
  * Layout: m = 512 registers (9 index bits) over the 60-bit md5-derived
  * hash (graft.functions.Hashes.md5Long60 semantics); rank = trailing
  * zeros of the remaining 51 bits + 1 (52 for zero). The estimate is
  * alpha_m * m^2 / sum(2^-M_j), with the register sum carried as an
  * exact scaled integer (sum of 2^(52-M_j), max 512·2^52 = 2^61 — fits
  * a long), so the only floating-point steps are one cast and one
  * divide, identical IEEE operations in both engines. The standard
  * low-cardinality linear-counting correction is intentionally omitted:
  * it needs ln(), whose last-ulp behavior differs between libms and
  * would break cross-engine equality (documented bias below ~2.5m).
  *
  * Buffers are single byte arrays (one byte per register); merge is
  * element-wise max — associative, commutative, partition-order-proof.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val RegBits = 9
  private val M = 1 << RegBits // 512

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_md5"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  // One digest instance per deserialized (= per-task, single-threaded)
  // aggregate; digest() resets it for the next row.
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md.digest(v.toString.getBytes("UTF-8"))
      // First 15 hex chars == top 60 bits of the first 8 bytes (big
      // endian), same value Long.parseLong(hex.take(15), 16) yields —
      // without materializing the hex string.
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4 // 60 bits, non-negative
      val reg = (h % M).toInt
      val w = h >>> RegBits // remaining 51 bits
      val rho = if (w == 0L) 52 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L // exact: sum of 2^(52 - M_j) <= 512 * 2^52 = 2^61
    var i = 0
    while (i < M) { s += 1L << (52 - buf(i)); i += 1 }
    // Mirrored verbatim in the oracle SQL — keep the operation order.
    0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 4503599627370496.0 / s.toDouble
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {

  /** Canonical constructor: SQL string rendering, not the internal
    * value (see CmsSketch.forInput) — a timestamp child must hash
    * "2024-01-01 00:00:00", not raw micros, or the estimate diverges
    * from the md5-based oracle.
    */
  def forInput(child: Expression): HllSketch =
    HllSketch(if (child.dataType == StringType) child else Cast(child, StringType))

  /** DuckDB oracle SQL computing the identical estimate for `key` over
    * table rows grouped by `groupCols` — generated next to the
    * implementation so the two expression shapes cannot drift.
    */
  def oracleSql(table: String, key: String, groupCols: String): String =
    s"""WITH h AS (SELECT $groupCols AS g, (('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15))::BIGINT) AS h FROM $table),
       |r AS (SELECT g, CAST(h % 512 AS INT) AS reg,
       |        CASE WHEN h // 512 = 0 THEN 52
       |             ELSE CAST(round(log2((h // 512) & -(h // 512))) AS INT) + 1 END AS rho
       |      FROM h),
       |regs AS (SELECT g, reg, MAX(rho) AS m FROM r GROUP BY 1, 2),
       |agg AS (SELECT g, SUM(CAST(pow(2, 52 - m) AS HUGEINT)) AS s, COUNT(*) AS nr FROM regs GROUP BY 1)
       |SELECT g AS $groupCols,
       |  0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 4503599627370496.0
       |    / CAST(s + CAST(512 - nr AS HUGEINT) * CAST(pow(2, 52) AS HUGEINT) AS DOUBLE) AS approx_users
       |FROM agg""".stripMargin
}
