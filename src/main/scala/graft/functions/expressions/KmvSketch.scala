package graft.functions.expressions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic KMV (k-minimum-values / bottom-k) distinct sketch as a
  * mergeable TypedImperativeAggregate — the theta-sketch family member
  * the engine's HLL cannot replace: because the sketch IS a uniform
  * hash-sample of the distinct set (Bar-Yossef et al. 2002, RANDOM —
  * "Counting distinct elements in a data stream"; Beyer et al. 2007,
  * SIGMOD), two sketches compose under SET OPERATIONS: the k smallest
  * of A ∪ B is computable from the two bottom-k arrays alone, and the
  * fraction of that union sample present in both sketches estimates
  * Jaccard — hence intersection cardinalities across sources without
  * ever co-shuffling the corpora. HLL registers destroy membership, so
  * none of that algebra exists there (inclusion-exclusion on HLL
  * explodes the variance); KMV is what Datasketches' theta sketch ships
  * for exactly this reason.
  *
  * Determinism: the hash is the same 60-bit md5 prefix the HLL/CMS
  * sketches use (graft.functions.Hashes.md5Long60 semantics), the
  * buffer is a SET (duplicates collapse), and merge is set-union
  * truncated to the k minima — associative, commutative, and
  * partition-order-proof, so the sketch array (and every estimate
  * derived from it) hash-matches a DuckDB replay bit-for-bit.
  *
  * Scale contract: each map task ships at most k longs per group into
  * the shuffle regardless of input size — the distinct-(group, token)
  * pre-shuffle a naive bottom-k would need never happens.
  *
  * Output: array<bigint> of the ≤k distinct hashes, ascending. The
  * estimator lives in the caller ([[graft.functions.Sketch.kmvEstimate]]):
  * with n_kept < k the sketch is exhaustive (estimate = n_kept exactly);
  * otherwise D̂ = (k-1) / F(h_k) with F(h) = h / 2^60 the hash's
  * uniform position in [0, 1).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_md5"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  // One digest instance per deserialized (= per-task, single-threaded)
  // aggregate; digest() resets it for the next row.
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  @inline private def insert(buf: JTreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.remove(buf.last()); () } }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md.digest(v.toString.getBytes("UTF-8"))
      // Top 60 bits of the first 8 bytes, big endian — the value
      // Long.parseLong(hex.take(15), 16) yields, without the hex string
      // (the md5Long60 convention shared by HllSketch/CmsSketch).
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      insert(buf, h >>> 4)
    }
    buf
  }

  override def merge(a: JTreeSet[java.lang.Long], b: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {

  /** Canonical constructor: SQL string rendering, not the internal
    * value (the HllSketch.forInput convention) — a timestamp child must
    * hash its rendered form or the estimate diverges from the md5-based
    * oracle.
    */
  def forInput(child: Expression, k: Int): KmvSketch =
    KmvSketch(if (child.dataType == StringType) child else Cast(child, StringType), k)

  /** DuckDB CTE yielding (g, h) — the per-group bottom-k distinct
    * 60-bit hashes of `keyExpr` over `rowsSql` — the oracle twin of the
    * sketch buffer, generated next to the implementation so the two
    * cannot drift.
    */
  def oracleRowsCte(rowsSql: String, keyExpr: String, groupExpr: String, k: Int): String =
    s"""SELECT g, h FROM (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT $groupExpr AS g,
       |          (('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15))::BIGINT) AS h
       |        FROM $rowsSql)) WHERE rn <= $k""".stripMargin
}
