package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Perceptual near-dup fingerprint (dHash + banded Hamming LSH). */
class DhashSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

  test("near-identical payloads pair at small Hamming; unrelated ones do not") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")), // one in-place word edit
      (3L, (1 to 30).map(i => s"tok${i * 17 % 11}").mkString(" ") + " completely different payload content")
    ).toDF("doc_id", "text")
    val pairs = Multimodal.dhashNearDupPairs(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 <= 6)
  }

  test("identical payloads hash identically (Hamming 0)") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val p = Multimodal.dhashNearDupPairs(docs).collect()
    assert(p.length == 1 && p.head.getInt(2) == 0)
  }

  test("payloads shorter than the pooling grid are excluded") {
    val docs = Seq((1L, "too short"), (2L, base)).toDF("doc_id", "text")
    assert(Multimodal.withDhash(docs).select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("fingerprint computation is corpus-linear: 5k docs x ~300 chars in bounded time") {
    // The round-9 regression shape: the md5 gram array inlined into
    // each of the 72 histogram-bin lambdas re-hashed every gram once
    // per bin, interpreted — >150 s on exactly this workload. The
    // fixed single-materialization plan runs it in a few seconds; the
    // generous bound only exists to catch an O(bins x L) re-evaluation
    // riding a green small-frame oracle again.
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = spark.range(5000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 48).map(j =>
        element_at(lit(words), (pmod(col("id") * 31 + j * 7, lit(words.length)) + 1).cast("int"))): _*)
        .as("text"))
    val t0 = System.nanoTime()
    // aggregate over dhash itself: a bare count() lets Catalyst prune
    // the whole fingerprint projection and times nothing
    val r = Multimodal.withDhash(docs)
      .agg(count(lit(1)).as("n"),
        sum(col("dhash").bitwiseAND(lit(255L))).as("chk")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) == 5000L)
    // Wall-clock tripwire: healthy ~2-4 s, the regression this guards
    // (per-bin HOF re-evaluation) was >150 s. The generous default and
    // the env override (GRAFT_TIMING_GATE_SEC, set 0 to disable) keep a
    // throttled/overloaded CI host from flaking the suite while still
    // catching an O(bins x L) blowup.
    val gate = sys.env.get("GRAFT_TIMING_GATE_SEC").map(_.toDouble).getOrElse(120.0)
    assert(gate <= 0.0 || sec < gate,
      f"withDhash took $sec%.1f s on 5k docs (gate $gate%.0f s) - per-row blowup?")
  }

  test("binary payload fingerprint == the equivalent text fingerprint (md5-of-bytes)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog while seventeen engines shuffle data",
      2L -> "a completely different corpus line about broadcast joins and sort merge planning")
      .toDF("doc_id", "text")
    val asText = Multimodal.withDhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asBytes = Multimodal.withDhash(
      docs.withColumn("payload", col("text").cast("binary")), "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asBytes == asText)
  }

  test("binary near-dup payloads land within the Hamming threshold, unrelated ones outside") {
    val base = "the quick brown fox jumps over the lazy dog while seventeen engines shuffle data"
    val docs = Seq(
      1L -> base,
      2L -> (base + " x"), // near-dup byte stream
      3L -> "totally unrelated content about conformal prediction intervals and quantile fits")
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val h = Multimodal.withDhash(docs, "payload")
    val pairs = Multimodal.dhashPairsFromHashes(h)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("banding covers every pair within the Hamming threshold (pigeonhole)") {
    // craft two hashes differing in exactly 7 bits, all inside two bands:
    // bands 2..7 are identical, so the (band, value) join MUST surface
    // the pair — the recall guarantee the 8×8-bit split provides
    val h1 = 0L
    val h2 = java.lang.Long.parseLong("1111" + "000" + "1110", 2) // 7 bits in bands 0-1
    assert(java.lang.Long.bitCount(h1 ^ h2) == 7)
    val shared = (2 until 8).map(b => (h1 >> (8 * b)) & 255L) ==
      (2 until 8).map(b => (h2 >> (8 * b)) & 255L)
    assert(shared)
  }
}
