package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Sketch}

class KmvSketchSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val K = 64

  test("sketch equals the exact bottom-k distinct md5Long60 hashes") {
    val df = (1 to 5000).map(i => s"tok-${i % 900}").toDF("t")
    val sk = df.agg(Sketch.kmvMd5($"t", K).as("sk")).head.getSeq[Long](0)
    val exact = df.select(Hashes.md5Long60($"t").as("h"))
      .distinct().orderBy("h").limit(K)
      .as[Long].collect().toSeq
    assert(sk == exact)
  }

  test("estimate lands within KMV error bounds and is partition-order-proof") {
    val rows = (1 to 20000).map(i => s"g-${i % 7000}")
    val a = rows.toDF("t").repartition(1)
      .agg(Sketch.kmvMd5($"t", 256).as("sk"))
      .select(Sketch.kmvEstimate($"sk", 256)).head.getDouble(0)
    val b = rows.toDF("t").repartition(13)
      .agg(Sketch.kmvMd5($"t", 256).as("sk"))
      .select(Sketch.kmvEstimate($"sk", 256)).head.getDouble(0)
    assert(a == b) // merge is set-union-truncate: associative + commutative
    // k=256 → standard error ~1/sqrt(254) ≈ 6.3%; allow 3 sigma
    assert(math.abs(a - 7000) / 7000 < 0.19, s"estimate $a")
  }

  test("below k distinct the sketch is exhaustive and the estimate exact") {
    val df = (1 to 1000).map(i => s"x-${i % 40}").toDF("t")
    val r = df.agg(Sketch.kmvMd5($"t", K).as("sk"))
      .select(size($"sk"), Sketch.kmvEstimate($"sk", K)).head
    assert(r.getInt(0) == 40)
    assert(r.getDouble(1) == 40.0)
  }

  test("duplication-insensitive and null-skipping") {
    val once = (1 to 500).map(i => s"d-$i")
    val a = once.toDF("t").agg(Sketch.kmvMd5($"t", K)).head.getSeq[Long](0)
    val b = (once ++ once ++ once).toDF("t").agg(Sketch.kmvMd5($"t", K)).head.getSeq[Long](0)
    assert(a == b)
    val withNulls = (once.map(Option(_)) ++ Seq.fill(100)(Option.empty[String]))
      .toDF("t").agg(Sketch.kmvMd5($"t", K)).head.getSeq[Long](0)
    assert(withNulls == a)
  }

  test("union bottom-k from two sketches matches the sketch of the union") {
    // the set-algebra contract q197 builds on: k smallest of A∪B is
    // recoverable from the two bottom-k arrays alone
    val aRows = (1 to 3000).map(i => s"a-${i % 800}")
    val bRows = (1 to 3000).map(i => s"${if (i % 2 == 0) "a" else "b"}-${i % 800}")
    def sk(rows: Seq[String]) =
      rows.toDF("t").agg(Sketch.kmvMd5($"t", K)).head.getSeq[Long](0)
    val fromParts = (sk(aRows) ++ sk(bRows)).distinct.sorted.take(K)
    val direct = sk(aRows ++ bRows)
    assert(fromParts == direct)
  }

  test("sketch aggregates across streaming micro-batches (mergeable state)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String]
    val q = mem.toDF().agg(Sketch.kmvMd5(col("value"), K).as("sk"))
      .writeStream.format("memory").queryName("kmv_stream").outputMode("complete").start()
    try {
      mem.addData((1 to 800).map(i => s"s$i"): _*)
      q.processAllAvailable()
      mem.addData((400 to 1200).map(i => s"s$i"): _*) // overlaps first batch
      q.processAllAvailable()
      val est = spark.table("kmv_stream").head.getSeq[Long](0)
      val batch = (1 to 1200).map(i => s"s$i").toDF("value")
        .agg(Sketch.kmvMd5(col("value"), K)).head.getSeq[Long](0)
      assert(est == batch) // stream state merge == one-shot batch
    } finally q.stop()
  }
}
