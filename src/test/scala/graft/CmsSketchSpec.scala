package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Sketch

class CmsSketchSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def estimates(rows: Seq[String], keys: Seq[String], parts: Int): Map[String, Long] = {
    val df = rows.toDF("w").repartition(parts)
    val cms = df.agg(Sketch.cmsMd5($"w").as("cms"))
    keys.toDF("w").crossJoin(broadcast(cms))
      .select($"w", Sketch.cmsEstimate($"cms", $"w").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimate is an overcount: est >= exact for every key, exact when sparse") {
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"k$i"))
    val est = estimates(rows, (1 to 50).map(i => s"k$i"), parts = 4)
    (1 to 50).foreach { i =>
      assert(est(s"k$i") >= i, s"k$i under-counted: ${est(s"k$i")} < $i")
    }
    // 50 keys in 4x256 buckets: total collision mass is tiny; the top key
    // cannot be inflated past the full stream size
    assert(est("k50") <= rows.size)
  }

  test("counter table is bit-identical regardless of partitioning (merge path)") {
    val rows = (1 to 9000).map(i => s"w${i % 311}")
    val a = rows.toDF("w").repartition(1).agg(Sketch.cmsMd5($"w")).head.getSeq[Long](0)
    val b = rows.toDF("w").repartition(17).agg(Sketch.cmsMd5($"w")).head.getSeq[Long](0)
    assert(a == b)
    assert(a.sum == 9000L * graft.functions.expressions.CmsSketch.Depth)
  }

  test("sketch merges across streaming micro-batches == one-shot batch") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String]
    val q = mem.toDF().agg(Sketch.cmsMd5(col("value")).as("cms"))
      .writeStream.format("memory").queryName("cms_stream").outputMode("complete").start()
    try {
      mem.addData((1 to 800).map(i => s"a${i % 97}"): _*)
      q.processAllAvailable()
      mem.addData((1 to 700).map(i => s"a${i % 53}"): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").head.getSeq[Long](0)
      val batch = ((1 to 800).map(i => s"a${i % 97}") ++ (1 to 700).map(i => s"a${i % 53}"))
        .toDF("value").agg(Sketch.cmsMd5(col("value"))).head.getSeq[Long](0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("non-string child buckets on its SQL rendering (implicit cast), so estimates stay one-sided") {
    import java.sql.Timestamp
    val ts = (1 to 300).map(i => new Timestamp(1704067200000L + (i % 7) * 1000L))
    val df = ts.toDF("t")
    // sketch on the raw timestamp == sketch on its explicit string cast
    val a = df.agg(Sketch.cmsMd5($"t")).head.getSeq[Long](0)
    val b = df.agg(Sketch.cmsMd5($"t".cast("string"))).head.getSeq[Long](0)
    assert(a == b)
    // and the estimate path (which hashes the string) is >= exact
    val cms = df.agg(Sketch.cmsMd5($"t").as("cms"))
    val est = df.distinct().crossJoin(broadcast(cms))
      .select(Sketch.cmsEstimate($"cms", $"t".cast("string")).as("e")).collect()
    assert(est.forall(_.getLong(0) >= 300 / 7)) // every key appears ~43x
  }

  test("heavy hitter estimate is tight when the key space is small") {
    val rows = Seq.fill(5000)("hot") ++ (1 to 200).map(i => s"cold$i")
    val est = estimates(rows, Seq("hot"), parts = 3)
    assert(est("hot") >= 5000L)
    assert(est("hot") <= 5200L) // only 200 cold keys can collide into its buckets
  }
}
