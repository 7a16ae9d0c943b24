package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Layout
import graft.functions.expressions.ZOrder2

class ZOrderSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("codegen morton matches the reference implementation on a grid") {
    val rows = for (a <- 0L to 17L; b <- 0L to 17L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select($"a", $"b", Layout.zorder2($"a", $"b").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) => assert(got((a, b)) == ZOrder2.morton(a, b)) }
    // spot-check the interleave convention: a → even bits, b → odd bits
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((3L, 3L)) == 15L)
  }

  test("z-sorted layout clusters both dimensions (range locality)") {
    // Points sorted by morton: any contiguous run of 64 points spans a
    // bounded box in (a, b) — the property min/max row-group stats
    // exploit. Row-major sort has a-runs spanning the FULL b range.
    val n = 64
    val pts = (for (a <- 0L until n; b <- 0L until n) yield (a, b))
    val sortedZ = pts.sortBy { case (a, b) => ZOrder2.morton(a, b) }
    val spans = sortedZ.grouped(64).map { g =>
      (g.map(_._1).max - g.map(_._1).min).max(g.map(_._2).max - g.map(_._2).min)
    }.toSeq
    assert(spans.max <= 8, s"64-point z-run spans up to ${spans.max} in a 64x64 grid")
  }

  test("zorder2 is callable from SQL") {
    assert(spark.sql("SELECT zorder2(3L, 5L) AS z").head.getLong(0) == ZOrder2.morton(3, 5))
  }
}
