package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashes, Num, Text, TimeF, Vec}

class FnsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("dsum is exact where double sum drifts") {
    val df = Seq.fill(10)(0.1).toDF("x")
    val r = df.agg(Num.dsum($"x").as("s")).head.getDouble(0)
    assert(r == 1.0)
  }

  test("dstddev matches stddev_samp within 1e-9") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val row = df.agg(Num.dstddev($"x").as("a"), stddev_samp($"x").as("b")).head
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9)
  }

  test("dstddev is null for single-row groups (reference guard)") {
    val df = Seq(42.0).toDF("x")
    assert(df.agg(Num.dstddev($"x")).head.isNullAt(0))
  }

  test("md5-derived hashes match the cross-engine reference values") {
    // duckdb: ('0x' || substr(md5('abc'),1,8))::BIGINT = 2416005272
    val r = Seq("abc").toDF("s")
      .select(Hashes.md5Long32($"s"), Hashes.md5Long60($"s")).head
    assert(r.getLong(0) == 2416005272L)
    assert(r.getLong(1) == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("cosine: orthogonal 0, parallel 1") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f), Array(2f, 0f))).toDF("a", "b", "c")
    val r = df.select(
      Vec.cosine($"a", $"b").as("ab"),
      Vec.cosine($"a", $"c").as("ac")).head
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("shingles: 3-grams, and empty below 3 words") {
    val df = Seq("a b c d", "x y").toDF("text")
    val r = df.select(Text.shingles($"text").as("sh")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
  }

  test("dayofweek convention: 1=Sunday..7=Saturday, weekend/business flags") {
    val df = Seq(
      "2024-01-07 10:00:00", // Sunday
      "2024-01-06 23:00:00", // Saturday
      "2024-01-08 08:59:59" // Monday, before business hours
    ).toDF("s").select($"s".cast("timestamp").as("t"))
    val r = df.select(
      TimeF.dow($"t"), TimeF.isWeekend($"t"), TimeF.isBusinessHours($"t")).collect()
    assert(r(0).getInt(0) == 1 && r(0).getBoolean(1) && r(0).getBoolean(2))
    assert(r(1).getInt(0) == 7 && r(1).getBoolean(1) && !r(1).getBoolean(2))
    assert(r(2).getInt(0) == 2 && !r(2).getBoolean(1) && !r(2).getBoolean(2))
  }
}
