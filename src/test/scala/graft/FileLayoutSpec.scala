package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.FileLayout

/** Locks the physical-layout contracts: date partitions actually PRUNE
  * (PartitionFilters in the scan, non-matching directories never read)
  * and Z-order clustering yields disjoint per-file key ranges (the
  * precondition for min/max row-group skipping on both dimensions).
  */
class FileLayoutSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def ts(day: Int, sec: Int) =
    new Timestamp(1704067200000L + day * 86400000L + sec * 1000L)

  test("date-partitioned write prunes to the queried window") {
    val dir = Files.createTempDirectory("graft-datepart").toString + "/t"
    val df = (0 until 10).flatMap(d => Seq((ts(d, 0), d.toLong, 1.0), (ts(d, 60), d.toLong, 2.0)))
      .toDF("ts", "k", "v")
    FileLayout.writeDatePartitioned(df, "ts", dir)

    val read = FileLayout.readDatePartitioned(spark, dir)
      .filter(col("p_date") === "2024-01-03")
    assert(read.count() == 2)
    val plan = read.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning), not
    // as a post-scan filter over all partitions
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"), plan.take(1200))
    val scannedParts = read.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scannedParts.contains("p_date=2024-01-05"))
  }

  test("compaction collapses small files without losing rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    df.repartition(20).write.parquet(dir) // 20 tiny files
    def parquetFiles = Files.walk(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).count(f => f.endsWith(".parquet") && !f.contains("__"))
    assert(parquetFiles == 20)
    FileLayout.compact(spark, dir, targetRowsPerFile = 500)
    assert(parquetFiles == 2)
    assert(spark.read.parquet(dir).count() == 1000)
    assert(spark.read.parquet(dir).agg(sum("v")).head.getLong(0) == 1001000L)
  }

  test("compaction recovers a table stranded by a crash between renames") {
    val dir = Files.createTempDirectory("graft-compact-crash").toString + "/t"
    (1L to 100L).map(i => (i, i)).toDF("k", "v").repartition(5).write.parquet(dir)
    // simulate the crash window: data moved to __retired, nothing at path
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dir + "__retired"))
    FileLayout.compact(spark, dir, targetRowsPerFile = 50) // recovers, then compacts
    assert(spark.read.parquet(dir).count() == 100)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "__retired")))
  }

  test("z-ordered files own disjoint key ranges") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/t"
    val df = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("a", "b")
    FileLayout.writeZOrdered(df, graft.functions.Layout.zorder2(col("a"), col("b")), 8, dir)

    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("z_key").as("lo"), max("z_key").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ => ()
    }
    // round-trip completeness
    assert(spark.read.parquet(dir).count() == 4096)
  }
}
