package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.warehouse.StorageStats

/** Q18/Q19 analog: file-layout and table-size introspection derived from
  * parquet file metadata (no data read).
  */
class StorageStatsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("tableLayout reports per-partition file counts, bytes, and the compaction flag") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/t"
    spark.range(1000)
      .withColumn("part", (col("id") % 2).cast("int"))
      .repartition(4) // several small files per partition dir
      .write.partitionBy("part").parquet(dir)
    val r = StorageStats.tableLayout(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(6)))).toMap
    assert(r.keySet == Set("part=0", "part=1"))
    r.values.foreach { case (nFiles, totalBytes, needsCompaction) =>
      assert(nFiles >= 1 && totalBytes > 0)
      assert(needsCompaction) // KB-scale test files sit far under 32 MB
    }
    // byte totals agree with the filesystem
    val fsBytes = Files.walk(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .map(p => java.nio.file.Files.size(java.nio.file.Paths.get(p))).sum
    assert(r.values.map(_._2).sum == fsBytes)
  }

  test("tableSizes rolls up files, bytes, rows, and density per table") {
    val base = Files.createTempDirectory("graft-sizes").toString
    spark.range(500).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(s"$base/a")
    spark.range(50).selectExpr("id").coalesce(1).write.parquet(s"$base/b")
    val r = StorageStats.tableSizes(spark, Map("a" -> s"$base/a", "b" -> s"$base/b"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r("a")._3 == 500L && r("b")._3 == 50L)
    assert(r("a")._2 > 0 && r("b")._2 > 0)
    assert(r("a")._4 > 0.0) // bytes per row populated
  }
}
