package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Materialized

/** The filesystem-persisted artifact loop: write once, read back, prove
  * the disk reader ≡ the re-deriver bit-for-bit.
  */
class MaterializedDiskSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def freshFrame() =
    Seq(
      (3L, Array(0.25f, -1.5f, 3.125f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(Float.MinPositiveValue, 0f, -0f))
    ).toDF("cluster_id", "cemb")

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .orderBy("cluster_id")
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toList))
    .toSeq

  test("onDisk builds+writes once, then serves a real parquet scan, bit-identical") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def artifact() = Materialized.onDisk(spark, "disk-spec-corpus", "cmap") {
      builds.incrementAndGet()
      freshFrame()
    }
    val first = artifact()
    assert(builds.get() == 1)
    // reader ≡ re-deriver, float bits included
    assert(canon(first) == canon(freshFrame()))
    // second consumer: no rebuild, and the plan is a genuine file scan
    // (persisted THROUGH the filesystem, not a cached in-memory frame)
    val second = artifact()
    assert(builds.get() == 1)
    assert(second.queryExecution.executedPlan.toString.contains("parquet"))
    assert(canon(second) == canon(freshFrame()))
  }

  test("partitioned onDisk hive-partitions the table and round-trips every row") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def artifact() = Materialized.onDisk(spark, "disk-spec-part", "lists",
      partitionCols = Seq("cent_id")) {
      builds.incrementAndGet()
      Seq((10L, 0.5, 1L), (11L, 1.5, 1L), (12L, 2.5, 2L), (13L, 3.5, 7L))
        .toDF("cand_id", "cn", "cent_id")
    }
    val first = artifact()
    assert(builds.get() == 1)
    // reader sees the partition column (appended, type-inferred) and
    // every row survives the partitionBy write
    val rows = first.select($"cand_id", $"cn", $"cent_id".cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows == Set((10L, 0.5, 1L), (11L, 1.5, 1L), (12L, 2.5, 2L), (13L, 3.5, 7L)))
    // second consumer: no rebuild, and a partition-key filter reaches
    // PartitionFilters (file-level pruning, the inverted-list contract)
    val pruned = artifact().filter($"cent_id" === 1)
    assert(builds.get() == 1)
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cent_id"), scan.take(800))
  }

  test("onDisk artifacts are keyed by corpus dir") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def artifact(dir: String) = Materialized.onDisk(spark, dir, "cmap2") {
      builds.incrementAndGet()
      freshFrame()
    }
    artifact("corpus-a").count()
    artifact("corpus-b").count()
    artifact("corpus-a").count()
    assert(builds.get() == 2)
  }
}
