package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical file layout strategies beyond bucketing (BucketedLayout):
  * date partitioning for partition PRUNING and Z-order clustering for
  * row-group SKIPPING — the two levers that decide whether a 100 TB
  * range scan reads terabytes or gigabytes.
  *
  *  - Hive-style date partitions turn time predicates into directory
  *    pruning: the scan never opens files outside the window
  *    (PartitionFilters in the plan, verified by LayoutSpec).
  *  - Z-order clustering range-partitions and sorts the data by a
  *    Morton key (graft zorder2), so every data file covers a narrow,
  *    non-overlapping key range and parquet min/max stats prune
  *    row-groups on BOTH underlying dimensions.
  */
object FileLayout {

  /** Write `df` as Hive-style `p_date=YYYY-MM-DD/` partitions derived
    * from `tsCol`. At 100 TB this is the default fact layout: retention
    * drops whole directories, backfills overwrite one partition, and
    * every time-bounded query prunes to its window.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date")
      .parquet(path)

  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a directory of small parquet files into
    * ceil(rows/targetRowsPerFile) right-sized ones — the maintenance
    * pass every streaming/append sink needs (a 5 s trigger writing 100
    * files/hour turns a year-old table into millions of tiny files whose
    * open/footer overhead dwarfs the data).
    *
    * Crash contract: the swap is two renames, so a crash can leave the
    * data parked at `<path>__retired` with nothing at `path` — never
    * half-and-half — and the NEXT compact() (or `recover`) restores it
    * before doing anything else. Stale staging/retired leftovers from
    * old crashes are cleared up front, so a previous failure can't wedge
    * later runs.
    *
    * Concurrency contract: SINGLE WRITER, READERS QUIESCED. Between the
    * two renames nothing exists at `path`, so a concurrent reader fails
    * and a concurrent writer into the same directory loses its output —
    * this is a maintenance-window op, and the rename swap is
    * local-filesystem semantics (object stores copy). For compaction
    * under live readers use `StreamSinks.compactStore`, whose gen-N +
    * `_CURRENT` pointer swap never exposes a missing path. On a real
    * deployment this role belongs to a transactional table format's
    * commit protocol.
    */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val staging = path + "__compacting"
    val retired = path + "__retired"
    def rmTree(p: String): Unit =
      if (Files.exists(Paths.get(p)))
        Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
    recover(path)
    rmTree(staging)
    rmTree(retired)
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(staging)
    Files.move(Paths.get(path), Paths.get(retired))
    Files.move(Paths.get(staging), Paths.get(path))
    rmTree(retired)
  }

  /** Restore a table whose last compact() crashed between the two
    * renames (data intact at `<path>__retired`, nothing at `path`).
    */
  def recover(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    val retired = Paths.get(path + "__retired")
    if (!Files.exists(Paths.get(path)) && Files.exists(retired))
      Files.move(retired, Paths.get(path))
  }

  /** Write `df` Z-order-clustered on `zKey` (typically
    * `Fns.zorder2(bucketA, bucketB)`): range-partition into `numFiles`
    * disjoint key ranges, sort inside each, one file per range. Every
    * output file then owns a non-overlapping z-range, so min/max stats
    * skip files for predicates on either interleaved dimension.
    */
  def writeZOrdered(df: DataFrame, zKey: Column, numFiles: Int, path: String): Unit =
    df.withColumn("z_key", zKey)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions("z_key")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
