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
    * open/footer overhead dwarfs the data). Writes to a staging dir and
    * swaps via rename, so a crash leaves either the old or the new
    * layout, never a mix.
    */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val staging = path + "__compacting"
    val retired = path + "__retired"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(staging)
    Files.move(Paths.get(path), Paths.get(retired))
    Files.move(Paths.get(staging), Paths.get(path))
    // best-effort cleanup of the old generation
    Files.walk(Paths.get(retired)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
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
