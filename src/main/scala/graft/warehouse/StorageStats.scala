package graft.warehouse

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layer introspection — the Spark/parquet analog of the
  * reference's chunk/table size health checks (analytical_queries.sql:
  * 302-324, Q18 compression stats per chunk, Q19 table size analysis).
  *
  * TimescaleDB exposes these from catalog tables; a lake-table engine
  * derives them from the FILES: per partition directory — file count,
  * bytes, min/avg/max file size, and the small-files flag that drives
  * compaction decisions (thousands of KB-scale files turn a 100 TB scan
  * into an open()-bound crawl; the fix is `StreamSinks.compactStore` /
  * a coalesced rewrite). Compression ratio per se is parquet-internal
  * (encoded vs raw); the actionable lake-side signals are bytes-per-row
  * and file sizing, which this reports.
  *
  * Scale design: only file METADATA moves. Listing fans out from the
  * driver per partition directory (the same shape the Spark file index
  * itself uses); statuses are parallelized into a DataFrame so the
  * aggregation — and any join against row counts — runs distributed.
  * No data file is ever opened.
  */
object StorageStats {

  /** Per-partition-directory layout report for a (possibly partitioned)
    * parquet table. `smallFileBytes` flags partitions whose AVERAGE
    * file size sits under the threshold (default 32 MB — well under the
    * 128 MB scan-split target).
    */
  def tableLayout(spark: SparkSession, path: String,
      smallFileBytes: Long = 32L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    // (partition, file, bytes) for every data file under the table root
    def walk(p: Path, part: String): Seq[(String, String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, if (part.isEmpty) name else s"$part/$name")
        else if (name.endsWith(".parquet") || name.endsWith(".orc"))
          Seq((if (part.isEmpty) "<root>" else part, name, st.getLen))
        else Seq.empty
      }
    val files = if (fs.exists(root)) walk(root, "") else Seq.empty
    spark.createDataset(files).toDF("partition", "file", "bytes")
      .groupBy("partition")
      .agg(
        count(lit(1)).as("n_files"),
        sum("bytes").as("total_bytes"),
        min("bytes").as("min_file_bytes"),
        max("bytes").as("max_file_bytes"),
        (sum("bytes") / count(lit(1))).cast("long").as("avg_file_bytes"))
      .withColumn("needs_compaction", col("avg_file_bytes") < smallFileBytes)
      .orderBy("partition")
  }

  /** Whole-table size rollup with bytes-per-row — the Q19 analog (total
    * size per table) with the lake-relevant density signal in place of
    * index/toast split. Row count comes from parquet footer metadata
    * via a count() (no column data read).
    */
  def tableSizes(spark: SparkSession, tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val rows = tables.toSeq.sortBy(_._1).map { case (name, path) =>
      val layout = tableLayout(spark, path)
        .agg(sum("n_files"), sum("total_bytes")).head()
      // An empty/missing table sums to NULL and has no files to read:
      // report a zero row instead of NPE-ing on getLong / failing
      // parquet schema inference on a file-less directory.
      if (layout.isNullAt(0)) (name, 0L, 0L, 0L, null)
      else {
        val nRows = spark.read.parquet(path).count()
        (name, layout.getLong(0), layout.getLong(1), nRows,
          if (nRows == 0) null else java.lang.Double.valueOf(
            math.round(layout.getLong(1).toDouble / nRows * 100.0) / 100.0))
      }
    }
    rows.toDF("table_name", "n_files", "total_bytes", "n_rows", "bytes_per_row")
  }
}
