package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared filesystem discipline for the `batch_id=<id>` streaming
  * ingest sinks (StreamDhash / StreamPostings / StreamIvfLists): the
  * legacy-layout write guard and the empty-store read, both through
  * Hadoop's FileSystem API — java.io.File silently returns "no
  * children" for any non-local URI (hdfs://, s3a://), which would skip
  * the guard and crash the reader on exactly the deployments a 100 TB
  * ingest runs on. `Path.getFileSystem(hadoopConf)` resolves local
  * paths and object stores alike.
  */
private[graft] object BatchLayout {

  /** Refuse to write the `batch_id=<id>` layout into a directory that
    * holds ROOT-LEVEL data files (a pre-round-11 append sink's output):
    * mixing flat files with partition directories breaks parquet
    * partition discovery for every reader of outDir. Metadata entries
    * (dot-files, `_spark_metadata`, `_SUCCESS`) are fine.
    */
  def requireCleanRoot(spark: SparkSession, outDir: String): Unit = {
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).collect {
        case st if st.isFile &&
          !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_") => st.getPath.getName
      }
    require(legacy.isEmpty,
      s"outDir '$outDir' holds root-level data files (${legacy.take(3).mkString(", ")}…); " +
        "the batch_id=<id> layout needs a clean or already-partitioned directory")
  }

  /** The `batch_id=<id>` fragment directories currently under outDir
    * (empty if the directory is missing or holds none) — the read-side
    * twin of the write guard, and the existence check that lets a
    * reader set up BEFORE the stream's first non-empty batch commits.
    */
  def batchDirs(spark: SparkSession, outDir: String): Seq[String] = {
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
        st.getPath.toString
    }
  }

  /** Every ingested row under outDir with the batch_id partition column
    * dropped — or an EMPTY frame of `schema` when no batch has
    * committed yet (ingest skips empty batches, so a reader set up
    * before first data would otherwise die on schema inference).
    */
  def readFragments(spark: SparkSession, outDir: String, schema: StructType): DataFrame = {
    if (batchDirs(spark, outDir).isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(outDir).drop("batch_id").select(
      schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
  }
}
