package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Connector builders for the reference's source/sink surface beyond
  * parquet (SURVEY §2.1): JDBC (S1-S4, S8-S10), CSV (S15), Kafka batch
  * writes (S13 harness side). JDBC/Kafka have no test infrastructure in
  * this container — the builders mirror the reference's options and are
  * exercised only for CSV here.
  */
object Connectors {

  /** JDBC scan; `partitionColumn` enables the reference's 4-way parallel
    * range read (spark_extract.py:74-81). At scale, numPartitions should
    * track executor count and bounds should come from a min/max probe.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 1L,
      upperBound: Long = 1000000L,
      numPartitions: Int = 4): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn
      .map(c => base
        .option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions))
      .getOrElse(base)
      .load()
  }

  /** JDBC pushdown scan: arbitrary SQL evaluated at the source
    * (spark_extract.py:128-163).
    */
  def readJdbcQuery(spark: SparkSession, url: String, sql: String,
      user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", sql)
      .option("user", user).option("password", password)
      .load()

  /** JDBC batch sink (spark_load.py:28-65). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, mode: SaveMode = SaveMode.Append): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** CSV with header + schema inference off by default (deterministic). */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = false): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** Kafka batch producer (test-harness side of S13). */
  def writeKafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
}
