package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic content-hash sampling and dataset splitting — the
  * reproducibility primitives a training-data pipeline needs that
  * seeded `df.sample()` cannot give: membership here is a pure function
  * of the row's key, so it is stable across engines, runs, partitionings,
  * cluster sizes, and incremental re-ingestion (a document keeps its
  * split forever, even when the corpus around it changes).
  *
  * Scale design: pure narrow projections/filters (one md5 per row, no
  * shuffle, codegen'd); the filter pushes down past column pruning like
  * any other predicate.
  */
object Sampling {

  val Buckets = 100

  /** Stable bucket in [0, 100) from the md5 of the key. */
  def hashBucket(key: Column): Column =
    Hashes.md5Long32(key.cast("string")) % Buckets

  /** Keep ~keepPct% of rows, selected by key hash (deterministic). */
  def hashSample(df: DataFrame, keyCol: String, keepPct: Int): DataFrame =
    df.withColumn("bucket", hashBucket(col(keyCol)).cast("int"))
      .filter(col("bucket") < keepPct)

  /** Stratified hash sampling: a different deterministic keep-rate per
    * stratum (e.g. downsample boilerplate-heavy sources hard, keep
    * high-quality ones whole — the standard corpus-mixing primitive).
    * Same purity guarantees as hashSample: membership is a function of
    * (key, stratum rate) only — stable across runs, partitionings, and
    * incremental re-ingestion. Narrow projection + filter; no shuffle.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (els, (s, pct)) =>
      when(col(strataCol) === s, lit(pct)).otherwise(els)
    }
    df.withColumn("bucket", hashBucket(col(keyCol)).cast("int"))
      .withColumn("keep_pct", rate)
      .filter(col("bucket") < col("keep_pct"))
  }

  /** Assign a stable train/val/test split by key hash. */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** DuckDB oracle fragments (identical md5 arithmetic). */
  object O {
    def hashBucket(key: String): String =
      s"(${Hashes.O.md5Long32(s"CAST($key AS VARCHAR)")} % $Buckets)"
    def strataRate(strataCol: String, rates: Map[String, Int], defaultPct: Int): String =
      rates.toSeq.sortBy(_._1)
        .map { case (s, pct) => s"WHEN $strataCol = '$s' THEN $pct" }
        .mkString("CASE ", " ", s" ELSE $defaultPct END")
    def split(key: String, trainPct: Int = 80, valPct: Int = 10): String =
      s"""CASE WHEN ${hashBucket(key)} < $trainPct THEN 'train'
         |     WHEN ${hashBucket(key)} < ${trainPct + valPct} THEN 'val'
         |     ELSE 'test' END""".stripMargin
  }
}
