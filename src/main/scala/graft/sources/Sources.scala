package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-source extract orchestration with per-source failure tolerance
  * (reference: spark_extract.py:165-214 returns None for a source whose
  * connection fails and lets the pipeline proceed with what it has).
  * The engine analog: every table resolves independently to
  * Some(frame)/None, and callers choose which absences are fatal.
  */
object Sources {

  /** Resolve every known table; a failing source yields None (logged)
    * instead of failing the whole extract.
    */
  def extractAll(spark: SparkSession, dir: String): Map[String, Option[DataFrame]] =
    Tables.all.map { name =>
      name -> Try(Tables(spark, dir, name)).recover { case e =>
        spark.sparkContext.setLogLevel("WARN")
        System.err.println(s"[sources] $name unavailable: ${e.getMessage}")
        throw e
      }.toOption
    }.toMap

  /** The sources the batch pipeline cannot run without. */
  def requireAll(extracted: Map[String, Option[DataFrame]], names: String*): Map[String, DataFrame] =
    names.map { n =>
      n -> extracted.getOrElse(n, None).getOrElse(
        throw new IllegalStateException(s"required source '$n' unavailable"))
    }.toMap
}
