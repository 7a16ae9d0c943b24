package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
trait TestSpark {
  lazy val spark: SparkSession = TestSpark.session
}

object TestSpark {
  lazy val session: SparkSession = {
    val s = graft.core.GraftSession
      .builder(master = "local[4]", shufflePartitions = 4, appName = "graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
