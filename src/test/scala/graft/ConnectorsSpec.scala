package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Connectors

class ConnectorsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("csv round-trip preserves rows and header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    Connectors.writeCsv(df, dir)
    val back = Connectors.readCsv(spark, dir)
    assert(back.columns.toSeq == Seq("id", "name"))
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("1", "a"), ("2", "b"))) // inferSchema off: strings, deterministic
  }
}
