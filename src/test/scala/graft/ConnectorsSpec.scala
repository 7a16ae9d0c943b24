package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Connectors

class ConnectorsSpec extends AnyFunSuite with TestSpark {

  test("extractAll tolerates a missing source, requireAll enforces") {
    val got = graft.sources.Sources.extractAll(spark, "/root/testdata/sf0.001")
    assert(got("events").isDefined && got("lineitem").isDefined)
    val broken = graft.sources.Sources.extractAll(spark, "/no/such/dir")
    assert(broken.values.forall(_.isEmpty))
    intercept[IllegalStateException] {
      graft.sources.Sources.requireAll(broken, "events")
    }
  }

  test("kafka json write-side serialization round-trips through the parser") {
    import java.sql.Timestamp
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val events = Seq(graft.model.SensorEvent(
      new Timestamp(1704067230000L), "TEMP-001", "temperature", 22.5, "C", 97, false,
      """{"v":"1"}""")).toDF()
    val wire = graft.streaming.KafkaJsonSource.toJson(events)
    assert(wire.columns.toSeq == Seq("key", "value"))
    assert(wire.head.getString(0) == "TEMP-001")
    // parse the produced wire value back (simulating the broker hop)
    val back = graft.streaming.KafkaJsonSource.parseJson(
      wire.select($"value", lit(new Timestamp(0L)).as("timestamp")))
    val r = back.select("time", "device_id", "value", "quality_score").head
    assert(r.getTimestamp(0) == new Timestamp(1704067230000L))
    assert(r.getString(1) == "TEMP-001" && r.getDouble(2) == 22.5 && r.getInt(3) == 97)
  }
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

  test("json-lines round-trip with a pinned schema") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    Connectors.writeJsonLines(df, dir)
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Connectors.readJsonLines(spark, dir, Some(schema))
    assert(back.schema == schema) // pinned, not inferred
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("json-lines source captures malformed rows instead of failing (PERMISSIVE)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      java.util.Arrays.asList(
        """{"id":1,"v":"ok"}""",
        """{"id":2,"v":}""", // malformed — must not kill the read
        """{"id":3,"v":"fine"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val rows = Connectors.readJsonLines(spark, dir.toString, Some(schema)).collect()
    assert(rows.length == 3) // nothing dropped
    val bad = rows.filter(!_.isNullAt(2))
    assert(bad.length == 1 && bad.head.isNullAt(0)) // quarantined, typed cols null
    assert(bad.head.getString(2).contains(""""id":2"""))
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    // v1 writer: (id, a); v2 writer adds column b
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/p=1")
    Seq((2L, "y", 9.5)).toDF("id", "a", "b").write.parquet(s"$dir/p=2")
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("id", "a", "b", "p"))
    val rows = back.select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSet == Set((1L, "x", None), (2L, "y", Some(9.5))))
  }

  test("orc round-trip preserves schema and rows") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Connectors.writeOrc(df, dir)
    val back = Connectors.readOrc(spark, dir)
    // files read back nullable; names/types must survive exactly
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }
}
