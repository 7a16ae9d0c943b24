package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gen.{ChurnFixture, IotSimulator}
import graft.streaming.StreamMonitor

/** The two remaining reference-surface fixtures: the seeded telecom-churn
  * practice dataset (generate_practice_data.py) and the S14 monitoring
  * consumer's summary aggregation.
  */
class ChurnMonitorSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("churn fixture is deterministic and partitioning-independent") {
    val a = ChurnFixture.generate(spark, 500).orderBy("customerID").collect()
    val b = ChurnFixture.generate(spark, 500).repartition(13).orderBy("customerID").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
    assert(a.head.getString(0) == "CUST-00001")
  }

  test("churn fixture preserves the reference's dependent-field semantics") {
    val df = ChurnFixture.generate(spark, 2000).cache()
    // MultipleLines is 'No phone service' exactly when PhoneService = No
    assert(df.filter(col("PhoneService") === "No"
      && col("MultipleLines") =!= "No phone service").count() == 0)
    assert(df.filter(col("PhoneService") === "Yes"
      && col("MultipleLines") === "No phone service").count() == 0)
    // all six add-ons collapse to 'No internet service' without internet
    for (addon <- Seq("OnlineSecurity", "OnlineBackup", "DeviceProtection",
        "TechSupport", "StreamingTV", "StreamingMovies")) {
      assert(df.filter(col("InternetService") === "No"
        && col(addon) =!= "No internet service").count() == 0, addon)
    }
    // charges floor and tenure domain
    assert(df.filter(col("MonthlyCharges") < 18.25).count() == 0)
    assert(df.filter(col("tenure") < 1 || col("tenure") > 71).count() == 0)
    // ~1.5% planted missing TotalCharges (3σ band for n=2000)
    val missing = df.filter(col("TotalCharges").isNull).count()
    assert(missing > 10 && missing < 55, s"missing=$missing")
    df.unpersist()
  }

  test("churn fixture plants the discoverable churn patterns") {
    val df = ChurnFixture.generate(spark, 5000).cache()
    def rate(cond: org.apache.spark.sql.Column): Double = {
      val g = df.filter(cond)
      g.filter(col("Churn") === "Yes").count().toDouble / g.count()
    }
    // the signals an analyst is meant to find (reference :79-99)
    assert(rate(col("Contract") === "Month-to-month") > rate(col("Contract") === "Two year") + 0.2)
    assert(rate(col("tenure") > 48) < rate(col("tenure") <= 24))
    assert(rate(col("TechSupport") === "Yes") < rate(col("TechSupport") === "No"))
    df.unpersist()
  }

  test("monitor summary: running counters over a live file stream equal the batch aggregate") {
    val events = IotSimulator.generate(7L, new Timestamp(1704067200000L), 400)
    val dir = Files.createTempDirectory("graft-monitor").toString
    // land as JSONL via the Kafka wire format (the same bytes a topic would carry)
    val wire = graft.streaming.KafkaJsonSource.toJson(events.toDF())
    wire.select("value").coalesce(1).write.mode("overwrite").text(dir + "/drop")

    val parsed = spark.readStream
      .schema(graft.model.Schemas.SensorSchema).json(dir + "/drop")
      .withColumn("time", col("time").cast("timestamp"))
    val q = StreamMonitor.summarize(parsed).writeStream
      .outputMode("complete").format("memory").queryName("monitor_summary").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("monitor_summary")
      .select("device_type", "n_messages", "avg_value", "n_anomalies").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val expected = StreamMonitor.summarize(
      graft.streaming.KafkaJsonSource.parseJson(
        wire.withColumn("timestamp", lit(new Timestamp(0L)))))
      .select("device_type", "n_messages", "avg_value", "n_anomalies").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == 400L)
  }
}
