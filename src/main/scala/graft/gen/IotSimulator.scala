package graft.gen

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.SensorEvent

/** Deterministic seeded sensor-event generator (reference:
  * iot_simulator.py:22-204; profiles FIXTURES.md A6): 5 devices with
  * per-device base/variation/anomaly-rate, a ±10% sinusoidal daily
  * pattern peaking at 18:00, clamping (humidity 0..100, energy >= 0),
  * anomaly offsets of ±(3-5)x variation, and quality 90-100 normal /
  * 70-90 anomalous.
  *
  * Used by tests and stream demos; generation is driver-side by design
  * (tiny volumes). For bulk synthetic data use spark.range + expressions.
  */
object IotSimulator {

  final case class DeviceProfile(
      id: String, deviceType: String, unit: String,
      base: Double, variation: Double, anomalyRate: Double)

  val Devices: Seq[DeviceProfile] = Seq(
    DeviceProfile("TEMP-001", "temperature", "C", 22.0, 3.0, 0.02),
    DeviceProfile("TEMP-002", "temperature", "C", 20.0, 2.5, 0.02),
    DeviceProfile("HUM-001", "humidity", "%", 50.0, 10.0, 0.03),
    DeviceProfile("MOT-001", "motion", "boolean", 0.0, 1.0, 0.0),
    DeviceProfile("ENR-001", "energy", "kWh", 100.0, 20.0, 0.01))

  /** Daily sinusoid in [0.9, 1.1] peaking at hour 18 (iot_simulator.py:89-91). */
  private def dailyFactor(hourOfDay: Double): Double =
    1.0 + 0.1 * math.sin((hourOfDay - 12.0) * math.Pi / 12.0)

  def generate(seed: Long, start: Timestamp, count: Int, intervalSeconds: Int = 1): Seq[SensorEvent] = {
    val rnd = new Random(seed)
    (0 until count).map { i =>
      val d = Devices(i % Devices.length)
      val t = new Timestamp(start.getTime + i.toLong * intervalSeconds * 1000)
      val hour = (t.getTime / 1000 % 86400) / 3600.0
      val isAnomaly = d.anomalyRate > 0 && rnd.nextDouble() < d.anomalyRate
      val raw =
        if (d.deviceType == "motion") if (rnd.nextDouble() < 0.3) 1.0 else 0.0
        else {
          val base = d.base * dailyFactor(hour) + (rnd.nextDouble() * 2 - 1) * d.variation
          if (isAnomaly) base + math.signum(rnd.nextDouble() - 0.5) * (3 + rnd.nextDouble() * 2) * d.variation
          else base
        }
      val clamped = d.deviceType match {
        case "humidity" => math.max(0.0, math.min(100.0, raw))
        case "energy" => math.max(0.0, raw)
        case _ => raw
      }
      val quality = if (isAnomaly) 70 + rnd.nextInt(21) else 90 + rnd.nextInt(11)
      SensorEvent(t, d.id, d.deviceType, math.round(clamped * 100) / 100.0, d.unit,
        quality, isAnomaly, s"""{"simulator_version":"1.0","seq":$i}""")
    }
  }

  def generateDF(spark: SparkSession, seed: Long, start: Timestamp, count: Int,
      intervalSeconds: Int = 1): DataFrame = {
    import spark.implicits._
    generate(seed, start, count, intervalSeconds).toDF()
  }
}
