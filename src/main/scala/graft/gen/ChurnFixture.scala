package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic telecom-churn practice fixture (reference:
  * generate_practice_data.py:6-135 — the optional analysis dataset the
  * reference ships beside the pipeline). Re-expressed Spark-first:
  * `spark.range` + md5-derived uniforms instead of a driver-side numpy
  * array build, so the same generator that makes 3k practice rows makes
  * 3B without touching the driver — and, unlike seeded-PRNG rows, every
  * field is a pure function of (seed, customer id), independent of
  * partitioning, task order, or cluster size.
  *
  * Semantics preserved from the reference:
  *  - dependent fields: MultipleLines = 'No phone service' without
  *    phone; all six add-ons = 'No internet service' without internet
  *    (generate_practice_data.py:25-43);
  *  - MonthlyCharges built additively from the subscribed services with
  *    noise and the 18.25 floor (:52-71), TotalCharges ≈ monthly·tenure
  *    with noise (:73-76);
  *  - churn probability = 0.15 base, raised by month-to-month/fiber/
  *    e-check/paperless/senior and lowered by tenure/two-year/support/
  *    security/dependents/partner, clipped to [0,1] (:79-99);
  *  - ~1.5% of TotalCharges nulled as the planted data-quality issue
  *    (:102-110).
  */
object ChurnFixture {

  private val Two32 = 4294967296.0 // 2^32; md5Long32 is uniform on [0, 2^32)

  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    // one deterministic uniform per (seed, field, customer)
    def u(tag: String): Column =
      Hashes.md5Long32(concat_ws(":", lit(seed), lit(tag), col("id"))) / lit(Two32)
    // weighted categorical via cumulative thresholds on the field's uniform
    def pick(tag: String, choices: Seq[(String, Double)]): Column = {
      require(math.abs(choices.map(_._2).sum - 1.0) < 1e-9,
        s"weights for '$tag' must sum to 1: $choices")
      val cum = choices.scanLeft(0.0)(_ + _._2).tail
      choices.map(_._1).zip(cum).init.foldRight(lit(choices.last._1): Column) {
        case ((v, c), rest) => when(u(tag) < c, v).otherwise(rest)
      }
    }
    def yesNo(tag: String, pYes: Double): Column = pick(tag, Seq("Yes" -> pYes, "No" -> (1 - pYes)))
    // gaussian via Box-Muller over two field uniforms (clamped away from ln(0))
    def gauss(tag: String, mean: Double, sd: Double): Column =
      lit(mean) + lit(sd) * sqrt(lit(-2.0) * log(greatest(u(tag + ".g1"), lit(1e-12)))) *
        cos(lit(2.0 * math.Pi) * u(tag + ".g2"))

    val base = spark.range(1, n + 1).toDF("id")
      .withColumn("customerID", format_string("CUST-%05d", col("id")))
      .withColumn("gender", pick("gender", Seq("Male" -> 0.5, "Female" -> 0.5)))
      .withColumn("SeniorCitizen", when(u("senior") < 0.15, 1).otherwise(0))
      .withColumn("Partner", yesNo("partner", 0.48))
      .withColumn("Dependents", yesNo("dependents", 0.30))
      .withColumn("tenure", (u("tenure") * 71).cast("int") + 1) // 1..71 months
      .withColumn("PhoneService", yesNo("phone", 0.9))
      .withColumn("MultipleLines",
        when(col("PhoneService") === "No", "No phone service")
          .otherwise(yesNo("lines", 0.4)))
      .withColumn("InternetService",
        pick("internet", Seq("DSL" -> 0.35, "Fiber optic" -> 0.40, "No" -> 0.25)))

    val withAddons = Seq(
      ("OnlineSecurity", 0.30), ("OnlineBackup", 0.35), ("DeviceProtection", 0.30),
      ("TechSupport", 0.30), ("StreamingTV", 0.40), ("StreamingMovies", 0.40))
      .foldLeft(base) { case (df, (name, p)) =>
        df.withColumn(name,
          when(col("InternetService") === "No", "No internet service")
            .otherwise(yesNo(name, p)))
      }

    val withAccount = withAddons
      .withColumn("Contract",
        pick("contract", Seq("Month-to-month" -> 0.55, "One year" -> 0.25, "Two year" -> 0.20)))
      .withColumn("PaperlessBilling", yesNo("paperless", 0.6))
      .withColumn("PaymentMethod", pick("payment", Seq(
        "Electronic check" -> 0.25, "Mailed check" -> 0.25,
        "Bank transfer (automatic)" -> 0.25, "Credit card (automatic)" -> 0.25)))

    def svc(c: String, fee: Double): Column = when(col(c) === "Yes", fee).otherwise(0.0)
    val monthly = greatest(round(
      gauss("basecharge", 20.0, 5.0)
        + svc("PhoneService", 20) + svc("MultipleLines", 10)
        + when(col("InternetService") === "Fiber optic", 30.0)
          .when(col("InternetService") === "DSL", 15.0).otherwise(0.0)
        + svc("OnlineSecurity", 5) + svc("OnlineBackup", 5) + svc("DeviceProtection", 5)
        + svc("TechSupport", 5) + svc("StreamingTV", 10) + svc("StreamingMovies", 10)
        + gauss("chargenoise", 0.0, 2.0), 2), lit(18.25))

    val churnProb = {
      val p = lit(0.15) +
        when(col("Contract") === "Month-to-month", 0.4).otherwise(0.0) +
        when(col("InternetService") === "Fiber optic", 0.15).otherwise(0.0) +
        when(col("PaymentMethod") === "Electronic check", 0.1).otherwise(0.0) +
        when(col("PaperlessBilling") === "Yes", 0.05).otherwise(0.0) +
        when(col("SeniorCitizen") === 1, 0.1).otherwise(0.0) -
        when(col("tenure") > 24, 0.1).otherwise(0.0) -
        when(col("tenure") > 48, 0.1).otherwise(0.0) -
        when(col("Contract") === "Two year", 0.3).otherwise(0.0) -
        when(col("TechSupport") === "Yes", 0.15).otherwise(0.0) -
        when(col("OnlineSecurity") === "Yes", 0.1).otherwise(0.0) -
        when(col("Dependents") === "Yes", 0.05).otherwise(0.0) -
        when(col("Partner") === "Yes", 0.05).otherwise(0.0)
      least(greatest(p, lit(0.0)), lit(1.0))
    }

    withAccount
      .withColumn("MonthlyCharges", monthly)
      .withColumn("TotalCharges",
        // ~1.5% planted missing values (reference :102-110); otherwise
        // |monthly·tenure + noise| rounded to cents
        when(u("missing") < 0.015, lit(null).cast("double"))
          .otherwise(round(abs(col("MonthlyCharges") * col("tenure")
            + gauss("totalnoise", 0.0, 10.0)), 2)))
      .withColumn("Churn", when(u("churn") < churnProb, "Yes").otherwise("No"))
      .drop("id")
  }

  /** The reference's CSV artifact (`telecom_customer_churn_practice.csv`). */
  def writeCsv(spark: SparkSession, path: String, n: Long = 3000L, seed: Long = 42L): Unit =
    graft.sources.Connectors.writeCsv(generate(spark, n, seed), path)
}
