package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Linear quantile regression by pinball-loss subgradient descent
  * (Koenker/Bassett 1978, Econometrica — "Regression Quantiles"): fit
  * ŷ = θ0 + θ1·x minimizing Σ ρ_τ(y − ŷ), ρ_τ(u) = u·(τ − 1[u<0]).
  * Where OLS (q106) gives the conditional MEAN and the exact/sketch
  * quantile operators give MARGINAL quantiles, this is the conditional
  * quantile — "the p90 of value as a function of hour", the
  * heteroscedasticity read none of the others can make.
  *
  * Engine discipline is the q171 classifier's exactly: each iteration
  * is ONE map-side-combined aggregation over the cached feature frame
  * (two decimal-backed subgradient sums), the 2-parameter model
  * round-trips through the driver as literals, and — better than the
  * classifier — the subgradient τ − 1[y < ŷ] is PURE COMPARISON
  * ARITHMETIC (no sigmoid, no libm anywhere), so the DuckDB replay of
  * the whole trajectory is exact by construction. Parameters round at
  * 12 dp per step; the unrolled-CTE oracle mirrors each stage.
  */
object QuantileReg {

  val Lr = 100.0
  val Iters = 15

  /** One subgradient term: τ − 1[y < θ0 + θ1·x], θs as columns. */
  private def term(tau: Double, t0: Column, t1: Column): Column =
    lit(tau) - when(col("y") < t0 + t1 * col("x"), lit(1.0))
      .otherwise(lit(0.0))

  /** Fits ALL τs simultaneously on a cached (x, y) frame — the
    * trajectories are independent, so one aggregation per iteration
    * carries every τ's subgradient sums (2·|taus| decimal sums per
    * scan instead of |taus| separate scan loops). Returns the final
    * (θ0, θ1) per τ, order-aligned with `taus`.
    *
    * θs ride a broadcast 1-row frame instead of literals so the
    * subgradient plan compiles ONCE for all iterations (inlined literal
    * doubles defeat the codegen cache — a per-iteration janino
    * recompile of pure driver latency; see Classifier.fit). Same IEEE
    * ops on the same doubles ⇒ bit-identical trajectory.
    */
  private def fit(f: DataFrame, taus: Seq[Double], lr: Double,
      iters: Int): Seq[(Double, Double)] = {
    val n = count(lit(1)).cast("double")
    def p(j: Int) = col(s"_wp_$j")
    val aggs = taus.zipWithIndex.flatMap { case (tau, i) =>
      val t = term(tau, p(2 * i), p(2 * i + 1))
      Seq(
        round(max(p(2 * i)) + lit(lr) * (Num.dsumHi(t) / n), 12).as(s"t0_$i"),
        round(max(p(2 * i + 1)) + lit(lr) * (Num.dsumHi(t * col("x")) / n), 12).as(s"t1_$i"))
    }
    var ths: Seq[(Double, Double)] = taus.map(_ => (0.0, 0.0))
    for (_ <- 1 to iters) {
      val flat = ths.flatMap(th => Seq(th._1, th._2))
      val wdf = f.sparkSession.range(1)
        .select(flat.indices.map(j => lit(flat(j)).as(s"_wp_$j")): _*)
      val row = f.crossJoin(broadcast(wdf)).agg(aggs.head, aggs.tail: _*).head()
      require(!row.isNullAt(0), "empty frame: quantile regression needs rows")
      ths = taus.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
    }
    ths
  }

  /** Fits each τ and reports the model + its mean pinball loss (the
    * in-sample goodness read, decimal-summed). Output: one row per τ:
    * (tau, n, theta0, theta1, mean_pinball).
    */
  def fitQuantiles(df: DataFrame, xCol: String, yCol: String,
      taus: Seq[Double] = Seq(0.5, 0.9),
      lr: Double = Lr, iters: Int = Iters): DataFrame = {
    val f = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).cache()
    val ths = fit(f, taus, lr, iters)
    val fitted = taus.zip(ths).map { case (tau, th) =>
      val u = col("y") - (lit(th._1) + lit(th._2) * col("x"))
      val rho = u * (lit(tau) - when(u < 0, lit(1.0)).otherwise(lit(0.0)))
      f.agg(
        max(lit(tau)).as("tau"),
        count(lit(1)).as("n"),
        max(lit(th._1)).as("theta0"),
        max(lit(th._2)).as("theta1"),
        round(Num.dsumHi(rho) / count(lit(1)).cast("double"), 6).as("mean_pinball"))
    }
    fitted.reduce(_ unionByName _)
  }

  /** Unrolled-CTE oracle twin over relation f(x, y) — `fCte` supplies
    * it; one (g, w) stage pair per iteration per τ.
    */
  object O {
    def fitQuantiles(fCte: String, taus: Seq[Double] = Seq(0.5, 0.9),
        lr: Double = Lr, iters: Int = Iters): String = {
      def tag(tau: Double) = math.round(tau * 100).toString
      val stages = taus.flatMap { tau =>
        val tg = tag(tau)
        val w0 = s"w${tg}_0 AS (SELECT 0.0 AS t0, 0.0 AS t1)"
        val its = (1 to iters).map { i =>
          val t = s"($tau - CASE WHEN f.y < w.t0 + w.t1 * f.x THEN 1.0 ELSE 0.0 END)"
          s"""g${tg}_$i AS (SELECT w.t0, w.t1, CAST(COUNT(*) AS DOUBLE) AS n,
             |  ${Num.O.sumHi(t)} AS s0, ${Num.O.sumHi(s"$t * f.x")} AS s1
             |  FROM f CROSS JOIN w${tg}_${i - 1} w GROUP BY 1, 2),
             |w${tg}_$i AS (SELECT round(t0 + $lr * (s0 / n), 12) AS t0,
             |  round(t1 + $lr * (s1 / n), 12) AS t1 FROM g${tg}_$i)""".stripMargin
        }
        w0 +: its
      }
      val rows = taus.map { tau =>
        val tg = tag(tau)
        val u = "(f.y - (w.t0 + w.t1 * f.x))"
        val rho = s"($u * ($tau - CASE WHEN $u < 0 THEN 1.0 ELSE 0.0 END))"
        s"""SELECT CAST($tau AS DOUBLE) AS tau, COUNT(*) AS n,
           |  ANY_VALUE(w.t0) AS theta0, ANY_VALUE(w.t1) AS theta1,
           |  round(${Num.O.sumHi(rho)} / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pinball
           |FROM f CROSS JOIN w${tg}_$iters w""".stripMargin
      }
      s"""WITH f AS MATERIALIZED ($fCte),
         |${stages.mkString(",\n")}
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY tau""".stripMargin
    }
  }
}
