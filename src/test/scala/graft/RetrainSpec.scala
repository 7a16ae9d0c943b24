package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clustering, Similarity}

/** Quantizer retrain rotation (q275): proves the full
  * drop-AND-recover recall ordering on a SEPARATED synthetic corpus
  * (the driver corpus is near-isotropic, where a stale quantizer is
  * nearly as good as any — see the q275 scaladoc), and pins the
  * recovery gap on the driver data at both test scales.
  */
class RetrainSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val Dim = Similarity.Dim

  /** Deterministic jitter in [-eps, eps] per (vector, component) — a
    * real hash, NOT a linear congruence: a linear formula makes every
    * vector's jitter a translate of one sawtooth (fully correlated
    * across vectors), which un-scatters the stale assignments the test
    * is about.
    */
  private def jit(i: Long, d: Int, eps: Double): Float = {
    val h = scala.util.hashing.MurmurHash3.stringHash(s"$i:$d")
    (h.toDouble / Int.MaxValue * eps).toFloat
  }

  /** `n` vectors around unit basis direction `axis`, ids from `from`. */
  private def cluster(from: Long, n: Int, axis: Int, eps: Double): Seq[(Long, Array[Float])] =
    (0 until n).map { j =>
      val id = from + j
      (id, Array.tabulate(Dim)(d => (if (d == axis) 1f else 0f) + jit(id, d, eps)))
    }

  private def recallAt10(corpus: DataFrame, trained: DataFrame,
      queryPred: org.apache.spark.sql.Column): Double = {
    val exact = Similarity.bruteForceTopK(corpus, queryPred, 10)
      .select("query_id", "cand_id")
    val approx = Similarity.ivfTopK(corpus, queryPred, 10, trained = Some(trained))
      .select("query_id", "cand_id")
    val hits = exact.join(approx, Seq("query_id", "cand_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  test("separated corpus: recall drops under the drifted delta and recovers after retrain") {
    // base: 8 tight clusters on orthogonal axes e0..e7 (50 vectors
    // each); a 16-centroid quantizer resolves them all, so the healthy
    // operating point is near-perfect recall
    val base = (0 until 8).flatMap(c => cluster(c * 50L, 50, c, eps = 0.05))
    // drifted delta: 100 vectors around e8 — a direction the stale
    // quantizer never saw — with jitter LARGE enough that each member's
    // stale assignment is decided by its own noise (cosines to every
    // stale centroid are jitter-level), scattering true neighbors
    // across lists the probe set misses
    val delta = cluster(400L, 100, 8, eps = 0.30)
    val baseDf = base.toDF("vec_id", "embedding")
    val fullDf = (base ++ delta).toDF("vec_id", "embedding")
    val stale = Clustering.kmeans(baseDf,
      Similarity.IvfNlist, Similarity.IvfIters, Similarity.IvfTrainPct)
    stale.cache(); stale.count()
    val fresh = Clustering.kmeans(fullDf,
      Similarity.IvfNlist, Similarity.IvfIters, Similarity.IvfTrainPct)
    fresh.cache(); fresh.count()
    // one query per base cluster / ten delta queries
    val baseQ = col("vec_id") % 50 === 0
    val deltaQ = col("vec_id") >= 400L && col("vec_id") < 410L
    val before = recallAt10(baseDf, stale, baseQ)
    val staleAfter = recallAt10(fullDf, stale, deltaQ)
    val retrained = recallAt10(fullDf, fresh, deltaQ)
    info(f"before=$before%.3f staleAfter=$staleAfter%.3f retrained=$retrained%.3f")
    assert(before >= 0.8, s"healthy operating point should be near-perfect, got $before")
    assert(staleAfter <= before - 0.3,
      s"drift must break the stale quantizer: $staleAfter vs before $before")
    assert(retrained >= staleAfter + 0.3,
      s"retrain must recover: $retrained vs stale $staleAfter")
  }

  test("driver data: the retrained quantizer beats the stale one at both scales") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.warehouse.PipelineQueries.retrainRecall(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      assert(rows.keySet == Set("1_before_drift", "2_stale_after_drift", "3_after_retrain"))
      assert(rows("3_after_retrain") > rows("2_stale_after_drift"),
        s"$dir: recovery gap missing: $rows")
    }
  }
}
