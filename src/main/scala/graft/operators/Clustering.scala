package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Num, Vec}

/** Distributed embedding clustering: element-wise centroid aggregation
  * and Lloyd's k-means over DataFrames — the missing piece between the
  * near-dup family (pairwise) and IVF ANN (which needs a trained coarse
  * quantizer).
  *
  * Scale design: centroids are always the small side — broadcast to the
  * assignment join (no shuffle of the corpus). The mean update is
  * posexplode → one hash aggregation keyed by (cluster, dim): shuffle
  * volume is k × dim rows of partial sums per executor (map-side
  * combine), NOT the corpus. Per-dimension sums are decimal-backed
  * (graft.Num) so centroids are bit-reproducible under any
  * partitioning — iteration trajectories can be replayed exactly.
  */
object Clustering {

  /** Nearest-centroid assignment by cosine (ties → lowest cluster_id).
    * `centroids`: (cluster_id, cemb) with unit-free vectors.
    */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val n = emb.select(col("vec_id"), col("embedding"),
      sqrt(Vec.dotFast(col("embedding"), col("embedding"))).as("nrm"))
    val c = centroids.select(col("cluster_id"), col("cemb"),
      sqrt(Vec.dotFast(col("cemb"), col("cemb"))).as("cnrm"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos_c"), col("cluster_id"))
    n.crossJoin(broadcast(c))
      .withColumn("cos_c", Vec.dotFast(col("embedding"), col("cemb")) / (col("nrm") * col("cnrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cluster_id"), col("cos_c"))
  }

  /** Element-wise mean per group in long form: one row per (group, dim)
    * with a decimal-exact mean — the deterministic centroid shape (also
    * the oracle-checkable one).
    */
  def centroidsLong(emb: DataFrame, groupCol: String): DataFrame =
    emb
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n_vecs"), Num.davg(col("v").cast("double")).as("avg_val"))

  /** Long-form centroids reassembled into float vectors (cluster_id,
    * cemb) for the next assignment round.
    */
  private def reassemble(long: DataFrame, groupCol: String): DataFrame =
    long
      .groupBy(col(groupCol).as("cluster_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("avg_val")))),
        x => x.getField("avg_val").cast("float")).as("cemb"))

  /** One Lloyd iteration: assign to nearest centroid, recompute means. */
  def step(emb: DataFrame, centroids: DataFrame): DataFrame =
    reassemble(centroidsLong(assign(emb, centroids), "cluster_id"), "cluster_id")

  /** Lloyd's k-means with a deterministic seed: every `seedStep`-th
    * vec_id starts a cluster (k grows with the corpus, like IVF nlist).
    * Returns the final (cluster_id, cemb). Iterations localCheckpoint so
    * the plan does not grow (same lesson as Dedup.connectedComponents).
    */
  def kmeans(emb: DataFrame, seedStep: Int = 31, iters: Int = 5): DataFrame = {
    var centroids = emb.filter(col("vec_id") % seedStep === 0)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("cemb"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val prev = centroids
      centroids = step(emb, centroids).localCheckpoint(true)
      prev.unpersist()
    }
    centroids
  }
}
