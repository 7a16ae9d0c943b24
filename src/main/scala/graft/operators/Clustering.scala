package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Num, Vec}

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

  /** Deterministic FIXED-SIZE seeding: the k members with the smallest
    * portable key hash (md5-derived, ties by vec_id) — a hash-random
    * draw both engines reproduce bit-for-bit. k is a constant (or
    * sublinear) in the corpus size, so everything downstream that
    * broadcasts the centroid table stays O(k·dim) no matter how large
    * the corpus grows — a billion vectors still yield exactly k seeds.
    * (Round-2's `vec_id % step` seeding made k linear in n: an O(n)
    * broadcast and O(n²/step) assignment at scale.)
    */
  def seedCentroids(emb: DataFrame, k: Int): DataFrame =
    emb
      .orderBy(Hashes.md5Long32(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("cemb"))

  /** Lloyd's k-means with deterministic hash seeding and an optional
    * hash-sampled training subset (`trainPct` < 100): the quantizer is
    * trained on a sample — the full corpus is only ever ASSIGNED, never
    * used to update means — which is how a real IVF coarse quantizer is
    * fit at scale. Returns the final (cluster_id, cemb). Iterations
    * localCheckpoint so the plan does not grow (same lesson as
    * Dedup.connectedComponents).
    */
  def kmeans(emb: DataFrame, k: Int = 16, iters: Int = 5, trainPct: Int = 100): DataFrame = {
    val train = (if (trainPct >= 100) emb else Sampling.hashSample(emb, "vec_id", trainPct))
      .select("vec_id", "embedding")
    var centroids = seedCentroids(train, k).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val prev = centroids
      centroids = step(train, centroids).localCheckpoint(true)
      prev.unpersist()
    }
    centroids
  }
}
