package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Approximate-nearest-neighbor search over an embedding column
  * (ArrayType(FloatType)).
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k; the query set is broadcast so
  *    the candidate side streams — the correct baseline shape when the
  *    query set is small (scoring is a codegen'd zip_with/aggregate
  *    fold, no UDF).
  *  - lshTopK: random-hyperplane (sign) LSH — vectors bucketed by the
  *    sign pattern of dot products with deterministic md5-derived
  *    hyperplanes; candidates come from an equality join on the bucket
  *    id. At 100 TB this is the scale path: the bucket join replaces the
  *    cartesian product, and buckets can be made hierarchical (IVF-style)
  *    by adding planes.
  *
  * Hyperplane coefficients are derived from md5 (portable), so the DuckDB
  * oracle reproduces the identical buckets bit-for-bit.
  */
object Similarity {

  val LshPlanes = 5 // 2^5 = 32 buckets
  val Dim = 64 // testdata embedding dimension

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** coef(h,d) = (first32bits(md5("h:d")) % 2001 - 1000) / 1000 in [-1, 1]. */
  def planeCoef(h: Int, d: Int): Double =
    (java.lang.Long.parseLong(md5Hex(s"$h:$d").take(8), 16) % 2001 - 1000) / 1000.0

  private def planeLit(h: Int): Column =
    array((1 to Dim).map(d => lit(planeCoef(h, d))): _*)

  /** Sign-LSH bucket id for an embedding column. */
  def bucketOf(emb: Column): Column =
    (0 until LshPlanes)
      .map(h => when(Vec.dot(planeLit(h), emb) >= 0, shiftleft(lit(1L), h)).otherwise(0L))
      .reduce(_ + _)

  /** Exact cosine top-k for a small query set (broadcast). Norms are
    * precomputed per vector (one fold instead of three per pair; the
    * dot/(n1*n2) arithmetic is bit-identical to inline cosine).
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred).select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), sqrt(Vec.dotFast(col("embedding"), col("embedding"))).as("qn"))
    val c = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), sqrt(Vec.dotFast(col("embedding"), col("embedding"))).as("cn"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cosine_sim", round(Vec.dotFast(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine_sim"), col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cosine_sim", "rank")
  }

  /** LSH-bucketed cosine top-k: candidates share the query's bucket. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucketOf(col("embedding")))
      .withColumn("nrm", sqrt(Vec.dotFast(col("embedding"), col("embedding"))))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("nrm").as("cn"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine_sim", round(Vec.dotFast(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine_sim"), col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "bucket", "cosine_sim", "rank")
  }

  val IvfCentStep = 31 // centroids = vectors with vec_id % 31 == 0 (nlist grows with n)
  val IvfProbes = 4 // coarse lists searched per query

  /** IVF-style ANN: a deterministic coarse quantizer (every 31st vec_id
    * is a centroid — the list count grows with the corpus, like a real
    * IVF nlist) assigns each vector to its nearest centroid; a query
    * scores only the vectors in its `IvfProbes` nearest lists. The
    * centroid table is tiny and broadcast; the only big shuffle is the
    * candidate join keyed on cent_id. Ties in the argmax break on
    * cent_id — cosines are bit-identical across engines (sequential
    * folds), so the assignment is reproducible.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val n = emb.select(col("vec_id"), col("embedding"),
      sqrt(Vec.dotFast(col("embedding"), col("embedding"))).as("nrm"))
    val centroids = n.filter(col("vec_id") % IvfCentStep === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))
    val toCent = n.crossJoin(broadcast(centroids))
      .withColumn("cos_c", Vec.dotFast(col("embedding"), col("cemb")) / (col("nrm") * col("cnrm")))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("cos_c"), col("cent_id"))
    val ranked = toCent.withColumn("crn", row_number().over(wAssign))
    val assigned = ranked.filter(col("crn") === 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("nrm").as("cn"), col("cent_id"))
    val probes = ranked.filter(queryPred && col("crn") <= IvfProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cent_id"))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine_sim", round(Vec.dotFast(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine_sim"), col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cent_id", "cosine_sim", "rank")
  }

  /** Embedding near-duplicate pairs within a blocking key (label):
    * cosine above threshold. The block join keeps the pair space keyed.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val n = emb.withColumn("nrm", sqrt(Vec.dotFast(col("embedding"), col("embedding"))))
    val a = n.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = n.select(col("label"), col("vec_id").as("v2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("v1") < col("v2"))
      .withColumn("cosine_sim", round(Vec.dotFast(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select("label", "v1", "v2", "cosine_sim")
  }

  /** DuckDB oracle fragments. */
  object O {
    /** Bucket expression over embedding column `e` (md5-derived planes
      * computed inline in SQL — identical doubles to planeCoef).
      */
    def bucket(e: String): String =
      (0 until LshPlanes).map { h =>
        val coef = s"((('0x' || substr(md5('$h:' || d), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)"
        val dot = s"list_reduce(list_transform(range(1, ${Dim + 1}), d -> $coef * CAST($e[d] AS DOUBLE)), (x, y) -> x + y)"
        s"(CASE WHEN $dot >= 0 THEN (CAST(1 AS BIGINT) << $h) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
  }
}
