package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  test("dot_product_d is callable from SQL (extension-injected)") {
    Seq((Array(1f, 2f), Array(3f, 4f)), (Array(1f), Array(1f, 2f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product_d(a, b) AS d FROM vecs ORDER BY d NULLS LAST").collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0)) // length mismatch → NULL, from SQL too
  }

  test("hll_md5 is callable from SQL and matches the Column API") {
    (1 to 1000).map(i => s"u$i").toDF("u").createOrReplaceTempView("hll_in")
    val sqlEst = spark.sql("SELECT hll_md5(u) AS e FROM hll_in").head.getDouble(0)
    val colEst = spark.table("hll_in")
      .agg(graft.functions.Sketch.hllMd5($"u")).head.getDouble(0)
    assert(sqlEst == colEst)
  }

  test("kmv_md5 is callable from SQL and matches the Column API") {
    (1 to 900).map(i => s"k${i % 300}").toDF("t").createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql("SELECT kmv_md5(t, 64) AS s FROM kmv_in").head.getSeq[Long](0)
    val viaCol = spark.table("kmv_in")
      .agg(graft.functions.Sketch.kmvMd5($"t", 64)).head.getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.size == 64)
  }

  test("cms_md5 is callable from SQL and matches the Column API") {
    (1 to 500).map(i => s"w${i % 61}").toDF("w").createOrReplaceTempView("cms_in")
    val viaSql = spark.sql("SELECT cms_md5(w) AS c FROM cms_in").head.getSeq[Long](0)
    val viaCol = spark.table("cms_in")
      .agg(graft.functions.Sketch.cmsMd5($"w")).head.getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("topk_by_score is callable from SQL and matches the Column API") {
    (1L to 100L).map(i => (i % 3, i.toDouble, i)).toDF("g", "s", "id")
      .createOrReplaceTempView("topk_in")
    val viaSql = spark.sql(
      "SELECT g, topk_by_score(s, id, 2) AS t FROM topk_in GROUP BY g ORDER BY g").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))).toMap
    val viaCol = spark.table("topk_in").groupBy("g")
      .agg(graft.functions.Sketch.topKByScore($"s", $"id", 2).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))).toMap
    assert(viaSql == viaCol)
    assert(viaSql(0L) == Seq(99L, 96L)) // 99.0 then 96.0
  }

  test("jaro_winkler is callable from SQL and matches the published values") {
    Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("duane", "dwayne"),
      ("abc", "xyz"), ("", ""), ("same", "same")
    ).toDF("a", "b").createOrReplaceTempView("jw_in")
    val r = spark.sql("SELECT round(jaro_winkler(a, b), 6) AS s FROM jw_in").collect()
      .map(_.getDouble(0)).toSeq
    // Winkler 1990's worked examples + the conventions that matter:
    // either-empty (incl. empty-empty) scores 0, identity scores 1
    assert(r == Seq(0.961111, 0.813333, 0.84, 0.0, 0.0, 1.0), r.toString)
  }

  test("damerau_levenshtein is the FULL variant, callable from SQL") {
    Seq(
      ("ca", "abc"), // FULL-DL distinguisher: 2 (OSA would say 3)
      ("ab", "ba"), ("kitten", "sitting"), ("", "abc"), ("same", "same")
    ).toDF("a", "b").createOrReplaceTempView("dl_in")
    val r = spark.sql("SELECT damerau_levenshtein(a, b) AS d FROM dl_in").collect()
      .map(_.getInt(0)).toSeq
    assert(r == Seq(2, 1, 3, 3, 0), r.toString)
  }

  test("optimizer rule rewrites the zip_with/aggregate fold to dot_product_d") {
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),
      (Array(1f), Array(1f, 2f)) // mismatch — both forms must yield NULL
    ).toDF("a", "b")
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // literal input, so the optimized plan keeps the projection
    val q = df.repartition(2).select(graft.functions.Vec.dot($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product_d"),
      q.queryExecution.optimizedPlan.toString)
    val r = q.orderBy($"d".desc_nulls_last).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    // double arrays keep the generic fold — the rule is float-only
    val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .repartition(2).select(graft.functions.Vec.dot($"a", $"b").as("d"))
    assert(!dd.queryExecution.optimizedPlan.toString.contains("dot_product_d"))
    assert(dd.head.getDouble(0) == 11.0)
  }

  test("band join rewrite: |a-b| <= w joins bucket to an equi join, results identical") {
    val rng = new scala.util.Random(13)
    val lRows = List.tabulate(300)(i => (i.toLong, rng.nextInt(5000).toLong))
    val rRows = List.tabulate(300)(i => (1000L + i, rng.nextInt(5000).toLong))
    val l = lRows.toDF("lid", "lt").repartition(3)
    val r = rRows.toDF("rid", "rt").repartition(3)
    val q = l.join(r, org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 60)
      .select("lid", "rid")
    // the rewrite fires: equi join machinery, no nested-loop scan of the pair space
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("__graft_band"), p.take(1500))
    val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val exp = (for {
      a <- lRows; b <- rRows if math.abs(a._2 - b._2) <= 60
    } yield (a._1, b._1)).toSet
    assert(got == exp, s"got ${got.size} vs expected ${exp.size}")

    // a join that already has an equi key is left alone (no bucket column)
    val l2 = lRows.toDF("lid", "lt").withColumn("k", $"lid" % 3).repartition(3)
    val r2 = rRows.toDF("rid", "rt").withColumn("k", $"rid" % 3).repartition(3)
    val q2 = l2.join(r2, l2("k") === r2("k") &&
      org.apache.spark.sql.functions.abs(l2("lt") - r2("rt")) <= 60)
    assert(!q2.queryExecution.executedPlan.toString.contains("__graft_band"))
    // and NULL band values match nothing, same as the raw predicate
    val ln = (lRows.map { case (i, t) => (i, Some(t)) } :+ ((999L, Option.empty[Long])))
      .toDF("lid", "lt").repartition(2)
    val qn = ln.join(r, org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 60)
    assert(qn.filter($"lid" === 999L).count() == 0)
  }

  test("band join rewrite buckets losslessly above 2^53 (integer floor-div path)") {
    // doubles resolve only to 2^53: at base = 2^60 a double round-trip
    // collapses ~128-unit neighborhoods, so the old floor(t/w) double
    // bucket could drop in-band pairs; the integer path cannot
    val base = 1L << 60
    val lRows = List((1L, base), (2L, base + 40L), (3L, base + 100L), (4L, base - 70L))
    val rRows = List((10L, base + 30L), (11L, base + 1000L), (12L, base - 61L))
    val l = lRows.toDF("lid", "lt").repartition(2)
    val r = rRows.toDF("rid", "rt").repartition(2)
    val q = l.join(r, org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 60)
      .select("lid", "rid")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("__graft_band"), p.take(1500))
    val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val exp = (for {
      a <- lRows; b <- rRows if math.abs(a._2 - b._2) <= 60
    } yield (a._1, b._1)).toSet
    assert(exp.nonEmpty && got == exp, s"got $got vs expected $exp")
  }

  test("band join rewrite buckets correctly within w of Long.MinValue") {
    // the old e − pmod(e, w) bucket wrapped below Long.MinValue for
    // values within w of it, silently dropping in-band pairs; the
    // trunc-divide + negative-remainder correction cannot overflow
    val mn = Long.MinValue
    val lRows = List((1L, mn), (2L, mn + 2L), (3L, mn + 100L))
    val rRows = List((10L, mn + 2L), (11L, mn + 5L), (12L, mn + 200L))
    val l = lRows.toDF("lid", "lt").repartition(2)
    val r = rRows.toDF("rid", "rt").repartition(2)
    val q = l.join(r, org.apache.spark.sql.functions.abs($"lt" - $"rt") <= 3)
      .select("lid", "rid")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("__graft_band"), p.take(1500))
    val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val exp = (for {
      a <- lRows; b <- rRows if math.abs(a._2 - b._2) <= 3
    } yield (a._1, b._1)).toSet
    assert(exp == Set((1L, 10L), (2L, 10L), (2L, 11L)) && got == exp,
      s"got $got vs expected $exp")
  }

  test("registerAll is idempotent on an existing session") {
    graft.core.GraftExtensions.registerAll(spark)
    graft.core.GraftExtensions.registerAll(spark)
    assert(spark.sql("SELECT dot_product_d(array(2.0f), array(3.0f)) AS d").head.getDouble(0) == 6.0)
  }
}
