package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: lock in the scale-critical plan
  * properties (broadcasts, top-k, pruning, no quadratic joins, shared
  * window Exchange) so a refactor that silently degrades a plan fails
  * CI instead of failing at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("star join broadcasts the dimensions (no dimension shuffle)") {
    val p = plan("q03_star_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan("q07_top_events").contains("TakeOrderedAndProject"))
  }

  test("projection reaches the scan: pricing summary reads only its columns") {
    val p = plan("q01_pricing_summary")
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("l_comment") && !s.contains("l_partkey")), readSchemas.mkString("\n"))
  }

  test("no quadratic join shapes anywhere in the oracle-checked surface") {
    // broadcast NLJ with a tiny explicit side is allowed (ANN query
    // sets); CartesianProduct never is.
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("bm25 never explodes the corpus and takes top-k distributed") {
    val p = plan("q149_bm25")
    assert(!p.contains("Generate"), p.take(800)) // tf is narrow array math
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastNestedLoopJoin")) // 1-row stats side
  }

  test("bpe merge pairs explode the vocabulary, not the token stream") {
    val p = plan("q150_bpe_merges")
    // the char-pair Generate must sit ABOVE the word-count aggregate:
    // exactly one explode of the token stream (words), one of the
    // vocab (pairs), and the pair explode input is the aggregated side.
    assert(p.contains("TakeOrderedAndProject"))
    val generates = "Generate explode".r.findAllIn(p).length
    assert(generates == 2, s"expected 2 explodes (words, vocab pairs), got $generates")
  }

  test("weighted sample and zipf top-R plan as TakeOrderedAndProject") {
    assert(plan("q104_weighted_sample").contains("TakeOrderedAndProject"))
    assert(plan("q110_zipf_fit").contains("TakeOrderedAndProject"))
  }

  test("pagerank contributions aggregate map-side (partial sum before the shuffle)") {
    // audit one pre-checkpoint iteration directly: inside pageRank each
    // round hides behind a localCheckpoint, so the end-to-end explain
    // would only show the final join (and pass vacuously)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src")
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    val r = nodes.withColumn("m", lit(1000000L))
    val p = graft.operators.Graph.step(withDeg, nodes, r)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("rolling-window family shares one Exchange") {
    val p = plan("q23_rolling_stats")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n${p.take(1200)}")
  }

  test("filter pushdown reaches the parquet scan") {
    val p = plan("q02_monthly_shipments")
    assert(p.contains("PushedFilters: [") && p.contains("IsNotNull"), p.take(1200))
  }

  test("join strategy is controllable: shuffle_hash hint avoids the sort-merge sort") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import graft.sources.Tables
      val o = Tables(spark, dir, "orders")
      val c = Tables(spark, dir, "customer")
      val smj = o.join(c, o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(smj.contains("SortMergeJoin"), smj.take(600))
      val shj = o.join(c.hint("shuffle_hash"), o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      // hash join skips both sort passes — the right call when one side
      // fits per-partition memory but not a broadcast
      assert(shj.contains("ShuffledHashJoin"), shj.take(600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANALYZE TABLE feeds exact row counts to the cost-based optimizer") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS t_cbo_audit")
    val loc = java.nio.file.Paths.get("spark-warehouse/t_cbo_audit")
    if (java.nio.file.Files.exists(loc))
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    (1L to 321L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("t_cbo_audit")
    spark.sql("ANALYZE TABLE t_cbo_audit COMPUTE STATISTICS")
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("t_cbo_audit").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(321)), stats.toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the downstream aggregate reuses the join's partitioning; force
      // the split anyway (costs one extra shuffle — the right trade for
      // a straggler that would otherwise run 20x longer)
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key carrying ~95% of the left side
      val left = ((1L to 200000L).map(i => (1L, i)) ++ (1L to 10000L).map(i => (1L + i % 50, i)))
        .toDF("k", "v")
      val right = (1L to 51L).map(i => (i, s"r$i")).toDF("k", "name")
      val q = left.join(right, "k").groupBy("k").count()
      q.collect() // AQE re-plans during execution
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(1500))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("IVF assignment broadcasts a fixed-size quantizer, never O(n)") {
    import graft.operators.{Clustering, Similarity}
    import graft.sources.Tables
    // nlist stays at the configured constant while the corpus scales
    // 4× (sf0.001: 500 vectors → sf0.1: 2000) — the broadcast side of
    // the assignment join is O(nlist·dim) by construction.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val cents = Clustering.kmeans(
        Tables(spark, sf, "embeddings"),
        Similarity.IvfNlist, Similarity.IvfIters, Similarity.IvfTrainPct)
      assert(cents.count() <= Similarity.IvfNlist, s"nlist grew at $sf")
    }
  }

  test("nearest-centroid assignment aggregates, never sorts the scored corpus") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Clustering, Similarity}
    import graft.sources.Tables
    // the n x k assignment must plan as a (partial-combined) aggregate:
    // a Window/Sort over the scored frame is the shape that dies first
    // at 100 TB (sorting 16x the corpus per Lloyd round)
    val emb = Tables(spark, dir, "embeddings")
    val cents = Clustering.seedCentroids(emb, Similarity.IvfNlist)
    for ((label, df) <- Seq(
        "assign" -> Clustering.assign(emb, cents),
        "assignL2" -> Clustering.assignL2(
          emb, cents.select(col("cluster_id"), col("cemb"))))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$label plans a Window:\n${p.take(600)}")
      // the ACTUAL node: Max/Min over a struct carrying an ARRAY column
      // cannot use HashAggregate (immutable buffer type) — the planner
      // picks SortAggregate, still partial + final (one node per side
      // of the exchange). Asserting both occurrences pins the
      // partial-aggregation claim to the plan, not to a comment.
      assert("SortAggregate".r.findAllMatchIn(p).size >= 2,
        s"$label expected partial+final SortAggregate:\n${p.take(600)}")
    }
    // the ANN queries that embed this assignment keep Sort out of their
    // corpus branch too (the only Sorts left are the bounded final
    // ORDER BY / per-query top-k rankings)
    val ivf = SparkEntry.queries("q65_ann_ivf")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(ivf.contains("ObjectHashAggregate") || ivf.contains("SortAggregate") ||
      ivf.contains("HashAggregate"), ivf.take(600))
  }

  test("CMS sketch aggregates with map-side partials (ObjectHashAggregate)") {
    val p = plan("q113_cms_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"), p.take(1000))
    assert(p.contains("partial_cms_md5"), p.take(1000))
  }

  test("kmv sketches partial-aggregate; the overlap matrix joins sketches, not corpora") {
    // map-side partial: each task ships <=k hashes per source into the
    // shuffle — the whole point of the sketch at 100 TB
    val p = plan("q196_kmv_distinct")
    assert(p.contains("partial_kmv_md5"), p.take(1000))
    assert(p.contains("ObjectHashAggregate"), p.take(1000))
    // the pair frame is S sketch rows self-joined under s1 < s2 — a
    // broadcast NLJ over aggregates; the corpora themselves never meet
    val o = plan("q197_kmv_overlap")
    assert(o.contains("partial_kmv_md5"), o.take(1000))
    assert(o.contains("BroadcastNestedLoopJoin"), o.take(1000))
    assert(!o.contains("SortMergeJoin"), o.take(1000))
  }

  test("auc ranks through a bucket-partitioned window, never a global score sort") {
    val p = plan("q198_classifier_auc")
    // the data-scale cumulative is PARTITIONED by bucket
    assert("""\], \[bucket#\d+L\], \[score#""".r.findFirstIn(p).isDefined, p.take(1500))
    // no window sorts the full score stream in one partition
    assert(!p.contains("], [], [score#"), "global score window found:\n" + p.take(1500))
    // tie groups collapse with map-side partials before any window
    assert(p.contains("partial_sum"), p.take(1000))
  }

  test("spearman ranks are fully partitioned — no unpartitioned window at all") {
    // both rank cumulatives are keyed (key for the bucket table,
    // (key, bucket) for the within-bucket pass): q201's plan must not
    // contain a single empty partition spec
    val p = plan("q201_signal_agreement")
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("], [], ["), "unpartitioned window found:\n" + p.take(1500))
  }

  test("blocklist dictionaries broadcast; modality census joins nothing") {
    // both dictionary tiers must ride broadcast joins (a shuffled dict
    // join would shuffle the exploded token stream against a
    // constant-size table); the corpus-keyed verdict join is the only
    // non-broadcast join allowed
    val p = plan("q189_blocklist")
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 2, p.take(1000))
    // the modality census is one scan + one keyed aggregate — any Join
    // node means the detection stopped being a pure projection
    val m = plan("q185_modality_stats")
    assert(!m.contains("Join"), m.take(1000))
  }

  test("join-size sketch estimates without materializing either join") {
    // the CMS arrays partial-aggregate (TypedImperativeAggregate ->
    // ObjectHashAggregate); the only joins are 1-row scalar cross
    // products (BroadcastNestedLoopJoin Cross over aggregates — the
    // adjudicated scalar pattern) and the keyed COUNT-table join of the
    // exact reference. A raw-row join would show as a join whose child
    // is a FileScan, which the keyed-aggregate shape precludes: every
    // scan feeds an aggregate before any join.
    val p = plan("q190_join_size_sketch")
    assert(p.contains("ObjectHashAggregate"), p.take(1000))
    assert(p.contains("partial_cms_md5"), p.take(1000))
  }

  test("salted join carries the salt in the join keys (hot key split across reducers)") {
    val p = plan("q118_salted_join")
    assert(p.contains("__salt"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("inverted index decides df before any posting list materializes") {
    // the collect_list aggregate must sit ABOVE the df-filtering join in
    // the plan tree: no list buffer exists for a term outside the band
    val p = plan("q115_inverted_index")
    val collectAt = p.indexOf("collect_list")
    val joinAt = math.max(p.indexOf("SortMergeJoin"), p.indexOf("BroadcastHashJoin"))
    assert(collectAt >= 0 && joinAt >= 0, p.take(1200))
    assert(collectAt < joinAt, s"collect_list (at $collectAt) should be upstream-of-root " +
      s"relative to the df join (at $joinAt)\n${p.take(1500)}")
  }

  test("streaming-fold batch twins shuffle once and sort within partitions only") {
    // the backfill shape: ONE key exchange, partition-local sort (the
    // `false` flag), single-pass mapPartitions — a global sort or a
    // second exchange would mean the twin re-shuffles a 100 TB history
    for (name <- Seq("q138_ewma_drift", "q139_session_fold")) {
      val p = plan(name)
      val keyExchanges = "Exchange hashpartitioning\\(device_id".r.findAllIn(p).length
      assert(keyExchanges == 1, s"$name: expected 1 device_id exchange, got $keyExchanges\n${p.take(1500)}")
      assert("Sort \\[device_id[^\\]]*\\], false".r.findFirstIn(p).isDefined,
        s"$name: expected a partition-local (non-global) sort\n${p.take(1500)}")
      // the only other exchange is the final output ordering
      assert("Exchange hashpartitioning\\((?!device_id)".r.findAllIn(p).isEmpty,
        s"$name: unexpected extra hash exchange\n${p.take(1500)}")
    }
  }

  private def joinKeyLists(p: String): List[String] =
    "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*\\], \\[[^\\]]*".r
      .findAllIn(p).toList

  test("similarity-graph candidate joins are keyed on label AND bucket") {
    // the bounded generator's self-join must carry the LSH bucket in its
    // equality keys — label-only keys are the hot-label quadratic the
    // round-4 review flagged. Audited on the generator's own plan:
    // q132's triangle operator now localCheckpoints the edge list, so
    // the generation subtree no longer appears in the query's final plan
    val edges = graft.operators.Similarity.bucketedNearDupPairs(
      spark.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.15)
    val joinKeys = joinKeyLists(edges.queryExecution.executedPlan.toString)
    assert(joinKeys.exists(k => k.contains("label") && k.contains("bucket")),
      joinKeys.mkString("\n"))
  }

  test("semDedup pair joins are keyed on cluster AND bucket") {
    // same contract for the semantic-dedup generator: candidate pairs
    // must ride the (cent_id, bucket) equality block, never all-pairs
    // (audited on the generator subtree — the eager component solve
    // hides it from semDedup's final plan)
    val Sim = graft.operators.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = Sim.semDedupPairs(e, Sim.semDedupAssigned(e), Sim.SemDedupThreshold)
    val joinKeys = joinKeyLists(pairs.queryExecution.executedPlan.toString)
    assert(joinKeys.exists(k => k.contains("cent_id") && k.contains("bucket")),
      joinKeys.mkString("\n"))
  }

  test("edit-distance self-join carries the refined (blk, grp) block key") {
    val joinKeys = joinKeyLists(plan("q94_fuzzy_pairs"))
    assert(joinKeys.exists(k => k.contains("blk") && k.contains("grp")),
      joinKeys.mkString("\n"))
  }

  test("PQ ADC scores packed code arrays against a broadcast LUT, ranked by partial top-k") {
    // round-8 packed contract: candidates carry one m-ordered codes
    // array, the per-query LUT broadcasts, scoring is an in-row fold
    // (|corpus|·|Q| pair rows — PqM× fewer than the former long-form
    // (m, code) join), and ranking is the mergeable TopKByScore
    // aggregate, never a window sort of the scored frame
    val p = plan("q156_pq_adc")
    // topk_by_score present = the scored frame partial-aggregates; the
    // only window left in the plan is the codebook's K-row code
    // numbering, never the |corpus|·|Q| scored frame
    assert(p.contains("topk_by_score"), p.take(1500))
    // the pair join's broadcast side is the packed LUT (array column),
    // not a PqM-exploded long table
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("IVF-PQ candidate join carries the probed list in its keys") {
    // cent_id in the equality keys = only probed lists are scored; its
    // absence would score every candidate against every query LUT
    val keys = joinKeyLists(plan("q161_ivfpq"))
    assert(keys.exists(k => k.startsWith("BroadcastHashJoin") && k.contains("cent_id")),
      keys.mkString("\n"))
  }

  test("winnowing overlap pair join is keyed on the fingerprint hash") {
    val keys = joinKeyLists(plan("q165_winnow_overlap"))
    assert(keys.exists(k => k.contains("g#")), keys.mkString("\n"))
    assert(!plan("q165_winnow_overlap").contains("BroadcastNestedLoopJoin"))
  }

  test("CDC chunking shuffles the position stream exactly once") {
    // the doc-keyed window exchange must be the ONLY hash exchange: the
    // chunk aggregation's (doc_id, chunk_idx) clustering is satisfied
    // by the window's doc_id partitioning (plus the final presentation
    // range sort)
    val p = plan("q157_cdc_chunks")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n${p.take(1200)}")
  }

  test("log quantile sketch prunes to two columns (never reads text)") {
    // earlier plan() calls register other queries' pinned frames for
    // cache lookup; a structurally-matching InMemoryRelation would hide
    // this query's own scan (Verify clears per query — mirror that)
    spark.catalog.clearCache()
    val p = plan("q209_log_quantiles")
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("text")), readSchemas.mkString("\n"))
    assert(p.contains("HashAggregate"), p.take(800)) // counter table, map-side partials
  }

  test("skyline prunes via a broadcast staircase; exact test only on survivors") {
    val p = plan("q210_pareto_skyline")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))     // stair join on xb
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200)) // survivor anti-join
    assert(!p.contains("SortMergeJoin"), p.take(1600)) // nothing corpus-scale shuffles to sort
  }

  test("declarative band join plans as the bucketed equi join, not a nested loop") {
    val p = plan("q223_band_auto_join")
    assert(p.contains("__graft_band"), p.take(1500)) // the rewrite fired
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("keyness broadcasts its totals; the rank window runs on the capped vocab only") {
    val p = plan("q211_keyness")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))       // per-source totals
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200)) // 1-row corpus total
    assert(p.contains("Window"), p.take(1200))
  }

  test("bloom pre-filter broadcasts the single-row filter; the probe side never shuffles for it") {
    val p = plan("q240_bloom_filter")
    // the 1-row bloom joins by broadcast (NLJ on a single row); the
    // membership probe is pure projection arithmetic over the array —
    // no Generate, no extra Exchange between the customer scan and the
    // probe expression
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("bloom_md5"), p.take(1200)) // the mergeable aggregate, not collect
    assert(!p.contains("Generate"), p.take(1200)) // probe = shift/mask, never an explode
  }

  test("q250 bloom probe drops probe rows BELOW the semi join's Exchange") {
    val p = plan("q250_semi_bloom")
    // the exact semi join is shuffle-pinned (the 100 TB regime), and
    // the codegen'd shift/mask membership probe must evaluate in the
    // probe side's scan stage — i.e. the Filter sits UNDER the
    // l_suppkey Exchange, so dropped rows never reach the shuffle
    assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"), p.take(1500))
    // the filter arrives as a scalar subquery (computed once, shipped
    // with the task binary) — a join-shaped feed would let the
    // optimizer reorder the semi join below the probe
    assert(p.contains("Subquery subquery") || p.contains("scalar-subquery"), p.take(1500))
    val lines = p.linesIterator.toVector
    val exIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning(l_suppkey"))
    val probeIdx = lines.indexWhere(l => l.contains("bloom_probe") && l.contains("Filter"))
    assert(exIdx >= 0, p.take(2500))
    assert(probeIdx > exIdx,
      s"bloom probe must sit under the probe-side Exchange (probe@$probeIdx, exchange@$exIdx)\n${p.take(2500)}")
  }

  test("phrase search explodes postings once per side and joins keyed, never scans LIKE") {
    val p = plan("q241_phrase_search")
    // the phrase dictionary broadcasts; the position match is an
    // equi-join (doc_id, pos+1) — hash or sort-merge, never a nested loop
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("n-word phrase search joins broadcast and aggregates — no NLJ, no join chain") {
    val p = plan("q251_phrase_ngram")
    assert(p.contains("BroadcastHashJoin"), p.take(1500)) // the term dictionary
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("indexed BM25 reads the posting artifact, never re-tokenizes the corpus") {
    val p = plan("q252_bm25_indexed")
    // the only corpus-shaped input is the persisted postings parquet;
    // a Generate would mean the documents table was exploded again
    assert(!p.contains("Generate"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500)) // the 1-row stats broadcast
  }

  test("hybrid fusion computes the tf/dl base aggregation ONCE (exchange reused)") {
    // both rankers and both stats rows branch from one scored frame;
    // at corpus scale the per-doc rollup is the cost center and must
    // not run per ranking — the reuse only appears in the EXECUTED
    // (AQE-final) plan, so run the query first
    val df = SparkEntry.queries("q261_hybrid_text_rrf")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), p.take(2000))
  }

  test("hybrid dense+lexical reads both index artifacts; ANN side never all-pairs") {
    val p = plan("q262_hybrid_dense_lexical")
    // lexical side: the postings parquet artifact, never a corpus
    // re-tokenization (a Generate would mean documents was exploded)
    assert(!p.contains("Generate"), p.take(1500))
    assert(p.contains("graft-artifacts"), p.take(1500)) // the postings artifact scan
    // dense side: candidates come from the cent_id-keyed probe-list
    // equi-join (BHJ); the only NLJ is the bounded 16-centroid /
    // 1-row-stats broadcast — a CartesianProduct is never acceptable
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("indexed ANN prunes the stored inverted-list partitions; corpus read only for query rows") {
    // DPP only materializes in the EXECUTED plan (the pruning subquery
    // comes from the broadcast probe side), so run the query first
    val df = SparkEntry.queries("q264_ann_ivf_indexed")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // candidate side = the cent_id-partitioned lists artifact, with
    // dynamic partition pruning from the broadcast probe rows — the
    // file-level inverted index: only probe lists' files are read
    assert(p.contains("ivf_lists"), p.take(2000))
    assert(p.contains("dynamicpruningexpression(cast(cent_id") ||
      p.contains("dynamicpruningexpression(cent_id"), p.take(2000))
    // the corpus parquet serves ONLY the bounded query set — every scan
    // of it must carry the pushed query predicate
    val embScans = p.split("\n").filter(_.contains("embeddings.parquet"))
    assert(embScans.nonEmpty)
    embScans.foreach(l => assert(l.contains("< 20"), l.take(300)))
  }

  test("partition pruning survives the (base ∪ delta) union on the incremental lists") {
    // the 100 TB claim for q266: the stored base index is 99.9% of the
    // data, and the probe join must still prune its partitioned scan
    // THROUGH the union with the freshly-assigned delta
    val df = SparkEntry.queries("q266_ann_ivf_incremental")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression(cast(cent_id") ||
      p.contains("dynamicpruningexpression(cent_id"), p.take(2000))
  }

  test("incremental hybrid touches raw tables only for the delta and the query rows") {
    val df = SparkEntry.queries("q267_hybrid_incremental")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // lexical side: the pre-split corpus lives in the postings_base
    // artifact — every documents scan must carry the delta predicate
    val docScans = p.split("\n").filter(_.contains("documents.parquet"))
    assert(docScans.nonEmpty)
    docScans.foreach(l => assert(l.contains(">= 400"), l.take(300)))
    // dense side: the pre-split corpus lives in the ivf_lists_base
    // artifact — embeddings scans are the delta assignment or the
    // single query row, never the full corpus
    val embScans = p.split("\n").filter(_.contains("embeddings.parquet"))
    assert(embScans.nonEmpty)
    embScans.foreach(l => assert(l.contains(">= 400") || l.contains("= 0"), l.take(300)))
  }

  test("query-term filters push down to the postings artifact scan") {
    // the 100 TB claim for q251/q255/q257: retrieval reads the
    // query terms' posting lists, not the whole index — the isin()
    // must reach the parquet reader as a pushed In filter
    for (q <- Seq("q251_phrase_ngram", "q255_term_proximity", "q257_min_window")) {
      val p = plan(q)
      assert(p.contains("PushedFilters: [In(word") || p.contains("PushedFilters: [IsNotNull(word), In(word"),
        s"$q: ${p.take(1500)}")
      assert(!p.contains("Generate"), s"$q re-exploded the corpus\n${p.take(1200)}")
    }
  }

  test("cluster sample assigns via broadcast centroids and draws via the partial top-k heap") {
    val p = plan("q243_cluster_sample")
    assert(p.contains("topk_by_score"), p.take(1500)) // mergeable heap, no per-cluster sort window
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1500)) // centroid side broadcast
  }

  test("incremental dhash match blocks on (band, value) equi keys with the cap applied to the index") {
    val p = plan("q239_dhash_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500)) // candidate generation is the banded equi-join, never all-pairs
  }

  test("dynamic partition pruning survives compaction on the generation store") {
    // the q271 contract: the compacted generation keeps the cent_id
    // hive layout, so the probe join still prunes the lists scan at the
    // file level — compaction must never cost the index its pruning
    val df = SparkEntry.queries("q271_ivf_compacted")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ivf_store"), p.take(2000)) // serving from the store, not the corpus
    assert(p.contains("dynamicpruningexpression(cast(cent_id") ||
      p.contains("dynamicpruningexpression(cent_id"), p.take(2000))
  }

  test("rm3 family serves from the postings artifact: no re-tokenization, broadcast dictionaries") {
    for (name <- Seq("q286_rm3_expansion", "q287_rm3_rerank", "q288_query_clarity",
        "q289_percolator")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the corpus text is never re-exploded — every tf/df/presence
      // read comes off the persisted postings parquet
      assert(!p.contains("Generate"), s"$name re-tokenizes: ${p.take(1500)}")
      assert(p.contains("postings"), s"$name does not read the postings artifact")
      assert(p.contains("BroadcastHashJoin"), s"$name lost its broadcast dictionary join")
    }
  }

  test("adaptive retrieval scans the prefix artifact coarse, full vectors only behind broadcast joins") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = SparkEntry.queries("q280_ann_adaptive")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the corpus-wide coarse stage reads the persisted 8-dim prefix,
      // and that scan projects the prefix column, never the full vector
      val prefixScans = p.split("\n").filter(l => l.contains("mrl_prefix") && l.contains("ReadSchema"))
      assert(prefixScans.nonEmpty, p.take(2000))
      assert(prefixScans.forall(l => l.contains("pe") && !l.contains("embedding")),
        prefixScans.mkString("\n").take(1200))
      // the full-width rerank is fed by broadcast joins (candidate list
      // + bounded query side) — the full-dim pair space is never built
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", "100")
  }

  test("lifecycle hybrid serves from both lived-in stores with the lists pruning intact") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = SparkEntry.queries("q278_hybrid_lifecycle")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("post_store_ts"), p.take(2000)) // lexical side: the compacted postings store
      assert(p.contains("ivf_store_ts"), p.take(2000)) // dense side: the compacted lists store
      // the tombstone anti-join must not cost the dense side its
      // file-level pruning on the compacted generation
      assert(p.contains("dynamicpruningexpression(cast(cent_id") ||
        p.contains("dynamicpruningexpression(cent_id"), p.take(2000))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", "100")
  }

  test("filtered ANN pushes the metadata predicate into the lists scan beside the pruning") {
    // FileScan metadata truncates at maxMetadataStringLength (default
    // 100) — raise it so the artifact path and PushedFilters are
    // visible to the assertions
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = SparkEntry.queries("q276_ann_filtered")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruningexpression(cast(cent_id") ||
        p.contains("dynamicpruningexpression(cent_id"), p.take(2000))
      // the label cohort filter lands ON the stored-lists scan (the
      // carried metadata column) as a pushed data filter, never as a
      // post-join filter or a join back to the corpus
      val listScans = p.split("\n").filter(_.contains("ivf_lists_meta"))
      assert(listScans.nonEmpty, p.take(2000))
      assert(listScans.exists(l => l.contains("In(label, [1,4,7]")),
        listScans.mkString("\n").take(1200))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", "100")
  }

  test("substring gate pushes the base/delta split to the documents scans") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val p = plan("q302_substring_gate")
      assert(p.contains("LessThan(doc_id,400)"), p.take(1500))
      assert(p.contains("GreaterThanOrEqual(doc_id,400)"), p.take(1500))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", "100")
  }

  test("pair metrics broadcast the bounded LSH candidate list") {
    val p = plan("q295_bleu_pairs")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
  }

  test("training order ranks inside hex-prefix buckets (keyed shuffle)") {
    val p = plan("q299_training_order")
    assert(p.contains("hashpartitioning(bucket"), p.take(1500))
  }

  test("pair-metric gram tables are candidate-sized: semi-join precedes the explode") {
    // the q309 regression pin: without the candidate-doc semi-join the
    // char-gram explode runs over the whole corpus (measured 106 s at
    // sf0.1; 3.4 s with it)
    for (name <- Seq("q309_chrf", "q295_bleu_pairs")) {
      val p = plan(name)
      assert(p.contains("LeftSemi"), s"$name lost the candidate semi-join\n" + p.take(1200))
    }
  }

  test("binary retrieval: the corpus-wide Hamming scan reads only the 8-byte sketch") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = SparkEntry.queries("q324_binary_ann")(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the coarse stage scans the persisted bin_sketch artifact and
      // projects the packed words, never the float vector
      val sketchScans = p.split("\n").filter(l => l.contains("bin_sketch") && l.contains("ReadSchema"))
      assert(sketchScans.nonEmpty, p.take(2000))
      assert(sketchScans.forall(l => l.contains("w0") && !l.contains("embedding")),
        sketchScans.mkString("\n").take(1200))
      // full vectors appear only behind the broadcast m-list rerank
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", "100")
  }

  test("table-driven percolation: broadcast query dictionary, no Generate on the serving side") {
    val df = SparkEntry.queries("q322_percolator_table")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the corpus side is the postings artifact — the percolator itself
    // must not re-tokenize (its only explodes live in the one-time
    // query-table derivation over documents, not per serving row)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("postings"), p.take(1500))
  }
}
