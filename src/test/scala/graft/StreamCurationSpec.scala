package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier
import graft.streaming.StreamCuration

/** Streaming curation gate: the stream path must produce exactly the
  * batch verdicts (same code, stateless), run in append mode with no
  * watermark, and respect the offline-trained boundary.
  */
class StreamCurationSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private def corpus = {
    val pos = (0 until 20).map { i =>
      (i.toLong, ("the data of a pipeline and more words here now " * 6).trim, "src0")
    }
    val neg = (20 until 40).map { i =>
      (i.toLong, s"short doc number$i", s"src${i % 4 + 1}")
    }
    pos ++ neg
  }

  test("kn gate: micro-batches score against the frozen model exactly like batch") {
    import graft.operators.TextAnalysis
    import graft.streaming.StreamCuration
    val docs = corpus.toDF("doc_id", "text", "source")
    // train OFFLINE on the reference slice; the stream never retrains
    val model = TextAnalysis.knTrain(
      docs.filter(col("source") === "src0")
        .select(graft.functions.Text.words(col("text")).as("w")))
    val batch = StreamCuration.knGate(docs, model, minLogprob = 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // the reference-like docs must outscore the OOV-heavy ones; gate at
    // the midpoint so the verdict column carries the planted structure
    val bySource = corpus.map { case (id, _, s) => id -> s }.toMap
    val pos = batch.collect { case (id, s) if bySource(id) == "src0" => s }
    val neg = batch.collect { case (id, s) if bySource(id) != "src0" => s }
    assert(pos.min > neg.max, s"frozen-model scores do not separate: ${pos.min} vs ${neg.max}")
    val cut = (pos.min + neg.max) / 2
    val want = StreamCuration.knGate(docs, model, cut).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(4), r.getBoolean(5)))).toMap

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Double, Boolean)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamCuration.knGate(b, model, cut).collect().foreach { r =>
        buf.synchronized { buf(r.getLong(0)) = ((r.getLong(1), r.getDouble(4), r.getBoolean(5))) }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(buf.toMap == want, "stream and batch KN verdicts diverge")
    assert(buf.size == 40)
    assert(want.forall { case (id, (_, _, pass)) => pass == (bySource(id) == "src0") })
  }

  test("percolator: per-batch alerts equal batch matches; unsatisfiable query stays silent") {
    import graft.streaming.StreamPercolate
    val queries = Seq(
      "q_pipeline" -> Seq("data", "pipeline"),
      "q_short" -> Seq("short", "doc"),
      "q_never" -> Seq("data", "number21"))
    val docs = corpus.toDF("doc_id", "text", "source")
    val want = StreamPercolate.alerts(docs, queries).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Set.empty[(String, Long)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamPercolate.alerts(b, queries).collect().foreach { r =>
        buf.synchronized { buf += ((r.getString(0), r.getLong(1))) }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(buf.toSet == want, "stream and batch percolation alerts diverge")
    // planted structure: every pos doc carries data+pipeline, every neg
    // doc carries short+doc, and the impossible conjunction never fires
    assert(want.count(_._1 == "q_pipeline") == 20)
    assert(want.count(_._1 == "q_short") == 20)
    assert((want & Set(("q_short", 21L))).nonEmpty)
    assert(!want.exists(_._1 == "q_never"))
  }

  test("queries-as-data percolator: stored-query TABLE drives alerts; stream equals batch") {
    import graft.operators.TextAnalysis
    import graft.streaming.StreamPercolate
    val docs = corpus.toDF("doc_id", "text", "source")
    // the standing-query set is DATA: derived from the corpus, frozen
    // for the stream (stream-static join — updating the table is a
    // restart, never a redeploy)
    val qt = TextAnalysis.percolatorQueryTable(docs).localCheckpoint()
    val want = StreamPercolate.tableAlerts(docs, qt).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "the data-derived query table should fire on its own corpus")
    // census contract: every stored query reports, zero-match included
    val census = TextAnalysis.percolateTableCensus(
      docs, TextAnalysis.positionalPostings(docs)).collect()
    assert(census.length == qt.select("query_id").distinct().count())

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Set.empty[(String, Long)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamPercolate.tableAlerts(b, qt).collect().foreach { r =>
        buf.synchronized { buf += ((r.getString(0), r.getLong(1))) }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(buf.toSet == want, "stream and batch table-driven alerts diverge")
    // a query-table UPDATE (new alert row) takes effect with no code
    // change: the same operator over qt ∪ {new query} fires the new id
    val qt2 = qt.unionByName(Seq(("alert_added", "data")).toDF("query_id", "term"))
    val withNew = StreamPercolate.tableAlerts(docs, qt2).collect()
      .map(r => r.getString(0)).toSet
    assert(withNew.contains("alert_added"))
  }

  test("stored-query STORE drives stream alerts through the UPDATE/DELETE lifecycle and compaction") {
    import graft.operators.TextAnalysis
    import graft.streaming.StreamPercolate
    import graft.warehouse.IndexStore
    import org.apache.spark.sql.types._
    val docs = corpus.toDF("doc_id", "text", "source")
    val schema = StructType(Seq(StructField("query_id", StringType),
      StructField("ver", LongType), StructField("term", StringType)))
    val root = java.nio.file.Files.createTempDirectory("perc-store-").toString + "/store"
    // base generation: two standing queries at ver 0
    IndexStore.writeBase(Seq(
      ("q_data", 0L, "data"), ("q_data", 0L, "zzmissing"),
      ("q_doomed", 0L, "short")).toDF("query_id", "ver", "term"), root)
    // UPDATE q_data (drop the never-matching term — ver 1), DELETE
    // q_doomed: versioned tombstones + the next-version fragment
    IndexStore.addTombstones(
      Seq(("q_data", 0L), ("q_doomed", 0L)).toDF("query_id", "ver"), root, 0L)
    IndexStore.addFragment(
      Seq(("q_data", 1L, "data")).toDF("query_id", "ver", "term"), root, 0L)
    IndexStore.compact(spark, root, schema, tombstoneKeys = Seq("query_id", "ver"))
    // the stream's standing-query table IS the store's serving read
    val qt = IndexStore.read(spark, root, schema, Seq("query_id", "ver"))
      .select("query_id", "term").localCheckpoint()
    val want = StreamPercolate.tableAlerts(docs, qt).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // deleted query can never fire; the pre-update definition (which
    // required the never-matching term) fired nothing, the updated one
    // fires on every pos doc — compaction + tombstones served the
    // correct alert set
    assert(!want.exists(_._1 == "q_doomed"))
    assert(want == (0 until 20).map(i => ("q_data", i.toLong)).toSet,
      s"updated stored query must fire on every planted doc: $want")

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Set.empty[(String, Long)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamPercolate.tableAlerts(b, qt).collect().foreach { r =>
        buf.synchronized { buf += ((r.getString(0), r.getLong(1))) }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(buf.toSet == want, "stream and store-served alerts diverge")
  }

  test("stream verdicts equal batch verdicts; selection respects the trained boundary") {
    val docs = corpus.toDF("doc_id", "text", "source")
    val w = Classifier.trainedWeights(docs, col("source") === "src0")

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = StreamCuration.curate(
      mem.toDF().toDF("doc_id", "text", "source"), w)
    val q = stream.writeStream.format("memory")
      .queryName("curation").outputMode("append").start()
    // two micro-batches: verdicts must not depend on batch boundaries
    mem.addData(corpus.take(15): _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(15): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("curation").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    val want = StreamCuration.curate(docs, w).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    assert(got == want, "stream and batch verdicts diverge")
    assert(got.size == 40)
    // the separable corpus separates: src0 docs selected, the short
    // stopword-free docs rejected by BOTH gates
    val bySource = corpus.map { case (id, _, s) => id -> s }.toMap
    assert(got.forall { case (id, (_, _, _, sel)) => sel == (bySource(id) == "src0") },
      s"selection does not match the planted structure: $got")
  }

  test("phrase percolator: ordered adjacency alerts, stream equals batch") {
    import graft.streaming.StreamPercolate
    val phrases = Seq(
      "p_data_pipeline" -> Seq("data", "of"), // adjacent in the planted text
      "p_reversed" -> Seq("of", "data"), // same words, wrong order -> silent
      "p_repeat" -> Seq("a", "a"), // repeated-word phrase
      "p_never" -> Seq("data", "zzz"))
    val feed: Seq[(Long, String, String)] = Seq(
      (1L, "the data of a pipeline", "s"),
      (2L, "a a doubled word here", "s"),
      (3L, "of data reversed order", "s"))
    val docs = feed.toDF("doc_id", "text", "source")
    val want = StreamPercolate.phraseAlerts(docs, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want == Set(("p_data_pipeline", 1L), ("p_repeat", 2L), ("p_reversed", 3L)),
      s"unexpected batch alerts: $want")

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Set.empty[(String, Long)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamPercolate.phraseAlerts(b, phrases).collect().foreach { r =>
        buf.synchronized { buf += ((r.getString(0), r.getLong(1))) }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(feed.take(2): _*); q.processAllAvailable()
    mem.addData(feed.drop(2): _*); q.processAllAvailable()
    q.stop()
    assert(buf.toSet == want, "stream and batch phrase alerts diverge")
  }

  test("substring gate: micro-batches scrub against the frozen gram set exactly like batch") {
    import graft.operators.Dedup
    val bp = "p1 p2 p3 p4 p5 p6 p7 p8"
    val baseDocs = Seq((1L, s"base words $bp more base", "src0"))
      .toDF("doc_id", "text", "source")
    val grams = Dedup.gramSet(baseDocs).cache() // the frozen artifact
    val feed: Seq[(Long, String, String)] = (10L until 30L).map { i =>
      val t = if (i % 3 == 0) s"x${i}a x${i}b $bp x${i}c" // planted boilerplate
      else s"y${i}a y${i}b y${i}c y${i}d y${i}e y${i}f y${i}g y${i}h"
      (i, t, "feed")
    }
    val docs = feed.toDF("doc_id", "text", "source")
    val want = StreamCuration.substringGate(docs, grams).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_removed"), r.getAs[String]("kept_md5"))))
      .toMap

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val buf = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      StreamCuration.substringGate(b, grams).collect().foreach { r =>
        buf.synchronized {
          buf(r.getLong(0)) = ((r.getAs[Long]("n_removed"), r.getAs[String]("kept_md5")))
        }
      }
    val q = mem.toDF().toDF("doc_id", "text", "source")
      .writeStream.foreachBatch(fn).start()
    mem.addData(feed.take(7): _*)
    q.processAllAvailable()
    mem.addData(feed.drop(7): _*)
    q.processAllAvailable()
    q.stop()
    assert(buf.toMap == want, "stream and batch scrub results diverge")
    // the planted boilerplate is erased in every doc carrying it
    feed.foreach { case (id, t, _) =>
      assert(want(id)._1 == (if (t.contains(bp)) 8L else 0L))
    }
    grams.unpersist()
  }
}
