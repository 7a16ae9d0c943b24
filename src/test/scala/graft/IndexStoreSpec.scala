package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BatchLayout, StreamTombstones}
import graft.warehouse.IndexStore

/** The generation-versioned index store: compaction merges base ∪
  * fragments (− tombstones) into an atomic new generation, readers
  * always resolve one complete snapshot, tombstones erase immediately
  * on read and physically at compaction.
  */
class IndexStoreSpec extends AnyFunSuite with TestSpark {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def freshRoot() =
    Files.createTempDirectory("ixstore-").toString + "/store"

  private def rows(r: (Long, String)*) = r.toSeq.toDF("k", "v")

  private def readSet(root: String, ts: Seq[String] = Nil): Set[(Long, String)] =
    IndexStore.read(spark, root, schema, ts).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("serving read = base ∪ fragments; compaction preserves it exactly and drops files") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b").repartition(4), root)
    IndexStore.addFragment(rows(3L -> "c").repartition(2), root, 0L)
    IndexStore.addFragment(rows(4L -> "d").repartition(2), root, 1L)
    val before = readSet(root)
    assert(before == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    val filesBefore = IndexStore.dataFileCount(spark, root)
    val c = IndexStore.compact(spark, root, schema)
    assert(c == IndexStore.Commit(1L, 1L))
    assert(readSet(root) == before, "compaction must not change the served rows")
    // small-file pressure actually REPAIRED: a flat store this far
    // under targetRowsPerFile compacts to exactly one data file
    val filesAfter = IndexStore.dataFileCount(spark, root)
    assert(filesAfter < filesBefore, s"$filesAfter >= $filesBefore")
    assert(filesAfter == 1L, s"flat compaction should write 1 file, got $filesAfter")
    // ONE-GENERATION RETENTION LAG: the replaced generation and its
    // fragments survive this compaction (a pinned reader keeps its
    // snapshot), and readAt time-travels it
    assert(Files.exists(Paths.get(IndexStore.fragmentsDir(root), "batch_id=0")))
    assert(Files.exists(Paths.get(root, "gen-0")))
    val at0 = IndexStore.readAt(spark, root, 0L, schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at0 == before, "readAt(0) must serve the retained snapshot")
    // new fragments after compaction serve immediately
    IndexStore.addFragment(rows(5L -> "e"), root, 2L)
    assert(readSet(root) == before + (5L -> "e"))
    // the NEXT compaction retires generation 0 and its absorbed
    // fragments; gen-1 becomes the retained snapshot
    IndexStore.compact(spark, root, schema)
    assert(!Files.exists(Paths.get(root, "gen-0")))
    assert(!Files.exists(Paths.get(IndexStore.fragmentsDir(root), "batch_id=0")))
    assert(!Files.exists(Paths.get(IndexStore.fragmentsDir(root), "batch_id=1")))
    assert(Files.exists(Paths.get(root, "gen-1"))) // retained now
    assert(Files.exists(Paths.get(IndexStore.fragmentsDir(root), "batch_id=2")))
    intercept[IllegalStateException](IndexStore.readAt(spark, root, 0L, schema))
    val at1 = IndexStore.readAt(spark, root, 1L, schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at1 == before + (5L -> "e"))
    assert(readSet(root) == before + (5L -> "e"))
  }

  test("crash between pointer swap and fragment GC never double-counts") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a"), root)
    IndexStore.addFragment(rows(2L -> "b"), root, 0L)
    IndexStore.compact(spark, root, schema)
    // simulate the crash window: the absorbed fragment reappears on
    // disk (GC never ran) — the watermark must keep excluding it
    IndexStore.addFragment(rows(2L -> "b"), root, 0L)
    assert(readSet(root) == Set(1L -> "a", 2L -> "b"),
      "absorbed fragment below the watermark must not be re-served")
    assert(IndexStore.read(spark, root, schema).count() == 2L)
  }

  test("crash mid-compaction leaves the old snapshot serving; retry succeeds") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a"), root)
    IndexStore.addFragment(rows(2L -> "b"), root, 0L)
    // a partial gen-1 from a crashed compactor: data present, pointer
    // NOT swapped — readers must ignore it entirely
    rows(99L -> "junk").write.parquet(s"$root/gen-1")
    assert(readSet(root) == Set(1L -> "a", 2L -> "b"))
    // the retry overwrites the partial directory and commits
    val c = IndexStore.compact(spark, root, schema)
    assert(c.gen == 1L)
    assert(readSet(root) == Set(1L -> "a", 2L -> "b"))
  }

  test("tombstones erase on read immediately and physically at compaction") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b"), root)
    IndexStore.addFragment(rows(3L -> "c", 4L -> "d"), root, 0L)
    IndexStore.addTombstones(Seq(2L, 3L).toDF("k"), root, 0L)
    // immediate: the anti-join wins before any compaction
    assert(readSet(root, Seq("k")) == Set(1L -> "a", 4L -> "d"))
    val c = IndexStore.compact(spark, root, schema, tombstoneKeys = Seq("k"))
    // physical: the committed generation's parquet holds no erased row
    val gen = spark.read.parquet(s"$root/gen-${c.gen}")
    assert(gen.filter(col("k").isin(2L, 3L)).isEmpty,
      "compaction must purge tombstoned keys from the new generation")
    assert(readSet(root, Seq("k")) == Set(1L -> "a", 4L -> "d"))
  }

  test("a tombstone outlives compaction: re-delivered keys stay erased") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b"), root)
    IndexStore.addTombstones(Seq(2L).toDF("k"), root, 0L)
    IndexStore.compact(spark, root, schema, tombstoneKeys = Seq("k"))
    // ingest re-delivers the erased key AFTER the purge
    IndexStore.addFragment(rows(2L -> "b2"), root, 7L)
    assert(readSet(root, Seq("k")) == Set(1L -> "a"),
      "re-delivered erased key must keep losing the anti-join")
    // explicit retirement is the only way a key returns
    IndexStore.purgeTombstones(spark, root)
    assert(readSet(root, Seq("k")) == Set(1L -> "a", 2L -> "b2"))
  }

  test("versioned UPDATE lifecycle: tombstone (key, ver) + next-ver fragment; readAt pins the pre-update snapshot") {
    // The q340/q341 shape: the tombstone contract ("the anti-join must
    // keep winning") means UPDATE cannot erase a bare key and re-add
    // it — rows are (k, ver)-versioned, DELETE tombstones the old
    // version, UPDATE = DELETE + next-version ingest.
    val vSchema = StructType(Seq(StructField("k", LongType),
      StructField("ver", LongType), StructField("v", StringType)))
    def vRead(root: String, ts: Boolean): Set[(Long, Long, String)] =
      IndexStore.read(spark, root, vSchema,
          if (ts) Seq("k", "ver") else Nil)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val root = freshRoot()
    val base = Seq((1L, 0L, "a0"), (2L, 0L, "b0"), (3L, 0L, "c0"))
    IndexStore.writeBase(base.toDF("k", "ver", "v"), root)
    // UPDATE k=2 (tombstone v0, ingest v1); DELETE k=3 (tombstone v0)
    IndexStore.addTombstones(Seq((2L, 0L), (3L, 0L)).toDF("k", "ver"), root, 0L)
    IndexStore.addFragment(Seq((2L, 1L, "b1")).toDF("k", "ver", "v"), root, 0L)
    val expected = Set((1L, 0L, "a0"), (2L, 1L, "b1"))
    assert(vRead(root, ts = true) == expected, "pre-compaction serving read")
    val c = IndexStore.compact(spark, root, vSchema, tombstoneKeys = Seq("k", "ver"))
    assert(vRead(root, ts = true) == expected, "post-compaction serving read")
    // the new generation physically excludes the superseded version
    assert(spark.read.parquet(s"$root/gen-${c.gen}")
      .filter(col("ver") === 0L && col("k") =!= 1L).isEmpty)
    // full-snapshot pin: generation 0 + its own fragment watermark (-1)
    // rereads the PRE-lifecycle table even though the update fragment
    // and tombstones exist on disk
    val at0 = IndexStore.readAt(spark, root, 0L, vSchema, maxFragmentId = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(at0 == base.toSet, "pinned readAt must serve the pre-update snapshot")
    // without the pin, generation 0's serving view includes the later
    // fragment — the documented generation-is-a-lower-bound semantics
    val at0Unpinned = IndexStore.readAt(spark, root, 0L, vSchema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(at0Unpinned == base.toSet + ((2L, 1L, "b1")))
  }

  test("compaction preserves the hive partition layout") {
    val root = freshRoot()
    val part = Seq((1L, 10L, "a"), (2L, 11L, "b")).toDF("cent_id", "cand_id", "p")
    val pSchema = StructType(Seq(StructField("cent_id", LongType),
      StructField("cand_id", LongType), StructField("p", StringType)))
    IndexStore.writeBase(part, root, Seq("cent_id"))
    IndexStore.addFragment(Seq((1L, 12L, "c")).toDF("cent_id", "cand_id", "p"), root, 0L)
    val c = IndexStore.compact(spark, root, pSchema, Seq("cent_id"))
    val genDir = Paths.get(s"$root/gen-${c.gen}")
    val parts = Files.list(genDir).toArray.map(_.toString).filter(_.contains("cent_id="))
    assert(parts.nonEmpty, "compacted generation must keep cent_id=<v> directories")
    // file-count repair: the key-repartitioned write leaves exactly ONE
    // data file in every hive dir (the DPP read opens one file per
    // probed centroid)
    parts.foreach { dir =>
      val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(f => !Paths.get(f).getFileName.toString.startsWith(".")
          && !Paths.get(f).getFileName.toString.startsWith("_"))
      assert(files.length == 1, s"$dir holds ${files.length} data files")
    }
    assert(IndexStore.read(spark, root, pSchema).count() == 3L)
  }

  test("streaming ingest twins write store fragments; compaction absorbs them") {
    // StreamPostings' batch_id=<id> sink IS the store's fragment
    // layout: point its outDir at fragmentsDir and the lifecycle
    // composes — stream in, serve immediately, compact into the base
    implicit val ctx = spark.sqlContext
    import graft.operators.TextAnalysis
    import graft.streaming.StreamPostings
    val root = freshRoot()
    val dir = "/root/testdata/sf0.001"
    val docs = sources.Tables(spark, dir, "documents")
    IndexStore.writeBase(
      TextAnalysis.positionalPostings(docs.filter($"doc_id" < 400L)), root)
    val delta = docs.filter($"doc_id" >= 400L)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val ckpt = Files.createTempDirectory("sp-ckpt-").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamPostings.ingest(mem.toDF().toDF("doc_id", "text"),
      IndexStore.fragmentsDir(root), ckpt).start()
    try {
      mem.addData(delta.take(delta.size / 2): _*)
      q.processAllAvailable()
      mem.addData(delta.drop(delta.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val pSchema = graft.streaming.StreamPostings.PostingsSchema
    val expected = TextAnalysis.positionalPostings(docs).count()
    assert(IndexStore.read(spark, root, pSchema).count() == expected)
    IndexStore.compact(spark, root, pSchema)
    assert(IndexStore.read(spark, root, pSchema).count() == expected,
      "compaction must absorb the streamed fragments losslessly")
    // the absorbed stream fragments survive ONE compaction (retained
    // for gen-0 readers) and retire on the next
    IndexStore.compact(spark, root, pSchema)
    assert(BatchLayout.batchDirs(spark, IndexStore.fragmentsDir(root)).isEmpty,
      "fragments absorbed by the retained generation should be GC'd")
    assert(IndexStore.read(spark, root, pSchema).count() == expected)
  }

  test("streaming tombstone ingest: erased the moment the micro-batch commits") {
    implicit val ctx = spark.sqlContext
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b", 3L -> "c"), root)
    val ckpt = Files.createTempDirectory("ts-ckpt-").toString
    val mem = MemoryStream[Long]
    val q = StreamTombstones.ingest(mem.toDF().toDF("k"), root, ckpt).start()
    try {
      mem.addData(2L)
      q.processAllAvailable()
      assert(readSet(root, Seq("k")) == Set(1L -> "a", 3L -> "c"))
      mem.addData(3L) // a second erasure batch layers on
      q.processAllAvailable()
      assert(readSet(root, Seq("k")) == Set(1L -> "a"))
    } finally q.stop()
    // compaction applies the streamed tombstones physically
    val c = IndexStore.compact(spark, root, schema, tombstoneKeys = Seq("k"))
    val gen = spark.read.parquet(s"$root/gen-${c.gen}")
    assert(gen.count() == 1L && gen.head.getLong(0) == 1L)
  }

  test("a reader racing the _CURRENT swap survives via the bounded retry") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b"), root)
    val ptr = Paths.get(root, "_CURRENT")
    val content = Files.readAllBytes(ptr)
    // simulate the writer's delete→rename window: the pointer vanishes,
    // then a concurrent "writer" restores it mid-way through the
    // reader's retry budget (5 probes × 10 ms)
    Files.delete(ptr)
    val restorer = new Thread(() => {
      Thread.sleep(15)
      Files.write(ptr, content)
    })
    restorer.start()
    try assert(readSet(root) == Set(1L -> "a", 2L -> "b"),
      "a read racing the pointer swap must retry, not throw")
    finally restorer.join()
    // and a genuinely-uncommitted store still reads as None (the retry
    // only costs ~50 ms there, it doesn't invent a commit)
    assert(IndexStore.commitOf(spark, freshRoot()).isEmpty)
  }

  test("compactIfNeeded: no-op within the file budget, compacts above it") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b", 3L -> "c").repartition(3), root)
    IndexStore.addFragment(rows(4L -> "d").repartition(2), root, 0L)
    val pressure = IndexStore.dataFileCount(spark, root)
    assert(pressure >= 4L)
    // within budget: the committed generation is left alone
    assert(IndexStore.compactIfNeeded(spark, root, schema,
      maxDataFiles = pressure).isEmpty)
    assert(IndexStore.commitOf(spark, root).get.gen == 0L)
    // above budget: one compaction, file count repaired, rows identical
    val before = readSet(root)
    val c = IndexStore.compactIfNeeded(spark, root, schema,
      maxDataFiles = pressure - 1)
    assert(c.contains(IndexStore.Commit(1L, 0L)))
    assert(IndexStore.dataFileCount(spark, root) == 1L)
    assert(readSet(root) == before)
  }

  test("over-threshold tombstone table degrades to a shuffle anti-join, same rows") {
    val root = freshRoot()
    IndexStore.writeBase(rows(1L -> "a", 2L -> "b", 3L -> "c"), root)
    IndexStore.addTombstones(Seq(2L).toDF("k"), root, 0L)
    assert(IndexStore.tombstoneBytes(spark, root) > 0L)
    // the gauge controls the FORCED hint (the driver-OOM risk); with
    // the hint gone Spark's own size stats decide — on this tiny test
    // table AQE may still broadcast, which is exactly the desired
    // degrade-gracefully behavior, so the assertion targets the hint
    // in the optimized logical plan, not the physical strategy
    def hinted(): Boolean = {
      val df = IndexStore.read(spark, root, schema, Seq("k"))
      df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    }
    // default gauge: the key table is tiny → broadcast hint attached
    assert(hinted(), "small tombstones should carry the broadcast hint")
    // force the over-threshold path: hint dropped, SAME rows come back
    System.setProperty("graft.tombstone.broadcast.max.bytes", "1")
    try {
      assert(!hinted(), "over-threshold tombstones must not force a broadcast")
      assert(readSet(root, Seq("k")) == Set(1L -> "a", 3L -> "c"))
    } finally System.clearProperty("graft.tombstone.broadcast.max.bytes")
    assert(readSet(root, Seq("k")) == Set(1L -> "a", 3L -> "c"))
  }
}
