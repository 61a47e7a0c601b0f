package graft.streaming

import graft.SparkSpec
import graft.pipeline.CurationPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

case class Ev(reward_id: String, ts: Timestamp, event_type: String, value: Double)

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming keyed dedup drops duplicate reward_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.dedupStream(input.toDF(), "reward_id", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(
      Ev("r1", t("2024-01-01 10:00:00"), "a", 1.0),
      Ev("r1", t("2024-01-01 10:05:00"), "a", 1.0), // dup key
      Ev("r2", t("2024-01-01 11:00:00"), "b", 2.0))
    q.processAllAvailable()
    input.addData(Ev("r1", t("2024-01-02 09:00:00"), "a", 3.0)) // still within watermark
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("reward_id").as[String].collect()
    q.stop()
    assert(out.sorted.toSeq === Seq("r1", "r2"))
  }

  test("streaming decontamination gate matches the batch gate on a replayed stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.where(col("doc_id") >= 10)
    val bench = docs.where(col("doc_id") < 10)
    // benchmark keys exactly as the batch gate hashes them
    val benchKeys = bench
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("tok"))
      .select(explode(graft.operators.TextAnalysis.ngrams(col("tok"), 4)).as("gs"))
      .select(graft.operators.TextAnalysis.md5Long(col("gs")).as("g"))
      .distinct().as[Long].collect().toSeq
    val expectedClean = graft.operators.TextAnalysis
      .bloomDecontaminate(corpus, bench, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    val gated = Streams.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), benchKeys, "doc_id", "text", n = 4)
    val q = gated.writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    // replay the corpus in two micro-batches
    val rows = corpus.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    val streamed = spark.table("decon_out").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(streamed === expectedClean,
      "the stateless streaming gate must pass exactly the batch gate's clean set")
    assert(streamed.size < rows.length, "fixture should actually drop contaminated docs")
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("streaming span decontamination via foreachBatch: micro-batch union ≡ one batch run") {
    // exactSubstrRemoveAgainst is per-doc against a FROZEN corpus, so the
    // result for a doc does not depend on which micro-batch carried it —
    // the union of per-micro-batch removals equals one batch removal over
    // everything. foreachBatch is the composition point (the operator's
    // per-doc lead window is a batch-only shape). The corpus gram reduce
    // — the operator's dominant stage — is built ONCE via
    // corpusGramHashes and persisted; each micro-batch pays only its own
    // batch-sized attach (the pattern the operator's scaladoc prescribes;
    // calling exactSubstrRemoveAgainst per batch would rebuild it).
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val incoming = docs.where(col("doc_id") % 7 === 0)
    val frozen = docs.where(col("doc_id") % 7 =!= 0).select("doc_id", "text").cache()
    val expected = graft.operators.TextAnalysis
      .exactSubstrRemoveAgainst(incoming, frozen, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val frozenGrams = graft.operators.TextAnalysis
      .corpusGramHashes(frozen, "doc_id", "text", n = 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val acc = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cleaned = graft.operators.TextAnalysis
          .exactSubstrRemoveAgainstGrams(batch, frozenGrams, "doc_id", "text", n = 8)
          .as[(Long, Long, Long, Long, String)](
            org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long, String)])
          .collect()
        acc.synchronized { acc ++= cleaned }
        ()
      }
      .start()
    val rows = incoming.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1.toIndexedSeq); q.processAllAvailable()
    input.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    assert(acc.toSet === expected,
      "frozen-corpus span removal must be micro-batch-invariant")
    assert(expected.exists(_._3 > 0), "fixture must actually cut spans")
    frozenGrams.unpersist()
    frozen.unpersist()
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("row-local text operators run unchanged on a stream (batch/stream unification)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    // the same Column expressions the batch queries use, applied to a stream
    def gate(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tok", graft.operators.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text"), Seq("the", "a")).as("q"),
        graft.operators.TextAnalysis.dupNgramFraction(col("tok"), 2).as("rep"),
        size(graft.operators.TextAnalysis.collapseRepeats(col("tok"))).as("n_clean"))
    val expected = gate(docs).as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("txt_gate_out")
      .outputMode("append").start()
    input.addData(docs.as[(Long, String)].collect().toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("txt_gate_out")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    q.stop()
    assert(streamed.toSeq === expected.toSeq,
      "stateless Column expressions must produce identical values under streaming")
  }

  test("model-based quality filtering runs unchanged on a stream") {
    // the classifier gate is a pure row-local expression (plan-asserted in
    // QualityModelSpec), so the nightly-ingest shape — score + keep-filter
    // inside the stream — must match the batch gate doc-for-doc
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.QualityModel.hashedLinearScore(df, "text",
          graft.operators.QualityModel.fixedWeights(), bias = 0.1)
        .where(col("keep")).select(col("doc_id"), col("model_score"))
    val expected = gate(docs).as[(Long, Double)].collect().sortBy(_._1)
    assert(expected.nonEmpty, "the fixture gate must keep at least one doc")
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qm_gate_out")
      .outputMode("append").start()
    input.addData(docs.as[(Long, String)].collect().toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.table("qm_gate_out")
      .as[(Long, Double)].collect().sortBy(_._1)
    q.stop()
    assert(streamed.toSeq === expected.toSeq,
      "the classifier gate must produce identical keep decisions under streaming")
  }

  test("stream-stream interval join matches views within the lookback only") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val joined = Streams.purchaseViewJoin(
      purchases.toDF().withColumnRenamed("reward_id", "event_id")
        .withColumn("user_id", org.apache.spark.sql.functions.lit(1L)),
      views.toDF().withColumnRenamed("reward_id", "event_id")
        .withColumn("user_id", org.apache.spark.sql.functions.lit(1L)),
      lookback = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    views.addData(
      Ev("v1", t("2024-01-01 09:30:00"), "view", 0.0),  // within 1h of purchase
      Ev("v2", t("2024-01-01 07:00:00"), "view", 0.0))  // too old
    purchases.addData(Ev("p1", t("2024-01-01 10:00:00"), "purchase", 42.0))
    q.processAllAvailable()
    val out = spark.table("ssj_out").select("purchase_id", "view_id")
      .as[(String, String)].collect().toSet
    q.stop()
    assert(out === Set(("p1", "v1")))
  }

  test("streaming index ingest is exactly-once: a replayed micro-batch changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val coarse = Similarity.ivfCentroids(e, k = 4, iters = 1)
    val books = Similarity.pqTrain(e, 4, 16, iters = 1)
    val streamDir = java.nio.file.Files.createTempDirectory("stream_once").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_once_ckpt").toString
    try {
      val input = MemoryStream[(Long, Seq[Float])]
      val q = Streams.ivfPqIndexSink(
          input.toDF().toDF("vec_id", "embedding"), streamDir, coarse, books)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val (b0, b1) = rows.splitAt(rows.length / 2)
      input.addData(b0.toIndexedSeq); q.processAllAvailable()
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      q.stop()
      val count = spark.read.parquet(streamDir).count()
      assert(count === e.count())
      // a crash after batch 1's files landed but before its commit marker
      // replays batch 1 with the same id and rows — the foreachBatch body
      // re-runs verbatim; row count and answers must not move
      val lastBatch = e.where(col("vec_id").isin(b1.map(_._1): _*))
      assert(new java.io.File(s"$streamDir/_batches/batch-1").delete())
      Similarity.ivfPqIndexAppendOnce(lastBatch, streamDir, 1L, coarse, books)
      assert(spark.read.parquet(streamDir).count() === count,
        "a replayed micro-batch must not grow the index")
      val probe = e.where(col("vec_id") < 5)
      def top(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
      val streamed = top(Similarity.ivfPqTopKIndexed(
        probe, spark.read.parquet(streamDir), 5, coarse, books, nprobe = 4))
      val mem = top(Similarity.ivfPqTopK(probe, e, 5, coarse, books, nprobe = 4))
      assert(streamed.toSeq === mem.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
  }

  test("streaming index ingest: two micro-batches ≡ one batch write ≡ in-memory search") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val coarse = Similarity.ivfCentroids(e, k = 4, iters = 1)
    val books = Similarity.pqTrain(e, 4, 16, iters = 1)
    val streamDir = java.nio.file.Files.createTempDirectory("stream_index").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_index_ckpt").toString
    try {
      val input = MemoryStream[(Long, Seq[Float])]
      val q = Streams.ivfPqIndexSink(
          input.toDF().toDF("vec_id", "embedding"), streamDir, coarse, books)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      q.stop()
      val probe = e.where(col("vec_id") < 5)
      def top(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
      val streamed = top(Similarity.ivfPqTopKIndexed(
        probe, spark.read.parquet(streamDir), 5, coarse, books, nprobe = 4))
      val mem = top(Similarity.ivfPqTopK(probe, e, 5, coarse, books, nprobe = 4))
      assert(streamed.toSeq === mem.toSeq,
        "a stream-grown index must answer identically to the in-memory path")
      // the exact-cosine tier works off the same stream-grown index too
      val exact = top(Similarity.ivfTopKIndexed(
        probe, spark.read.parquet(streamDir), 3, coarse, nprobe = 4))
      val exactMem = top(Similarity.ivfTopK(probe, e, 3, coarse, nprobe = 4))
      assert(exact.toSeq === exactMem.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
  }

  test("streaming index ingest with compactEvery: files collapse mid-stream, search still exact") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val coarse = Similarity.ivfCentroids(e, k = 4, iters = 1)
    val books = Similarity.pqTrain(e, 4, 16, iters = 1)
    val streamDir = java.nio.file.Files.createTempDirectory("stream_compact").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_compact_ckpt").toString
    try {
      val input = MemoryStream[(Long, Seq[Float])]
      val q = Streams.ivfPqIndexSink(
          input.toDF().toDF("vec_id", "embedding"), streamDir, coarse, books,
          compactEvery = 2)
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
      // six micro-batches → compactions fire at batch ids 2 and 4
      rows.grouped(math.max(1, rows.length / 6)).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      q.stop()
      val filesPerCluster = new java.io.File(streamDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
      assert(filesPerCluster.nonEmpty && filesPerCluster.max <= 6,
        s"mid-stream compaction must bound file growth, got ${filesPerCluster.mkString(",")}")
      val probe = e.where(col("vec_id") < 5)
      def top(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
      val streamed = top(Similarity.ivfPqTopKIndexed(
        probe, spark.read.parquet(streamDir), 5, coarse, books, nprobe = 4))
      assert(streamed.toSeq === top(Similarity.ivfPqTopK(probe, e, 5, coarse, books, nprobe = 4)).toSeq,
        "a stream-grown, mid-stream-compacted index must stay exact")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
  }

  test("incremental hourly rollup emits finalized windows after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.hourlyRollup(input.toDF(), "ts")
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("append").start()
    input.addData(
      Ev("r1", t("2024-01-01 10:05:00"), "purchase", 10.0),
      Ev("r2", t("2024-01-01 10:45:00"), "purchase", 5.0),
      Ev("r3", t("2024-01-01 10:50:00"), "view", 1.0))
    q.processAllAvailable()
    // advance event time far past the 10:00 window + 2h watermark
    input.addData(Ev("r4", t("2024-01-01 15:00:00"), "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("rollup_out")
      .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(out.contains(("purchase", 2L, 15.0)))
    assert(out.contains(("view", 1L, 1.0)))
  }

  test("streaming curation ingest via foreachBatch: each micro-batch runs " +
      "the gauntlet against the accumulated state") {
    // The literal drive of CurationPipeline.ingestBatch's scaladoc claim
    // ("the shape a foreachBatch stream runs"): micro-batches arrive over
    // a MemoryStream, each is curated against the state accumulated from
    // every earlier batch, survivors append to the state. The same
    // batches pushed through direct sequential calls must produce the
    // identical final state — proving the wiring survives the streaming
    // engine (serialization, cache brackets per micro-batch, staging).
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def words(p: String, k: Int) = (1 to k).map(p + _)
    val suite = Seq((900L, words("h", 9).mkString(" "))).toDF("doc_id", "text")
    val suiteGrams = graft.operators.TextAnalysis
      .corpusGramHashes(suite, "doc_id", "text", n = 8)
    val root = java.nio.file.Files.createTempDirectory("curation_stream").toString
    val b1 = Seq((1L, "en", words("a", 20).mkString(" ")),
      (2L, "en", words("b", 12).mkString(" ")))
    val b2 = Seq(
      (10L, "en", words("a", 20).reverse.mkString(" ")),    // dup of state doc 1
      (13L, "en", "c1 c2 c3 " + words("h", 8).mkString(" ") + " c4 c5"),
      (14L, "en", words("z", 10).mkString(" ")))
    try {
      // streaming drive: state lives as staged parquet across micro-batches
      val statePaths = scala.collection.mutable.ArrayBuffer.empty[String]
      def state(): org.apache.spark.sql.DataFrame =
        if (statePaths.isEmpty)
          Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "clean_text")
        else statePaths.map(spark.read.parquet(_)).reduce(_ unionByName _)
      val input = MemoryStream[(Long, String, String)]
      val q = input.toDF().toDF("doc_id", "lang", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            val p = s"$root/stream_b$id"
            CurationPipeline.ingestBatch(spark, batch, state(), suiteGrams, p)
            statePaths.synchronized { statePaths += p }
          }
          ()
        }
        .start()
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      q.stop()
      val streamed = state().as[(Long, String, String)].collect().toSet
      // direct sequential twin
      val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "clean_text")
      val s1 = CurationPipeline.ingestBatch(spark,
        b1.toDF("doc_id", "lang", "text"), empty, suiteGrams, s"$root/direct_b1")
      val s2 = CurationPipeline.ingestBatch(spark,
        b2.toDF("doc_id", "lang", "text"), s1, suiteGrams, s"$root/direct_b2")
      val direct = s1.unionByName(s2).as[(Long, String, String)].collect().toSet
      assert(streamed === direct,
        "the stream-driven state must equal the direct sequential chain")
      assert(streamed.map(_._1) === Set(1L, 2L, 13L, 14L),
        "cross-batch dup dropped, contaminated span cut, clean docs kept")
      assert(streamed.find(_._1 == 13L).get._3 === "c1 c2 c3 c4 c5")
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "per-micro-batch brackets must leave no cache behind")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
  }
}
