package graft.pipeline

import graft.SparkSpec
import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end run of the FULL curation chain — ingest → clean →
  * dedup → decontaminate → select → shard export — through the one
  * [[CurationPipeline]] driver, on the sf0.001 documents table split into
  * a pipeline corpus (doc_id % 13 != 0) and a frozen held-out suite
  * (doc_id % 13 == 0).
  *
  * What only this spec can catch (vs the per-operator specs/oracles):
  * cross-stage cache lifecycle (the census assertions), parquet staging
  * round-trips between operators, and the composed row-level result —
  * the exported corpus is compared doc-for-doc against the same five
  * operators composed DIRECTLY in this spec with no staging writes.
  */
class CurationPipelineSpec extends SparkSpec {

  private def docsAll = spark.read.parquet(s"$sf/documents.parquet")
  private def corpus = docsAll.where(col("doc_id") % 13 =!= 0)
  private def heldOut = docsAll.where(col("doc_id") % 13 === 0)
    .select(col("doc_id"), col("text"))

  private val budget = 5000L

  private lazy val run = {
    val root = java.nio.file.Files.createTempDirectory("curation_e2e").toString
    val report = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed")
    (root, report)
  }

  /** The same chain composed directly — no staging writes, no driver —
    * the independent expectation for the row-level comparison. */
  private lazy val direct: DataFrame = {
    val cleaned = TextAnalysis.exactSubstrRemove(corpus, "doc_id", "text", n = 8)
      .select(col("doc_id"), col("clean_text"))
      .join(corpus.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val toks = cleaned.select(col("doc_id"), col("lang"),
      array_distinct(split(col("clean_text"), " ")).as("tok"))
    val canon = Dedup.canonicalIdsCascade(toks, "doc_id", "tok", "lang", 0.95)
    val kept = cleaned.join(canon, Seq("doc_id"))
      .where(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("lang"), col("clean_text"))
    val decon = TextAnalysis.exactSubstrRemoveAgainst(
        kept.select(col("doc_id"), col("clean_text")),
        heldOut.withColumnRenamed("text", "clean_text"),
        "doc_id", "clean_text", n = 8)
      .select(col("doc_id"), col("clean_text"))
      .join(kept.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val scored = decon.select(col("doc_id"), col("lang"), col("clean_text"),
      round(TextAnalysis.qualityScore(col("clean_text"), Seq("the", "a")), 6).as("quality"),
      TextAnalysis.tokenCount(col("clean_text")).as("n_tokens"))
    Sampling.keepByTokenBudget(scored, col("doc_id"), col("quality"),
      col("n_tokens"), budget)
  }

  test("stage flow is coherent: counts monotone where removal happens, " +
      "row-preserving where only spans are cut") {
    val (_, report) = run
    val byName = report.stages.map(s => s.name -> s).toMap
    assert(report.stages.map(_.name) ===
      Seq("clean", "dedup", "decontaminate", "select", "export"))
    // span removal keeps every doc; dedup and select genuinely drop rows
    assert(byName("clean").rowsOut === byName("clean").rowsIn)
    assert(byName("dedup").rowsOut < byName("dedup").rowsIn,
      "the planted near-dups must collapse")
    assert(byName("decontaminate").rowsOut === byName("decontaminate").rowsIn)
    assert(byName("select").rowsOut < byName("select").rowsIn,
      "the 5k budget must land mid-corpus")
    assert(byName("select").rowsOut > 0)
    // each stage's rowsIn is the previous stage's rowsOut
    report.stages.sliding(2).foreach { case Seq(a, b) =>
      assert(b.rowsIn === a.rowsOut, s"${b.name} rowsIn vs ${a.name} rowsOut")
    }
    assert(0L < report.keptTokens && report.keptTokens <= budget)
  }

  test("cache census is zero after every stage boundary") {
    val (_, report) = run
    report.stages.foreach { s =>
      assert(s.cachedBlocksAfter === 0,
        s"stage ${s.name} left ${s.cachedBlocksAfter} persisted blocks")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("exported corpus matches the directly-composed chain doc-for-doc") {
    val (root, _) = run
    val exported = spark.read.json(s"$root/05_export/shard=*")
      .select(col("doc_id").cast("long"), col("lang"), col("clean_text"),
        col("quality").cast("double"), col("n_tokens").cast("long"))
    val expect = direct.select(col("doc_id").cast("long"), col("lang"),
      col("clean_text"), col("quality").cast("double"),
      col("n_tokens").cast("long"))
    assert(exported.count() === expect.count())
    assert(exported.exceptAll(expect).isEmpty && expect.exceptAll(exported).isEmpty,
      "export content must equal the stage-free composition")
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("manifest accounts for the export: per-shard rows sum to the kept " +
      "corpus and every named file exists") {
    val (root, report) = run
    // `_`-prefixed: invisible to Spark readers — read as a loader would
    val lines = java.nio.file.Files
      .readAllLines(new java.io.File(s"$root/05_export", "_manifest.jsonl").toPath)
    assert(lines.size === 4, "one line per shard")
    val RowsField = """"rows":(\d+)""".r
    val FileField = """"file":"([^"]+)"""".r
    val total = lines.stream.mapToLong(l =>
      RowsField.findFirstMatchIn(l).get.group(1).toLong).sum
    assert(total === report.stages.last.rowsOut)
    lines.forEach { l =>
      val f = FileField.findFirstMatchIn(l).get.group(1)
      assert(new java.io.File(s"$root/05_export/$f").isFile)
    }
  }

  test("ingestBatch: the incremental chain — batch-local clean, " +
      "arrival-order-wins dedup, suite decontamination, staged survivors") {
    import spark.implicits._
    // near-dups are ORDER PERMUTATIONS: identical token sets (Jaccard 1.0)
    // with no shared 8-gram, so the clean stage leaves them intact and the
    // dedup stage is what judges them — isolating the two stages
    def words(p: String, k: Int) = (1 to k).map(p + _)
    val d1 = words("a", 20); val d2 = words("b", 12)
    val suite = Seq((900L, words("h", 9).mkString(" "))).toDF("doc_id", "text")
    val suiteGrams = graft.operators.TextAnalysis
      .corpusGramHashes(suite, "doc_id", "text", n = 8)
    val emptyState = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "clean_text")
    val root = java.nio.file.Files.createTempDirectory("curation_inc").toString
    // bootstrap: first batch against an empty state
    val batch0 = Seq((1L, "en", d1.mkString(" ")), (2L, "en", d2.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val state1 = CurationPipeline.ingestBatch(spark, batch0, emptyState,
      suiteGrams, s"$root/b0")
    assert(state1.as[(Long, String, String)].collect().toSet === Set(
      (1L, "en", d1.mkString(" ")), (2L, "en", d2.mkString(" "))),
      "clean batch against empty state passes through intact")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the batch bracket must release every cache")
    // second batch: one cross-dup of state (reversed d1), one internal dup
    // pair (permutations of each other), one suite-contaminated doc, one
    // clean doc
    val batch1 = Seq(
      (10L, "en", d1.reverse.mkString(" ")),
      (11L, "en", words("w", 15).mkString(" ")),
      (12L, "en", words("w", 15).reverse.mkString(" ")),
      (13L, "en", ("c1 c2 c3 " + words("h", 8).mkString(" ") + " c4 c5")),
      (14L, "en", words("z", 10).mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val out = CurationPipeline.ingestBatch(spark, batch1, state1,
      suiteGrams, s"$root/b1").as[(Long, String, String)].collect().toSet
    assert(out === Set(
      (11L, "en", words("w", 15).mkString(" ")), // min-id canonical of 11/12
      (13L, "en", "c1 c2 c3 c4 c5"),             // the leaked 8-token span cut
      (14L, "en", words("z", 10).mkString(" "))),
      "cross-dup dropped whole (arrival-order-wins), internal pair keeps " +
        "its canonical, suite span cut, clean doc intact")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // invariants a longer run relies on: survivors never near-dup the
    // state, and never carry a suite gram
    val pairs = Dedup.crossJaccardPairs(
      Seq((11L, "en", words("w", 15)), (13L, "en", Seq("c1", "c2", "c3", "c4", "c5")),
        (14L, "en", words("z", 10))).toDF("doc_id", "lang", "tok"),
      state1.select(col("doc_id"), col("lang"),
        array_distinct(split(col("clean_text"), " ")).as("tok")),
      "doc_id", "tok", "lang", 0.95)
    assert(pairs.count() === 0)
    // staging parquet is the restart boundary: re-reading it equals the
    // returned relation
    assert(spark.read.parquet(s"$root/b1").as[(Long, String, String)]
      .collect().toSet === out)
    // the batch/corpus id-disjointness contract is ENFORCED: a collision
    // would silently corrupt the arrival-order-wins dedup (the union keys
    // on the id), so it fails fast instead
    val colliding = Seq((1L, "en", words("q", 10).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    assert(intercept[IllegalArgumentException] {
      CurationPipeline.ingestBatch(spark, colliding, state1,
        suiteGrams, s"$root/b2")
    }.getMessage.contains("disjoint"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("ingestBatch shardByBatchLangs: survivors identical on a multi-lang " +
      "state whose extra langs the batch never carries (the exact " +
      "cross-dedup shard the cadence-crossover mitigation relies on)") {
    import spark.implicits._
    def words(p: String, k: Int) = (1 to k).map(p + _)
    val suite = Seq((900L, words("h", 9).mkString(" "))).toDF("doc_id", "text")
    val suiteGrams = graft.operators.TextAnalysis
      .corpusGramHashes(suite, "doc_id", "text", n = 8)
    // state: one en doc the batch near-dups, fr/de ballast the batch's
    // langs never touch — INCLUDING an fr row that is a verbatim token
    // permutation of a batch doc, which the lang-blocked pair contract
    // must ignore with or without sharding (the sharding's soundness in
    // one row: that doc can never pair, so pruning it changes nothing)
    val state = Seq(
      (1L, "en", words("a", 20).mkString(" ")),
      (2L, "fr", words("q", 14).mkString(" ")),  // same tokens as batch 11, lang fr
      (3L, "de", words("z", 10).mkString(" ")),
      (4L, "fr", words("y", 12).mkString(" "))
    ).toDF("doc_id", "lang", "clean_text")
    val batch = Seq(
      (10L, "en", words("a", 20).reverse.mkString(" ")), // cross-dup of 1
      (11L, "en", words("q", 14).mkString(" ")),          // fr twin can't pair
      (12L, "en", words("w", 16).mkString(" "))           // clean
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files.createTempDirectory("curation_shard").toString
    try {
      val plain = CurationPipeline.ingestBatch(spark, batch, state,
        suiteGrams, s"$root/p").as[(Long, String, String)].collect().toSet
      val sharded = CurationPipeline.ingestBatch(spark, batch, state,
        suiteGrams, s"$root/s", shardByBatchLangs = true)
        .as[(Long, String, String)].collect().toSet
      assert(sharded === plain,
        "lang-sharding must be survivor-invariant — pairs are lang-blocked " +
          "and verification is exact Jaccard")
      assert(plain === Set(
        (11L, "en", words("q", 14).mkString(" ")),
        (12L, "en", words("w", 16).mkString(" "))),
        "the en cross-dup drops; the fr verbatim twin never pairs (blocked)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
  }

  // ── restartability ──────────────────────────────────────────────────
  // The crash-recovery contract the object scaladoc states: a failed run
  // re-invoked under the same stagingRoot SKIPS every completed prefix
  // stage (marker match), recomputes the rest, and produces the same
  // export bytes an unfailed run produces.

  /** Every data file under a staged dir with its mtime — the "was this
    * recomputed?" evidence (a skip only READS the dir; reads don't touch
    * mtimes, an overwrite rewrites every file). */
  private def mtimes(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p))
        out += root.relativize(p).toString -> java.nio.file.Files
          .getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  /** Manifest identity minus the part-file names (which carry write-task
    * UUIDs): (shard, rows, bytes, md5) — md5 is of the exact shard bytes,
    * so equality here IS byte-identity of the export. */
  private def manifestStats(root: String): Set[String] = {
    val Keep = """"(shard|rows|bytes|md5)":("[^"]*"|\d+)""".r
    java.nio.file.Files
      .readAllLines(new java.io.File(s"$root/05_export", "_manifest.jsonl").toPath)
      .stream.map[String](l => Keep.findAllIn(l).mkString(","))
      .toArray.map(_.toString).toSet
  }

  test("restart: a run killed after stage 2 resumes — stages 1..2 skip " +
      "with their staged bytes untouched, the rest recompute, and the " +
      "export is byte-identical to an unfailed run") {
    val root1 = java.nio.file.Files.createTempDirectory("curation_resume").toString
    // poison pill: heldOut first evaluates AFTER stage 2 completes, so
    // this run dies exactly at the 2→3 boundary — the mid-chain kill
    val poisoned = heldOut.where(assert_true(length(col("text")) < 0).isNull)
    intercept[Exception] {
      CurationPipeline.run(spark, corpus, poisoned, root1,
        tokenBudget = budget, shards = 4, seed = "spec-seed")
    }
    graft.GraftSession.releaseCaches(spark, blocking = true)
    assert(new java.io.File(s"$root1/02_dedup", "_GRAFT_STAGE_OK").isFile,
      "the killed run must have committed stages 1..2")
    assert(!new java.io.File(s"$root1/03_decontam").exists,
      "the killed run must not have staged stage 3")
    val before1 = mtimes(s"$root1/01_clean"); val before2 = mtimes(s"$root1/02_dedup")
    val report = CurationPipeline.run(spark, corpus, heldOut, root1,
      tokenBudget = budget, shards = 4, seed = "spec-seed")
    assert(report.stages.map(s => s.name -> s.skipped) === Seq(
      "clean" -> true, "dedup" -> true, "decontaminate" -> false,
      "select" -> false, "export" -> false))
    assert(mtimes(s"$root1/01_clean") === before1 &&
           mtimes(s"$root1/02_dedup") === before2,
      "resume must not rewrite a completed stage's bytes")
    // the resumed chain is still coherent and cache-clean
    report.stages.sliding(2).foreach { case Seq(a, b) => assert(b.rowsIn === a.rowsOut) }
    assert(report.stages.forall(_.cachedBlocksAfter === 0))
    // byte-identity vs the unfailed run (the shared lazy `run` fixture)
    val (rootClean, _) = run
    assert(manifestStats(root1) === manifestStats(rootClean),
      "resumed export must be byte-identical to an unfailed run's")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root1))
  }

  test("restart: a completed root re-invoked skips every stage; a changed " +
      "knob recomputes exactly its stage and everything downstream") {
    val root = java.nio.file.Files.createTempDirectory("curation_resume2").toString
    val r1 = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed")
    // full skip: nothing recomputes, the report is the same shape
    val r2 = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed")
    assert(r2.stages.forall(_.skipped), "a completed root must fully skip")
    assert(r2.stages.map(s => (s.name, s.rowsIn, s.rowsOut)) ===
      r1.stages.map(s => (s.name, s.rowsIn, s.rowsOut)))
    assert(r2.keptTokens === r1.keptTokens)
    // a select-stage knob change: the prefix (1..3) skips, 4..5 recompute
    val r3 = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget / 2, shards = 4, seed = "spec-seed")
    assert(r3.stages.map(s => s.name -> s.skipped) === Seq(
      "clean" -> true, "dedup" -> true, "decontaminate" -> true,
      "select" -> false, "export" -> false))
    assert(r3.stages.find(_.name == "select").get.rowsOut <
      r1.stages.find(_.name == "select").get.rowsOut,
      "the halved budget must genuinely re-select")
    // a dedup-stage knob change ripples: only stage 1 skips
    val r4 = CurationPipeline.run(spark, corpus, heldOut, root,
      dedupThreshold = 0.90, tokenBudget = budget, shards = 4, seed = "spec-seed")
    assert(r4.stages.map(s => s.name -> s.skipped) === Seq(
      "clean" -> true, "dedup" -> false, "decontaminate" -> false,
      "select" -> false, "export" -> false))
    // resume = false forces a full recompute even on a completed root
    val r5 = CurationPipeline.run(spark, corpus, heldOut, root,
      dedupThreshold = 0.90, tokenBudget = budget, shards = 4,
      seed = "spec-seed", resume = false)
    assert(r5.stages.forall(!_.skipped))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("pluggable scorer: a model-scored run recomputes exactly stages 4-5 " +
      "on resume and selects by the classifier score") {
    val root = java.nio.file.Files.createTempDirectory("curation_scorer").toString
    // first build: default heuristic scorer
    CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed")
    // swap the scorer to the published hashed-linear model: stage 4's
    // chained fingerprint changes, stages 1-3 must SKIP, 4-5 recompute
    val w = graft.operators.QualityModel.fixedWeights().toSeq
    val model: CurationPipeline.Scorer = CurationPipeline.Scorer.HashedLinear(w, 0.1)
    val report = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed",
      scorer = Some(model))
    val skipped = report.stages.map(s => s.name -> s.skipped).toMap
    assert(skipped === Map("clean" -> true, "dedup" -> true,
      "decontaminate" -> true, "select" -> false, "export" -> false))
    // the selected set is the model-scored budget cut over the staged
    // decontaminated text — composed here directly from stage 3's output
    val decon = spark.read.parquet(s"$root/03_decontam")
    val scored = decon.select(col("doc_id"), col("clean_text"),
      graft.operators.QualityModel.scoreColumn(col("clean_text"), w.toArray, 0.1)
        .as("quality"),
      TextAnalysis.tokenCount(col("clean_text")).as("n_tokens"))
    val expect = Sampling.keepByTokenBudget(scored, col("doc_id"),
      col("quality"), col("n_tokens"), budget)
      .select(col("doc_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val got = spark.read.parquet(s"$root/04_select")
      .select(col("doc_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(got === expect, "stage 4 must select by the classifier score")
    assert(got.nonEmpty, "the model-scored budget must keep documents")
    // a re-invocation with the SAME scorer now skips everything
    val again = CurationPipeline.run(spark, corpus, heldOut, root,
      tokenBudget = budget, shards = 4, seed = "spec-seed",
      scorer = Some(model))
    assert(again.stages.forall(_.skipped), "identical knobs must fully skip")
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }

  test("decontamination cut held-out spans: suite 8-grams are absent from " +
      "the exported text") {
    val (root, _) = run
    val exported = spark.read.json(s"$root/05_export/shard=*")
      .select(col("doc_id").cast("long").as("doc_id"), col("clean_text"))
    // independent of the operator's own machinery: enumerate the windows
    // with SQL higher-order functions and semi-join against the suite
    val suiteTok = heldOut.select(split(col("text"), " ").as("tk"))
      .select(explode(expr("transform(sequence(0, size(tk) - 8), i -> concat_ws(' ', slice(tk, i + 1, 8)))")).as("gram"))
      .distinct()
    val expTok = exported.select(split(col("clean_text"), " ").as("tk"))
      .where(size(col("tk")) >= 8)
      .select(explode(expr("transform(sequence(0, size(tk) - 8), i -> concat_ws(' ', slice(tk, i + 1, 8)))")).as("gram"))
    val leaked = expTok.join(suiteTok, Seq("gram"), "left_semi").count()
    assert(leaked === 0L, s"$leaked held-out 8-grams survived decontamination")
    graft.GraftSession.releaseCaches(spark, blocking = true)
  }
}
