package graft.tools

import org.apache.spark.sql.functions._

/** BPE encode-kernel ladder (dev tool, not part of the driver contract):
  * the replace-chain kernel ([[graft.operators.BpeTrain.bpeEncode]]) pays
  * one linear string pass PER MERGE per document — measured fine at the
  * frozen 16-merge artifact, named as the 32k-merge wall in its scaladoc —
  * while the rank-replay kernel ([[graft.operators.BpeTrain.bpeEncodeRank]])
  * ships the table as a rank lookup and replays only the merges present
  * in each word. This tool times BOTH kernels over the sf0.1 corpus at
  * 16 / 256 / 4096 merges and asserts their outputs identical per leg
  * (the equivalence spec's assertion, re-run at bench scale).
  *
  * Table construction: the trained PREFIX is every merge the sf0.01
  * corpus can yield — the driver corpus carries only 31 distinct words
  * (max length 8), so training EXHAUSTS at 89 merges with every word a
  * single symbol (measured; the tool accepts exhaustion) — and the
  * larger legs pad with never-firing synthetic pairs ("zN","yN"). The
  * pad is the honest shape for the replace chain — its cost is per
  * TABLE ENTRY whether or not the merge fires (a full string pass
  * each) — and for the rank kernel an absent pair costs one hash miss
  * per rescan, which is exactly its production claim: per-word merge
  * WORK is bounded by the word's length (≤ 7 fires at an 8-char max),
  * never by the table.
  *
  * Timed action: Bench.materialize (noop datasource write — count() would
  * let Catalyst prune the encode work away), min of 3 reps, both-sentinel
  * bracketed per the round-16 protocol. */
object ProfileBpeKernels {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // a Θ(merges) expression tree renders a plan string big enough to OOM
    // the driver inside AQE's explain bookkeeping (measured round 19:
    // PlanStringConcat in AdaptiveSparkPlanExec.onUpdatePlan) — cap the
    // string so the 4096-merge chain's RUNTIME is what gets measured,
    // not its pretty-printer
    spark.conf.set("spark.sql.maxPlanStringLength", (8 << 20).toString)
    import graft.operators.BpeTrain

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val trainCorpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    println("[bpe-kernels] training to exhaustion on sf0.01 ...")
    Console.flush()
    val t0 = System.nanoTime()
    val trained = BpeTrain.bpeTrain(trainCorpus, "text", merges = 256,
      checkpointEvery = 8)
    println(f"[bpe-kernels] trained ${trained.size} merges in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (exhaustion expected ~89: " +
      "31 distinct words, max length 8)")
    Console.flush()
    graft.GraftSession.releaseCaches(spark, blocking = true)
    require(trained.size >= 64,
      s"corpus yielded only ${trained.size} merges — fixture assumption broken")

    def table(m: Int): Seq[(String, String)] =
      if (m <= trained.size) trained.take(m)
      else trained ++ (0 until (m - trained.size)).map(i => (s"z$i", s"y$i"))

    def time(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t = System.nanoTime()
        graft.Bench.materialize(df)
        (System.nanoTime() - t) / 1e9
      }.min

    // warm-up: codegen classes for both kernels, never timed
    graft.Bench.materialize(BpeTrain.bpeEncode(docs, "text", table(16)))
    graft.Bench.materialize(BpeTrain.bpeEncodeRank(docs, "text", table(16)))
    graft.GraftSession.releaseCaches(spark, blocking = true)

    Seq(16, 256, 1024, 4096).foreach { m =>
      val tab = table(m)
      val (c, io) = ProfileUtil.calibBoth(spark)
      val rank = time(BpeTrain.bpeEncodeRank(docs, "text", tab)
        .select(col("doc_id"), col("bpe_len")))
      println(f"[bpe-kernels] merges=$m%-5d rank=$rank%6.2f s"); Console.flush()
      // the chain leg may not SURVIVE at large tables (a Theta(merges)
      // expression tree is itself the wall) — report the failure as the
      // data point instead of dying with it
      // catch Throwable, not NonFatal: the chain's failure modes at large
      // tables are ERRORS (StackOverflowError converting 4096 nested
      // Columns to Expressions) and the stack is already unwound when we
      // get control back — the tool must outlive the leg it convicts
      val chain =
        try scala.util.Success(time(BpeTrain.bpeEncode(docs, "text", tab)
          .select(col("doc_id"), col("bpe_len"))))
        catch { case e: Throwable => scala.util.Failure(e) }
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      chain match {
        case scala.util.Success(tc) =>
          // equivalence at bench scale: token streams identical doc-for-doc
          val a = BpeTrain.bpeEncode(docs, "text", tab)
            .select(col("doc_id"), concat_ws(" ", col("bpe_tokens")).as("t"))
          val b = BpeTrain.bpeEncodeRank(docs, "text", tab)
            .select(col("doc_id"), concat_ws(" ", col("bpe_tokens")).as("t"))
          val drift = a.exceptAll(b).count() + b.exceptAll(a).count()
          require(drift == 0, s"kernel drift at $m merges: $drift rows differ")
          println(f"[bpe-kernels] merges=$m%-5d chain=$tc%7.2f s rank=$rank%6.2f s " +
            f"ratio=${tc / rank}%6.1fx cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        case scala.util.Failure(e) =>
          println(f"[bpe-kernels] merges=$m%-5d chain=FAILED " +
            f"(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}) " +
            f"rank=$rank%6.2f s cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
      }
      Console.flush()
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
    spark.stop()
  }
}
