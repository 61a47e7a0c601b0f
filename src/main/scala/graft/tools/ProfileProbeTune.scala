package graft.tools

import org.apache.spark.sql.functions._

/** Recall-target-vs-achieved measurement for
  * [[graft.operators.Similarity.tuneProbe]] (dev tool, not part of the
  * driver contract): on the sf0.1 embeddings (2k × 64-dim) under the
  * scaled-k regime (k=64 index, m=4/ksub=16 — SCALE.md §R16), tune for a
  * ladder of recall targets on one query sample, then VALIDATE each chosen
  * `(nprobe, rerank)` on a held-out query sample the tuner never saw —
  * the honest generalization check the operator's scaladoc prescribes
  * (the tuner's recall claim is conditional on the sample being
  * representative; this measures how conditional).
  *
  * Prints per target: the chosen knobs, tuning-sample recall (what the
  * plan promises), held-out recall (what a fresh batch gets), grid cells
  * walked (tuning cost in probe runs), and the held-out probe's min-of-2
  * wall, both-sentinel bracketed (round-16 protocol). */
object ProfileProbeTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val k = 64
    val idx = "/tmp/graft_probetune_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    val coarse = Similarity.ivfCentroids(emb, k = k, iters = 1)
    val books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 1)
    Similarity.ivfPqIndexWrite(emb, idx, coarse, books)
    release()
    def index = spark.read.parquet(idx)

    val tuneSample = emb.where(col("vec_id") < 10)
    val holdout = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
    val truthHold = ProfileUtil.pairsOf(Similarity.bruteForceTopK(holdout, emb, k = 5))
    release()

    Seq(0.5, 0.7, 0.9).foreach { target =>
      val (c, io) = ProfileUtil.calibBoth(spark)
      val plan = Similarity.tuneProbe(tuneSample, index, k = 5, coarse, books,
        recallTarget = target, maxRerank = 64)
      release()
      // held-out replay of the chosen pair: recall on queries the tuner
      // never saw, plus its wall (min-of-2, the serving-shaped cost)
      def probe() = Similarity.ivfPqTopKRefined(holdout, index, k = 5,
        coarse, books, nprobe = plan.nprobe, rerank = plan.rerank)
      val recallHold = ProfileUtil.pairsOf(probe()).intersect(truthHold).size.toDouble / truthHold.size
      release()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(probe())
        val dt = (System.nanoTime() - t0) / 1e9
        release(); dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[tune] target=$target%.2f -> nprobe=${plan.nprobe}%3d rerank=${plan.rerank}%3d " +
        f"met=${plan.targetMet} tuneRecall=${plan.recall}%.3f holdoutRecall=$recallHold%.3f " +
        f"cells=${plan.trace.size}%2d probeWall=$t%.2f s cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
      println(s"[tune]   trace: ${plan.trace.map { case (np, r, rc) => f"($np,$r)=$rc%.3f" }.mkString(" ")}")
      Console.flush()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    spark.stop()
  }
}
