package graft.tools

import org.apache.spark.sql.functions._

/** Attribute q98's ~1.0/decade exponent (ProfileThirdDecade r17:
  * 2.37 / 13.49 / 136.60 s): the hypothesis is that the wall is the
  * quality-SCORING text scan, which the query's lineage pays TWICE —
  * once into the (group, score)-level aggregate and once into the
  * selection join — because `keepByGroupTokenBudget` references its
  * input relation on both sides without materializing it. Three legs at
  * each dir, sentinel-bracketed:
  *
  *   A. score-only: the scored projection (id, source, quality, tokens)
  *      noop-written once — the irreducible linear term.
  *   B. q98 as declared (the double-scan baseline).
  *   C. the persist lever: score once into a MEMORY_AND_DISK persist,
  *      run the same selection arithmetic over the persisted relation.
  *
  * Decision rule (seam policy): if B ≈ 2A and C ≈ A + selection-noise,
  * the operator family (topKByScore / keepByTokenBudget /
  * keepByGroupTokenBudget) gains an internal persist of its scored
  * input; if B − C is inside host resolution, the lever is rejected and
  * the linear term is documented as the scoring scan itself. */
object ProfileQ98Attrib {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale3_sf1", "/tmp/graft_scale3_sf10")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def leg(name: String, dir: String, runs: Int)(body: => Unit): Unit = {
      val (c, io) = ProfileUtil.calibBoth(spark)
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[attrib] $name $dir runs=$runs min=$t%.2f s " +
        f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }

    def scored(dir: String) = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.qualityScore(col("text"), Stop).as("quality"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))

    dirs.foreach { dir =>
      leg("A_score_only", dir, 2) {
        graft.Bench.materialize(scored(dir))
      }
      leg("B_q98_declared", dir, 2) {
        graft.Bench.materialize(
          graft.queries.Queries.all("q98_domain_budget")(spark, dir))
      }
      leg("C_persisted_lever", dir, 2) {
        val s = scored(dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          graft.Bench.materialize(
            graft.operators.Sampling.keepByGroupTokenBudget(
              s, col("source"), col("doc_id"), col("quality"),
              col("n_tokens"), budgetPerGroup = 800L))
        } finally s.unpersist(true)
      }
    }
    spark.stop()
  }
}
