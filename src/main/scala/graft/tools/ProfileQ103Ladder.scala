package graft.tools

import org.apache.spark.sql.functions._

/** q103 decade ladder (dev tool, not part of the driver contract): the
  * indexed semantic-decontamination GATE is the one round-18 corpus-scale
  * composition whose components are laddered (index write, indexed
  * probes, the radius gate's recall curve) but whose composed cost never
  * was. The suite is FIXED (sf0.1's declared slice, 223 rows — eval
  * suites do not grow with the corpus) while the corpus grows ×10 per
  * leg ([[ProfileAnnScale]]'s rotation-perturbed embeddings, shared
  * markers); a fresh index is built per decade. Three configs per leg:
  *
  *  - "prod": the shortlist gate at its declared serving defaults
  *    (nprobe 2, rerank 4, hits 64) — the deployment shape whose decade
  *    exponent is the banked claim;
  *  - "radius": [[graft.operators.Similarity.semanticDecontaminateIndexedRadius]]
  *    at nprobe 2 — the batch-job default (no shortlist, pure coverage);
  *  - "cover": q103's oracle knobs (nprobe = all 8, 2²⁰ shortlist) —
  *    corpus-sized shortlist BY CONSTRUCTION; the round-19 refinedImpl
  *    fix (no forced broadcast past the pushdown rail) makes it
  *    survivable at the fourth decade, not cheap. One rep at sf100.
  *
  * The "declared" line times q103 exactly as gated at sf0.1 (suite tied
  * to the corpus by %9) for cross-reference with the bench row.
  * sf0.1 → sf1 → sf10, plus sf100 (fourth decade, ~2M vectors) under
  * GRAFT_FOURTH_DECADE=1. Each decade both-sentinel bracketed, min-of-2
  * (except cover@sf100), noop-write action, index build timed apart. */
object ProfileQ103Ladder {
  def main(args: Array[String]): Unit = {
    val fourth = sys.env.get("GRAFT_FOURTH_DECADE").contains("1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_annscale_sf1"
    val sf10 = "/tmp/graft_annscale_sf10"
    val sf100 = "/tmp/graft_annscale_sf100"
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf1, 10, 1, 32)
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf10, 100, 1, 32)
    if (fourth) ProfileAnnScale.buildScaledEmb(spark, sf10, sf100, 10, 13, 64)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    // the FIXED eval suite: sf0.1's declared suite slice (555 rows)
    val suite = spark.read.parquet(s"$sf01/embeddings.parquet")
      .where(col("vec_id") % 9 === 0)

    // warm-up (codegen classes) at the gate corpus, never timed
    graft.Bench.materialize(graft.queries.Queries
      .all("q103_semantic_decontam_indexed")(spark, "/root/testdata/sf0.01"))
    release()

    // declared config, sf0.1 only — the gate's own cost for reference
    {
      val (c, io) = ProfileUtil.calibBoth(spark)
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(graft.queries.Queries
          .all("q103_semantic_decontam_indexed")(spark, sf01))
        val dt = (System.nanoTime() - t0) / 1e9
        release(); dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[q103] declared sf0.1 min=$t%7.2f s " +
        f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }

    val rows = collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    (Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10) ++
      (if (fourth) Seq("sf100" -> sf100) else Nil))
      .foreach { case (name, dir) =>
        val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = corpus.count()
        val idxDir = s"/tmp/graft_q103_idx_$name"
        val (c, io) = ProfileUtil.calibBoth(spark)
        val tb0 = System.nanoTime()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
        val cached = corpus.persist()
        val (coarse, books) =
          try (Similarity.ivfCentroids(cached, k = 8, iters = 1),
               Similarity.pqTrain(cached, m = 4, ksub = 16, iters = 1))
          finally cached.unpersist()
        Similarity.ivfPqIndexWrite(corpus, idxDir, coarse, books)
        val build = (System.nanoTime() - tb0) / 1e9
        release()
        val idx = spark.read.parquet(idxDir)
        def leg(tag: String, reps: Int)(df: => org.apache.spark.sql.DataFrame): Double = {
          val t = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            graft.Bench.materialize(df)
            val dt = (System.nanoTime() - t0) / 1e9
            release(); dt
          }.min
          println(f"[q103] fixed-suite $name%-6s $tag%-6s vectors=$n%9d " +
            f"build=$build%7.2f s probe min=$t%8.2f s")
          Console.flush()
          t
        }
        // production configs: the shortlist gate at its declared serving
        // defaults, and the radius gate (the batch-job default) at the
        // same nprobe — these are the deployment shapes whose decades
        // matter; the covering config is the ORACLE gear (its shortlist
        // is corpus-sized by construction — the round-19 refinedImpl fix
        // makes it survivable, not cheap), timed last and once at the
        // fourth decade
        val tProd = leg("prod", 2)(Similarity.semanticDecontaminateIndexed(
          corpus, suite, idx, coarse, books, tau = 0.40))
        leg("radius", 2)(Similarity.semanticDecontaminateIndexedRadius(
          corpus, suite, idx, coarse, tau = 0.40, nprobe = 2))
        leg("cover", if (name == "sf100") 1 else 2)(
          Similarity.semanticDecontaminateIndexed(
            corpus, suite, idx, coarse, books,
            tau = 0.40, nprobe = 8, rerank = 1, hitsPerSuiteRow = 1 << 20))
        val (c2, io2) = ProfileUtil.calibBoth(spark)
        println(f"[q103] $name%-6s brackets cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        Console.flush()
        rows += ((name, tProd, n))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      }
    rows.zip(rows.drop(1)).foreach { case ((a, ta, na), (b, tb, nb)) =>
      // production-config exponents: log10 of the wall ratio per ×10
      // decade (1.0 = linear); per-vector drift: log10 of the per-vector
      // cost ratio (0.0 = flat cost per corpus vector)
      println(f"[q103] prod exponent $a→$b: total=${math.log10(tb / ta)}%.2f " +
        f"per-vector=${math.log10((tb / nb) / (ta / na))}%+.2f")
    }
    spark.stop()
  }
}
