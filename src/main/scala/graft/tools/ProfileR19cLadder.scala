package graft.tools

/** Decade ladders for the round-19 LM-quality additions (dev tool, not part
  * of the driver contract): Kneser–Ney NLL (q118), CCNet perplexity buckets
  * (q119), TF–IDF cosine pairs (q120), and the Unicode normalization gate
  * (q121), over the shared prefixed scaled corpora (sf0.1 → sf1 → sf10).
  *
  * Expected shapes, which the ladder verifies rather than assumes:
  *   - q118: one corpus shuffle into the (w1,w2) count relation; the four
  *     KN statistics reduce from that aggregate. The prefixed copies grow
  *     the bigram-type relation linearly with the corpus, so the scoring
  *     joins stay corpus-proportional — honest-linear overall;
  *   - q119: q59's NLL machinery plus a bounded histogram (cells ≈ NLL
  *     range ×1000, INDEPENDENT of corpus size) — the tertile cut must
  *     cost the same at every width; the corpus term is the NLL scan;
  *   - q120: inverted-index self-join on (lang, shingle). The prefixed
  *     copies keep shingle vocabularies disjoint, so candidate pairs grow
  *     linearly (within-copy only) — the ladder would expose any
  *     quadratic seam immediately;
  *   - q121: pure per-row codegen'd map (regex derive → NFC → strip) —
  *     flat per-char cost, zero shuffle at every width. */
object ProfileR19cLadder {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val (sf1, sf10, _) = ProfileUtil.scaledDocsDirs(spark, fourth = false)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val qs = Seq("q118_kneser_ney_nll", "q119_perplexity_buckets",
      "q120_tfidf_cosine_pairs", "q121_normalize_text")
    // warm-up at the gate SF: codegen compiles once, never timed
    qs.foreach(q => graft.Bench.materialize(
      graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01")))
    release()

    val legs = Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10)
    val totals = collection.mutable.Map.empty[(String, String), Double]
    legs.foreach { case (name, dir) =>
      val (c, io) = ProfileUtil.calibBoth(spark)
      qs.foreach { q =>
        val t = (1 to 2).map(_ => {
          val dt = timed(graft.Bench.materialize(
            graft.queries.Queries.all(q)(spark, dir)))
          release(); dt
        }).min
        totals((q, name)) = t
        println(f"[r19c] $q%-26s $name%-6s min=$t%8.2f s")
        Console.flush()
      }
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[r19c] $name sentinels cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }
    qs.foreach { q =>
      val a = totals((q, "sf0.1")); val b = totals((q, "sf1")); val c = totals((q, "sf10"))
      println(f"[r19c] exponent $q%-26s sf0.1→sf1 ${math.log10(b / a)}%.2f  " +
        f"sf1→sf10 ${math.log10(c / b)}%.2f")
    }
    spark.stop()
  }
}
