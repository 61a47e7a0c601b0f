package graft.tools

/** Decade ladders for the late-round-18 query additions (dev tool, not
  * part of the driver contract): the fixed-table BPE encode (q110), the
  * UniMax mixture expansion (q111), and the model-token budget cut
  * (q112), over the shared prefixed scaled corpora (sf0.1 → sf1 → sf10).
  *
  * Expected shapes, which the ladder verifies rather than assumes:
  *   - q110 is a pure per-row string rewrite (wrap + 16 replaces +
  *     split): honest-linear in corpus chars once the job constant is
  *     paid, zero shuffle at every width;
  *   - q111 is one stratum-sized LONG-sum exchange + a narrow per-row
  *     explode: the whole scale cost is the corpus scan and the ~1.5×
  *     expanded write, stratum count fixed at 5;
  *   - q112 adds q105's zero-shuffle scoring and q95's histogram
  *     machinery on top of q110's counts — the budgeted-selection family
  *     already decade-banked (SCALE.md §R16/§R17); here the encode scan
  *     dominates. */
object ProfileR18cLadder {

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
    val qs = Seq("q110_bpe_encode", "q111_unimax_mixture", "q112_bpe_token_budget")
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
        println(f"[r18c] $q%-22s $name%-6s min=$t%8.2f s")
        Console.flush()
      }
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[r18c] $name sentinels cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }
    qs.foreach { q =>
      val a = totals((q, "sf0.1")); val b = totals((q, "sf1")); val c = totals((q, "sf10"))
      println(f"[r18c] exponent $q%-22s sf0.1→sf1 ${math.log10(b / a)}%.2f  " +
        f"sf1→sf10 ${math.log10(c / b)}%.2f")
    }
    spark.stop()
  }
}
