package graft.tools

/** Decade ladders for the round-19d additions (dev tool, not part of the
  * driver contract): systematic resampling (q129) and df-threshold
  * boilerplate removal (q130), over the shared prefixed scaled corpora
  * (sf0.1 → sf1 → sf10).
  *
  * Expected shapes, which the ladder verifies rather than assumes:
  *   - q129: two corpus passes (the per-bucket mass totals aggregate,
  *     then the bucket-partitioned cumsum window) + a 2^8-row broadcast —
  *     honest-linear, with a per-row cost of one md5 + decimal adds. The
  *     window sorts |corpus|/256 rows per bucket, so the decade exponent
  *     must stay ~1.0 (a super-linear drift would mean bucket sorts
  *     spilling — the cue to raise bucketBits, which is the documented
  *     100 TB knob);
  *   - q130: two chunk explodes (the frequency branch and the keep
  *     branch each re-chunk — cheaper than persisting a corpus-sized
  *     segment relation for a one-shot), one map-side-combined
  *     distinct-doc count, the frequency join (AQE broadcasts at these
  *     widths), and the per-doc rebuild aggregate whose group size is
  *     one document's chunk count at every scale. The prefixed copies
  *     multiply chunk-text frequencies, not vocabulary — exactly the
  *     boilerplate-heavy regime the operator exists for — so the
  *     frequency relation grows sub-linearly while the scan term
  *     dominates: honest-linear per char. */
object ProfileR19dLadder {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val fourth = args.contains("-4")
    val qsArg = args.filterNot(_ == "-4")
    val sf01 = "/root/testdata/sf0.1"
    val (sf1, sf10, sf100) = ProfileUtil.scaledDocsDirs(spark, fourth = fourth)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val qs = if (qsArg.nonEmpty) qsArg.toSeq
      else Seq("q129_systematic_resample", "q130_boilerplate_removal")
    // warm-up at the gate SF: codegen compiles once, never timed
    qs.foreach(q => graft.Bench.materialize(
      graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01")))
    release()

    val legs = Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10) ++
      (if (fourth) Seq("sf100" -> sf100) else Seq.empty)
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
        println(f"[r19d] $q%-26s $name%-6s min=$t%8.2f s")
        Console.flush()
      }
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[r19d] $name sentinels cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }
    qs.foreach { q =>
      val a = totals((q, "sf0.1")); val b = totals((q, "sf1")); val c = totals((q, "sf10"))
      println(f"[r19d] exponent $q%-26s sf0.1→sf1 ${math.log10(b / a)}%.2f  " +
        f"sf1→sf10 ${math.log10(c / b)}%.2f")
    }
    spark.stop()
  }
}
