package graft.tools

import org.apache.spark.sql.functions._

/** Third-decade scale measurement (dev tool, not part of the driver
  * contract) for the two document queries with the least headroom under
  * their bounds in [[ProfileScaleCurve]]'s table — q60 (asymmetric
  * containment, measured 0.44/decade at the sf1 leg) and q76 (8-gram
  * novelty, 0.47). One more synthetic decade (100 × sf0.1, the same
  * disjoint-token construction: per-copy token prefixes keep shingle sets
  * across copies disjoint, so organic near-dup density is preserved and
  * no cross-copy cliques are fabricated) either confirms the exponents
  * flattening toward their documented bounds or catches a creeping
  * quadratic term at 100× cost instead of 1000×.
  *
  * Prints t(sf0.1), t(sf1), t(sf10) and the two per-decade exponents;
  * an exponent > 0.6 at the sf10 leg is the action threshold (q60's fix
  * would be a PPJoin positional filter on top of its prefix postings). */
object ProfileThirdDecade {
  private val Default = Seq("q60_containment", "q76_ngram_novelty")

  def main(args: Array[String]): Unit = {
    val Queries = if (args.nonEmpty) args.toSeq else Default
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"

    // docs-only corpora (q60/q76 read nothing else), shared via
    // [[ProfileUtil.scaledDocsDirs]]; markers encode the construction
    // (source, copies, prefix, partitions) so a construction change
    // invalidates stale bytes instead of silently re-measuring them.
    // Fourth decade (1000 × sf0.1, derived from sf10 under a second
    // disjoint-prefix layer) is opt-in: the leg costs minutes/query.
    val fourth = sys.env.get("GRAFT_FOURTH_DECADE").contains("1")
    val (sf1, sf10, sf100) = ProfileUtil.scaledDocsDirs(spark, fourth)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def timeMin(name: String, dir: String, runs: Int): Double = {
      // calibration bracket: host throughput drifts up to ~8× on minute
      // timescales with the guest idle (round 14, ProfileCalibrated) —
      // a leg timed against an inflated sentinel is re-run, not banked.
      // Both sentinels since round 16, pre AND post: a CPU-calm leg can
      // still integrate an I/O storm (the round-15 seam-A/B ambiguity),
      // and a storm arriving mid-leg shows in the post bracket.
      val (c, io) = ProfileUtil.calibBoth(spark)
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop-write, not count(): count() lets Catalyst elide exactly the
        // work under measurement (q90's count optimized to a bare scan —
        // see Bench.materialize). The banked pre-round-16 legs here
        // (q24/q60/q62/q76, agg/join-shaped outputs) are count-inelidable,
        // so their numbers stand.
        graft.Bench.materialize(graft.queries.Queries.all(name)(spark, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[leg] $name $dir runs=$runs min=$t%.2f s " +
        f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f"); Console.flush()
      t
    }

    println(f"${"query"}%-22s ${"t(0.1)"}%9s ${"t(sf1)"}%9s ${"t(sf10)"}%9s ${"t(sf100)"}%9s ${"exp 0.1→sf1"}%12s ${"exp sf1→sf10"}%13s ${"exp sf10→sf100"}%14s")
    Queries.foreach { name =>
      timeMin(name, "/root/testdata/sf0.01", 1) // codegen warm-up
      val t01 = timeMin(name, sf01, 3)
      val t1 = timeMin(name, sf1, 2)
      val t10 = timeMin(name, sf10, 2)
      val t100 = if (fourth) timeMin(name, sf100, 2) else Double.NaN
      println(f"$name%-22s $t01%9.2f $t1%9.2f $t10%9.2f $t100%9.2f ${math.log10(t1 / t01)}%12.2f ${math.log10(t10 / t1)}%13.2f ${math.log10(t100 / t10)}%14.2f")
    }
    spark.stop()
  }
}
