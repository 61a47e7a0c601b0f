package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q40 (winnowing fingerprints) growth attribution (dev tool, not part of
  * the driver contract). Round 13 measured q40's third decade at
  * exponent 0.92/decade — the highest in the engine — and documented it
  * as the linear O(tokens) bound arriving as fixed costs amortize, but
  * on one decade of evidence. This tool pins the attribution two ways:
  *
  *   1. STAGE DECOMPOSITION at each decade: cumulative prefixes of the
  *      q40 plan — (a) scan + posexplode (the raw token stream), (b) + the
  *      doc-id exchange, per-doc sort, window leads and gram hash
  *      ([[graft.operators.TextAnalysis.winnowedFingerprints]]'s `grams`),
  *      (c) the full query (+ windowed min, filter, distinct). If the
  *      sf1→sf10 growth lives in (a)/(b) — per-token scan and window
  *      work — the 0.92 is the linear bound, not a shuffle blowup: the
  *      only exchanges are the doc-id hash exchange in (b) and the
  *      distinct in (c), both Θ(tokens) / Θ(fingerprints) rows.
  *   2. A FOURTH DECADE (1000 × sf0.1, same disjoint-token construction
  *      as [[ProfileThirdDecade]]): a linear bound predicts the
  *      exponent holds ≈ 1 and the per-token cost (t / tokens) stays
  *      FLAT; any super-linear term (the per-doc window sort's log n is
  *      the candidate) would push the exponent past 1.
  *
  * Action threshold (banked in SCALE.md): exponent > 1 at the fourth
  * decade, or a stage whose share GROWS across decades without a
  * matching row-count growth — the fix would be pre-aggregating the
  * window min per (doc, pos/w) bucket before the full window. */
object ProfileWinnow {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"

    // shared scaled corpora ([[ProfileUtil.scaledDocsDirs]]): the fourth
    // decade derives from the sf10 corpus (10 copies under a SECOND
    // prefix layer — tokens "d<j>c<i>w" stay globally disjoint across all
    // 1000 effective copies) instead of a 1000-way union of sf0.1, which
    // would hand Catalyst a 1000-branch plan for no statistical
    // difference. Markers encode the construction (source, copies,
    // prefix, partitions), so a construction change rebuilds instead of
    // silently reusing a different layout.
    val (sf1, sf10, sf100) = ProfileUtil.scaledDocsDirs(spark, fourth = true)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    // the q40 stage prefixes, mirroring TextAnalysis.winnowedFingerprints
    // (k=3, w=4 — the q40 parameters)
    val k = 3; val w = 4
    def tokensOf(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("wf_id"),
        posexplode(graft.operators.TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    def explodeOnly(dir: String): Long = tokensOf(dir).count()
    def gramsOnly(dir: String): Long = {
      val byDoc = Window.partitionBy("wf_id").orderBy("pos")
      var th = tokensOf(dir)
      (1 until k).foreach { j => th = th.withColumn(s"t$j", lead(col("tok"), j).over(byDoc)) }
      th.where(col(s"t${k - 1}").isNotNull)
        .select(graft.operators.TextAnalysis.md5Long(
          concat_ws(" ", col("tok") +: (1 until k).map(j => col(s"t$j")): _*)).as("gh"))
        .agg(sum(col("gh"))).head(); 0L
    }
    // q40 as declared (the real query, the full stage) — timed identically
    // to the bench
    def q40(dir: String): Long =
      graft.queries.Queries.all("q40_winnow_fingerprints")(spark, dir).count()

    def timeMin(label: String, dir: String, runs: Int)(body: => Unit): Double = {
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body
        val dt = (System.nanoTime() - t0) / 1e9
        release(); dt
      }.min
      println(f"[leg] $label $dir runs=$runs min=$t%.2f s"); Console.flush()
      t
    }

    // warm-up compiles every codegen class off the timed path
    q40("/root/testdata/sf0.01"); explodeOnly("/root/testdata/sf0.01")
    gramsOnly("/root/testdata/sf0.01"); release()

    // every leg is calibration-bracketed: host throughput drifts up to
    // ~1.7× across (and within) sessions with the guest idle — raw
    // cross-session numbers are unsound without the sentinel
    def calib(): Double = {
      graft.Bench.calibrationOnce(spark)
      (1 to 3).map(_ => graft.Bench.calibrationOnce(spark)).min
    }
    val legs = Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10, "sf100" -> sf100)
    val rows = legs.map { case (name, dir) =>
      val runs = if (name == "sf100") 2 else 3
      val tokens = tokensOf(dir).count()
      release()
      val c = calib()
      println(f"[leg] calibration $dir $c%.3f s")
      val tExp = timeMin("explode", dir, runs)(explodeOnly(dir))
      val tGrm = timeMin("grams", dir, runs)(gramsOnly(dir))
      val tAll = timeMin("q40", dir, runs)(q40(dir))
      (name, tokens, tExp, tGrm, tAll)
    }
    println(f"${"leg"}%-7s ${"tokens"}%12s ${"explode"}%9s ${"grams"}%9s ${"q40"}%9s ${"ns/token"}%9s")
    rows.foreach { case (n, tok, a, b, c) =>
      println(f"$n%-7s $tok%12d $a%9.2f $b%9.2f $c%9.2f ${c * 1e9 / tok}%9.1f")
    }
    rows.sliding(2).foreach {
      case Seq((n0, _, _, _, c0), (n1, _, _, _, c1)) =>
        println(f"[exp] $n0→$n1 q40 exponent = ${math.log10(c1 / c0)}%.2f")
      case _ => ()
    }
    spark.stop()
  }
}
