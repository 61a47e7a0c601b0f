package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Calibration-bracketed query timing (dev tool). Round 14 found the
  * machine's effective throughput drifting up to ~1.7× between (and
  * within) sessions with NOTHING running in the guest — load average ~14
  * on an idle box, i.e. host/neighbor contention outside the VM. Raw
  * cross-session comparisons are therefore unsound; every measurement
  * here is bracketed by [[graft.Bench.calibrationOnce]] (the I/O-free
  * codegen'd sentinel) so times can be normalized by machine speed.
  *
  * Modes:
  *   - `<query>:<dir>:<reps> ...` — any list of triples, run in
  *     sequence; every rep is calibration-bracketed and reports the
  *     executed plan's own spillSize metric (the q40 lesson: a slow leg
  *     with a calm bracket and zero spill is machine noise integrated
  *     over a long run, not a plan defect).
  *   - `winnow_ab <dir> [reps]` — within-session A/B of q40's widened
  *     window exchange ([[graft.operators.TextAnalysis.scanStreamWidth]])
  *     vs the pre-round-14 unwidened shape (rebuilt here verbatim), so
  *     the width fix is measured under the SAME host load instead of
  *     across drifting sessions. */
object ProfileCalibrated {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    lazy val dir = args(1)
    lazy val reps = if (args.length > 2) args(2).toInt else 4
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def calib(): Double = ProfileUtil.calib(spark)
    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    /** The pre-round-14 q40 plan, verbatim minus the widening — the A/B
      * control. Mirrors TextAnalysis.winnowedFingerprints (k=3, w=4). */
    def unwidenedWinnow(d: String): org.apache.spark.sql.DataFrame = {
      val k = 3; val w = 4
      val byDoc = Window.partitionBy("wf_id").orderBy("pos")
      var th = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").as("wf_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      (1 until k).foreach { j => th = th.withColumn(s"t$j", lead(col("tok"), j).over(byDoc)) }
      val grams = th.where(col(s"t${k - 1}").isNotNull)
        .select(col("wf_id"), col("pos"),
          graft.operators.TextAnalysis.md5Long(concat_ws(" ",
            col("tok") +: (1 until k).map(j => col(s"t$j")): _*)).as("gh"))
      val win = Window.partitionBy("wf_id").orderBy("pos").rowsBetween(-(w - 1), 0)
      grams.withColumn("wmin", min(col("gh")).over(win))
        .where(col("gh") === col("wmin"))
        .select(col("wf_id").as("doc_id"), col("gh").as("fp"))
        .distinct()
    }

    /** Wall seconds + spill bytes from the SAME executed QueryExecution
      * ([[ProfileUtil.runWithSpill]] — the round-14 readout executed
      * `df.count()`'s separate wrapped plan and then read metrics off the
      * never-executed adaptive original, so spill always read 0). By-name
      * `build`: several operators run an eager plan-construction job (the
      * pair family's prefix build + width aggregate, q41's whole cascade)
      * — construction MUST happen inside the clock or the probe times only
      * the label join of an already-computed result. */
    def runWithSpill(build: => org.apache.spark.sql.DataFrame): (Double, Long) =
      ProfileUtil.runWithSpill(spark)(build)

    mode match {
      case "winnow_ab" =>
        // codegen warm-up off the clocks
        graft.queries.Queries.all("q40_winnow_fingerprints")(spark, "/root/testdata/sf0.01").count()
        unwidenedWinnow("/root/testdata/sf0.01").count()
        release()
        // INTERLEAVED pairs: host throughput drifts ~1.6× on timescales of
        // minutes, so back-to-back variant runs see ~the same machine and
        // the per-pair ratio is meaningful where sequential blocks aren't
        val pairs = (1 to reps).map { i =>
          val c = calib()
          val (tw, sw) = runWithSpill(
            graft.queries.Queries.all("q40_winnow_fingerprints")(spark, dir))
          val (tn, sn) = runWithSpill(unwidenedWinnow(dir))
          println(f"[calib] pair$i calib=$c%.3f widened=$tw%.2f s (spill ${sw >> 20} MB) " +
            f"unwidened=$tn%.2f s (spill ${sn >> 20} MB) unwid/wid=${tn / tw}%.2f×")
          tn / tw
        }
        val sorted = pairs.sorted
        println(f"[calib] median unwidened/widened ratio = ${sorted(sorted.length / 2)}%.2f×")
      case "novelty_ab" =>
        // q76's per-gram reduce at the static session width packs ~8 M
        // gram rows per task's hash map at the fourth decade and spills
        // 105-107 GB (fixed probe, round 15 — the round-14 "spill 0" was
        // the vacuous readout). Since round 15 the width self-sizes
        // (gramReduceWidth): A/B the WIRED default (None → auto) against
        // the pre-round-15 static shape (Some(4) — below the session
        // width, so widenForJoin is a no-op and the plan is the old
        // static-width one), interleaved like winnow_ab.
        def noveltyAt(d: String, width: Option[Int]) = graft.operators.TextAnalysis
          .ngramNovelty(spark.read.parquet(s"$d/documents.parquet"),
            "doc_id", "text", n = 8, shuffleWidth = width)
        def novelty(width: Option[Int]) = noveltyAt(dir, width)
        // warm BOTH A/B'd shapes' codegen at sf0.01: the round-14 warm-up
        // used width 4, below the session shuffle width, so widenForJoin
        // was a no-op and only the default plan compiled — the widened
        // (204) variant's first timed rep silently included its codegen
        // (ADVICE r14). 204 > the 32-partition session width, so the
        // widened plan shape compiles here at small scale.
        noveltyAt("/root/testdata/sf0.01", None).count()
        noveltyAt("/root/testdata/sf0.01", Some(204)).count()
        release()
        val pairsN = (1 to reps).map { i =>
          val c = calib()
          val (ta, sa) = runWithSpill(novelty(None))
          val (ts, ss) = runWithSpill(novelty(Some(4)))
          println(f"[calib] pair$i calib=$c%.3f auto=$ta%.2f s (spill ${sa >> 20} MB) " +
            f"static=$ts%.2f s (spill ${ss >> 20} MB) static/auto=${ts / ta}%.2f×")
          ts / ta
        }.sorted
        println(f"[calib] median static/auto ratio = ${pairsN(pairsN.length / 2)}%.2f×")

      case _ =>
        // every arg is a `query:dir:reps` triple, run in sequence, each
        // rep calibration-bracketed with the executed plan's spillSize
        val jobs = args.toSeq.map { a =>
          val parts = a.split(":")
          (parts(0), parts(1), if (parts.length > 2) parts(2).toInt else 2)
        }
        jobs.foreach { case (q, _, _) =>
          graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01").count()
          release()
        }
        jobs.foreach { case (q, d, n) =>
          val ts = (1 to n).map { i =>
            val c = calib()
            val (t, sp) = runWithSpill(graft.queries.Queries.all(q)(spark, d))
            println(f"[calib] $q $d rep$i calib=$c%.3f t=$t%.2f s spill=${sp >> 20} MB")
            t
          }
          println(f"[calib] $q $d min=${ts.min}%.2f s over $n reps")
        }
    }
    spark.stop()
  }
}
