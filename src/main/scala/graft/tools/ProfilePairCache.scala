package graft.tools

/** Round-15 measurement of the pair family's sf100 cache-fit step (dev
  * tool; SCALE.md §Round 14 banked the problem, this tool closes it):
  * at the fourth decade the persisted corpus-scale relations no longer
  * fit next to execution and q24/q60 pay a disk-backed materialization
  * (full-clock exponents 1.37/1.41 vs 0.90/0.93 for the machinery).
  *
  * Three cache shapes, A/B'd INTERLEAVED in one session (the round-14
  * protocol — variant blocks sequenced minutes apart sample different
  * machines), every leg calibration-bracketed, spill read from the
  * executed plan, cache residency read from the block manager right
  * after execution:
  *
  *   - `trim`   — the round-15 default: ord-only prefix cache (prefix is
  *                a slice on cache read) and the hashed-set input cache
  *                released at prefix-cache materialization.
  *   - `ser`    — trim + `spark.graft.pair.persistLevel=MEMORY_AND_DISK_SER`
  *                (the lever SCALE.md banked: heap for codec CPU).
  *   - `legacy` — the round-14 shape via the seams: prefix materialized
  *                into the cache AND the input cache held end-to-end.
  *
  * Usage: `runMain graft.tools.ProfilePairCache <dir> [reps] [queries…]`
  * (queries default to q24_jaccard_pairs q60_containment). */
object ProfilePairCache {
  private val Seams = Seq("spark.graft.pair.persistLevel",
    "spark.graft.pair.carryPrefixInCache", "spark.graft.pair.keepInputCache")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val queries = if (args.length > 2) args.drop(2).toSeq
      else Seq("q24_jaccard_pairs", "q60_containment")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "trim" -> Map.empty,
      "ser" -> Map("spark.graft.pair.persistLevel" -> "MEMORY_AND_DISK_SER"),
      "legacy" -> Map("spark.graft.pair.carryPrefixInCache" -> "true",
        "spark.graft.pair.keepInputCache" -> "true"))

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    // like ProfileUtil.runWithSpill but reads cache residency BEFORE the
    // release — the residency is the evidence the A/B is about
    def run(q: String): (Double, Long, Long, Long) = {
      val t0 = System.nanoTime()
      val df = graft.queries.Queries.all(q)(spark, dir)
      val qe = df.queryExecution
      qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val spill = ProfileUtil.sumMetric(qe.executedPlan, "spillSize")
      val (mem, disk) = ProfileUtil.cacheBytes(spark)
      release()
      (dt, spill, mem, disk)
    }

    // codegen warm-up off the clocks: every variant's plan shape at sf0.01
    queries.foreach { q =>
      variants.foreach { case (_, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try { graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01").count() }
        finally Seams.foreach(spark.conf.unset)
        release()
      }
    }

    val rows = collection.mutable.ArrayBuffer.empty[(String, String, Int, Double, Double, Long, Long, Long)]
    (1 to reps).foreach { rep =>
      // rotate the variant order per rep: the first timed run after a
      // corpus switch pays cold page-cache/JIT costs (measured at sf0.1:
      // first-position runs 1.5-2.4× the rest) — rotation gives every
      // variant a turn in every position, so min-over-reps is fair
      val rotated = variants.drop((rep - 1) % variants.size) ++
        variants.take((rep - 1) % variants.size)
      queries.foreach { q =>
        rotated.foreach { case (name, confs) =>
          val c = ProfileUtil.calib(spark)
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val (t, spill, mem, disk) =
            try run(q) finally Seams.foreach(spark.conf.unset)
          println(f"[paircache] $q $dir rep$rep variant=$name%-6s calib=$c%.3f " +
            f"t=$t%8.2f s spill=${spill >> 20}%6d MB cacheMem=${mem >> 20}%6d MB " +
            f"cacheDisk=${disk >> 20}%6d MB")
          Console.flush()
          rows += ((q, name, rep, c, t, spill, mem, disk))
        }
      }
    }
    // summary: per (query, variant) the min over reps — the noise floor —
    // next to the worst bracket it was measured under
    println(f"${"query"}%-20s ${"variant"}%-7s ${"min t"}%9s ${"worst calib"}%12s ${"cacheMem"}%9s ${"cacheDisk"}%10s")
    queries.foreach { q =>
      variants.foreach { case (name, _) =>
        val vs = rows.filter(r => r._1 == q && r._2 == name)
        if (vs.nonEmpty)
          println(f"$q%-20s $name%-7s ${vs.map(_._5).min}%9.2f ${vs.map(_._4).max}%12.3f " +
            f"${vs.map(_._7).max >> 20}%8d M ${vs.map(_._8).max >> 20}%9d M")
      }
    }
    spark.stop()
  }
}
