package graft.tools

/** Round-15 A/B of the ordered-arrays spill levers (dev tool). The
  * per-node spill map decomposed q60's "flat 79 GB candidate-stream
  * spill" (SCALE.md §Round 15) into the CACHE CONSTRUCTION, not the
  * candidate machinery: ~41 GB in the collect_list aggregate pair
  * (sort-based fallback at the default 128-key threshold), ~20 GB in
  * the token-df aggregate, ~17 GB in the df-attach sort-merge join's
  * input sorts. Three levers, each independently switchable:
  *
  *   - the df≥2 shuffled-hash attach with every build exchange sized by
  *     the posting volume ([[graft.operators.Dedup]] `orderedArrays`,
  *     round-15 default; `legacyOrderJoin` restores the full-df
  *     sort-merge shape at session width) — targets the sorts AND the
  *     per-task aggregate state;
  *   - `spark.graft.pair.maxShuffleWidth` raised past 1024 (q60's
  *     posting volume computes to ~3600 partitions at sf100 before the
  *     cap) — shrinks every per-task working set further.
  *
  * Interleaved + rotated + calibration-bracketed per the round-14
  * protocol; spill from the executed plan, top nodes printed so the
  * decomposition shift is visible, not just the total.
  *
  * Usage: `runMain graft.tools.ProfileOrderJoin <dir> [reps] [queries…]` */
object ProfileOrderJoin {
  private val Seams = Seq("spark.graft.pair.legacyOrderJoin",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
    "spark.graft.pair.maxShuffleWidth")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val queries = if (args.length > 2) args.drop(2).toSeq
      else Seq("q60_containment")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    // the fallback-threshold lever was A/B'd and REJECTED before the
    // width rework: 2x slower at sf10 (hash-mode buffer churn, legs
    // 47-60 s vs 21-24) and an outright JVM OOM at sf100 — the threshold
    // counts KEYS, not buffer bytes, so nothing bounds per-task array
    // memory. Width-first sizing replaces it (SCALE.md §Round 15).
    val variants: Seq[(String, Map[String, String])] = Seq(
      "legacy" -> Map("spark.graft.pair.legacyOrderJoin" -> "true"),
      "new" -> Map.empty,
      "neww" -> Map("spark.graft.pair.maxShuffleWidth" -> "4096"))

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def run(q: String): (Double, Long, Seq[(String, Long)]) = {
      val t0 = System.nanoTime()
      val df = graft.queries.Queries.all(q)(spark, dir)
      val qe = df.queryExecution
      qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nodes = ProfileUtil.spillByNode(qe.executedPlan)
      release()
      (dt, nodes.map(_._2).sum, nodes.take(4))
    }

    queries.foreach { q =>
      variants.foreach { case (_, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try { graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01").count() }
        finally Seams.foreach(spark.conf.unset)
        release()
      }
    }

    val rows = collection.mutable.ArrayBuffer.empty[(String, String, Int, Double, Double, Long)]
    (1 to reps).foreach { rep =>
      val rotated = variants.drop((rep - 1) % variants.size) ++
        variants.take((rep - 1) % variants.size)
      queries.foreach { q =>
        rotated.foreach { case (name, confs) =>
          val c = ProfileUtil.calib(spark)
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val (t, spill, top) =
            try run(q) finally Seams.foreach(spark.conf.unset)
          println(f"[orderjoin] $q $dir rep$rep variant=$name%-7s calib=$c%.3f " +
            f"t=$t%8.2f s spill=${spill >> 20}%6d MB top=" +
            top.map { case (n, v) => s"$n:${v >> 20}M" }.mkString(","))
          Console.flush()
          rows += ((q, name, rep, c, t, spill))
        }
      }
    }
    println(f"${"query"}%-20s ${"variant"}%-8s ${"min t"}%9s ${"worst calib"}%12s ${"max spill"}%10s")
    queries.foreach { q =>
      variants.foreach { case (name, _) =>
        val vs = rows.filter(r => r._1 == q && r._2 == name)
        if (vs.nonEmpty)
          println(f"$q%-20s $name%-8s ${vs.map(_._5).min}%9.2f " +
            f"${vs.map(_._4).max}%12.3f ${vs.map(_._6).max >> 20}%8d M")
      }
    }
    spark.stop()
  }
}
