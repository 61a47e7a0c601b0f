package graft.tools

/** Round-15 A/B (dev tool): the delete-1 path's candidate dedup —
  * widened grouping-only distinct (default) vs the round-14
  * `dropDuplicates(left_id, right_id)` whose first(blk) string buffer
  * forces a session-width SORT aggregate (the 4.6-9.9 GB q24 sf100
  * spill, `tools.ProfileSpillMap`). Interleaved + rotated +
  * calm-bracketed; pair sets are identical by construction (rows are
  * functionally determined by the pair) and spec-asserted.
  *
  * Usage: `runMain graft.tools.ProfilePairDistinct <dir> [reps] [queries…]` */
object ProfilePairDistinct {
  private val Seam = "spark.graft.pair.legacyPairDistinct"

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val queries = if (args.length > 2) args.drop(2).toSeq
      else Seq("q24_jaccard_pairs")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "legacy" -> Map(Seam -> "true"),
      "distinct" -> Map.empty)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def run(q: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val df = graft.queries.Queries.all(q)(spark, dir)
      val qe = df.queryExecution
      qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val spill = ProfileUtil.sumMetric(qe.executedPlan, "spillSize")
      release()
      (dt, spill)
    }

    queries.foreach { q =>
      variants.foreach { case (_, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try { graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01").count() }
        finally spark.conf.unset(Seam)
        release()
      }
    }

    val rows = collection.mutable.ArrayBuffer.empty[(String, String, Double, Double, Long)]
    (1 to reps).foreach { rep =>
      val rotated = variants.drop((rep - 1) % variants.size) ++
        variants.take((rep - 1) % variants.size)
      queries.foreach { q =>
        rotated.foreach { case (name, confs) =>
          val c = ProfileUtil.calib(spark)
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val (t, spill) = try run(q) finally spark.conf.unset(Seam)
          println(f"[pairdistinct] $q $dir rep$rep variant=$name%-9s " +
            f"calib=$c%.3f t=$t%8.2f s spill=${spill >> 20}%6d MB")
          Console.flush()
          rows += ((q, name, c, t, spill))
        }
      }
    }
    println(f"${"query"}%-20s ${"variant"}%-9s ${"min t"}%9s ${"worst calib"}%12s ${"max spill"}%10s")
    queries.foreach { q =>
      variants.foreach { case (name, _) =>
        val vs = rows.filter(r => r._1 == q && r._2 == name)
        if (vs.nonEmpty)
          println(f"$q%-20s $name%-9s ${vs.map(_._4).min}%9.2f " +
            f"${vs.map(_._3).max}%12.3f ${vs.map(_._5).max >> 20}%8d M")
      }
    }
    spark.stop()
  }
}
