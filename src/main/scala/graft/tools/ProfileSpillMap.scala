package graft.tools

/** Dev-only: run a query once and print its PER-NODE spill map — the
  * attribution step SCALE.md §Round 15 left open for q60's flat 79 GB
  * candidate-stream spill ("the spill term's disk bandwidth"). The
  * aggregate spill number from [[ProfileUtil.runWithSpill]] cannot say
  * WHICH operator paid: a sort-merge join's input sorts, the first-match
  * min-aggregate's hash-map overflow, or a too-narrow final-agg exchange
  * each want a different fix.
  *
  * Usage: `runMain graft.tools.ProfileSpillMap <query> <dir> [reps]` */
object ProfileSpillMap {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    // codegen warm-up off the clocks at sf0.01
    graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01").count()
    graft.GraftSession.releaseCaches(spark, blocking = true)
    System.gc()

    (1 to reps).foreach { i =>
      val c = ProfileUtil.calib(spark)
      val t0 = System.nanoTime()
      val df = graft.queries.Queries.all(q)(spark, dir)
      val qe = df.queryExecution
      qe.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nodes = ProfileUtil.spillByNode(qe.executedPlan)
      println(f"[spillmap] rep$i calib=$c%.3f $q $dir wall=$dt%.2f s " +
        f"totalSpill=${nodes.map(_._2).sum >> 20} MB")
      nodes.foreach { case (n, v) => println(f"[spillmap]   ${v >> 20}%8d MB  $n") }
      println("[spillmap] plan (spilling nodes in context):")
      ProfileUtil.planOutline(qe.executedPlan)
        .foreach(l => println(s"[spillmap]   $l"))
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    spark.stop()
  }
}
