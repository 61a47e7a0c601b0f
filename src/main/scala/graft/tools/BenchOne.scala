package graft.tools
/** Time a single named query from the registry: runMain graft.tools.BenchOne <name> [sfDir] [reps] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.local()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // noop-write, not count() — count() lets Catalyst elide the work
      // under measurement (see Bench.materialize)
      graft.Bench.materialize(graft.queries.Queries.all(name)(spark, dir))
      println(f"[bench1] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // the Bench protocol: each rep pays for its own materialization, and
      // GC debt never crosses a timed window
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    spark.stop()
  }
}
