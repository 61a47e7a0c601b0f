package graft.tools

import graft.GraftSession
import graft.queries.Queries

/** Full-surface A/B of the unsplittable-scan repartition: times every
  * declared query with `graft.scan.parallel` off and on (alternating
  * within one session, so host mode cancels), min over `reps` each.
  * Usage: runMain graft.tools.ProfileTablesAB [sfDir] [reps] [names...]
  */
object ProfileTablesAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val only = args.drop(2).toSet
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Queries.all.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    // one warm-up pass (codegen compile) at sf0.001 with the seam OFF
    names.foreach { case (_, fn) =>
      try graft.Bench.materialize(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => }
      GraftSession.releaseCaches(spark, blocking = true)
    }
    System.gc()
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             par: Boolean): Double = {
      spark.conf.set("graft.scan.parallel", par.toString)
      val t0 = System.nanoTime()
      try graft.Bench.materialize(fn(spark, dir))
      catch { case e: Throwable => println(s"[ab] FAILED par=$par: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.conf.unset("graft.scan.parallel")
      GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
      dt
    }
    println(f"${"query"}%-36s ${"off"}%7s ${"on"}%7s ${"delta"}%7s")
    var totOff = 0.0; var totOn = 0.0
    names.foreach { case (name, fn) =>
      val runs = (1 to reps).flatMap(_ => Seq(once(fn, false), once(fn, true)))
      val off = runs.grouped(2).map(_.head).min
      val on = runs.grouped(2).map(_.last).min
      totOff += off; totOn += on
      println(f"$name%-36s $off%7.3f $on%7.3f ${on - off}%+7.3f")
    }
    println(f"TOTAL off=$totOff%.2f on=$totOn%.2f delta=${totOn - totOff}%+.2f")
    spark.stop()
  }
}
