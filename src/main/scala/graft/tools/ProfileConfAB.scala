package graft.tools

import graft.GraftSession
import graft.queries.Queries

/** A/B a runtime-settable session conf across the declared query surface:
  * times every query with the conf at its session default ("off") and at
  * the candidate value ("on"), alternating within one session so host mode
  * cancels; min over `reps` each.
  * Usage: runMain graft.tools.ProfileConfAB <confKey> <onValue> [sfDir] [reps] [names...]
  */
object ProfileConfAB {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val onValue = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 2
    val only = args.drop(4).toSet
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val offValue = spark.conf.getOption(key)
    val names = Queries.all.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    names.foreach { case (_, fn) =>
      try graft.Bench.materialize(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => }
      GraftSession.releaseCaches(spark, blocking = true)
    }
    System.gc()
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             on: Boolean): Double = {
      if (on) spark.conf.set(key, onValue)
      else offValue match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      val t0 = System.nanoTime()
      try graft.Bench.materialize(fn(spark, dir))
      catch { case e: Throwable => println(s"[ab] FAILED on=$on: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
      dt
    }
    println(f"${"query"}%-36s ${"off"}%7s ${"on"}%7s ${"delta"}%7s   ($key=$onValue)")
    var totOff = 0.0; var totOn = 0.0
    names.foreach { case (name, fn) =>
      val runs = (1 to reps).flatMap(_ => Seq(once(fn, on = false), once(fn, on = true)))
      val off = runs.grouped(2).map(_.head).min
      val on = runs.grouped(2).map(_.last).min
      totOff += off; totOn += on
      println(f"$name%-36s $off%7.3f $on%7.3f ${on - off}%+7.3f")
    }
    println(f"TOTAL off=$totOff%.2f on=$totOn%.2f delta=${totOn - totOff}%+.2f")
    spark.stop()
  }
}
