package graft.tools

/** One-off experiment (dev tool): is q60's residual third-decade exponent
  * candidate growth or partition sizing? Times q60 at the 100× synthetic
  * corpus under increasing `spark.sql.shuffle.partitions` — if the time
  * collapses as partitions scale with the data, the operator is linear
  * and the knob table's "size shuffle partitions to the data" rule is the
  * whole story; if it doesn't, something in the plan really grows. */
object ProfileQ60Knob {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q60_containment")
    val sf10 = sys.env.getOrElse("GRAFT_SF10_DOCS_DIR", "/tmp/graft_scale3_sf10")
    Seq(32, 128, 512).foreach { parts =>
      val spark = graft.GraftSession.builder(shufflePartitions = parts)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Queries.all(query)(spark, sf10).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftSession.releaseCaches(spark, blocking = true)
        System.gc()
        dt
      }.min
      println(f"[q60knob] $query partitions=$parts%4d  t=$t%8.2f s")
      spark.stop()
    }
  }
}
