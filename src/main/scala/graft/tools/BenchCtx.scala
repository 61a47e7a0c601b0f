package graft.tools
/** Dev-only: reproduce Bench's release() context around one query. */
object BenchCtx {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    graft.queries.Queries.all(name)(spark, "/root/testdata/sf0.001").count()
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    release()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.queries.Queries.all(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      release()
      println(f"[ctx] $name rep$i $dt%.2f s rows=$n")
    }
    spark.stop()
  }
}
