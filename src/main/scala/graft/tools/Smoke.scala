package graft.tools

import graft.GraftSession
import graft.sources.Tables

/** Dev-only: print every testdata table's schema + count to validate reads. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = Tables.table(spark, dir, t)
      println(s"== $t: ${df.count()} rows")
      println(df.schema.simpleString)
    }
    Tables.events(spark, dir).show(3, truncate = false)
    spark.stop()
  }
}
