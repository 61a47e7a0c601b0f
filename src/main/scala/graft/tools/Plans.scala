package graft.tools

import graft.GraftSession
import graft.queries.Queries

/** Dev-only: dump formatted physical plans for plan-shape review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_enrich_transform", "q10_pricing_summary", "q11_top_revenue", "q27_ann_cosine")
    names.foreach { n =>
      println(s"########## $n")
      Queries.all(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
