package graft.tools
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    println("[smoke] entry rows=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
