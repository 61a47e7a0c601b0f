package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Checks for the Tables-level unsplittable-scan repartition (guide §2.5):
  *  1. does a Filter above `repartition(n, key)` still push into the
  *     parquet scan (PushedFilters)?
  *  2. what does the extra exchange cost on a scan→tiny-aggregate query?
  * Usage: runMain graft.tools.ProfileScanParallel [sfDir] [reps]
  */
object ProfileScanParallel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = GraftSession.defaultCpus

    // 1. pushdown through repartition
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plan = ev.repartition(cpus, col("event_id"))
      .where(col("value") > 100 && col("event_type") === "purchase")
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).take(2).toSeq
    println(s"[scanpar] pushdown-through-repartition: ${pushed.mkString(" | ")}")

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.releaseCaches(spark, blocking = true)
        System.gc()
        dt
      }
      println(f"[scanpar] $label%-44s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // 2. scan→tiny-aggregate overhead (q05 shape)
    def q05(d: DataFrame): DataFrame =
      d.where(col("value") > 100 && col("event_type") === "purchase")
        .agg(count(lit(1)).as("total_count"))
    val evT = Tables.events(spark, dir)
    time("q05 (as-is)") { q05(evT) }
    time("q05 (repartitioned by key)") { q05(evT.repartition(cpus, col("event_id"))) }

    // 3. q02 with the repartition (joins + heavy projection)
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    def q02(liX: DataFrame, oX: DataFrame): DataFrame = {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(12,2)")
      liX.join(oX, liX("l_orderkey") === oX("o_orderkey"), "left")
        .select(
          liX("l_orderkey").as("txn_id"),
          liX("l_linenumber").cast("long").as("line_no"),
          oX("o_custkey").as("customer_id"),
          oX("o_orderstatus").as("status"),
          (dec(abs(liX("l_extendedprice"))) * dec(lit(0.01))).cast("double").as("amount_major"),
          when(liX("l_discount") === 0, dec(liX("l_extendedprice")) * dec(liX("l_tax")))
            .otherwise(dec(liX("l_extendedprice")) * dec(lit(1) - liX("l_discount")))
            .cast("double").as("derived_price"),
          date_format(liX("l_shipdate"), "yyyy-MM-dd").as("txn_date"),
          liX("l_orderkey").cast("string").as("txn_id_str"),
          round(liX("l_discount") * 100).cast("int").cast("long").as("rate_pct"),
          (liX("l_returnflag") === "R").as("is_return"))
    }
    time("q02 (as-is)") { q02(li, o) }
    time("q02 (both sides repartitioned)") {
      q02(li.repartition(cpus, col("l_orderkey"), col("l_linenumber")),
        o.repartition(cpus, col("o_orderkey")))
    }
    // explode+aggregate shape (q59 unigram): the text family's first stage
    val docs = Tables.documents(spark, dir)
    def uni(d: DataFrame): DataFrame =
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
    time("unigram counts (as-is)") { uni(docs) }
    time("unigram counts (repartitioned)") { uni(docs.repartition(cpus, col("doc_id"))) }

    spark.stop()
  }
}
