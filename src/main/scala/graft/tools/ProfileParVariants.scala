package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Queries
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Within-session A/B of the round-19 scan-parallel wirings the driver's
  * cold run contradicted (VERDICT r19: q40 0.66×, q31 0.81×, q99 0.93×,
  * q26 flat) plus the q02 broadcast-build-side repartition. Each entry
  * pairs the CURRENT wiring ("on") against the candidate revert ("off"),
  * built inline — the `graft.scan.parallel` conf seam cannot exercise
  * these sites because the `*Par` loaders repartition unconditionally.
  * Alternating off/on within one session, min over `reps` (≥ 4 per the
  * measurement protocol), so host mode cancels.
  * Usage: runMain graft.tools.ProfileParVariants [sfDir] [reps] [names...]
  */
object ProfileParVariants {
  type Q = (SparkSession, String) => DataFrame

  /** (name, off = candidate revert, on = current wiring) */
  val variants: Seq[(String, Q, Q)] = Seq(
    ("q40_winnow",
      (s: SparkSession, dir: String) => TextAnalysis.winnowedFingerprints(
        Tables.documents(s, dir).select(col("doc_id"), split(col("text"), " ").as("tok")),
        "doc_id", "tok"),
      (s: SparkSession, dir: String) => Queries.all("q40_winnow_fingerprints")(s, dir)),
    ("q31_ann_srp",
      (s: SparkSession, dir: String) => {
        val e = Tables.embeddings(s, dir)
        Similarity.srpBucketTopK(e.where(col("vec_id") < 50), e, k = 3, dim = 64, nbits = 8)
      },
      (s: SparkSession, dir: String) => Queries.all("q31_ann_srp")(s, dir)),
    ("q99_contamination",
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.contaminationReport(
          docs.where(col("doc_id") % 7 === 0),
          docs.where(col("doc_id") % 7 =!= 0),
          "doc_id", "text", n = 8)
      },
      (s: SparkSession, dir: String) => Queries.all("q99_contamination_report")(s, dir)),
    ("q26_simhash",
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tok"))
        Dedup.simHashPairs(docs, "doc_id", "tok", maxHamming = 3)
      },
      (s: SparkSession, dir: String) => Queries.all("q26_simhash_pairs")(s, dir)),
    // off = keep lineitem parallel but feed the BROADCAST build side the
    // plain loader (VERDICT r19 "wasted shuffle under broadcast builds")
    ("q02_orders_plain",
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitemPar(s, dir)
        val o = Tables.orders(s, dir)
        q02Body(li, o)
      },
      (s: SparkSession, dir: String) => Queries.all("q02_enrich_transform")(s, dir))
  )

  /** q02's body minus the loader choice (mirrors Queries.q02 verbatim). */
  private def q02Body(li: DataFrame, o: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(12,2)")
    li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .select(
        li("l_orderkey").as("txn_id"),
        li("l_linenumber").cast("long").as("line_no"),
        o("o_custkey").as("customer_id"),
        o("o_orderstatus").as("status"),
        (dec(abs(li("l_extendedprice"))) * dec(lit(0.01))).cast("double").as("amount_major"),
        when(li("l_discount") === 0, dec(li("l_extendedprice")) * dec(li("l_tax")))
          .otherwise(dec(li("l_extendedprice")) * dec(lit(1) - li("l_discount")))
          .cast("double").as("derived_price"),
        date_format(li("l_shipdate"), "yyyy-MM-dd").as("txn_date"),
        li("l_orderkey").cast("string").as("txn_id_str"),
        round(li("l_discount") * 100).cast("int").cast("long").as("rate_pct"),
        (li("l_returnflag") === "R").as("is_return"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val only = args.drop(2).toSet
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = variants.filter { case (n, _, _) => only.isEmpty || only(n) }
    // warm-up (codegen compile) at sf0.001, both legs
    sel.foreach { case (_, off, on) =>
      try graft.Bench.materialize(off(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => }
      try graft.Bench.materialize(on(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => }
      GraftSession.releaseCaches(spark, blocking = true)
    }
    System.gc()
    def once(fn: Q): Double = {
      val t0 = System.nanoTime()
      try graft.Bench.materialize(fn(spark, dir))
      catch { case e: Throwable => println(s"[ab] FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
      dt
    }
    val calib0 = ProfileUtil.calib(spark)
    println(f"calib pre $calib0%.3f")
    println(f"${"variant"}%-24s ${"off"}%7s ${"on"}%7s ${"delta"}%7s")
    sel.foreach { case (name, off, on) =>
      val runs = (1 to reps).flatMap(_ => Seq(once(off), once(on)))
      val offMin = runs.grouped(2).map(_.head).min
      val onMin = runs.grouped(2).map(_.last).min
      println(f"$name%-24s $offMin%7.3f $onMin%7.3f ${onMin - offMin}%+7.3f")
    }
    println(f"calib post ${ProfileUtil.calib(spark)}%.3f")
    spark.stop()
  }
}
