package graft.tools

import graft.GraftSession
import graft.functions.Md5LongFunction
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-session A/B of the round-20 gram/bigram build rewrites: the OLD
  * window-lead / higher-order shapes (reconstructed here verbatim from the
  * round-19 tree) vs the NEW codegen'd posexplode + get(tk, pos+j) builds
  * now wired into the operators. Each leg materializes the bare stream to
  * the noop sink, alternating old/new within one session, min over reps —
  * the protocol instrument for this storm-prone host.
  * Usage: runMain graft.tools.ProfileGramAB [sfDir] [reps] [names...]
  */
object ProfileGramAB {
  private def md5Long(c: Column): Column = Md5LongFunction.md5Long(c)

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val only = args.drop(2).toSet
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def docsTok(s: SparkSession) = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("d_id"), split(col("text"), " ").as("tk"))

    // OLD tfidf/es-style gram stream: posexplode + window-lead (n-gram)
    def oldGrams(s: SparkSession, n: Int): DataFrame = {
      val w = Window.partitionBy("d_id").orderBy("pos")
      var th = docsTok(s).where(size(col("tk")) >= n)
        .select(col("d_id"), posexplode(col("tk")).as(Seq("pos", "tok")))
      (1 until n).foreach { j => th = th.withColumn(s"t$j", lead(col("tok"), j).over(w)) }
      (if (n > 1) th.where(col(s"t${n - 1}").isNotNull) else th)
        .select(col("d_id"), col("pos"), md5Long(concat_ws(" ",
          col("tok") +: (1 until n).map(j => col(s"t$j")): _*)).as("g"))
    }
    // NEW: posexplode + get
    def newGrams(s: SparkSession, n: Int): DataFrame = {
      val th = docsTok(s).where(size(col("tk")) >= n)
        .select(col("d_id"), col("tk"), posexplode(col("tk")).as(Seq("pos", "tok")))
      (if (n > 1) th.where(col("pos") <= size(col("tk")) - n) else th)
        .select(col("d_id"), col("pos"), md5Long(concat_ws(" ",
          col("tok") +: (1 until n).map(j => get(col("tk"), col("pos") + j)): _*)).as("g"))
    }
    // OLD shingle hashed sets (xxhash64 grams, zero-padded tail, set reduce)
    def oldShingles(s: SparkSession, n: Int): DataFrame = {
      val w = Window.partitionBy("d_id").orderBy("pos")
      var th = docsTok(s)
        .select(col("d_id"), posexplode(col("tk")).as(Seq("pos", "tok")))
        .select(col("d_id"), col("pos"), xxhash64(col("tok")).as("h0"))
      (1 until n).foreach { j => th = th.withColumn(s"h$j", lead(col("h0"), j).over(w)) }
      th.where(col(s"h${n - 1}").isNotNull || col("pos") === 0)
        .select(col("d_id"),
          xxhash64((0 until n).map(j => coalesce(col(s"h$j"), lit(0L))): _*).as("sh"))
        .groupBy(col("d_id")).agg(collect_set(col("sh")).as("hs"))
    }
    def newShingles(s: SparkSession, n: Int): DataFrame = {
      val th = docsTok(s)
        .select(col("d_id"), col("tk"), posexplode(col("tk")).as(Seq("pos", "tok")))
        .where(col("pos") <= size(col("tk")) - n || col("pos") === 0)
      def hj(j: Int): Column =
        if (j == 0) xxhash64(col("tok"))
        else when(col("pos") + j < size(col("tk")),
          xxhash64(get(col("tk"), col("pos") + j))).otherwise(lit(0L))
      th.select(col("d_id"), xxhash64((0 until n).map(hj): _*).as("sh"))
        .groupBy(col("d_id")).agg(collect_set(col("sh")).as("hs"))
    }
    // OLD bigram build: interpreted transform(sequence…) HOF
    def oldBigrams(s: SparkSession): DataFrame =
      docsTok(s).where(size(col("tk")) >= 2)
        .select(col("d_id"), explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
                      element_at(col("tk"), i + 1).as("w2")))).as("b"))
        .select(col("d_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    def newBigrams(s: SparkSession): DataFrame =
      docsTok(s).where(size(col("tk")) >= 2)
        .select(col("d_id"), col("tk"), posexplode(col("tk")).as(Seq("pos", "w1")))
        .where(col("pos") <= size(col("tk")) - 2)
        .select(col("d_id"), col("w1"), get(col("tk"), col("pos") + 1).as("w2"))

    val cases: Seq[(String, SparkSession => DataFrame, SparkSession => DataFrame)] = Seq(
      ("grams_n5", s => oldGrams(s, 5), s => newGrams(s, 5)),
      ("grams_n8", s => oldGrams(s, 8), s => newGrams(s, 8)),
      ("shingles_n3", s => oldShingles(s, 3), s => newShingles(s, 3)),
      ("bigrams", oldBigrams _, newBigrams _))
      .filter { case (n, _, _) => only.isEmpty || only(n) }

    // warm-up (codegen compile)
    cases.foreach { case (_, o, nw) =>
      try graft.Bench.materialize(o(spark)) catch { case _: Throwable => }
      try graft.Bench.materialize(nw(spark)) catch { case _: Throwable => }
      GraftSession.releaseCaches(spark, blocking = true)
    }
    System.gc()
    def once(fn: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      try graft.Bench.materialize(fn(spark))
      catch { case e: Throwable => println(s"[ab] FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
      dt
    }
    println(f"calib pre ${ProfileUtil.calib(spark)}%.3f")
    println(f"${"case"}%-14s ${"old"}%7s ${"new"}%7s ${"delta"}%7s")
    cases.foreach { case (name, o, nw) =>
      val runs = (1 to reps).flatMap(_ => Seq(once(o), once(nw)))
      val oldMin = runs.grouped(2).map(_.head).min
      val newMin = runs.grouped(2).map(_.last).min
      println(f"$name%-14s $oldMin%7.3f $newMin%7.3f ${newMin - oldMin}%+7.3f")
    }
    println(f"calib post ${ProfileUtil.calib(spark)}%.3f")
    spark.stop()
  }
}
