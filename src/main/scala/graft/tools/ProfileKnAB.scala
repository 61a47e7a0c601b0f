package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the Kneser–Ney scoring join shape (dev tool): the shipped
  * score-per-TYPE-then-one-join shape vs the first-cut three-join shape
  * (bg ⋈ cbg ⋈ ctx ⋈ back on the corpus-scale stream), at sf1 and sf10.
  * The ladder caught the first cut's sf1→sf10 exponent at 1.20; this
  * harness pins the attribution to the join count on the 59M-row stream. */
object ProfileKnAB {

  private def threeJoin(df: DataFrame, id: String, textCol: String): DataFrame = {
    import graft.operators.TextAnalysis.tokens
    val d = lit(0.75)
    val tok = df.select(col(id).as("kn_id"), tokens(col(textCol)).as("tk"))
    val bg = tok.where(size(col("tk")) >= 2)
      .select(col("kn_id"), explode(transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("w1"),
                    element_at(col("tk"), i + 1).as("w2")))).as("b"))
      .select(col("kn_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbg = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = cbg.groupBy("w1").agg(sum(col("c")).as("ctx"), count(lit(1)).as("n1f"))
    val back = cbg.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val types = cbg.count()
    val p = (col("c").cast("double") - d) / col("ctx") +
      d * col("n1f").cast("double") / col("ctx") *
        (col("n1b").cast("double") / lit(types.toDouble))
    bg.join(cbg, Seq("w1", "w2")).join(ctx, Seq("w1")).join(back, Seq("w2"))
      .groupBy(col("kn_id").as(id))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(-log(p)), 6).as("nll"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val (sf1, sf10, _) = ProfileUtil.scaledDocsDirs(spark, fourth = false)
    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true); System.gc()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes at the gate SF
    val warm = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    graft.Bench.materialize(graft.operators.TextAnalysis.kneserNeyLogProb(warm, "doc_id", "text"))
    release()
    graft.Bench.materialize(threeJoin(warm, "doc_id", "text"))
    release()
    Seq("sf1" -> sf1, "sf10" -> sf10).foreach { case (name, dir) =>
      val docs = graft.sources.Tables.documents(spark, dir)
      Seq(
        "one-join " -> (() => graft.Bench.materialize(
          graft.operators.TextAnalysis.kneserNeyLogProb(docs, "doc_id", "text"))),
        "three-join" -> (() => graft.Bench.materialize(threeJoin(docs, "doc_id", "text")))
      ).foreach { case (label, run) =>
        val t = (1 to 2).map(_ => { val dt = timed(run()); release(); dt }).min
        println(f"[knab] $label $name%-5s min=$t%8.2f s")
        Console.flush()
      }
    }
    spark.stop()
  }
}
