package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: decompose q90 (ExactSubstr removal) by stage at a given
  * corpus dir — the round-16 fourth-decade exponent read 1.22 with only
  * the window-lead sort spilling (8.7 GB, ProfileSpillMap), so the
  * super-linear term is CPU/shape, not spill, and the fix needs to know
  * WHICH stage breaks the decade before anything is rebuilt.
  *
  *   A: gram sites (posexplode + window leads + md5 project)
  *   B: duplicated-start arrays (A + widened gram exchange + occurrence
  *      reduce + semi-join + per-doc collect)
  *   C: the full query (B + token rescan + rebuild join + row-local HOFs)
  *
  * Stages mirror the operator's internals (kept in sync by hand — a
  * measurement harness, not a contract); every leg is noop-materialized
  * (Bench.materialize) and double-sentinel bracketed.
  *
  * Usage: `runMain graft.tools.ProfileQ90Stages <dir> [reps]` */
object ProfileQ90Stages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val n = 8
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextAnalysis

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def tok = docs.select(col("doc_id").as("es_id"), split(col("text"), " ").as("tk"))
    def gramSites = {
      val w = Window.partitionBy("es_id").orderBy("pos")
      var th = tok.where(size(col("tk")) >= n)
        .select(col("es_id"), posexplode(col("tk")).as(Seq("pos", "tok")))
      (1 until n).foreach { j => th = th.withColumn(s"t$j", lead(col("tok"), j).over(w)) }
      th.where(col(s"t${n - 1}").isNotNull)
        .select(col("es_id"), col("pos"), TextAnalysis.md5Long(concat_ws(" ",
          col("tok") +: (1 until n).map(j => col(s"t$j")): _*)).as("g"))
    }
    def starts = {
      val sites = gramSites.repartition(269, col("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dupGrams = sites.groupBy("g").agg(count(lit(1)).as("occ"))
        .where(col("occ") >= 2).select("g")
      sites.join(dupGrams, Seq("g"), "left_semi")
        .groupBy("es_id").agg(sort_array(collect_list(col("pos"))).as("st"))
    }

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def leg(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val (c1, io1) = ProfileUtil.calibBoth(spark)
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        release(); dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[q90stage] $name%-12s $dir min=$t%8.2f s cpu=$c1%.3f/$c2%.3f io=$io1%.3f/$io2%.3f")
      Console.flush()
    }

    // codegen warm-up off the clocks
    graft.Bench.materialize(
      graft.queries.Queries.all("q90_exact_substr_rm")(spark, "/root/testdata/sf0.01"))
    release()

    leg("A:grams", () => gramSites)
    leg("B:starts", () => starts)
    leg("C:full", () =>
      graft.queries.Queries.all("q90_exact_substr_rm")(spark, dir))
    spark.stop()
  }
}
