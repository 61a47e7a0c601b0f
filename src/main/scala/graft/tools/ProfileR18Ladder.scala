package graft.tools

import org.apache.spark.sql.functions._

/** Decade ladders for the round-18 operator additions (dev tool, not part
  * of the driver contract): model-based quality filtering (q105 scoring +
  * training), weighted sampling (q106), and BPE tokenizer training (q107's
  * pair stage + the full merge loop).
  *
  * Docs corpora: the shared prefixed construction
  * ([[ProfileUtil.scaledDocsDirs]] — per-copy token prefixes, so the
  * DISTINCT-WORD relation grows ×10 per decade) plus a VERBATIM
  * construction built here (ids remapped, text untouched — word counts
  * scale ×10, vocabulary FIXED). BPE is measured under BOTH because its
  * scale story splits exactly there: the corpus pass (wordCounts) is
  * linear in either regime, but every merge round touches only the vocab
  * relation — flat when the vocabulary saturates (the verbatim column,
  * and the 100 TB web-corpus reality where vocab grows ≪ linearly), and
  * linear in vocab when it doesn't (the prefixed column's worst case).
  *
  * Training is measured at iters=1 and iters=4 per leg; (t4 − t1)/3
  * isolates the per-iteration cost (one narrow pass + a dims-bounded
  * aggregate over the persisted feature relation) from the one-time
  * feature build, which pays the O(tokens · dims) dense construction. */
object ProfileR18Ladder {

  private def buildVerbatimDocs(spark: org.apache.spark.sql.SparkSession,
                                srcDir: String, dir: String, copies: Int,
                                parts: Int): Unit = {
    val srcTag = srcDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val marker = new java.io.File(s"$dir/_VERBATIM_OK_${srcTag}_${copies}x_p$parts")
    if (marker.exists()) return
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    (0 until copies).map { i =>
      docs.select((col("doc_id") + lit(i.toLong * nDoc)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    marker.createNewFile()
    println(s"[r18] built verbatim ${copies}x $srcDir at $dir")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val (sf1, sf10, _) = ProfileUtil.scaledDocsDirs(spark, fourth = false)
    val sf1v = "/tmp/graft_r18_verb_sf1"
    val sf10v = "/tmp/graft_r18_verb_sf10"
    buildVerbatimDocs(spark, sf01, sf1v, 10, 32)
    buildVerbatimDocs(spark, sf01, sf10v, 100, 32)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up at the gate SF: codegen compiles once, never timed
    Seq("q105_quality_model", "q106_weighted_sample", "q107_bpe_pairs")
      .foreach(q => graft.Bench.materialize(
        graft.queries.Queries.all(q)(spark, "/root/testdata/sf0.01")))
    graft.operators.BpeTrain.bpeTrain(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"), "text", 2)
    release()

    val legs = Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10)
    val totals = collection.mutable.Map.empty[(String, String), Double]

    legs.foreach { case (name, dir) =>
      val (c, io) = ProfileUtil.calibBoth(spark)
      def leg(tag: String)(body: => Unit): Unit = {
        val t = (1 to 2).map(_ => { val dt = timed(body); release(); dt }).min
        totals((tag, name)) = t
        println(f"[r18] $tag%-12s $name%-6s min=$t%8.2f s")
        Console.flush()
      }
      leg("q105_score") {
        graft.Bench.materialize(
          graft.queries.Queries.all("q105_quality_model")(spark, dir))
      }
      leg("q106_sample") {
        graft.Bench.materialize(
          graft.queries.Queries.all("q106_weighted_sample")(spark, dir))
      }
      leg("q107_pairs") {
        graft.Bench.materialize(
          graft.queries.Queries.all("q107_bpe_pairs")(spark, dir))
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      leg("train_it1") {
        graft.operators.QualityModel.trainHashedLogistic(
          docs, "text", col("lang") === "en", dims = 64, iters = 1)
      }
      leg("train_it4") {
        graft.operators.QualityModel.trainHashedLogistic(
          docs, "text", col("lang") === "en", dims = 64, iters = 4)
      }
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[r18] $name sentinels cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    }

    // BPE full-train ladders under both vocabulary regimes
    val bpeLegs = Seq(
      ("prefixed", Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10)),
      ("verbatim", Seq("sf0.1" -> sf01, "sf1" -> sf1v, "sf10" -> sf10v)))
    bpeLegs.foreach { case (regime, dirs) =>
      dirs.foreach { case (name, dir) =>
        val (c, io) = ProfileUtil.calibBoth(spark)
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val vocabN = graft.operators.BpeTrain.wordCounts(docs, "text").count()
        release()
        val tWc = (1 to 2).map(_ => {
          val dt = timed(graft.Bench.materialize(
            graft.operators.BpeTrain.wordCounts(docs, "text")))
          release(); dt
        }).min
        val tTrain = (1 to 2).map(_ => {
          val dt = timed(graft.operators.BpeTrain.bpeTrain(docs, "text", 4))
          release(); dt
        }).min
        totals((s"bpe_${regime}_wc", name)) = tWc
        totals((s"bpe_${regime}_train", name)) = tTrain
        val (c2, io2) = ProfileUtil.calibBoth(spark)
        println(f"[r18] bpe/$regime%-9s $name%-6s vocab=$vocabN%9d wc=$tWc%7.2f s " +
          f"train4=$tTrain%8.2f s rounds=${(tTrain - tWc) / 4}%6.2f s/round " +
          f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        Console.flush()
      }
    }

    // per-decade exponents for every ladder that ran
    totals.keys.map(_._1).toSeq.distinct.sorted.foreach { tag =>
      val t01 = totals.get((tag, "sf0.1")); val t1 = totals.get((tag, "sf1"))
      val t10 = totals.get((tag, "sf10"))
      (t01, t1, t10) match {
        case (Some(a), Some(b), Some(cc)) =>
          println(f"[r18] exponent $tag%-20s sf0.1→sf1 ${math.log10(b / a)}%.2f  " +
            f"sf1→sf10 ${math.log10(cc / b)}%.2f")
        case _ =>
      }
    }
    spark.stop()
  }
}
