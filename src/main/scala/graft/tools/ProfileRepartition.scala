package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** A/B: single-row-group parquet scans put an entire table in ONE task
  * (row groups are assigned to the split containing their midpoint), so a
  * map-shaped query's whole expression pipeline runs on one core of N.
  * Measures the guide §2.5 remedy — repartition immediately after the
  * read — on the heaviest map-shaped paths. Usage:
  *   runMain graft.tools.ProfileRepartition [sfDir] [reps]
  */
object ProfileRepartition {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = GraftSession.defaultCpus

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.releaseCaches(spark, blocking = true)
        System.gc()
        dt
      }
      println(f"[repart] $label%-40s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val e = Tables.embeddings(spark, dir)
    val eR = e.repartition(cpus)
    println(s"[repart] embeddings scan partitions = ${e.rdd.getNumPartitions}")

    // q69 shape: train + encode
    time("q69 pqEncode (as-is)") {
      Similarity.pqEncode(e, Similarity.pqTrain(e, m = 4, ksub = 16, iters = 1))
    }
    time("q69 pqEncode (repartitioned)") {
      Similarity.pqEncode(eR, Similarity.pqTrain(eR, m = 4, ksub = 16, iters = 1))
    }

    // q110 shape: BPE encode under the frozen 16-merge vocab
    val docs = Tables.documents(spark, dir)
    val docsR = docs.repartition(cpus)
    def q110(d: DataFrame): DataFrame = {
      import graft.operators.BpeTrain
      BpeTrain.bpeEncode(d, "text", BpeTrain.fixedMerges())
        .select(col("doc_id"),
          concat_ws(" ", col("bpe_tokens")).as("bpe_text"), col("bpe_len"))
    }
    time("q110 bpeEncode (as-is)") { q110(docs) }
    time("q110 bpeEncode (repartitioned)") { q110(docsR) }

    // q49 shape: repetition fraction (pure per-row array work)
    def q49(d: DataFrame): DataFrame = graft.queries.Queries.all("q49_repetition_fraction")(spark, dir)
    time("q49 as declared") { q49(docs) }

    // q02 shape: join + heavy decimal projection
    val li = Tables.lineitem(spark, dir)
    println(s"[repart] lineitem scan partitions = ${li.rdd.getNumPartitions}")
    time("q02 (as-is)") { graft.queries.Queries.q02_enrich_transform(spark, dir) }

    spark.stop()
  }
}
