package graft.tools

import org.apache.spark.sql.functions._

/** Quantifies [[graft.operators.Similarity.ivfPqTopKIndexedFiltered]]'s
  * in-source recall caveat (dev tool, not part of the driver contract):
  * probes follow the QUERY's nearest centroids, not the allowed density,
  * so an allow-list concentrated in clusters the queries don't probe
  * k-starves the answer even though pre-filter semantics are doing their
  * job inside the probed slice.
  *
  * Fixture: sf0.1 embeddings, k=64/m=4/ksub=16 stored index, 10 queries.
  * Two allow-lists of comparable size —
  *
  *   - `uniform`     every even vec_id (q92's shape): allowed density
  *                   ~equal in every cluster;
  *   - `adversarial` exactly the ids whose cluster is NOT probed by any
  *                   query at nprobe=2: allowed density ZERO in the
  *                   probed slice — the documented worst case.
  *
  * Recall is measured against the FILTERED truth (brute-force top-k over
  * the allowed corpus slice — the answer a filtered search is supposed to
  * return), across an nprobe ladder. The numbers decide whether
  * allowed-density-aware probing (probing by allow-mass instead of query
  * distance) is worth building; the decision is recorded in SCALE.md. */
object ProfileFilteredRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = emb.count()
    val k = 64
    val idx = "/tmp/graft_filtrecall_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    val coarse = Similarity.ivfCentroids(emb, k = k, iters = 1)
    val books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 1)
    Similarity.ivfPqIndexWrite(emb, idx, coarse, books)
    release()
    def index = spark.read.parquet(idx)
    val queries = emb.where(col("vec_id") < 10)

    // the clusters the query batch probes at nprobe=2 (metadata-sized)
    val probedAt2 = queries
      .select(explode(graft.functions.CentroidFunctions
        .centroidTopN(col("embedding"), coarse, 2)).as("cluster"))
      .distinct().collect().map(_.getInt(0)).toSet
    println(s"[filt] probed clusters at nprobe=2: ${probedAt2.toSeq.sorted.mkString(",")} (of $k)")

    val uniform = emb.where(col("vec_id") % 2 === 0).select("vec_id")
    val adversarial = index
      .where(!col("cluster").isin(probedAt2.toSeq.map(Integer.valueOf): _*))
      .select(col("neighbor_id").as("vec_id"))
    Seq(("uniform", uniform), ("adversarial", adversarial)).foreach {
      case (name, allow) =>
        val allowN = allow.count()
        // filtered truth: brute-force over the ALLOWED slice only — what a
        // filtered search is contractually supposed to return
        val truth = ProfileUtil.pairsOf(Similarity.bruteForceTopK(
          queries, emb.join(allow, Seq("vec_id"), "left_semi"), k = 5))
        release()
        val (c, io) = ProfileUtil.calibBoth(spark)
        val line = Seq(2, 8, 16, 64).map { np =>
          val got = ProfileUtil.pairsOf(Similarity.ivfPqTopKIndexedFiltered(
            queries, index, k = 5, coarse, books, allow = allow, nprobe = np))
          release()
          f"np$np=${got.intersect(truth).size.toDouble / truth.size}%.3f"
        }.mkString(" ")
        // the refined-filtered composition: exact rerank removes the ADC
        // quantization term, leaving coarse COVERAGE as the only miss
        val lineR = Seq(2, 8, 16, 64).map { np =>
          val got = ProfileUtil.pairsOf(Similarity.ivfPqTopKRefinedFiltered(
            queries, index, k = 5, coarse, books, allow = allow,
            nprobe = np, rerank = 8))
          release()
          f"np$np=${got.intersect(truth).size.toDouble / truth.size}%.3f"
        }.mkString(" ")
        val (c2, io2) = ProfileUtil.calibBoth(spark)
        println(f"[filt] $name%-12s |allow|=$allowN%5d/$n adc     recall@5: $line " +
          f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        println(f"[filt] $name%-12s |allow|=$allowN%5d/$n refineR8 recall@5: $lineR")
        Console.flush()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    spark.stop()
  }
}
