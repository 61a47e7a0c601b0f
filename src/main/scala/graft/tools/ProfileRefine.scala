package graft.tools

import org.apache.spark.sql.functions._

/** Refine-tier A/B (dev tool, not part of the driver contract): at a fixed
  * probe fraction (nprobe/k), the three stored-index probe tiers trade
  * vector I/O for recall —
  *
  *   - `adc`     [[graft.operators.Similarity.ivfPqTopKIndexed]]: m bytes
  *               of codes per candidate, quantization error kept;
  *   - `refine`  [[graft.operators.Similarity.ivfPqTopKRefined]]: codes per
  *               candidate + ONLY the rerank·k shortlist's vectors fetched
  *               back (pushed-id row-group skipping over id-sorted files),
  *               quantization error gone from the final ordering;
  *   - `exact`   [[graft.operators.Similarity.ivfTopKIndexed]]: every
  *               probed vector read — the refine tier's recall ceiling at
  *               the same nprobe.
  *
  * This tool banks recall@5 (vs the brute-force truth set) and min-of-2
  * wall per tier per decade, both-sentinel bracketed (the round-16
  * protocol). The claim under test: refine closes most of the ADC→exact
  * recall gap while its vector I/O stays SHORTLIST-proportional — the
  * probe-side cost that scales with the answer size, not the corpus.
  *
  * Corpora: sf0.1 is the driver testdata; the `deep` leg reads
  * [[ProfileAnnScale]]'s rotation-perturbed sf10 corpus and assumes a
  * prior ProfileAnnScale run left it built (marker-checked there). One
  * index build per decade at k=64 (the scaled-k regime measured in
  * SCALE.md §R16). */
object ProfileRefine {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val sf01 = "/root/testdata/sf0.1"
    val sf10 = "/tmp/graft_annscale_sf10"

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    val decades = Seq("sf0.1" -> sf01) ++
      (if (args.contains("deep")) Seq("sf10" -> sf10) else Nil)
    decades.foreach { case (name, dir) =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 10)
      val truth = ProfileUtil.pairsOf(Similarity.bruteForceTopK(queries, emb, k = 5))
      release()
      val k = 64
      val idx = s"/tmp/graft_refine_idx_$name"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
      val coarse = Similarity.ivfCentroids(emb, k = k, iters = 1)
      val books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 1)
      Similarity.ivfPqIndexWrite(emb, idx, coarse, books)
      release()
      def probe(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
        val recall = ProfileUtil.pairsOf(f).intersect(truth).size.toDouble / truth.size
        release()
        val (c, io) = ProfileUtil.calibBoth(spark)
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          require(f.count() > 0, s"$name $tag returned no rows")
          val dt = (System.nanoTime() - t0) / 1e9
          release(); dt
        }.min
        val (c2, io2) = ProfileUtil.calibBoth(spark)
        println(f"[refine] $name%-6s $tag%-12s min=$t%6.2f s recall@5=$recall%.3f " +
          f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        Console.flush()
      }
      def idxDf = spark.read.parquet(idx)
      probe("adc") {
        Similarity.ivfPqTopKIndexed(queries, idxDf, k = 5, coarse, books, nprobe = 2)
      }
      Seq(2, 8).foreach { r =>
        probe(s"refine r$r") {
          Similarity.ivfPqTopKRefined(queries, idxDf, k = 5, coarse, books,
            nprobe = 2, rerank = r)
        }
      }
      probe("exact") {
        Similarity.ivfTopKIndexed(queries, idxDf, k = 5, coarse, nprobe = 2)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    }
    spark.stop()
  }
}
