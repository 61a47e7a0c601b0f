package graft.tools

import org.apache.spark.sql.functions._

/** ANN scale measurement (dev tool, not part of the driver contract):
  * the embedding family's scale story stopped at the SECOND decade
  * (ProfileScaleCurve's sf1 leg; rounds 10-13) with the note "q72's
  * in-memory quantizer build dominates; the amortized answer is the
  * stored-index tier". This tool takes the STORED tier itself to the
  * fourth decade — 2 k → 2 M vectors (dim 64) — and measures the one
  * design question that decides whether the tier holds at 100 TB:
  * does the FIXED coarse-cluster count (k = 8, the bench default) turn
  * the probe linear in corpus size, and does sizing k to the corpus
  * restore it?
  *
  *  - `build k8` / `build k64`: quantizer training (1 Lloyd iter) +
  *    PQ training + the clustered `partitionBy(cluster)` index write.
  *    Single-shot (a write is not idempotently re-timable), bracketed.
  *  - `probe k8` / `probe k64`: [[graft.operators.Similarity.ivfPqTopKIndexed]],
  *    10 queries, top-5, nprobe = 2 — partition-pruned to nprobe/k of
  *    the corpus, so k = 8 reads 25% of it forever while k = 64 reads
  *    3%. min-of-2.
  *  - `brute`: [[graft.operators.Similarity.bruteForceTopK]] over the
  *    full corpus — the no-index contrast line. min-of-2.
  *
  * k runs to 1024 at the two widest decades: coarse assignment
  * ([[graft.operators.Similarity.nearestCentroid]]) evaluates through the
  * fused [[graft.functions.CentroidTopN]] kernel (one expression node,
  * matrix as a referenced object), so the k ≈ √N regime (√N ≈ 1400 at
  * 2 M vectors) is reachable — the literal-centroid shape it replaced
  * (Θ(k·dim) expression terms) capped this tool at k=64, and the first
  * banked run measured that shape (SCALE.md §R16).
  *
  * Scaled corpora: rotation-perturbed copies (the ProfileScaleCurve
  * construction — within-copy geometry exact, cross-copy cosines
  * decorrelated by rotating each copy's vectors). Rotations live in
  * Z/64, so with ≥ 64 copies some copy PAIRS share geometry (exact
  * cross-copy twins); that perturbs recall statistics, not wall time,
  * and this tool measures wall. Markers are construction-parameterized
  * like every scale corpus since round 15. */
object ProfileAnnScale {
  private[tools] def buildScaledEmb(spark: org.apache.spark.sql.SparkSession,
                                    srcDir: String, dir: String, copies: Int,
                                    rotStep: Int, parts: Int): Unit = {
    val srcTag = srcDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val marker = new java.io.File(
      s"$dir/_SCALED_OK_EMB_${srcTag}_${copies}x_r${rotStep}_p$parts")
    if (marker.exists()) return
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nV = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until copies).map { i =>
      val rot = (i * rotStep) % dim
      val vec = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
                    slice(col("embedding"), 1, rot))
      emb.select((col("vec_id") + lit(i.toLong * nV)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    marker.createNewFile()
    println(s"[annscale] built ${copies}x $srcDir embeddings at $dir")
  }

  def main(args: Array[String]): Unit = {
    val fourth = args.contains("fourth")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_annscale_sf1"
    val sf10 = "/tmp/graft_annscale_sf10"
    val sf100 = "/tmp/graft_annscale_sf100"
    buildScaledEmb(spark, sf01, sf1, 10, 1, 32)
    buildScaledEmb(spark, sf01, sf10, 100, 1, 32)
    // fourth decade derives from sf10 (10 branches, second rotation layer
    // on a coprime step) — same layering trick as the docs corpora
    if (fourth) buildScaledEmb(spark, sf10, sf100, 10, 13, 64)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    val rows = collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    def leg(decade: String, what: String, runs: Int, note: String = "")(f: => Long): Unit = {
      val (c, io) = ProfileUtil.calibBoth(spark)
      val t = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        require(n > 0, s"$decade $what returned no rows")
        release()
        dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[annscale] $decade%-6s $what%-10s runs=$runs min=$t%8.2f s " +
        f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f" + note)
      Console.flush()
      rows += ((decade, what, t))
    }
    /** (query, neighbor) pairs of a top-k result — the recall basis. */

    val decades =
      if (args.contains("smoke")) Seq("sf0.1" -> sf01)
      else Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10) ++
        (if (fourth) Seq("sf100" -> sf100) else Nil)
    decades.foreach { case (name, dir) =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.where(col("vec_id") < 10)
      // exact ground truth first: timed as its own leg, then its pairs are
      // the recall basis for every probe at this decade (untimed re-run)
      leg(name, "brute", 2) {
        Similarity.bruteForceTopK(queries, emb, k = 5).count()
      }
      val truth = ProfileUtil.pairsOf(Similarity.bruteForceTopK(queries, emb, k = 5))
      release()
      val ks = if (name == "sf10" || name == "sf100") Seq(8, 64, 1024) else Seq(8, 64)
      ks.foreach { k =>
        val idx = s"/tmp/graft_annscale_idx_${name}_k$k"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
        var coarse: Array[Array[Double]] = null
        var books: Array[Array[Array[Double]]] = null
        leg(name, s"build k$k", 1) {
          coarse = Similarity.ivfCentroids(emb, k = k, iters = 1)
          books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 1)
          Similarity.ivfPqIndexWrite(emb, idx, coarse, books)
          1L
        }
        // nprobe=2 everywhere (the bench default); at k=1024 also
        // nprobe=16 — the deployment-real scaled-k config (read fraction
        // 16/1024 ≈ 1.6%, vs k8's fixed 25%): fixed nprobe at growing k
        // must shed noise-neighbor recall, scaled nprobe is the claim
        val nprobes = if (k == 1024) Seq(2, 16) else Seq(2)
        nprobes.foreach { np =>
          // recall@5 vs the exact pairs, computed OUTSIDE the timed window
          // (ADC quantization error + the probed fraction both bound it)
          val got = ProfileUtil.pairsOf(Similarity.ivfPqTopKIndexed(queries,
            spark.read.parquet(idx), k = 5, coarse, books, nprobe = np))
          release()
          val recall = got.intersect(truth).size.toDouble / truth.size
          val tag = if (np == 2) s"probe k$k" else s"probe k$k np$np"
          leg(name, tag, 2, note = f" recall@5=$recall%.3f") {
            Similarity.ivfPqTopKIndexed(queries, spark.read.parquet(idx),
              k = 5, coarse, books, nprobe = np).count()
          }
        }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
      }
    }
    println(f"${"decade"}%-7s ${"variant"}%-10s ${"min t (s)"}%10s")
    rows.foreach { case (d, w, t) => println(f"$d%-7s $w%-10s $t%10.2f") }
    // per-decade exponents for the probes (the scale claim under test)
    Seq("probe k8", "probe k64", "probe k1024", "probe k1024 np16", "brute")
      .foreach { w =>
      val series = decades.map(_._1).flatMap(d =>
        rows.find(r => r._1 == d && r._2 == w).map(r => (d, r._3)))
      val exps = series.sliding(2).collect {
        case Seq((_, a), (d2, b)) => f"$d2=${math.log10(b / a)}%.2f"
      }.mkString(" ")
      println(s"[annscale] exponents $w: $exps")
    }
    spark.stop()
  }
}
