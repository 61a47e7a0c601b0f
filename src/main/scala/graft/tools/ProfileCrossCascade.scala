package graft.tools

import org.apache.spark.sql.functions._

/** Cross-corpus cascade A/B (dev tool, not part of the driver contract) —
  * the experiment that established the exact-first cascade is a NET LOSS
  * for the R×S family and must NOT be wired into
  * [[graft.operators.Dedup.crossJaccardPairs]]:
  *
  *  - the DISJOINT-token synthetic corpus (ProfileThirdDecade's — organic
  *    near-dup density, no cross-copy exact dups; shingle-space dup ratio
  *    ≈ 1.04) measured a forced cascade at 51.7 s vs 15.7 s direct at the
  *    100× decade — the collapse buys nothing there;
  *  - the VERBATIM-copies corpus built here (10 × sf0.1 documents with
  *    remapped ids and IDENTICAL text — the re-ingest shape the cascade
  *    was hypothesized FOR; dup ratio ≈ copies) measured PARITY within
  *    session noise (7.2 vs 6.0 s one session, 8.6 vs 10.6 a hotter
  *    one): even maximal duplicate mass buys only what the collapse
  *    costs, because the PPJoin's candidates are pair-bounded with or
  *    without collapse and the pair list is the output either way
  *    (unlike the self-join cascade, which shrinks a Θ(clique²) EDGE
  *    relation before CC).
  *
  * Times the q62 shape (batch sources src1–src3 vs the rest, 3-shingles,
  * τ = 0.8) through the forced-direct and forced-cascade seams on the
  * verbatim corpus, plus the public path (= direct). Pair OUTPUT is
  * quadratic in copies on this corpus — that is the true answer (every
  * cross-side twin pair exists), identical on all branches (counted). */
object ProfileCrossCascade {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_scale3_sf1verb"
    val copies = 10

    // construction-parameterized marker (same scheme as
    // ProfileUtil.buildScaledDocs): the verbatim corpus differs from the
    // disjoint-token ones only in construction, so the marker must encode
    // that construction — a bare version tag would let a stale corpus
    // built under older parameters measure as if it were this one
    val srcTag = sf01.replaceAll("[^A-Za-z0-9.]+", "_")
    val marker = new java.io.File(s"$dir/_SCALED_OK_VERBATIM_${srcTag}_${copies}x_p32")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      val nDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until copies).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * nDoc)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      marker.createNewFile()
      println(s"[scale] built ${copies}x VERBATIM docs corpus at $dir")
    }

    val batchSources = Seq("src1", "src2", "src3")
    def sides() = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"),
          graft.operators.TextAnalysis.shingles(split(col("text"), " "), 3).as("sh"))
      (docs.where(col("source").isin(batchSources: _*)),
        docs.where(!col("source").isin(batchSources: _*)))
    }
    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def time(tag: String,
             f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Long = {
      val (l, r) = sides()
      val t0 = System.nanoTime()
      val n = f(l, r).count()
      println(f"[cross-cascade] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$n")
      release()
      n
    }
    // one untimed warm-up (codegen classes), then each branch twice
    time("warmup", (l, r) =>
      graft.operators.Dedup.crossJaccardPairsDirectPath(l, r, "doc_id", "sh", "lang", 0.8))
    val counts = Seq(
      time("direct", (l, r) =>
        graft.operators.Dedup.crossJaccardPairsDirectPath(l, r, "doc_id", "sh", "lang", 0.8)),
      time("cascade", (l, r) =>
        graft.operators.Dedup.crossJaccardPairsCascadePath(l, r, "doc_id", "sh", "lang", 0.8)),
      time("public", (l, r) =>
        graft.operators.Dedup.crossJaccardPairs(l, r, "doc_id", "sh", "lang", 0.8)))
    require(counts.distinct.size == 1,
      s"branches must agree on the pair set, got $counts")
    spark.stop()
  }
}
