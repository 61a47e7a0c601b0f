package graft.tools

import org.apache.spark.sql.functions._

/** Scale-curve measurement (dev tool, not part of the driver contract):
  * times the scale-sensitive document/embedding queries at sf0.01, sf0.1,
  * and a synthetic 10× sf0.1 ("sf1") and prints per-decade growth
  * exponents, so every Θ-claim in SCALE.md §Scale curve is measured, not
  * extrapolated. A query growing ~linearly in rows shows exponent ≈ 1 per
  * decade; anything drifting toward 2 is a design bug caught at 10× cost
  * instead of 100×.
  *
  * The synthetic corpus is PROFILING-ONLY input (oracle queries never read
  * it): 10 copies of sf0.1 with remapped ids. Document text gets a
  * per-copy token prefix so token/shingle sets across copies are DISJOINT
  * — organic near-dup density is preserved exactly (the pair graph is 10 ×
  * sf0.1's; naive duplication would fabricate dense cross-copy near-dup
  * cliques and distort every pair-stage exponent).
  *
  * Embeddings have NO copy construction that preserves both properties a
  * true 10× draw would have — (a) the original distribution (cluster
  * populations scale linearly) and (b) organic match density (no
  * fabricated cross-copy near-pairs) — copies are either verbatim
  * (breaks b: every organic pair inflates 10×10, quadratic in copies) or
  * perturbed (breaks a: the mass moves relative to fixed centroids). So
  * the tool measures the embedding queries under BOTH constructions and
  * reports both exponents; the truth for a faithfully grown corpus lies
  * between them. Verbatim = distribution-faithful (IVF-family candidate
  * counts scale right, match-stage inflated); shifted (per-copy circular
  * dimension rotation — within-copy geometry exact, cross-copy cosines
  * decorrelated) = match-faithful, distribution-altered. */
object ProfileScaleCurve {
  private val DocQueries = Seq(
    "q23_dedup_exact", "q24_jaccard_pairs", "q25_minhash_dedup",
    "q26_simhash_pairs", "q40_winnow_fingerprints", "q41_dedup_clusters",
    "q43_corpus_curation", "q55_passage_dedup", "q60_containment",
    "q62_cross_dedup", "q76_ngram_novelty")
  private val EmbQueries = Seq(
    "q30_embedding_neardup", "q39_ann_ivf", "q72_ivfpq",
    "q80_semantic_dedup", "q81_ivfpq_indexed")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_scale_sf1")
    val sf1v = sf1 + "_verbatim"
    val copies = 10

    // versioned marker: bumping the construction invalidates stale corpora
    // built by older tool versions (an unversioned marker silently kept
    // measuring the old bytes)
    val marker = new java.io.File(s"$sf1/_SCALED_OK_v3")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf1))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sf1v))
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      val nDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until copies).map { i =>
        docs.select(
          (col("doc_id") + lit(i.toLong * nDoc)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(lit(s"c$i"), t)), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      val nV = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      def copiesOf(perturb: Boolean) = (0 until copies).map { i =>
        val vec = if (!perturb || i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, dim - i),
                      slice(col("embedding"), 1, i))
        emb.select((col("vec_id") + lit(i.toLong * nV)).as("vec_id"),
          vec.as("embedding"), col("label"))
      }.reduce(_ unionByName _).repartition(32)
      copiesOf(perturb = true)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      copiesOf(perturb = false)
        .write.mode("overwrite").parquet(s"$sf1v/embeddings.parquet")
      marker.createNewFile()
      println(s"[scale] built synthetic sf1 at $sf1 (+ verbatim embeddings at $sf1v)")
    }

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def timeMin(name: String, dir: String, runs: Int): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Queries.all(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        dt
      }.min

    // optional args: query names to measure (default: the full panel);
    // a typo'd name must fail loudly, not silently shrink the panel
    val unknown = args.toSet -- (DocQueries ++ EmbQueries).toSet
    require(unknown.isEmpty,
      s"unknown panel queries: ${unknown.mkString(", ")} — " +
        s"panel is ${(DocQueries ++ EmbQueries).mkString(", ")}")
    val panel = if (args.nonEmpty) (DocQueries ++ EmbQueries).filter(args.toSet)
                else DocQueries ++ EmbQueries
    println(f"${"query"}%-24s ${"t(0.01)"}%9s ${"t(0.1)"}%9s ${"t(sf1)"}%9s ${"exp 0.01→0.1"}%13s ${"exp 0.1→sf1"}%12s ${"exp(verbatim)"}%14s")
    panel.foreach { name =>
      // one warm-up at the smallest SF compiles the codegen classes
      timeMin(name, sf001, 1)
      val t001 = timeMin(name, sf001, 3)
      val t01 = timeMin(name, sf01, 3)
      val t1 = timeMin(name, sf1, 2)
      val e1 = math.log10(t01 / t001)
      val e2 = math.log10(t1 / t01)
      val ev = if (EmbQueries.contains(name))
        f"${math.log10(timeMin(name, sf1v, 2) / t01)}%14.2f" else f"${"—"}%14s"
      println(f"$name%-24s $t001%9.2f $t01%9.2f $t1%9.2f $e1%13.2f $e2%12.2f $ev")
    }
    spark.stop()
  }
}
