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
  * cliques and distort every pair-stage exponent). Embeddings get a
  * per-copy CIRCULAR SHIFT of their dimensions: within-copy geometry
  * (norms, pairwise cosines, cluster structure) is preserved exactly,
  * while cross-copy cosines decorrelate — verbatim copies would turn
  * every organic near-pair (a, b) into 10×10 cross-copy pairs, a
  * quadratic-in-copies inflation of the match set that misstates the
  * exponent of any match-sensitive stage.
  */
object ProfileScaleCurve {
  private val Queries = Seq(
    "q23_dedup_exact", "q24_jaccard_pairs", "q25_minhash_dedup",
    "q26_simhash_pairs", "q40_winnow_fingerprints", "q41_dedup_clusters",
    "q43_corpus_curation", "q55_passage_dedup", "q60_containment",
    "q62_cross_dedup", "q76_ngram_novelty",
    "q30_embedding_neardup", "q39_ann_ivf", "q72_ivfpq",
    "q80_semantic_dedup", "q81_ivfpq_indexed")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_scale_sf1")
    val copies = 10

    val marker = new java.io.File(s"$sf1/_SCALED_OK")
    if (!marker.exists()) {
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
      (0 until copies).map { i =>
        val shifted = if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, dim - i),
                      slice(col("embedding"), 1, i))
        emb.select((col("vec_id") + lit(i.toLong * nV)).as("vec_id"),
          shifted.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      marker.createNewFile()
      println(s"[scale] built synthetic sf1 at $sf1")
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

    println(f"${"query"}%-24s ${"t(0.01)"}%9s ${"t(0.1)"}%9s ${"t(sf1)"}%9s ${"exp 0.01→0.1"}%13s ${"exp 0.1→sf1"}%12s")
    Queries.foreach { name =>
      // one warm-up at the smallest SF compiles the codegen classes
      timeMin(name, sf001, 1)
      val t001 = timeMin(name, sf001, 3)
      val t01 = timeMin(name, sf01, 3)
      val t1 = timeMin(name, sf1, 2)
      val e1 = math.log10(t01 / t001)
      val e2 = math.log10(t1 / t01)
      println(f"$name%-24s $t001%9.2f $t01%9.2f $t1%9.2f $e1%13.2f $e2%12.2f")
    }
    spark.stop()
  }
}
