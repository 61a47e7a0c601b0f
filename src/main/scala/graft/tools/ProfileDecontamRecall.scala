package graft.tools

import org.apache.spark.sql.functions._

/** Recall curve for the INDEXED semantic-decontamination gate (dev tool,
  * not part of the driver contract): the q103 oracle pins the
  * covering-knob identity, and the fixture spec measured one low-nprobe
  * point (0.545 at nprobe=1 of 4 clusters, sf0.001) — this tool banks
  * the full nprobe curve at bench scale (sf0.1 embeddings, the shared
  * k=8 coarse geometry), so the "recall lever is nprobe" claim carries a
  * measured curve instead of one point.
  *
  * Per nprobe: the exact gate's dropped set is the truth;
  * recall = |indexed-dropped| / |exact-dropped| (precision is 1.0 by
  * construction — the refine tier scores exact cosine, so every indexed
  * drop is a real ≥ τ pair). Also prints the probed-cluster ceiling per
  * level — the fraction of truth drops whose NEAREST suite witness lives
  * in a probed cluster — the same provable-ceiling decomposition
  * tuneProbe uses. */
object ProfileDecontamRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpus = e.where(col("vec_id") % 9 =!= 0)
    val suite = e.where(col("vec_id") % 9 === 0)
    val tau = 0.40

    val coarse = Similarity.ivfCentroids(corpus, k = 8, iters = 1)
    val books = Similarity.pqTrain(corpus, 4, 16, iters = 1)
    val dir = "/tmp/graft_decontam_recall_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Similarity.ivfPqIndexWrite(corpus, dir, coarse, books)
    val index = spark.read.parquet(dir)

    val all = corpus.select("vec_id").as[Long].collect().toSet
    val exactKept = Similarity.semanticDecontaminate(corpus, suite, tau)
      .select("vec_id").as[Long].collect().toSet
    val exactDropped = all -- exactKept
    graft.GraftSession.releaseCaches(spark, blocking = true)
    println(s"[decontam] corpus=${all.size} suite=${suite.count()} " +
      s"exact-dropped=${exactDropped.size} (tau=$tau, k=8 clusters)")

    // three configs per nprobe level, separating the gate's loss terms:
    // "prod" (hits=64, rerank=4) carries BOTH the coverage miss and the
    // shortlist/multiplicity miss; "wide" (hits=512, rerank=8) eliminates
    // the shortlist term for this corpus; "radius" has NO shortlist AT
    // ALL (semanticDecontaminateIndexedRadius) — its curve is the pure
    // coverage term by construction, so radius-vs-wide agreement proves
    // wide's shortlist really covered, and prod-vs-radius at fixed nprobe
    // is the full multiplicity cost of reusing the serving-shaped tier
    def report(np: Int, tag: String)(kept: Set[Long]): Unit = {
      val dropped = all -- kept
      val falseDrops = dropped -- exactDropped
      val recall = dropped.intersect(exactDropped).size.toDouble /
        math.max(1, exactDropped.size)
      println(f"[decontam] nprobe=$np $tag%-6s recall=$recall%.3f " +
        f"(${dropped.intersect(exactDropped).size}/${exactDropped.size}) " +
        s"false-drops=${falseDrops.size}")
      Console.flush()
    }
    Seq(1, 2, 4, 8).foreach { np =>
      Seq(("prod", 64, 4), ("wide", 512, 8)).foreach { case (tag, hits, rr) =>
        report(np, tag)(Similarity.semanticDecontaminateIndexed(corpus, suite,
            index, coarse, books, tau, nprobe = np, rerank = rr,
            hitsPerSuiteRow = hits)
          .as[Long].collect().toSet)
        graft.GraftSession.releaseCaches(spark, blocking = true)
      }
      report(np, "radius")(Similarity.semanticDecontaminateIndexedRadius(
          corpus, suite, index, coarse, tau, nprobe = np)
        .as[Long].collect().toSet)
      graft.GraftSession.releaseCaches(spark, blocking = true)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
