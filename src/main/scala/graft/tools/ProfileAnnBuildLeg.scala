package graft.tools

import org.apache.spark.sql.functions._

/** One-shot re-bank of [[ProfileAnnScale]]'s sf100 k64 legs (dev tool,
  * not part of the driver contract). The round-16 banked build leg
  * (1495.9 s) OVERLAPPED that session's oracle-gate sbt jobs on the
  * 32-core host — its sentinel brackets read calm and the decade ratio
  * matched the uncontended k8 legs, so any inflation is small, but the
  * table's one starred number should not survive another round
  * (VERDICT r16 §3). This tool reproduces exactly that leg — same
  * corpus construction (marker-checked), same k=64 / m=4 / ksub=16 /
  * 1 Lloyd iter / clustered index write, same single-shot timing, same
  * both-sentinel brackets — with nothing else running, plus the probe
  * twin (min-of-2, recall@5 vs the decade's brute truth). Intermediate
  * decades are built only as construction inputs, never timed. */
object ProfileAnnBuildLeg {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_annscale_sf1"
    val sf10 = "/tmp/graft_annscale_sf10"
    val sf100 = "/tmp/graft_annscale_sf100"
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf1, 10, 1, 32)
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf10, 100, 1, 32)
    ProfileAnnScale.buildScaledEmb(spark, sf10, sf100, 10, 13, 64)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    val emb = spark.read.parquet(s"$sf100/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    val truth = ProfileUtil.pairsOf(Similarity.bruteForceTopK(queries, emb, k = 5))
    release()

    val k = 64
    val idx = s"/tmp/graft_annscale_idx_sf100_k$k"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    var coarse: Array[Array[Double]] = null
    var books: Array[Array[Array[Double]]] = null
    val (c, io) = ProfileUtil.calibBoth(spark)
    val t0 = System.nanoTime()
    coarse = Similarity.ivfCentroids(emb, k = k, iters = 1)
    books = Similarity.pqTrain(emb, m = 4, ksub = 16, iters = 1)
    Similarity.ivfPqIndexWrite(emb, idx, coarse, books)
    val tBuild = (System.nanoTime() - t0) / 1e9
    release()
    val (c2, io2) = ProfileUtil.calibBoth(spark)
    println(f"[annleg] sf100 build k$k single-shot t=$tBuild%8.2f s " +
      f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
    Console.flush()

    val got = ProfileUtil.pairsOf(Similarity.ivfPqTopKIndexed(queries,
      spark.read.parquet(idx), k = 5, coarse, books, nprobe = 2))
    release()
    val recall = got.intersect(truth).size.toDouble / truth.size
    val (c3, io3) = ProfileUtil.calibBoth(spark)
    val tProbe = (1 to 2).map { _ =>
      val p0 = System.nanoTime()
      val n = Similarity.ivfPqTopKIndexed(queries, spark.read.parquet(idx),
        k = 5, coarse, books, nprobe = 2).count()
      require(n > 0, "probe returned no rows")
      val dt = (System.nanoTime() - p0) / 1e9
      release(); dt
    }.min
    val (c4, io4) = ProfileUtil.calibBoth(spark)
    println(f"[annleg] sf100 probe k$k min-of-2 t=$tProbe%6.2f s recall@5=$recall%.3f " +
      f"cpu=$c3%.3f/$c4%.3f io=$io3%.3f/$io4%.3f")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    spark.stop()
  }
}
