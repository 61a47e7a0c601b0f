package graft.tools

import org.apache.spark.sql.functions._

/** q101/SQ8 decade ladder (dev tool, not part of the driver contract):
  * the SQ8 tier's decade story was ASSERTED to mirror q70's whole-corpus
  * ADC family (both scan every corpus code row per query batch); this
  * tool makes that a measurement — sf0.1 → sf1 → sf10 over the
  * rotation-perturbed scaled embeddings ([[ProfileAnnScale]]'s corpora,
  * shared markers), q101 exactly as declared (train + encode + top-5 for
  * 10 queries).
  *
  * It also reads the one footprint q101 carries that PQ does not: the
  * decoded-corpus persist ([[graft.operators.Similarity.sqTopK]] caches
  * (id, dim-double reconstruction, self-dot) per row — dim·8 B/vector
  * against PQ's m bytes). The tool reports the persist's memory/disk
  * split at every leg straight from the block manager, so the "where
  * does MEMORY_AND_DISK start spilling" question is answered with a
  * number instead of arithmetic. */
object ProfileSq8Ladder {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_annscale_sf1"
    val sf10 = "/tmp/graft_annscale_sf10"
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf1, 10, 1, 32)
    ProfileAnnScale.buildScaledEmb(spark, sf01, sf10, 100, 1, 32)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    // warm-up: codegen classes compile once, never timed
    graft.Bench.materialize(
      graft.queries.Queries.all("q101_sq_topk")(spark, "/root/testdata/sf0.01"))
    release()

    val rows = collection.mutable.ArrayBuffer.empty[(String, Double, Long, Long)]
    Seq("sf0.1" -> sf01, "sf1" -> sf1, "sf10" -> sf10).foreach { case (name, dir) =>
      val (c, io) = ProfileUtil.calibBoth(spark)
      var mem = 0L; var disk = 0L
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.materialize(
          graft.queries.Queries.all("q101_sq_topk")(spark, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        // the decoded-corpus persist is still resident here — read its
        // memory/disk split BEFORE the release drops it
        val (m, d) = ProfileUtil.cacheBytes(spark)
        mem = m; disk = d
        release()
        dt
      }.min
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[sq8] $name%-6s min=$t%8.2f s decoded-persist mem=${mem / 1e6}%8.1f MB " +
        f"disk=${disk / 1e6}%8.1f MB cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
      Console.flush()
      rows += ((name, t, mem, disk))
    }
    rows.zip(rows.drop(1)).foreach { case ((a, ta, _, _), (b, tb, _, _)) =>
      println(f"[sq8] exponent $a→$b: ${math.log10(tb / ta)}%.2f")
    }
    spark.stop()
  }
}
