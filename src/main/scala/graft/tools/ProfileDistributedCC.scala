package graft.tools

import org.apache.spark.sql.functions._

/** Distributed connected-components scale measurement (dev tool, not part
  * of the driver contract). The driver union-find gate
  * ([[graft.operators.Dedup.connectedComponents]], `maxDriverEdges`)
  * absorbs every bench-scale graph, so the pointer-jumping loop — the path
  * a 100 TB corpus WILL take once its near-dup graph outgrows the driver —
  * is property-tested for correctness (`maxDriverEdges = 0` in DedupSpec)
  * but its wall-time scale shape was unmeasured until round 13.
  *
  * Measures, at sf0.1 / 10× / 100× (the ProfileThirdDecade corpora,
  * reused or built with the identical disjoint-token construction): the
  * near-dup pair graph of the q41 corpus (τ = 0.95 over distinct-token
  * sets, blocked by language — cliques included, the loop's hardest
  * organic shape), then CC wall time on BOTH paths over the SAME persisted
  * edge relation:
  *   - `driver`: the gated union-find (where the graph fits the gate);
  *   - `loop`:   `maxDriverEdges = 0` — the distributed min-label +
  *     pointer-jumping rounds, the production path at scale.
  * Pair-stage time is excluded from both (edges are persisted and counted
  * before the clocks start); exponents are per 10× corpus decade. An
  * exponent > 1 on the loop is the action threshold (the fix would be
  * large-star/small-star contraction, same interface). */
object ProfileDistributedCC {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_scale3_sf1"
    val sf10 = "/tmp/graft_scale3_sf10"

    // construction-parameterized markers (shared with every other scale
    // tool via ProfileUtil): a raw versioned marker here would silently
    // reuse bytes another tool built under different parameters
    ProfileUtil.buildScaledDocs(spark, sf01, sf1, 10, "c", 32)
    ProfileUtil.buildScaledDocs(spark, sf01, sf10, 100, "c", 32)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }

    println(f"${"corpus"}%-10s ${"edges"}%10s ${"t(driver) s"}%12s ${"t(loop) s"}%10s ${"rounds-path agrees"}%18s")
    val rows = Seq(("sf0.1", sf01), ("sf1", sf1), ("sf10", sf10)).map {
      case (name, dir) =>
        val toks = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"),
            array_distinct(split(col("text"), " ")).as("tok"))
        val pairs = graft.operators.Dedup
          .jaccardPairs(toks, "doc_id", "tok", "lang", 0.95)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPairs = pairs.count() // pair stage paid HERE, outside both clocks
        def timeCC(maxDriverEdges: Long): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = graft.operators.Dedup.connectedComponents(
            pairs, maxDriverEdges = maxDriverEdges).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        // loop first so the driver path cannot warm the loop's codegen
        val (tLoop, nLoop) = timeCC(0L)
        val (tDriver, nDriver) = timeCC(1L << 21)
        val agrees = nLoop == nDriver
        println(f"$name%-10s $nPairs%10d $tDriver%12.2f $tLoop%10.2f $agrees%18s")
        pairs.unpersist(blocking = true)
        release()
        (name, nPairs, tDriver, tLoop)
    }
    def exp(a: Double, b: Double) = math.log10(b / a)
    println(f"loop exponents: 0.1→sf1 ${exp(rows(0)._4, rows(1)._4)}%.2f, " +
      f"sf1→sf10 ${exp(rows(1)._4, rows(2)._4)}%.2f " +
      f"(edge growth ${rows(1)._2.toDouble / rows(0)._2}%.1fx, " +
      f"${rows(2)._2.toDouble / rows(1)._2}%.1fx per decade)")
    spark.stop()
  }
}
