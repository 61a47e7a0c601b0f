package graft.tools

import org.apache.spark.sql.functions._

/** Incremental-ingest ladder (dev tool, not part of the driver contract):
  * [[graft.pipeline.CurationPipeline.ingestBatch]] documents its cost
  * honestly — stages 1 and 3 are batch-sized, stage 2's cross-dedup pays
  * one corpus-scale pass per batch (the union's token document-frequency
  * order cannot be precomputed) — but that honesty was unmeasured. This
  * tool holds the BATCH fixed (the sf0.01 documents table, ids offset
  * into a disjoint range) and grows the corpus STATE ×10 per leg
  * (sf0.1 → sf1 → sf10 over [[ProfileUtil.scaledDocsDirs]]'s shared
  * corpora), timing one full ingestBatch per leg: the per-batch wall's
  * exponent against state size IS the "curate on a cadence, not per
  * micro-batch" crossover, measured.
  *
  * The suite-gram relation is STAGED to parquet once and passed as a
  * read handle — exactly the cross-bracket discipline the operator's
  * scaladoc prescribes (a persist would be silently dropped by each
  * batch's cache bracket). */
object ProfileIngestBatch {
  def main(args: Array[String]): Unit = {
    val fourth = sys.env.get("GRAFT_FOURTH_DECADE").contains("1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.CurationPipeline
    val (sf1, sf10, sf100) = ProfileUtil.scaledDocsDirs(spark, fourth)

    // fixed batch: the sf0.01 table, ids shifted clear of every scaled
    // corpus's id range (ids there are < copies · |sf0.1| ≪ 10^9) — the
    // operator now fail-fasts on a collision
    val batch = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
        col("lang"), col("text"))
    // eval-sized frozen suite → gram relation staged to parquet ONCE
    val suite = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("doc_id") % 13 === 0).select(col("doc_id"), col("text"))
    val gramsPath = "/tmp/graft_ingest_suite_grams"
    graft.operators.TextAnalysis.corpusGramHashes(suite, "doc_id", "text", 8)
      .write.mode("overwrite").parquet(gramsPath)
    graft.GraftSession.releaseCaches(spark, blocking = true)
    val suiteGrams = spark.read.parquet(gramsPath)

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    def state(dir: String) = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text").as("clean_text"))

    // warm-up at the smallest state (codegen classes), never timed
    CurationPipeline.ingestBatch(spark, batch, state("/root/testdata/sf0.1"),
      suiteGrams, "/tmp/graft_ingest_warm")
    release()

    // GRAFT_SHARD_ONLY=1 skips the base ladder (already banked) and runs
    // only the lang-sharded A/B below — the fourth-decade session knob
    val shardOnly = sys.env.get("GRAFT_SHARD_ONLY").contains("1")
    val rows = collection.mutable.ArrayBuffer.empty[(String, Double)]
    (if (shardOnly) Nil
     else Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> sf1, "sf10" -> sf10) ++
      (if (fourth) Seq("sf100" -> sf100) else Nil))
      .foreach { case (name, dir) =>
        val st = state(dir)
        val (c, io) = ProfileUtil.calibBoth(spark)
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val out = CurationPipeline.ingestBatch(spark, batch, st, suiteGrams,
            s"/tmp/graft_ingest_$name")
          val n = out.count()
          val dt = (System.nanoTime() - t0) / 1e9
          require(n > 0, s"$name: batch fully rejected — fixture broken")
          release()
          dt
        }.min
        val (c2, io2) = ProfileUtil.calibBoth(spark)
        println(f"[ingest] state=$name%-6s batch-wall min=$t%8.2f s " +
          f"cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
        Console.flush()
        rows += ((name, t))
      }
    rows.zip(rows.drop(1)).foreach { case ((a, ta), (b, tb)) =>
      println(f"[ingest] per-batch exponent vs state $a→$b: ${math.log10(tb / ta)}%.2f")
    }

    // ── lang-sharded mitigation A/B (round 19) ───────────────────────
    // The documented escape for the cadence crossover: a batch carrying
    // a SUBSET of the corpus langs restricts stage 2b's corpus side to
    // those langs (exact under the lang-blocked pair contract). Here the
    // batch is the single-lang 'de' slice (~14% of the corpus mix), so
    // the sharded cross-dedup's corpus term should scale with the de
    // slice, not the whole state — measured per state decade, same
    // calibration brackets, survivors count-asserted identical.
    val deBatch = batch.where(col("lang") === "de")
    CurationPipeline.ingestBatch(spark, deBatch,
      state("/root/testdata/sf0.1"), suiteGrams,
      "/tmp/graft_ingest_warm_de", shardByBatchLangs = true)
    release()
    ((if (shardOnly) Nil
      else Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> sf1, "sf10" -> sf10)) ++
      (if (fourth) Seq("sf100" -> sf100) else Nil))
      .foreach { case (name, dir) =>
        val st = state(dir)
        def leg(sharded: Boolean): (Double, Long) = {
          val (c, io) = ProfileUtil.calibBoth(spark)
          var n = 0L
          val t = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            val out = CurationPipeline.ingestBatch(spark, deBatch, st,
              suiteGrams, s"/tmp/graft_ingest_de_${name}_$sharded",
              shardByBatchLangs = sharded)
            n = out.count()
            val dt = (System.nanoTime() - t0) / 1e9
            release()
            dt
          }.min
          val (c2, io2) = ProfileUtil.calibBoth(spark)
          println(f"[ingest-shard] state=$name%-6s sharded=$sharded%-5s " +
            f"wall min=$t%8.2f s survivors=$n cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f")
          Console.flush()
          (t, n)
        }
        val (tp, np) = leg(sharded = false)
        val (ts, ns) = leg(sharded = true)
        require(np == ns,
          s"$name: lang-sharding changed the survivor count ($np vs $ns) — " +
            "the exactness contract is broken")
        println(f"[ingest-shard] state=$name%-6s sharded/plain = ${ts / tp}%.2f")
      }
    spark.stop()
  }
}
