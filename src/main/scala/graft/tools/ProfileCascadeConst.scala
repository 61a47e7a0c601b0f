package graft.tools

import org.apache.spark.sql.functions._

/** Bench-scale constant decomposition for the cascade queries (dev tool,
  * not part of the driver contract). q41/q43 are the two slowest bench
  * rows (~2.3/2.8 s at sf0.1) and their fourth-decade exponents are banked
  * at 0.93/0.90 — the cost is the CASCADE CONSTANT, not a scaling term
  * (VERDICT r15 stretch). This tool names the dominant stage so the
  * constant is either banked as irreducible or yields a cheap win.
  *
  * Decomposition (the plain sub-gate path q41 takes at bench scale —
  * occ ≈ 5·10⁵ < the 2²¹ cascade gate):
  *   tok     — parquet scan + split + array_distinct, cached and counted;
  *   pairs   — [[graft.operators.Dedup.jaccardPairs]] end-to-end (routing
  *             aggregate + representation path + verify), persisted;
  *   cc      — [[graft.operators.Dedup.connectedComponents]] over the
  *             persisted pairs (driver union-find at this scale);
  *   label   — the distinct-ids left join producing canonical_id;
  *   q41     — the composed query, same protocol, for the residual
  *             (q41 − tok − pairs − cc − label ≈ plan/scheduling overhead,
  *             noting tok/pairs work is re-done inside the composed run).
  * Every rep is bracketed by both sentinels (CPU + I/O) per the round-16
  * protocol; stages run min-of-`reps` with blocking cache release between
  * reps. */
object ProfileCascadeConst {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def release(): Unit = {
      graft.GraftSession.releaseCaches(spark, blocking = true)
      System.gc()
    }
    // codegen warm-up at the smallest SF (never timed)
    graft.queries.Queries.all("q41_dedup_clusters")(spark, "/root/testdata/sf0.001").count()
    release()

    def toks() = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("tok"))

    val stages = collection.mutable.LinkedHashMap
      .empty[String, collection.mutable.ArrayBuffer[Double]]
    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      stages.getOrElseUpdate(name, collection.mutable.ArrayBuffer.empty) +=
        (System.nanoTime() - t0) / 1e9
      n
    }

    (1 to reps).foreach { rep =>
      val (c, io) = ProfileUtil.calibBoth(spark)
      // staged decomposition: each stage consumes the previous one's
      // PERSISTED output, so its clock holds only its own work
      val t = toks().persist()
      time("tok")(t.count())
      val pairs = graft.operators.Dedup
        .jaccardPairs(t, "doc_id", "tok", "lang", 0.95)
        .persist()
      time("pairs")(pairs.count())
      val comps = graft.operators.Dedup.connectedComponents(pairs)
      time("cc")(comps.count())
      time("label")(t.select(col("doc_id").as("id")).distinct()
        .join(comps, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id"))).count())
      release()
      time("q41_composed")(
        graft.queries.Queries.all("q41_dedup_clusters")(spark, dir).count())
      release()
      time("q43_composed")(
        graft.queries.Queries.all("q43_corpus_curation")(spark, dir).count())
      release()
      val (c2, io2) = ProfileUtil.calibBoth(spark)
      println(f"[cascade-const] rep$rep cpu=$c%.3f/$c2%.3f io=$io%.3f/$io2%.3f " +
        stages.map { case (k, v) => f"$k=${v.last}%.2f" }.mkString(" "))
      Console.flush()
    }
    println(f"${"stage"}%-14s ${"min"}%7s ${"median"}%7s  (s over $reps reps)")
    stages.foreach { case (k, v) =>
      val s = v.sorted
      println(f"$k%-14s ${s.head}%7.2f ${s(s.length / 2)}%7.2f")
    }
    spark.stop()
  }
}
