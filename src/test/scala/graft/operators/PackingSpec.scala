package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def packed(budget: Long) = {
    val docs = Seq(
      // (shard, id, nTokens)
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L), ("a", 4L, 50L),
      ("b", 1L, 300L), ("b", 2L, 10L)
    ).toDF("shard", "id", "n")
    Packing.packByBudget(docs, col("shard"), col("id"), col("n"), budget)
      .select("shard", "id", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long)].collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
  }

  test("cumulative-offset binning: pack boundaries cut at the running token count") {
    val p = packed(256L)
    // shard a: offsets 0,100,200,300 -> packs 0,0,0,1; straddler (id 3, first
    // token at 200) belongs to pack 0 per the documented contract
    assert(p(("a", 1L)) === (0L, 0L))
    assert(p(("a", 2L)) === (0L, 100L))
    assert(p(("a", 3L)) === (0L, 200L))
    assert(p(("a", 4L)) === (1L, 44L)) // offset 300 = pack 1, 300 % 256 = 44
    // shard b is independent: its own window restarts at 0
    assert(p(("b", 1L)) === (0L, 0L))
    assert(p(("b", 2L)) === (1L, 44L)) // offset 300
  }

  test("matches a sequential re-computation on the documents corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val out = Packing.packByBudget(docs, col("lang"), col("doc_id"),
        col("n_tokens"), 256L)
      .select("lang", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      var before = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, packId, off) =>
        assert(packId === before / 256 && off === before % 256)
        assert(off >= 0 && off < 256)
        before += n
      }
    }
  }

  test("plan shape: one exchange on the shard key, nothing global") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val out = Packing.packByBudget(docs, col("lang"), col("doc_id"),
      col("n_tokens"), 256L)
    out.count() // finalize the adaptive plan before inspecting it
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(lang"),
      s"window must hash-partition by the shard key, got:\n$plan")
    assert(!plan.contains("SinglePartition") && !plan.contains("rangepartitioning"),
      s"no global sort/single-partition stage may exist:\n$plan")
  }

  test("budget must be positive") {
    val df = Seq(("a", 1L, 1L)).toDF("shard", "id", "n")
    intercept[IllegalArgumentException] {
      Packing.packByBudget(df, col("shard"), col("id"), col("n"), 0L)
    }
  }

  test("chunking: windows cover every token, overlap by chunk-stride, short docs pass through") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, 2 chunks
      (2L, "a b c")                                   // under one chunk
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, col("doc_id"), split(col("text"), " "),
        chunkTokens = 6, stride = 4)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((1L, 0L)) === ("t1 t2 t3 t4 t5 t6", 6L))
    assert(out((1L, 1L)) === ("t5 t6 t7 t8 t9 t10", 6L)) // 2-token overlap
    assert(out((2L, 0L)) === ("a b c", 3L))
    assert(out.size === 3)
    // exact-fit doc emits exactly one chunk (no empty tail chunk)
    val exact = Packing.chunkByTokens(
      Seq((3L, "x y z w")).toDF("doc_id", "text"), col("doc_id"),
      split(col("text"), " "), chunkTokens = 4, stride = 2).count()
    assert(exact === 1L)
  }

  test("plan shape: chunking is a pure per-row explode (zero exchanges)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Packing.chunkByTokens(docs, col("doc_id"), split(col("text"), " "),
      chunkTokens = 64, stride = 48)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("lengthGroupedBatches: descending chop is optimal on the bimodal " +
    "fixture, batch maxima monotone, partial tail batch, empty batch eff 1.0") {
    // 4 long + 4 short in ONE shard: length-grouped batching pads 404
    // tokens total (the optimum); any interleaving would pad up to 800.
    val df = (1L to 4L).map(i => (i, 100L)) ++ (5L to 8L).map(i => (i, 1L))
    val got = Packing.lengthGroupedBatches(df.toDF("id", "len"), col("id"),
        col("len"), batchSize = 4, shards = 1)
      .as[(Int, Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._6).sum === 404L, s"padded total: $got")
    assert(got.map(_._7).forall(_ === 1.0), "equal lengths per batch → eff 1.0")
    // monotone maxima + a partial tail: 5 seqs of one length, batch 2
    val odd = Seq((1L, 9L), (2L, 7L), (3L, 7L), (4L, 7L), (5L, 2L))
    val g2 = Packing.lengthGroupedBatches(odd.toDF("id", "len"), col("id"),
        col("len"), batchSize = 2, shards = 1)
      .as[(Int, Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(g2.map(_._4) === g2.map(_._4).sorted.reverse,
      "per-shard batch maxima must be non-increasing (descending chop)")
    assert(g2.map(_._3) === Array(2L, 2L, 1L), "last batch holds the tail")
    assert(g2.map(_._5).sum === odd.map(_._2).sum,
      "real tokens are conserved across batches")
    // an all-zero-length batch pads nothing and reports 1.0, not ÷0
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "len")
    val gz = Packing.lengthGroupedBatches(zeros, col("id"), col("len"), 2, 1)
      .select("padded_tokens", "efficiency").as[(Long, Double)].head()
    assert(gz === ((0L, 1.0)))
  }

  test("lengthGroupedBatches: layout-stable, seed reshards, exclusions " +
    "and guards; plan: one exchange, batch agg rides the shard partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def run(parts: Int, seed: String = "b1") =
      Packing.lengthGroupedBatches(docs.repartition(parts), col("doc_id"),
        col("n_chars"), batchSize = 16, shards = 4, seed = seed)
        .as[(Int, Long, Long, Long, Long, Long, Double)].collect().toSet
    val a = run(3)
    assert(a === run(29), "batching must not depend on partition layout")
    assert(a !== run(3, "b2"), "a fresh seed must reshard")
    val ill = Seq((Option(1L), Option(5L)), (Option.empty[Long], Option(9L)),
      (Option(3L), Option.empty[Long]), (Option(4L), Option(-2L)))
      .toDF("id", "len")
    val kept = Packing.lengthGroupedBatches(ill, col("id"), col("len"), 8, 1)
      .select("n_seqs").as[Long].head()
    assert(kept === 1L, "null key / null or negative length cannot batch")
    intercept[IllegalArgumentException] {
      Packing.lengthGroupedBatches(ill, col("id"), col("len"), 0, 1)
    }
    intercept[IllegalArgumentException] {
      Packing.lengthGroupedBatches(ill, col("id"), col("len"), 1, 0)
    }
    val clash = Seq((1L, 2L, 3L)).toDF("id", "len", "max_len")
    val e = intercept[IllegalArgumentException] {
      Packing.lengthGroupedBatches(clash, col("id"), col("len"), 1, 1)
    }
    assert(e.getMessage.contains("max_len"))
    // plan: the batch aggregate reuses the shard hash partitioning — the
    // window's exchange is the ONLY one
    val out = Packing.lengthGroupedBatches(docs, col("doc_id"),
      col("n_chars"), batchSize = 16, shards = 4)
    out.count()
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val nodes = out.queryExecution.executedPlan.collectWithSubqueries {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan
      case p => p
    }
    val shuffles = nodes.flatMap(_.collect { case s: ShuffleExchangeExec => s })
    assert(shuffles.length <= 1,
      s"only the shard window may shuffle, got ${shuffles.length}")
  }

  test("chunking validates window parameters") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(df, col("doc_id"), split(col("text"), " "), 0, 1)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(df, col("doc_id"), split(col("text"), " "), 4, 5)
    }
  }
}
