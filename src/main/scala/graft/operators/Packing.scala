package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * fixed-token-budget packs (context windows) deterministically.
  *
  * True first-fit-decreasing is inherently sequential; the distributed
  * packing used in practice is cumulative-offset binning within a shard:
  * order documents by id inside each shard, take the running token count,
  * and cut packs every `budgetTokens` — a document that straddles a
  * boundary belongs to the pack its first token falls in (trainers truncate
  * or roll the tail, exactly as with a concatenated-then-chunked corpus).
  *
  * Scale shape: ONE window (partitionBy shard, orderBy id) — a single hash
  * exchange on the shard key + per-shard sort. Shards (language, date,
  * source file, …) bound the window so no global single-partition sort
  * exists; packs are only meaningful within a shard anyway, because that is
  * the unit a data-loader worker reads. */
object Packing {

  /** Adds `pack_id` (0-based within shard) and `pack_offset` (token offset
    * of this doc's first token inside its pack). */
  def packByBudget(df: DataFrame, shard: Column, id: Column, nTokens: Column,
                   budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(shard).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(nTokens).over(w), lit(0L))
    df.withColumn("pack_id", (before / budgetTokens).cast("long"))
      .withColumn("pack_offset", pmod(before, lit(budgetTokens)))
  }

  /** Length-grouped batch assignment + padding report — the dynamic-batching
    * step (HF Trainer's LengthGroupedSampler, Fairseq's bucketed batching):
    * a training batch pads every sequence to the batch MAX, so batching
    * similar lengths together is where GPU efficiency comes from. Shard
    * rows by the seeded content hash (shard sizes balance by uniformity),
    * sort each shard by length DESCENDING (ties by (hash, key) — a total
    * order, so the assignment is a pure function of content and seed),
    * chop into consecutive `batchSize` runs, and report each batch's
    * padding arithmetic: real tokens, padded tokens (n·max), efficiency.
    *
    * Output is BATCH-grain — (shard, batch_id, n_seqs, max_len,
    * real_tokens, padded_tokens, efficiency) — the relation a training
    * planner reads to size buckets or pick batchSize; |output| =
    * |corpus|/batchSize. An all-empty batch (max_len 0) pads nothing and
    * reports efficiency 1.0, not a division by zero. Rows with a null key
    * or null length cannot be batched and are excluded up front; lengths
    * must be non-negative (fail-fast is the caller's tokenizer's job —
    * a negative count is ill-formed input and excluded likewise).
    *
    * Scale shape: NO global sort — one hash exchange on the shard key
    * into per-shard (length DESC, hash, key) sorts (|corpus|/shards rows
    * each; set shards ≳ cores, exactly [[graft.operators.Sampling
    * .deterministicShuffle]]'s contract), then one map-side-combinable
    * batch-grain aggregate. The descending order means a shard's batches
    * are monotone: batch k's max_len ≥ batch k+1's — the property that
    * makes per-bucket learning-rate / token-budget planning readable. */
  def lengthGroupedBatches(df: DataFrame, key: Column, nTokens: Column,
                           batchSize: Int, shards: Int,
                           seed: String = ""): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(shards > 0, s"shards must be positive, got $shards")
    val reserved = Seq("lb_key", "lb_len", "lb_h", "shard", "batch_id",
      "n_seqs", "max_len", "real_tokens", "padded_tokens", "efficiency")
    val clash = df.columns.filter(c => reserved.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"input columns collide with scratch/output names " +
        s"[${clash.mkString(", ")}] — rename or drop them first")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("lb_len").desc, col("lb_h").asc, col("lb_key").asc)
    df.withColumn("lb_key", key.cast("string"))
      .withColumn("lb_len", nTokens.cast("long"))
      .where(col("lb_key").isNotNull &&
        col("lb_len").isNotNull && col("lb_len") >= 0)
      .withColumn("lb_h",
        graft.functions.Md5LongFunction.md5Long(concat(lit(seed), col("lb_key"))))
      .withColumn("shard", pmod(col("lb_h"), lit(shards.toLong)).cast("int"))
      .withColumn("batch_id",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("shard"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_seqs"),
        max(col("lb_len")).as("max_len"),
        sum(col("lb_len")).as("real_tokens"))
      .withColumn("padded_tokens", col("n_seqs") * col("max_len"))
      .withColumn("efficiency",
        when(col("padded_tokens") === 0, lit(1.0)).otherwise(
          round(col("real_tokens").cast("double") /
            col("padded_tokens").cast("double"), 6)))
  }

  /** Document → overlapping fixed-size context windows: chunk c covers
    * tokens [c·stride, c·stride + chunkTokens) (0-based; overlap =
    * chunkTokens − stride). A doc at or under chunkTokens yields exactly
    * itself as chunk 0; otherwise chunks are emitted while they start
    * strictly inside the doc, so the tail is covered and every chunk of a
    * multi-chunk doc is non-empty. A doc whose token array is empty yields
    * one chunk with `chunk_text = ""` and `n_tokens = 0` — the whole-doc
    * fallback applies to it too (and SQL engines that split "" to a
    * 1-element array agree on this shape, so the oracle matches).
    *
    * Scale shape: pure per-row explode — no shuffle, no state; output rows
    * ≈ n_tokens/stride per doc. The standard pre-packing shaper (chunk here,
    * then [[packByBudget]] the chunks). */
  def chunkByTokens(df: DataFrame, id: Column, tokens: Column,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, $chunkTokens], got $stride")
    val n = size(col("tok"))
    val nChunks = when(n <= chunkTokens, lit(1)).otherwise(
      lit(1) + ceil((n - chunkTokens).cast("double") / stride).cast("int"))
    // two-step projection: the caller's `tokens` expression (often a
    // Θ(|text|) split/tokenize) → attribute, THEN the explode. In one
    // select the generator is hoisted below it (ExtractGenerator), so the
    // tokenizer would re-run once per CHUNK row — Θ(|text|·chunks)/doc
    df.select(id.as("doc_id"), tokens.as("tok"))
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(0), nChunks - 1)).as("c"))
      .select(col("doc_id"), col("c").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("tok"), col("c") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("tok")) - col("c") * stride, lit(chunkTokens))
          .cast("long").as("n_tokens"))
  }
}
