package graft.streaming

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expression of the reference's batch refresh
  * (SURVEY §2.9): the overwrite-everything + load-time anti-join strategy
  * becomes watermarked keyed dedup + incremental windowed aggregation.
  *
  * These are plan builders: they accept a streaming DataFrame (readStream /
  * MemoryStream in tests) and return a streaming DataFrame, so the same
  * logic runs under `Trigger.AvailableNow` (the batch-refresh analog) or
  * continuously.
  */
object Streams {

  /** Keyed dedup with bounded state: the streaming J2. The watermark bounds
    * how long a key is remembered — the 45-day budget mirrors the business
    * rule "Automated approval after 45 days" (rewards.csv reason values). */
  def dedupStream(events: DataFrame, key: String, tsCol: String,
                  watermark: String = "45 days"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(key))

  /** Incremental tumbling-window aggregate — the streaming twin of
    * Queries.q13_hourly_rollup (identical logical plan, incremental state). */
  def hourlyRollup(events: DataFrame, tsCol: String = "ts",
                   watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming decontamination gate: an unbounded document stream filtered
    * against the benchmark gram set — the live-ingest pipeline that must
    * never let eval data reach the training corpus. A doc's verdict is
    * decided ROW-LOCALLY (a stream-derived dedup/anti-join would be an
    * unsupported stream-stream shape): the gram array stays inside the row,
    * a codegen'd [[graft.operators.Bloom]] probe prunes, and — only when
    * the bloom fires; And short-circuits on false — an exact overlap test
    * against the literal key set confirms. Stateless, so memory stays
    * bounded at any stream length; the bench keys ride the plan exactly
    * like the batch gate's broadcast. For a benchmark suite too big to
    * inline, run the batch operator per micro-batch via foreachBatch
    * instead — same semantics, same code path. */
  def decontaminateStream(docs: DataFrame, benchKeys: Seq[Long],
                          id: String, textCol: String, n: Int = 4): DataFrame = {
    import graft.operators.{Bloom, TextAnalysis}
    val bloom = Bloom.build(benchKeys)
    docs.withColumn("sd_tok", TextAnalysis.tokens(col(textCol)))
      .withColumn("sd_g", transform(TextAnalysis.ngrams(col("sd_tok"), n),
        g => TextAnalysis.md5Long(g)))
      .where(!(exists(col("sd_g"), h => Bloom.mightContain(bloom, h)) &&
               arrays_overlap(col("sd_g"), typedlit(benchKeys.sorted))))
      .drop("sd_tok", "sd_g")
  }

  /** Streaming ingest into the MATERIALIZED clustered vector index: each
    * micro-batch encodes against the FROZEN coarse centroids + codebooks
    * and lands as extra files inside its cluster directories via
    * [[graft.operators.Similarity.ivfPqIndexAppend]] — the continuous half
    * of the growing-corpus story (batch half: nightly appends). Run under
    * `Trigger.AvailableNow` for the catch-up shape or continuously for
    * live ingest; the append-equivalence spec (SimilaritySpec) proves the
    * hard part — streamed growth answers identically to indexing the whole
    * corpus at once, because quantizers are frozen by design (re-training
    * would re-shape every existing cluster; growth beyond the training
    * distribution is a rebuild, the FAISS add() contract).
    *
    * Delivery is effectively exactly-once: each micro-batch lands through
    * [[graft.operators.Similarity.ivfPqIndexAppendOnce]] — batch-keyed
    * deterministic file names behind a commit marker — so a micro-batch
    * replayed after a crash (same batchId, same rows, the Structured
    * Streaming replay contract) is either skipped outright or re-lands
    * onto its own previous file names, never duplicated. The caller must
    * set `checkpointLocation` so offsets survive restarts, and must pair
    * a FRESH checkpoint with a fresh index (batch ids restart at 0 and
    * would be mistaken for already-committed replays). */
  def ivfPqIndexSink(vectors: DataFrame, path: String,
                     coarse: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]],
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     withVectors: Boolean = true, compactEvery: Int = 0)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.Similarity.ivfPqIndexAppendOnce(
        batch, path, batchId, coarse, codebooks, idCol, vecCol, withVectors)
      // optional in-line maintenance: every Nth micro-batch, collapse the
      // small files this sink itself has been accumulating (idempotent —
      // only clusters over the file threshold rewrite). Safe relative to
      // THIS stream (micro-batches are serial); external probes must still
      // respect ivfPqIndexCompact's maintenance-window contract.
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        graft.operators.Similarity.ivfPqIndexCompact(batch.sparkSession, path)
        ()
      }
    }

  /** Watermarked stream-stream interval join: each purchase joined to the
    * same user's views from the preceding `lookback`. Both sides carry
    * watermarks and the join condition bounds the event-time gap, so state
    * eviction is provable — the requirements Structured Streaming imposes
    * for unbounded-input joins. (The batch analog of "most recent prior
    * view" is the as-of join, q19; streaming keeps ALL views in the window
    * because later purchases may still match them.) */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
                       lookback: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"), col("value"))
  }
}
