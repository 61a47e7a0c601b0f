package graft.queries

/** DuckDB-dialect oracle SQL for every entry in [[Queries.all]] — all of
  * them, spec-asserted (`OracleCoverageSpec` fails on any key drift), so
  * this header can never go stale again.
  *
  * The approximate operators are oracled by construction rather than skipped:
  *  - q25 (MinHash LSH) against the exact shingle-Jaccard truth set — valid
  *    because the verify stage makes output ⊆ truth, and the fixed banding
  *    recalls every truth pair on this data (also asserted in ScalaTest); a
  *    recall loss OR a broken verifier both fail the gate.
  *  - q26/q34/q40 recompute SimHash/rolling/winnowing exactly: their hashes
  *    are built on the cross-engine [[graft.operators.TextAnalysis.md5Long]].
  *  - q31 embeds the SRP hyperplane constants (generated from the same code
  *    the query uses, so they cannot drift).
  *  - q39 replays the deterministic IVF centroid build (seed + one Lloyd
  *    step with exact decimal sums) in SQL.
  *  - q38's sketch estimate is exported as a bounded-error witness bit that
  *    each engine checks against its own HLL.
  */
object OracleSql {

  // q25 portable-MinHash fragments: 16 per-perm signature minima and 4
  // band buckets, all on the 60-bit md5 hash (identical to the engine's
  // md5Long; the engine prefixes "i:" / "b:" and joins minima with ':'
  // over their decimal renderings — replayed verbatim here).
  private val mhSignature: String = (0 until 16).map(i =>
    s"min(('0x' || substr(md5('$i:' || sg), 1, 15))::BIGINT) AS m$i")
    .mkString(",\n         ")
  private val mhBuckets: String = (0 until 4).map { b =>
    val ms = (b * 4 until b * 4 + 4).map(i => s"CAST(m$i AS VARCHAR)")
      .mkString(" || ':' || ")
    s"('0x' || substr(md5('$b:' || $ms), 1, 15))::BIGINT"
  }.mkString(",\n             ")

  /** SRP hyperplanes as a DuckDB VALUES list — the identical constants the
    * Spark plan folds in ([[graft.operators.Similarity.srpBucket]]). */
  private val srpPlanes: String =
    graft.operators.Similarity.hyperplanes(64, 8).zipWithIndex
      .map { case (p, b) => s"($b, [${p.mkString(",")}]::DOUBLE[])" }
      .mkString(",\n")

  // q81/q82/q83 answer from the MATERIALIZED clustered index with q72's/
  // q39's/q80's exact parameters; the on-disk round trip cannot change a
  // single row, so each oracle is definitionally its in-memory twin's —
  // any drift between the in-memory and indexed paths fails the gate.
  val all: Map[String, String] =
    base.updated("q81_ivfpq_indexed", base("q72_ivfpq"))
      .updated("q82_ivf_indexed", base("q39_ann_ivf"))
      .updated("q83_semantic_indexed", base("q80_semantic_dedup"))
      .updated("q89_ivfpq_refined", refinedFromAdc(base("q72_ivfpq")))
      .updated("q92_ann_filtered", filteredFromAdc(base("q72_ivfpq")))
      // q97: the two injections COMPOSE — the allow predicate lands at the
      // candidate pairing (beneath the shortlist), then the refine tail
      // reranks the (now allowed-only) shortlist by exact cosine; built
      // from q72's SQL like both parents so none of the three can drift
      .updated("q97_ann_filtered_refined",
        refinedFromAdc(filteredFromAdc(base("q72_ivfpq"))))
      // q103: the indexed gate at COVERING knobs is definitionally the
      // exact gate restricted to surviving ids, so its oracle is q102's
      // with the max_sim column dropped — DuckDB replays the exact gate
      // with no knowledge of the probe machinery, and any shortlist /
      // probe / radius defect in the engine's indexed path fails the hash
      .updated("q103_semantic_decontam_indexed",
        idOnly(base("q102_semantic_decontam")))
      // q104: voteLabels over the stored index's covering-knob refine tier
      // — the neighbor relation is definitionally brute force's top-5, so
      // the oracle is q93's verbatim (the q81/q82/q83 storage-round-trip
      // pattern applied to the labeling composition)
      .updated("q104_knn_label_indexed", base("q93_knn_label"))
      // q116: the RADIUS gate at covering probes is definitionally the
      // exact gate restricted to surviving ids (no shortlist exists to
      // cover — spec-asserted ≡ the exact gate), so its oracle is q103's
      // exactly: q102's replay with max_sim dropped
      .updated("q116_semantic_decontam_radius",
        idOnly(base("q102_semantic_decontam")))

  /** q103: q102's exact-gate replay projected to the surviving ids (the
    * indexed twin returns no max_sim — it judges only probed candidates,
    * so a per-survivor max would be a lie). Built FROM q102's SQL so the
    * two gates can never drift. */
  private def idOnly(gateSql: String): String = {
    val proj = "SELECT c.vec_id, mx.max_sim"
    require(gateSql.contains(proj), "q102 oracle shape changed; update q103's projection")
    gateSql.replace(proj, "SELECT c.vec_id")
  }

  /** q92: q72's full quantizer replay with the allow-list predicate
    * injected at the candidate PAIRING (the `term` CTE's join) — before
    * any ranking, mirroring the engine's pre-filter semi-join beneath the
    * ADC window. Built FROM q72's SQL so the shared machinery cannot
    * drift between the two oracles. */
  private def filteredFromAdc(adcSql: String): String = {
    val pairing = "JOIN ca2 ON p.cluster = ca2.cluster AND p.query_id <> ca2.neighbor_id"
    require(adcSql.contains(pairing), "q72 oracle shape changed; update q92's filter injection")
    adcSql.replace(pairing, pairing + "\n        AND ca2.neighbor_id % 2 = 0")
  }

  /** q89: q72's quantizer replay up through the per-candidate ADC
    * distances (`dist`), then the refine tier's two extra steps — a
    * rerank·k = 10 shortlist by (adc_dist, neighbor_id) and an
    * exact-cosine re-cut of the top 5 — mirroring
    * [[graft.operators.Similarity.ivfPqTopKRefined]]'s two passes. Built
    * FROM q72's SQL so the shared IVF+PQ machinery can never drift
    * between the two oracles; the exact-cosine tail is q39's spelling
    * (the one already hash-parity-proven against the engine's fused
    * kernel via q82). */
  private def refinedFromAdc(adcSql: String): String = {
    val tail = adcSql.indexOf("SELECT query_id, neighbor_id, adc_dist")
    require(tail >= 0, "q72 oracle shape changed; update q89's refine tail")
    adcSql.substring(0, tail).reverse.dropWhile(_ == '\n').reverse + ",\n" +
      """shortlist AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
        |    FROM dist) WHERE rk <= 10),
        |rpair AS (
        |  SELECT s.query_id, s.neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(n.embedding) AS ue
        |  FROM shortlist s
        |  JOIN e q ON q.vec_id = s.query_id
        |  JOIN e n ON n.vec_id = s.neighbor_id),
        |rscored AS (
        |  SELECT query_id, neighbor_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM rpair GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
        |  FROM rscored) WHERE rk <= 5""".stripMargin
  }

  private lazy val base: Map[String, String] = Map(

    "q01_daily_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events
        |WHERE coalesce(event_type, '') <> 'error'
        |GROUP BY 1""".stripMargin,

    "q02_enrich_transform" ->
      """SELECT l.l_orderkey AS txn_id,
        |       CAST(l.l_linenumber AS BIGINT) AS line_no,
        |       o.o_custkey AS customer_id,
        |       o.o_orderstatus AS status,
        |       CAST(CAST(abs(l.l_extendedprice) AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(12,2)) AS DOUBLE) AS amount_major,
        |       CAST(CASE WHEN l.l_discount = 0
        |                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(l.l_tax AS DECIMAL(12,2))
        |                 ELSE CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(12,2))
        |            END AS DOUBLE) AS derived_price,
        |       strftime(l.l_shipdate, '%Y-%m-%d') AS txn_date,
        |       CAST(l.l_orderkey AS VARCHAR) AS txn_id_str,
        |       CAST(round(l.l_discount * 100) AS BIGINT) AS rate_pct,
        |       l.l_returnflag = 'R' AS is_return
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,

    "q03_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,

    "q04_filter_sort_page" ->
      """SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |       user_id, value
        |FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        |  AND event_type = 'purchase'
        |ORDER BY event_id DESC
        |LIMIT 50 OFFSET 10""".stripMargin,

    "q05_count_filter" ->
      """SELECT count(*) AS total_count
        |FROM events WHERE value > 100 AND event_type = 'purchase'""".stripMargin,

    "q06_cast_battery" ->
      """SELECT event_id,
        |       CAST(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT) AS k_int,
        |       CAST(TRY_CAST(event_type AS INTEGER) AS BIGINT) AS coerced_null,
        |       CAST(user_id AS VARCHAR) AS user_id_str,
        |       CAST(round(value * 100) AS BIGINT) AS value_cents,
        |       event_type = 'error' AS is_error,
        |       strftime(ts, '%Y-%m-%d') AS day
        |FROM events""".stripMargin,

    "q07_window_funcs" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(row_number() OVER w AS BIGINT) AS rn,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
        |       first_value(o_orderkey) OVER w AS first_order,
        |       lag(o_orderkey, 1) OVER w AS prev_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q08_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    "q09_set_ops" ->
      """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
        |UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)""".stripMargin,

    "q10_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
        |       count(*) AS count_order,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,

    "q11_top_revenue" ->
      """SELECT o.o_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,

    "q12_coalesce_fill" ->
      """SELECT c.c_custkey,
        |       coalesce(t.n, 0) AS n_orders,
        |       coalesce(t.total, 0.0) AS total_spend,
        |       coalesce(c.c_mktsegment, 'UNKNOWN') AS segment
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1) t ON c.c_custkey = t.o_custkey""".stripMargin,

    "q13_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q44_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q15_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum,
        |       count(*) OVER w AS trail_n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / (count(*) OVER w) AS trail_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q16_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')""".stripMargin,

    "q17_incremental_union" ->
      """WITH u AS (
        |  SELECT event_id, 1 AS src, ts FROM events WHERE event_id % 3 <> 0
        |  UNION ALL
        |  SELECT event_id, 2 AS src, ts FROM events WHERE event_id % 2 = 0)
        |SELECT event_id, src AS winning_src,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY src DESC) AS rk
        |      FROM u) WHERE rk = 1""".stripMargin,

    "q18_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click') AS DOUBLE) AS click,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view') AS DOUBLE) AS view,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'signup') AS DOUBLE) AS signup,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'error') AS DOUBLE) AS error
        |FROM events GROUP BY 1""".stripMargin,

    "q19_asof_join" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |     p AS (SELECT event_id, user_id, ts, value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s, p.value,
        |       v.view_id AS matched_view,
        |       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS matched_ts_s
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts < p.ts""".stripMargin,

    "q46_sliding_window" ->
      """SELECT strftime(s, '%Y-%m-%d %H:%M') AS win_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT e.ts, e.value, unnest(generate_series(
        |           to_timestamp(floor(epoch(e.ts) / 900) * 900) - INTERVAL 45 MINUTES,
        |           to_timestamp(floor(epoch(e.ts) / 900) * 900), INTERVAL 15 MINUTES)) AS s
        |  FROM events e) t
        |WHERE ts >= s AND ts < s + INTERVAL 1 HOUR
        |GROUP BY 1""".stripMargin,

    "q45_interval_join" ->
      """SELECT p.event_id,
        |       count(*) AS n_views,
        |       strftime(max(v.ts), '%Y-%m-%d %H:%M:%S') AS last_view_s
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |GROUP BY 1""".stripMargin,

    "q20_text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars_calc,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS stop_ratio
        |FROM documents""".stripMargin,

    "q21_lang_guess" ->
      """SELECT doc_id, lang,
        |       CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |                        x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
        |                 / len(string_split(text, ' ')) >= 0.05
        |            THEN 'en' ELSE 'und' END AS lang_guess,
        |       (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |                        x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
        |                 / len(string_split(text, ' ')) >= 0.05
        |            THEN 'en' ELSE 'und' END) = lang AS agrees
        |FROM documents""".stripMargin,

    "q22_fingerprint" ->
      """SELECT doc_id,
        |       md5(lower(trim(text))) AS fp_md5,
        |       sha256(lower(trim(text))) AS fp_sha256,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    "q23_dedup_exact" ->
      """SELECT md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp,
        |       min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q24_jaccard_pairs" ->
      """WITH tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM documents)
        |SELECT left_id, right_id, jaccard FROM (
        |  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |         CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |           / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS jaccard
        |  FROM tok a JOIN tok b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.95""".stripMargin,

    "q27_ann_cosine" ->
      """WITH pair AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e.embedding) AS ue
        |  FROM embeddings q, embeddings e
        |  WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin,

    // q93: q27's exact brute top-5 (same cosine spelling and tie-break),
    // then the majority vote — count per (query, label), winner by
    // (votes DESC, label ASC). Confidence is votes/k with both operands
    // exact integers, so the double is bit-identical across engines.
    "q93_knn_label" ->
      """WITH pair AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e.embedding) AS ue
        |  FROM embeddings q, embeddings e
        |  WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2),
        |nn AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY cosine DESC, neighbor_id) AS rk
        |    FROM scored) WHERE rk <= 5),
        |votes AS (
        |  SELECT nn.query_id, e.label, count(*) AS votes
        |  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
        |  WHERE e.label IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT query_id, label,
        |       CAST(votes AS BIGINT) AS votes,
        |       CAST(votes AS DOUBLE) / 5 AS confidence
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY votes DESC, label ASC) AS rk
        |      FROM votes) WHERE rk = 1""".stripMargin,

    "q28_embedding_stats" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
        |       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm
        |FROM embeddings""".stripMargin,

    "q29_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        |       CAST(64 + doc_id % 512 AS BIGINT) AS fake_width,
        |       CAST(64 + (doc_id * 7) % 512 AS BIGINT) AS fake_height
        |FROM documents""".stripMargin,

    "q41_dedup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM documents),
        |pairs AS (
        |  SELECT left_id, right_id FROM (
        |    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |           CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |             / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS jaccard
        |    FROM tok a JOIN tok b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.95),
        |edges AS (SELECT left_id AS src, right_id AS dst FROM pairs
        |          UNION SELECT right_id, left_id FROM pairs),
        |reach(id, anc) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, min(anc) AS canonical_id FROM reach GROUP BY 1""".stripMargin,

    "q42_train_split" ->
      """SELECT doc_id,
        |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |      FROM documents)""".stripMargin,

    "q43_corpus_curation" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM documents),
        |pairs AS (
        |  SELECT left_id, right_id FROM (
        |    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |           CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |             / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS jaccard
        |    FROM tok a JOIN tok b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.95),
        |edges AS (SELECT left_id AS src, right_id AS dst FROM pairs
        |          UNION SELECT right_id, left_id FROM pairs),
        |reach(id, anc) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
        |canon AS (SELECT id AS doc_id, min(anc) AS canonical_id FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, lang,
        |        least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |      + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |      + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |           / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3 AS qual,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |SELECT q.doc_id, q.lang, round(q.qual, 6) AS quality, q.n_tokens
        |FROM q JOIN canon ON q.doc_id = canon.doc_id
        |WHERE q.lang = 'en' AND q.doc_id = canon.canonical_id AND q.qual >= 0.8""".stripMargin,

    "q30_embedding_neardup" ->
      """WITH pair AS (
        |  SELECT a.vec_id AS l, b.vec_id AS r,
        |         unnest(a.embedding) AS ua, unnest(b.embedding) AS ub
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT l AS left_id, r AS right_id,
        |         round(sum(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           / (sqrt(sum(CAST(ua AS DOUBLE) * CAST(ua AS DOUBLE)))
        |            * sqrt(sum(CAST(ub AS DOUBLE) * CAST(ub AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2)
        |SELECT left_id, right_id, cosine FROM scored WHERE cosine >= 0.35""".stripMargin,

    "q32_subword_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subtokens,
        |       md5(array_to_string(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'), chr(1))) AS subtoken_fp
        |FROM documents""".stripMargin,

    "q36_percentiles" ->
      """SELECT o_orderpriority,
        |       quantile_cont(o_totalprice, 0.5) AS med_price,
        |       quantile_cont(o_totalprice, 0.9) AS p90_price,
        |       count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q37_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_upper,
        |       substr(c_name, 1, 8) AS name_prefix,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       reverse(c_name) AS name_rev,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
        |       CAST(length(trim(c_name)) AS BIGINT) AS name_len
        |FROM customer""".stripMargin,

    "q33_quality_score" ->
      """SELECT doc_id, round(
        |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |  + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |       / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |  + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |       / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3, 6) AS quality
        |FROM documents""".stripMargin,

    "q38_hll_distinct" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS exact_users,
        |       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |         <= 0.15 * count(DISTINCT user_id) AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,

    "q34_rolling_hash" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_concat([0::BIGINT],
        |           list_transform(string_split(text, ' '),
        |             t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)),
        |         (a, h) -> (a * 1000003 + h) % 2147483647) AS roll_hash
        |FROM documents""".stripMargin,

    "q40_winnow_fingerprints" ->
      """WITH toks AS (
        |  SELECT doc_id, u.i AS pos, u.x AS tok
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(string_split(text, ' '), (x, i) -> {'x': x, 'i': i})) AS u
        |        FROM documents)),
        |grams AS (
        |  SELECT doc_id, pos,
        |         ('0x' || substr(md5(tok || ' ' || t1 || ' ' || t2), 1, 15))::BIGINT AS gh
        |  FROM (SELECT doc_id, pos, tok,
        |               lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2
        |        FROM toks
        |        WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
        |  WHERE t2 IS NOT NULL),
        |winnow AS (
        |  SELECT doc_id, gh,
        |         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
        |                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
        |  FROM grams)
        |SELECT DISTINCT doc_id, gh AS fp FROM winnow WHERE gh = wmin""".stripMargin,

    "q26_simhash_pairs" ->
      """WITH th AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
        |        FROM documents)),
        |votes AS (
        |  SELECT doc_id, i,
        |         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, generate_series(0, 59) g(i) GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS sh
        |  FROM votes GROUP BY 1)
        |SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,

    // q25 replays the ENTIRE portable MinHash+LSH pipeline — 16 per-perm
    // md5 signature minima, 4 band buckets, the distinct bucket-join
    // candidate set, then the exact-Jaccard verify — so the approximate
    // tier's recall misses are reproduced bit-for-bit, not assumed away.
    "q25_minhash_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |         CASE WHEN len(tk) >= 3
         |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 2),
         |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
         |              ELSE [array_to_string(tk, ' ')] END AS s
         |  FROM t),
         |e AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         |sig AS (
         |  SELECT doc_id,
         |         $mhSignature
         |  FROM e GROUP BY doc_id),
         |bk AS (
         |  SELECT doc_id,
         |         unnest([0, 1, 2, 3]) AS band,
         |         unnest([
         |             $mhBuckets]) AS bucket
         |  FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |                     AND a.doc_id < b.doc_id)
         |SELECT left_id, right_id, jaccard FROM (
         |  SELECT c.left_id, c.right_id,
         |         CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS DOUBLE)
         |           / (len(sa.s) + len(sb.s) - len(list_filter(sa.s, x -> list_contains(sb.s, x)))) AS jaccard
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.left_id
         |  JOIN sh sb ON sb.doc_id = c.right_id)
         |WHERE jaccard >= 0.8""".stripMargin,

    "q35_media_features" ->
      """WITH f AS (
        |  -- ASCII-ONLY ASSUMPTION: cs hashes character code points, while
        |  -- Spark hashes signed UTF-8 payload bytes (Arrays.hashCode); the
        |  -- two agree exactly for pure-ASCII text, which TESTDATA.md
        |  -- guarantees (a 31-token a-z vocabulary). Non-ASCII testdata
        |  -- would need cs derived from the UTF-8 byte stream instead.
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |         list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1))) AS cs
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_bytes, cs,
        |         list_reduce(list_concat([1::BIGINT], cs),
        |           (a, x) -> (((31 * a + x) + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648) AS hc
        |  FROM f),
        |slots AS (
        |  SELECT doc_id, (u.i - 1) % 8 AS j, sum(u.x) AS s
        |  FROM (SELECT doc_id, unnest(list_transform(cs, (x, i) -> {'x': x, 'i': i})) AS u FROM h)
        |  GROUP BY 1, 2),
        |fsum AS (
        |  SELECT doc_id, round(sum(CAST(CAST(s / 255.0 AS REAL) AS DOUBLE)), 4) AS feature_sum
        |  FROM slots GROUP BY 1)
        |SELECT h.doc_id AS media_id,
        |       CAST(64 + ((hc % 512) + 512) % 512 AS INTEGER) AS width,
        |       CAST(64 + (((hc * 7) % 512) + 512) % 512 AS INTEGER) AS height,
        |       h.n_bytes,
        |       fsum.feature_sum
        |FROM h JOIN fsum USING (doc_id)""".stripMargin,

    // q84 wraps each doc's UTF-8 bytes as canonical 16 kHz mono 16-bit PCM
    // WAV and parses the header back; every parsed field is a deterministic
    // function of the byte length (byte rate = 16000*1*16/8 = 32000 B/s,
    // header = 44 B), so the oracle replays the arithmetic exactly.
    "q84_wav_metadata" ->
      """SELECT doc_id AS media_id,
        |       'audio/wav' AS mime,
        |       CAST(16000 AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST((CAST(octet_length(encode(text)) AS BIGINT) * 1000) // 32000 AS BIGINT) AS duration_ms,
        |       CAST(octet_length(encode(text)) + 44 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // q87 replays the tagger's occurrence counts: list_filter over the
    // same whitespace tokens, ratio over max(n_tokens, 1), 6-dp round.
    "q87_term_tags" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |       CAST(len(list_filter(tk, x -> list_contains(['slow', 'fast'], x))) AS BIGINT) AS perf_hits,
        |       round(len(list_filter(tk, x -> list_contains(['slow', 'fast'], x)))
        |             / greatest(len(tk), 1)::DOUBLE, 6) AS perf_ratio,
        |       CAST(len(list_filter(tk, x -> list_contains(['join', 'scan', 'sort'], x))) AS BIGINT) AS sql_hits,
        |       round(len(list_filter(tk, x -> list_contains(['join', 'scan', 'sort'], x)))
        |             / greatest(len(tk), 1)::DOUBLE, 6) AS sql_ratio,
        |       (len(list_filter(tk, x -> list_contains(['slow', 'fast'], x))) > 0
        |        OR len(list_filter(tk, x -> list_contains(['join', 'scan', 'sort'], x))) > 0) AS flagged
        |FROM t""".stripMargin,

    // q85 wraps each doc's UTF-8 bytes as a minimal MP4 (640×360, movie
    // duration = byte count at timescale 1000, container overhead =
    // 16 ftyp + 216 moov + 8 mdat header = 240 B) and parses the boxes
    // back; all fields are deterministic functions of the byte length.
    "q85_mp4_metadata" ->
      """SELECT doc_id AS media_id,
        |       'video/mp4' AS mime,
        |       CAST(640 AS INTEGER) AS width,
        |       CAST(360 AS INTEGER) AS height,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS duration_ms,
        |       CAST(octet_length(encode(text)) + 240 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // q88 composes q84/q85: even doc_ids wrapped as WAV (duration = UTF-8
    // byte count over the 32000 B/s byte rate), odd as MP4 (duration = byte
    // count in ms), every 7th payload corrupted (8-byte truncation) so its
    // parse fails and the corrupt-media gate drops it; survivors join back
    // onto the document relation 1:1.
    "q88_multimodal_mix" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(NULL AS INTEGER)
        |            ELSE CAST(640 AS INTEGER) END AS width,
        |       CASE WHEN doc_id % 2 = 0 THEN CAST(NULL AS INTEGER)
        |            ELSE CAST(360 AS INTEGER) END AS height,
        |       CASE WHEN doc_id % 2 = 0
        |            THEN CAST((CAST(octet_length(encode(text)) AS BIGINT) * 1000) // 32000 AS BIGINT)
        |            ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS duration_ms,
        |       source, lang, n_chars
        |FROM documents
        |WHERE doc_id % 7 <> 0""".stripMargin,

    // q86: shard = 60-bit md5Long(seed||key) mod shards (hash is
    // non-negative, so % is pmod); position = rank within the shard by
    // (hash, key) — the same cross-engine md5Long replay as q22/q25.
    "q86_corpus_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5('r10seed' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(h % 8 AS INTEGER) AS shard,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h""".stripMargin,

    "q31_ann_srp" ->
      s"""WITH planes(bit, w) AS (VALUES
         |$srpPlanes),
         |proj AS (
         |  SELECT e.vec_id, p.bit,
         |         list_sum(list_transform(generate_series(1, 64),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i])) AS s
         |  FROM embeddings e, planes p),
         |bkt AS (
         |  SELECT vec_id,
         |         sum(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS bucket
         |  FROM proj GROUP BY 1),
         |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
         |      FROM embeddings e JOIN bkt b USING (vec_id) WHERE e.vec_id < 50),
         |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS nv, b.bucket
         |      FROM embeddings e JOIN bkt b USING (vec_id)),
         |pair AS (
         |  SELECT q.query_id, c.neighbor_id,
         |         unnest(q.qv) AS uq, unnest(c.nv) AS ue
         |  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
         |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
         |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
         |  FROM pair GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM scored) WHERE rk <= 3""".stripMargin,

    "q39_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
        |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
        |cos0 AS (
        |  SELECT e.vec_id, s.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * s.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(s.cent, x -> x * x)))) AS cos
        |  FROM e, seeds s),
        |a1 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM cos0) WHERE rk = 1),
        |m AS (
        |  SELECT a1.cluster, u.i - 1 AS pos,
        |         CAST(sum(CAST(u.x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS m
        |  FROM a1 JOIN (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {'x': x, 'i': i})) AS u
        |                FROM e) ex USING (vec_id)
        |  GROUP BY 1, 2),
        |cents AS (
        |  -- LEFT JOIN the seeds: a cluster that empties after the Lloyd
        |  -- step keeps its seed centroid, mirroring Spark's
        |  -- means.getOrElse(i, cents(i)) (Similarity.ivfCentroids)
        |  SELECT s.cluster, coalesce(mm.cent, s.cent) AS cent
        |  FROM seeds s LEFT JOIN
        |    (SELECT cluster, list(m ORDER BY pos) AS cent FROM m GROUP BY 1) mm
        |    ON s.cluster = mm.cluster),
        |cos2 AS (
        |  SELECT e.vec_id, c.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * c.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(c.cent, x -> x * x)))) AS cos
        |  FROM e, cents c),
        |a2 AS (
        |  SELECT vec_id AS neighbor_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM cos2) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM cos2 WHERE vec_id < 50) WHERE rk <= 2),
        |pair AS (
        |  SELECT p.query_id, a2.neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(n.embedding) AS ue
        |  FROM probes p
        |  JOIN a2 ON p.cluster = a2.cluster AND p.query_id <> a2.neighbor_id
        |  JOIN e q ON q.vec_id = p.query_id
        |  JOIN e n ON n.vec_id = a2.neighbor_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
        |  FROM scored) WHERE rk <= 3""".stripMargin,

    "q47_pack_sequences" ->
      """SELECT doc_id, lang, n_tokens,
        |       CAST(before // 256 AS BIGINT) AS pack_id,
        |       CAST(before % 256 AS BIGINT) AS pack_offset
        |FROM (SELECT doc_id, lang, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |      FROM (SELECT doc_id, lang,
        |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |            FROM documents))""".stripMargin,

    "q48_stratified_sample" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |      FROM documents)
        |WHERE b < CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 100 ELSE 20 END""".stripMargin,

    "q50_ann_srp_multiprobe" ->
      s"""WITH planes(bit, w) AS (VALUES
         |$srpPlanes),
         |proj AS (
         |  SELECT e.vec_id, p.bit,
         |         list_sum(list_transform(generate_series(1, 64),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i])) AS s
         |  FROM embeddings e, planes p),
         |bkt AS (
         |  SELECT vec_id,
         |         sum(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS bucket
         |  FROM proj GROUP BY 1),
         |q AS (
         |  -- multi-probe: own bucket plus the 8 Hamming-1 neighbors
         |  SELECT e.vec_id AS query_id, e.embedding AS qv,
         |         unnest(list_prepend(b.bucket,
         |           list_transform(range(0, 8), i -> xor(b.bucket, 1::BIGINT << i)))) AS bucket
         |  FROM embeddings e JOIN bkt b USING (vec_id) WHERE e.vec_id < 50),
         |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS nv, b.bucket
         |      FROM embeddings e JOIN bkt b USING (vec_id)),
         |pair AS (
         |  SELECT q.query_id, c.neighbor_id,
         |         unnest(q.qv) AS uq, unnest(c.nv) AS ue
         |  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
         |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
         |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
         |  FROM pair GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
         |  FROM scored) WHERE rk <= 3""".stripMargin,

    "q49_repetition_fraction" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(tok) >= 2
        |             THEN list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i + 1])
        |             ELSE [array_to_string(tok, ' ')] END AS g2,
        |        CASE WHEN len(tok) >= 3
        |             THEN list_transform(range(1, len(tok) - 1),
        |                    i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])
        |             ELSE [array_to_string(tok, ' ')] END AS g3
        |      FROM t)
        |SELECT doc_id,
        |       round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / greatest(len(g2), 1), 6) AS dup2_frac,
        |       round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / greatest(len(g3), 1), 6) AS dup3_frac
        |FROM g""".stripMargin,

    "q51_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok,
        |                 len(string_split(text, ' ')) AS n
        |          FROM documents),
        |c AS (SELECT doc_id, tok, n,
        |        unnest(range(0, CASE WHEN n <= 64 THEN 1
        |                            ELSE 1 + CAST(ceil((n - 64) / 48.0) AS INT) END)) AS c
        |      FROM t)
        |SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
        |       array_to_string(list_slice(tok, c * 48 + 1, c * 48 + 64), ' ') AS chunk_text,
        |       CAST(least(n - c * 48, 64) AS BIGINT) AS n_tokens
        |FROM c""".stripMargin,

    "q52_decontamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g0 AS (SELECT doc_id,
        |        unnest(CASE WHEN len(tok) >= 4
        |               THEN list_transform(range(1, len(tok) - 2),
        |                      i -> array_to_string(list_slice(tok, i, i + 3), ' '))
        |               ELSE [array_to_string(tok, ' ')] END) AS gs
        |      FROM t),
        |g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM g0),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id < 10)
        |SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        |FROM g JOIN b USING (g)
        |WHERE g.doc_id >= 10
        |GROUP BY 1""".stripMargin,

    "q53_token_vocab" ->
      """SELECT token, freq, CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
        |FROM (SELECT u AS token, count(*) AS freq
        |      FROM (SELECT unnest(string_split(text, ' ')) AS u FROM documents)
        |      GROUP BY 1
        |      ORDER BY freq DESC, token
        |      LIMIT 20)""".stripMargin,

    // weight literals CAST to DOUBLE (DuckDB parses 0.5 as DECIMAL) and the
    // cut arithmetic written in the same order as the Spark plan, so the
    // IEEE doubles — and the floor boundary — replay bit-for-bit
    "q54_corpus_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
        |w AS (SELECT lang, cnt,
        |        CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
        |                  WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
        |                  WHEN 'de' THEN CAST(0.3 AS DOUBLE) END AS w
        |      FROM counts),
        |ws AS (SELECT * FROM w WHERE w IS NOT NULL),
        |s AS (SELECT min(cnt / w) AS scale FROM ws),
        |cuts AS (SELECT lang, floor(w * scale / cnt * 100) AS cut FROM ws, s)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cuts USING (lang)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < cut""".stripMargin,

    // q100: the epoch expansion replayed literally — same bucket hash as
    // q54, per-row copies = ⌊w⌋ + (bucket < ⌊frac(w)·100 + 0.5⌋), epochs
    // unnested 0-based. The frac arithmetic is written (w - floor(w))
    // with the SAME half-up +0.5 in both engines, so the IEEE noise
    // (3.2 - 3.0 = 0.2000…018 → bucket cut 20) replays bit-for-bit.
    "q100_epoch_mixture" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b,
        |         CASE source WHEN 'src0' THEN CAST(3.2 AS DOUBLE)
        |                     WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
        |                     WHEN 'src2' THEN CAST(0.0 AS DOUBLE)
        |                     ELSE CAST(1.0 AS DOUBLE) END AS w
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |             CAST(floor(w) AS INT)
        |               + CASE WHEN b < floor((w - floor(w)) * 100 + 0.5) THEN 1 ELSE 0 END AS copies
        |      FROM d)
        |SELECT doc_id, source,
        |       CAST(unnest(generate_series(0, copies - 1)) AS INT) AS epoch
        |FROM c WHERE copies > 0""".stripMargin,

    "q55_passage_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok, len(tok) AS n,
        |        unnest(range(0, CASE WHEN n <= 16 THEN 1
        |                            ELSE 1 + CAST(ceil((n - 16) / 16.0) AS INT) END)) AS c
        |      FROM t),
        |segs AS (SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
        |        array_to_string(list_slice(tok, c * 16 + 1, c * 16 + 16), ' ') AS chunk_text,
        |        CAST(least(n - c * 16, 16) AS BIGINT) AS n_tokens
        |      FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY chunk_text
        |                                   ORDER BY doc_id, chunk_id) AS rn
        |      FROM segs)
        |SELECT doc_id, chunk_id, chunk_text, n_tokens FROM r WHERE rn = 1""".stripMargin,

    "q56_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |          / CAST(127 AS DOUBLE) AS scale
        |      FROM embeddings),
        |x AS (SELECT vec_id, scale, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |      FROM e)
        |SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |       CASE WHEN scale = 0 THEN 0
        |            ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5) AS BIGINT)
        |       END AS q,
        |       round(scale, 6) AS scale
        |FROM x""".stripMargin,

    // patterns are the Java-regex/RE2 intersection; DuckDB regexp_replace
    // needs the explicit 'g' flag to match Spark's replace-all
    "q57_pii_redact" ->
      """WITH c AS (
        |  SELECT c_custkey AS customer_id,
        |         'user' || CAST(c_custkey AS VARCHAR) || '@' || lower(c_mktsegment)
        |           || '.example.com tel 555-'
        |           || lpad(CAST(c_custkey * 7919 % 10000 AS VARCHAR), 4, '0')
        |           || ' ip 10.' || CAST(c_custkey % 256 AS VARCHAR)
        |           || '.' || CAST(c_custkey * 3 % 256 AS VARCHAR) || '.7' AS contact
        |  FROM customer)
        |SELECT customer_id, contact,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(contact,
        |         '\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b', '[card]', 'g'),
        |         '\b\d{3}-\d{2}-\d{4}\b', '[ssn]', 'g'),
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[email]', 'g'),
        |         '\b\d{3}[- ]\d{4}\b', '[phone]', 'g'),
        |         '\b\d{1,3}(?:\.\d{1,3}){3}\b', '[ip]', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |       CAST(len(regexp_extract_all(contact, '\b\d{3}[- ]\d{4}\b')) AS BIGINT) AS n_phone,
        |       CAST(len(regexp_extract_all(contact, '\b\d{1,3}(?:\.\d{1,3}){3}\b')) AS BIGINT) AS n_ip
        |FROM c""".stripMargin,

    // arithmetic written in the exact order of the Spark expression (term 0
    // + term 1 + term 2, each idf * (tf*(k1+1)) / (tf + k1*((1-b) + b*dl/avgdl)))
    // with double literals CAST so DuckDB never routes through DECIMAL
    "q58_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN tok = 'dup' THEN 1 ELSE 0 END) AS tf0,
        |         sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS tf1,
        |         sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf2
        |  FROM tok GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM perdoc),
        |scored AS (
        |  SELECT doc_id, dl,
        |         round(
        |             ln(CAST(1.0 AS DOUBLE) + (n - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE)))
        |               * (tf0 * CAST(2.2 AS DOUBLE)) / (tf0 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
        |           + ln(CAST(1.0 AS DOUBLE) + (n - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE)))
        |               * (tf1 * CAST(2.2 AS DOUBLE)) / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
        |           + ln(CAST(1.0 AS DOUBLE) + (n - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE)))
        |               * (tf2 * CAST(2.2 AS DOUBLE)) / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)),
        |           6) AS score
        |  FROM perdoc, stats)
        |SELECT doc_id, CAST(dl AS BIGINT) AS dl, score, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |  FROM scored WHERE score > 0) WHERE rk <= 20""".stripMargin,

    "q59_unigram_nll" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
        |tot AS (SELECT sum(freq) AS total FROM freq)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(avg(-ln(CAST(freq AS DOUBLE) / total)), 6) AS nll
        |FROM tok JOIN freq USING (tok), tot
        |GROUP BY doc_id""".stripMargin,

    "q60_containment" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN len(tk) >= 3
        |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |              ELSE [array_to_string(tk, ' ')] END AS s
        |  FROM t)
        |SELECT left_id, right_id, containment FROM (
        |  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |         CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |           / len(a.s) AS containment
        |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id <> b.doc_id)
        |WHERE containment >= 0.8""".stripMargin,

    "q61_bigram_nll" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
        |  FROM tok WHERE len(tk) >= 2),
        |cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |cw1 AS (SELECT w1, sum(c) AS ctx FROM cbg GROUP BY 1),
        |v AS (SELECT count(DISTINCT t) AS vocab
        |      FROM (SELECT unnest(tk) AS t FROM tok))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(-ln((c + 1.0) / (ctx + vocab))), 6) AS nll
        |FROM bg JOIN cbg USING (w1, w2) JOIN cw1 USING (w1), v
        |GROUP BY doc_id""".stripMargin,

    "q62_cross_dedup" ->
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang, source,
        |         CASE WHEN len(tk) >= 3
        |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
        |              ELSE [array_to_string(tk, ' ')] END AS s
        |  FROM t)
        |SELECT left_id, right_id, jaccard FROM (
        |  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |         CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |           / (len(a.s) + len(b.s)
        |              - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS jaccard
        |  FROM sh a JOIN sh b ON a.lang = b.lang
        |  WHERE a.source IN ('src1', 'src2', 'src3')
        |    AND b.source NOT IN ('src1', 'src2', 'src3'))
        |WHERE jaccard >= 0.8""".stripMargin,

    "q63_source_drift" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        |gc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |gt AS (SELECT source, sum(c) AS gn FROM gc GROUP BY 1),
        |ct AS (SELECT t, sum(c) AS cc FROM gc GROUP BY 1),
        |tot AS (SELECT sum(c) AS tot FROM gc)
        |SELECT source, CAST(max(gn) AS BIGINT) AS n_tokens,
        |       round(sum((CAST(c AS DOUBLE) / gn)
        |                 * ln((CAST(c AS DOUBLE) / gn) / (CAST(cc AS DOUBLE) / tot))), 6) AS kl
        |FROM gc JOIN gt USING (source) JOIN ct USING (t), tot
        |GROUP BY source""".stripMargin,

    "q64_distinctive_terms" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        |gc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |gt AS (SELECT source, sum(c) AS gn FROM gc GROUP BY 1),
        |ct AS (SELECT t, sum(c) AS cc FROM gc GROUP BY 1),
        |tot AS (SELECT sum(c) AS tot FROM gc),
        |scored AS (
        |  SELECT source, t,
        |         (CAST(c AS DOUBLE) / gn) / (CAST(cc AS DOUBLE) / tot) AS lift
        |  FROM gc JOIN gt USING (source) JOIN ct USING (t), tot)
        |SELECT source, t AS term, CAST(rank AS BIGINT) AS rank, round(lift, 6) AS lift
        |FROM (SELECT source, t, lift,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY lift DESC, t ASC) AS rank
        |      FROM scored)
        |WHERE rank <= 3""".stripMargin,

    "q65_centroid_cohesion" ->
      """WITH comp AS (
        |  SELECT label, i,
        |         round(CAST(sum(CAST(embedding[i] AS DECIMAL(30,10))) AS DOUBLE)
        |               / count(*), 6) AS c
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |  GROUP BY 1, 2),
        |cent AS (SELECT label, list(c ORDER BY i) AS centroid FROM comp GROUP BY 1)
        |SELECT vec_id, label,
        |       round(
        |         list_sum(list_transform(generate_series(1, len(embedding)),
        |           i -> CAST(embedding[i] AS DOUBLE) * centroid[i]))
        |         / (sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
        |              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(generate_series(1, len(centroid)),
        |                i -> centroid[i] * centroid[i])))), 6) AS cos_centroid
        |FROM embeddings JOIN cent USING (label)""".stripMargin,

    "q66_bloom_decontam" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g0 AS (SELECT doc_id,
        |        unnest(CASE WHEN len(tok) >= 4
        |               THEN list_transform(range(1, len(tok) - 2),
        |                      i -> array_to_string(list_slice(tok, i, i + 3), ' '))
        |               ELSE [array_to_string(tok, ' ')] END) AS gs
        |      FROM t),
        |g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM g0),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id < 10),
        |hit AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (g) WHERE g.doc_id >= 10)
        |SELECT g.doc_id, count(DISTINCT g.g) AS n_grams
        |FROM g
        |WHERE g.doc_id >= 10 AND g.doc_id NOT IN (SELECT doc_id FROM hit)
        |GROUP BY 1""".stripMargin,

    "q67_fixed_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |                    CAST(doc_id AS VARCHAR)) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin,

    "q68_dup_histogram" ->
      """WITH fam AS (
        |  SELECT md5(lower(trim(substr(text, 1, 120)))) AS fp, count(*) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT sz AS cluster_size,
        |       CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sum(sz) AS BIGINT) AS n_docs,
        |       CAST(sum(sz - 1) AS BIGINT) AS n_redundant
        |FROM fam GROUP BY 1""".stripMargin,

    "q69_pq_codes" ->
      """WITH params AS (SELECT unnest(generate_series(0, 3)) AS s),
        |sub AS (
        |  SELECT e.vec_id, p.s,
        |         list_transform(e.embedding[p.s*16+1 : (p.s+1)*16],
        |                        x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings e, params p),
        |seeds AS (
        |  SELECT s, code, v AS cent FROM (
        |    SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code, v
        |    FROM sub) WHERE code < 16),
        |d0 AS (
        |  SELECT sub.vec_id, sub.s, seeds.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * seeds.cent[i])) AS d
        |  FROM sub JOIN seeds USING (s)),
        |a0 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM d0) WHERE rk = 1),
        |m AS (
        |  SELECT a0.s, a0.code, u.i AS pos,
        |         CAST(sum(CAST(sub.v[u.i] AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mval
        |  FROM a0 JOIN sub USING (vec_id, s),
        |       unnest(generate_series(1, 16)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |cents AS (
        |  SELECT seeds.s, seeds.code, coalesce(mm.cent, seeds.cent) AS cent
        |  FROM seeds LEFT JOIN
        |    (SELECT s, code, list(mval ORDER BY pos) AS cent FROM m GROUP BY 1, 2) mm
        |    ON seeds.s = mm.s AND seeds.code = mm.code),
        |d1 AS (
        |  SELECT sub.vec_id, sub.s, cents.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * cents.cent[i])) AS d
        |  FROM sub JOIN cents USING (s)),
        |a1 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM d1) WHERE rk = 1)
        |SELECT vec_id,
        |       CAST(max(CASE WHEN s = 0 THEN code END) AS BIGINT) AS code_0,
        |       CAST(max(CASE WHEN s = 1 THEN code END) AS BIGINT) AS code_1,
        |       CAST(max(CASE WHEN s = 2 THEN code END) AS BIGINT) AS code_2,
        |       CAST(max(CASE WHEN s = 3 THEN code END) AS BIGINT) AS code_3
        |FROM a1 GROUP BY 1""".stripMargin,

    // q102: the semantic gate replayed with q30's proven cosine spelling —
    // per (corpus, suite) pair the ROUNDED cosine, max per corpus id, kept
    // where the max stays under τ (null-vector rows survive with null max,
    // exactly as the engine's left join leaves them).
    "q102_semantic_decontam" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 9 = 0
        |             AND embedding IS NOT NULL),
        |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 9 <> 0),
        |pair AS (
        |  SELECT c.vec_id AS cid, s.vec_id AS sid,
        |         unnest(c.embedding) AS uc, unnest(s.embedding) AS us
        |  FROM c, s),
        |scored AS (
        |  SELECT cid, sid,
        |         round(sum(CAST(uc AS DOUBLE) * CAST(us AS DOUBLE))
        |           / (sqrt(sum(CAST(uc AS DOUBLE) * CAST(uc AS DOUBLE)))
        |            * sqrt(sum(CAST(us AS DOUBLE) * CAST(us AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2),
        |mx AS (SELECT cid AS vec_id, max(cosine) AS max_sim FROM scored
        |       WHERE NOT isnan(cosine) GROUP BY 1)
        |SELECT c.vec_id, mx.max_sim
        |FROM c LEFT JOIN mx USING (vec_id)
        |WHERE mx.max_sim < 0.40 OR mx.max_sim IS NULL""".stripMargin,

    // q101: the scalar quantizer replayed literally — per-dim min/max
    // (exact, no summation order), affine 0…255 codes with the clamp and
    // constant-dim guard written as the engine writes them, decode, then
    // the same query-constant-dropped squared L2 as q70 (|x̂|² − 2·q·x̂,
    // both sums left-to-right).
    "q101_sq_topk" ->
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |mm AS (SELECT u.i, min(CAST(e.embedding[u.i] AS DOUBLE)) AS mn,
        |              max(CAST(e.embedding[u.i] AS DOUBLE)) AS mx
        |       FROM embeddings e, dims u GROUP BY 1),
        |ml AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm),
        |dec AS (
        |  SELECT e.vec_id,
        |         list_transform(generate_series(1, 64), i ->
        |           mns[i]
        |           + CASE WHEN mxs[i] > mns[i]
        |                  THEN (mxs[i] - mns[i]) / 255.0 ELSE 0.0 END
        |             * least(greatest(round(
        |                 (CAST(e.embedding[i] AS DOUBLE) - mns[i]) * 255.0
        |                 / CASE WHEN mxs[i] > mns[i]
        |                        THEN mxs[i] - mns[i] ELSE 1.0 END), 0), 255)) AS d
        |  FROM embeddings e, ml),
        |cn AS (SELECT vec_id, d,
        |              list_sum(list_transform(d, x -> x * x)) AS nrm
        |       FROM dec),
        |q AS (SELECT vec_id AS query_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |      FROM embeddings WHERE vec_id < 10),
        |p AS (SELECT q.query_id, cn.vec_id AS neighbor_id,
        |             round(cn.nrm - 2 * list_sum(list_transform(
        |               generate_series(1, 64), i -> q.qv[i] * cn.d[i])), 6) AS sq_dist
        |      FROM q, cn WHERE q.query_id <> cn.vec_id)
        |SELECT query_id, neighbor_id, sq_dist, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY sq_dist, neighbor_id) AS rk FROM p)
        |WHERE rk <= 5""".stripMargin,

    "q70_pq_adc" ->
      """WITH params AS (SELECT unnest(generate_series(0, 3)) AS s),
        |sub AS (
        |  SELECT e.vec_id, p.s,
        |         list_transform(e.embedding[p.s*16+1 : (p.s+1)*16],
        |                        x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings e, params p),
        |seeds AS (
        |  SELECT s, code, v AS cent FROM (
        |    SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code, v
        |    FROM sub) WHERE code < 16),
        |d0 AS (
        |  SELECT sub.vec_id, sub.s, seeds.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * seeds.cent[i])) AS d
        |  FROM sub JOIN seeds USING (s)),
        |a0 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM d0) WHERE rk = 1),
        |m AS (
        |  SELECT a0.s, a0.code, u.i AS pos,
        |         CAST(sum(CAST(sub.v[u.i] AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mval
        |  FROM a0 JOIN sub USING (vec_id, s),
        |       unnest(generate_series(1, 16)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |cents AS (
        |  SELECT seeds.s, seeds.code, coalesce(mm.cent, seeds.cent) AS cent
        |  FROM seeds LEFT JOIN
        |    (SELECT s, code, list(mval ORDER BY pos) AS cent FROM m GROUP BY 1, 2) mm
        |    ON seeds.s = mm.s AND seeds.code = mm.code),
        |d1 AS (
        |  SELECT sub.vec_id, sub.s, cents.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * cents.cent[i])) AS d
        |  FROM sub JOIN cents USING (s)),
        |a1 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM d1) WHERE rk = 1),
        |term AS (
        |  SELECT q.vec_id AS query_id, a1.vec_id AS neighbor_id, q.s,
        |         (list_sum(list_transform(q.v, x -> x * x))
        |          + list_sum(list_transform(c.cent, x -> x * x)))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> q.v[i] * c.cent[i])) AS t
        |  FROM (SELECT * FROM sub WHERE vec_id < 10) q
        |  JOIN a1 ON q.s = a1.s AND q.vec_id <> a1.vec_id
        |  JOIN cents c ON c.s = a1.s AND c.code = a1.code),
        |dist AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_sum(list(t ORDER BY s)), 6) AS adc_dist
        |  FROM term GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT query_id, neighbor_id, adc_dist,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
        |      FROM dist)
        |WHERE rk <= 5""".stripMargin,

    "q71_destutter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id, tk,
        |             list_filter(tk, (x, i) -> i = 1 OR x <> tk[i-1]) AS ck
        |      FROM t)
        |SELECT doc_id,
        |       CAST(len(tk) AS BIGINT) AS n_before,
        |       CAST(len(ck) AS BIGINT) AS n_after,
        |       array_to_string(ck, ' ') AS clean_text
        |FROM c""".stripMargin,

    "q72_ivfpq" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |cseeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
        |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
        |ccos0 AS (
        |  SELECT e.vec_id, s.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * s.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(s.cent, x -> x * x)))) AS cos
        |  FROM e, cseeds s),
        |ca1 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM ccos0) WHERE rk = 1),
        |cm AS (
        |  SELECT ca1.cluster, u.i - 1 AS pos,
        |         CAST(sum(CAST(u.x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS m
        |  FROM ca1 JOIN (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {'x': x, 'i': i})) AS u
        |                 FROM e) ex USING (vec_id)
        |  GROUP BY 1, 2),
        |ccents AS (
        |  SELECT s.cluster, coalesce(mm.cent, s.cent) AS cent
        |  FROM cseeds s LEFT JOIN
        |    (SELECT cluster, list(m ORDER BY pos) AS cent FROM cm GROUP BY 1) mm
        |    ON s.cluster = mm.cluster),
        |ccos2 AS (
        |  SELECT e.vec_id, c.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * c.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(c.cent, x -> x * x)))) AS cos
        |  FROM e, ccents c),
        |ca2 AS (
        |  SELECT vec_id AS neighbor_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM ccos2) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM ccos2 WHERE vec_id < 10) WHERE rk <= 2),
        |params AS (SELECT unnest(generate_series(0, 3)) AS s),
        |sub AS (
        |  SELECT e.vec_id, p.s,
        |         list_transform(e.embedding[p.s*16+1 : (p.s+1)*16],
        |                        x -> CAST(x AS DOUBLE)) AS v
        |  FROM e, params p),
        |pseeds AS (
        |  SELECT s, code, v AS cent FROM (
        |    SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code, v
        |    FROM sub) WHERE code < 16),
        |pd0 AS (
        |  SELECT sub.vec_id, sub.s, pseeds.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * pseeds.cent[i])) AS d
        |  FROM sub JOIN pseeds USING (s)),
        |pa0 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM pd0) WHERE rk = 1),
        |pm AS (
        |  SELECT pa0.s, pa0.code, u.i AS pos,
        |         CAST(sum(CAST(sub.v[u.i] AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mval
        |  FROM pa0 JOIN sub USING (vec_id, s),
        |       unnest(generate_series(1, 16)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |pcents AS (
        |  SELECT pseeds.s, pseeds.code, coalesce(mm.cent, pseeds.cent) AS cent
        |  FROM pseeds LEFT JOIN
        |    (SELECT s, code, list(mval ORDER BY pos) AS cent FROM pm GROUP BY 1, 2) mm
        |    ON pseeds.s = mm.s AND pseeds.code = mm.code),
        |pd1 AS (
        |  SELECT sub.vec_id, sub.s, pcents.code,
        |         list_sum(list_transform(cent, x -> x * x))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> sub.v[i] * pcents.cent[i])) AS d
        |  FROM sub JOIN pcents USING (s)),
        |pa1 AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rk
        |    FROM pd1) WHERE rk = 1),
        |term AS (
        |  SELECT p.query_id, ca2.neighbor_id, q.s,
        |         (list_sum(list_transform(q.v, x -> x * x))
        |          + list_sum(list_transform(c.cent, x -> x * x)))
        |         - 2 * list_sum(list_transform(generate_series(1, 16),
        |             i -> q.v[i] * c.cent[i])) AS t
        |  FROM probes p
        |  JOIN ca2 ON p.cluster = ca2.cluster AND p.query_id <> ca2.neighbor_id
        |  JOIN sub q ON q.vec_id = p.query_id
        |  JOIN pa1 ON pa1.vec_id = ca2.neighbor_id AND pa1.s = q.s
        |  JOIN pcents c ON c.s = pa1.s AND c.code = pa1.code),
        |dist AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_sum(list(t ORDER BY s)), 6) AS adc_dist
        |  FROM term GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT query_id, neighbor_id, adc_dist,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
        |      FROM dist)
        |WHERE rk <= 5""".stripMargin,

    "q73_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())""".stripMargin,

    "q74_above_avg" ->
      """WITH ct AS (
        |  SELECT c_custkey, c_nationkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_total
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT *,
        |         sum(cust_total) OVER (PARTITION BY c_nationkey) AS nation_total,
        |         count(*) OVER (PARTITION BY c_nationkey) AS n_cust
        |  FROM ct)
        |SELECT c_custkey, c_nationkey,
        |       CAST(cust_total AS DOUBLE) AS cust_total,
        |       CAST(n_cust AS BIGINT) AS n_cust
        |FROM n WHERE cust_total * n_cust > nation_total""".stripMargin,

    "q75_token_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, t, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       count(*) AS n_distinct,
        |       round(ln(CAST(sum(c) AS DOUBLE))
        |             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
        |               / CAST(sum(c) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY 1""".stripMargin,

    "q76_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(tk) >= 8
        |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 7),
        |                     i -> array_to_string(tk[i:i+7], ' ')))
        |              ELSE [array_to_string(tk, ' ')] END AS s
        |  FROM t),
        |g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g
        |      FROM (SELECT doc_id, unnest(s) AS gs FROM sh)),
        |dfq AS (SELECT g, count(*) AS df FROM g GROUP BY 1)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
        |FROM g JOIN dfq USING (g) GROUP BY 1""".stripMargin,

    // q90: ExactSubstr span removal. Same gram hash as q76 but occurrence-
    // counted over ALL (doc, pos) sites (no per-doc distinct — a window
    // repeated within one doc is duplicated too); kept tokens replay the
    // engine's coverage predicate (token q-1 is cut iff some duplicated
    // window starts in (q-1-8, q-1]); span count is the gaps-and-islands
    // read of the sorted start list (new span iff the gap exceeds n).
    // DuckDB list indexes and lambda position params are 1-based where
    // Spark's are 0-based — hence the q - 1.
    "q90_exact_substr_rm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM t WHERE len(tk) >= 8)),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        |st AS (SELECT doc_id, list_sort(list(pos)) AS st
        |       FROM g JOIN dup USING (g) GROUP BY 1),
        |j AS (SELECT t.doc_id, t.tk, coalesce(st.st, CAST([] AS BIGINT[])) AS st
        |      FROM t LEFT JOIN st USING (doc_id)),
        |k AS (SELECT doc_id, tk, st,
        |             list_filter(tk, (x, q) ->
        |               len(list_filter(st, p -> p <= q - 1 AND q - 1 < p + 8)) = 0) AS kept
        |      FROM j)
        |SELECT doc_id,
        |       CAST(len(tk) AS BIGINT) AS n_tokens,
        |       CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
        |       CAST(CASE WHEN len(st) <= 1 THEN len(st)
        |                 ELSE 1 + len(list_filter(generate_series(2, len(st)),
        |                        i -> st[i] > st[i - 1] + 8))
        |            END AS BIGINT) AS n_spans,
        |       coalesce(array_to_string(kept, ' '), '') AS clean_text
        |FROM k""".stripMargin,

    // q91: q33's exact score expression (already hash-parity-proven), then
    // the budget selection is definitionally the first 200 rows of the
    // total order (score DESC, md5Long(key), key) — the engine computes
    // the same set threshold-wise, never sorting corpus rows.
    "q91_quality_budget" ->
      """WITH scored AS (
        |  SELECT doc_id, round(
        |      least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |    + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |    + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |         / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3, 6) AS quality
        |  FROM documents)
        |SELECT doc_id, quality FROM (
        |  SELECT doc_id, quality,
        |         row_number() OVER (ORDER BY quality DESC,
        |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |           CAST(doc_id AS VARCHAR)) AS rn
        |  FROM scored)
        |WHERE rn <= 200""".stripMargin,

    // q95: q33's exact score + token counts, then the kept set is the
    // maximal prefix of the total order (quality DESC, md5Long(key), key)
    // whose running token sum fits the budget — the engine computes the
    // same set threshold-wise without sorting corpus rows.
    "q95_token_budget" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |         round(
        |      least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |    + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |    + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |         / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3, 6) AS quality,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT *, sum(n_tokens) OVER (ORDER BY quality DESC,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |        CAST(doc_id AS VARCHAR)
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM scored WHERE n_tokens > 0)
        |SELECT doc_id, quality, n_tokens FROM r WHERE cum <= 20000""".stripMargin,

    // q98: q95's selection PER SOURCE — the oracle replays the naive
    // per-group spelling (running token sum over the identical total order,
    // partitioned by source); the engine computes the same set via the
    // distributed (group, score)-level threshold without sorting corpus
    // rows, and the two coincide by the same prefix argument as q95.
    "q98_domain_budget" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |         round(
        |      least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |    + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |    + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |         / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3, 6) AS quality,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
        |        ORDER BY quality DESC,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |        CAST(doc_id AS VARCHAR)
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM scored WHERE n_tokens > 0)
        |SELECT doc_id, source, quality, n_tokens FROM r WHERE cum <= 800""".stripMargin,

    // q96: the composed curation pass — q90's span removal verbatim, then
    // q33's quality expression and q95's running-sum budget selection both
    // computed over the CLEANED text (the stage boundary the composition
    // is evidence for). Budget 15000 on cleaned tokens.
    "q96_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM t WHERE len(tk) >= 8)),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        |st AS (SELECT doc_id, list_sort(list(pos)) AS st
        |       FROM g JOIN dup USING (g) GROUP BY 1),
        |j AS (SELECT t.doc_id, t.tk, coalesce(st.st, CAST([] AS BIGINT[])) AS st
        |      FROM t LEFT JOIN st USING (doc_id)),
        |cleaned AS (
        |  SELECT doc_id,
        |         coalesce(array_to_string(list_filter(tk, (x, q) ->
        |           len(list_filter(st, p -> p <= q - 1 AND q - 1 < p + 8)) = 0), ' '), '') AS ct
        |  FROM j),
        |scored AS (
        |  SELECT doc_id,
        |         round(
        |      least(CAST(length(ct) AS DOUBLE) / 200.0, 1.0) * 0.4
        |    + (CAST(len(list_distinct(string_split(ct, ' '))) AS DOUBLE)
        |         / greatest(CAST(len(string_split(ct, ' ')) AS DOUBLE), 1.0)) * 0.3
        |    + (1.0 - CAST(length(ct) - length(regexp_replace(ct, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |         / greatest(CAST(length(ct) AS DOUBLE), 1.0)) * 0.3, 6) AS quality,
        |         CAST(len(string_split(ct, ' ')) AS BIGINT) AS n_tokens
        |  FROM cleaned),
        |r AS (SELECT *, sum(n_tokens) OVER (ORDER BY quality DESC,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |        CAST(doc_id AS VARCHAR)
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM scored WHERE n_tokens > 0)
        |SELECT doc_id, quality, n_tokens FROM r WHERE cum <= 15000""".stripMargin,

    // q94: q90's machinery with frozen-corpus duplication — a batch gram
    // is duplicated iff it appears (at any position) on the corpus side;
    // batch-internal repeats deliberately do not count. Same coverage
    // predicate and span arithmetic as q90.
    "q94_cross_substr_rm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT * FROM t WHERE doc_id % 7 = 0),
        |c AS (SELECT * FROM t WHERE doc_id % 7 <> 0),
        |bg AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM b WHERE len(tk) >= 8)),
        |cg AS (
        |  SELECT DISTINCT ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM c WHERE len(tk) >= 8)),
        |st AS (SELECT doc_id, list_sort(list(pos)) AS st
        |       FROM bg JOIN cg USING (g) GROUP BY 1),
        |j AS (SELECT b.doc_id, b.tk, coalesce(st.st, CAST([] AS BIGINT[])) AS st
        |      FROM b LEFT JOIN st USING (doc_id)),
        |k AS (SELECT doc_id, tk, st,
        |             list_filter(tk, (x, q) ->
        |               len(list_filter(st, p -> p <= q - 1 AND q - 1 < p + 8)) = 0) AS kept
        |      FROM j)
        |SELECT doc_id,
        |       CAST(len(tk) AS BIGINT) AS n_tokens,
        |       CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
        |       CAST(CASE WHEN len(st) <= 1 THEN len(st)
        |                 ELSE 1 + len(list_filter(generate_series(2, len(st)),
        |                        i -> st[i] > st[i - 1] + 8))
        |            END AS BIGINT) AS n_spans,
        |       coalesce(array_to_string(kept, ' '), '') AS clean_text
        |FROM k""".stripMargin,

    // q99: q94's split with the roles flipped — the % 7 == 0 slice is the
    // held-out suite, audited against the rest. The oracle reads the three
    // span stats off the COVERED-POSITION islands (unnest each leaked
    // window to its positions, gaps-and-islands per doc), which coincides
    // with the engine's start-gap interval merge: two starts merge iff the
    // gap is ≤ n ⟺ their coverage is contiguous.
    "q99_contamination_report" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |h AS (SELECT * FROM t WHERE doc_id % 7 = 0),
        |c AS (SELECT * FROM t WHERE doc_id % 7 <> 0),
        |hg AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM h WHERE len(tk) >= 8)),
        |cg AS (
        |  SELECT DISTINCT ('0x' || substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 15))::BIGINT AS g
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 7)) AS i
        |        FROM c WHERE len(tk) >= 8)),
        |hit AS (SELECT doc_id, pos FROM hg JOIN cg USING (g)),
        |sites AS (SELECT doc_id, count(*) AS sites FROM hit GROUP BY 1),
        |cov AS (SELECT DISTINCT doc_id, pos + u AS q
        |        FROM hit, (SELECT unnest(generate_series(0, 7)) AS u)),
        |isl AS (SELECT doc_id, q,
        |               q - row_number() OVER (PARTITION BY doc_id ORDER BY q) AS grpk
        |        FROM cov),
        |runs AS (SELECT doc_id, count(*) AS rl FROM isl GROUP BY doc_id, grpk),
        |ragg AS (SELECT doc_id, count(*) AS nspans, max(rl) AS maxrl,
        |                sum(rl) AS covtok
        |         FROM runs GROUP BY 1)
        |SELECT h.doc_id,
        |       CAST(len(h.tk) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(sites.sites, 0) AS BIGINT) AS leaked_sites,
        |       CAST(coalesce(ragg.covtok, 0) AS BIGINT) AS leaked_tokens,
        |       CAST(coalesce(ragg.nspans, 0) AS BIGINT) AS leaked_spans,
        |       CAST(coalesce(ragg.maxrl, 0) AS BIGINT) AS max_span_tokens
        |FROM h LEFT JOIN sites USING (doc_id) LEFT JOIN ragg USING (doc_id)""".stripMargin,

    "q77_dsir_score" ->
      """WITH tk AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT tok, count(*) AS cf,
        |             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tf
        |      FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS c_tot,
        |               CAST(sum(tf) + count(*) AS DOUBLE) AS tv
        |        FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(avg(ln((tf + 1.0) / tv) - ln(CAST(cf AS DOUBLE) / c_tot)), 6)
        |         AS dsir_score
        |FROM tk JOIN f USING (tok), tot
        |GROUP BY 1""".stripMargin,

    "q78_cms_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |ds AS (SELECT unnest(generate_series(0, 3)) AS d),
        |cells AS (
        |  SELECT d,
        |         ('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || tok), 1, 15))::BIGINT % 64 AS b,
        |         count(*) AS cnt
        |  FROM toks, ds GROUP BY 1, 2),
        |exact AS (SELECT tok, count(*) AS exact_count FROM toks GROUP BY 1),
        |est AS (
        |  SELECT tok, min(cnt) AS cms_count
        |  FROM (SELECT e.tok, ds.d,
        |               ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || '|' || e.tok), 1, 15))::BIGINT % 64 AS b
        |        FROM exact e, ds) p
        |  JOIN cells USING (d, b) GROUP BY 1)
        |SELECT tok, exact_count, cms_count,
        |       cms_count >= exact_count AS never_undercounts
        |FROM exact JOIN est USING (tok)""".stripMargin,

    "q79_approx_quantiles" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       quantile_cont(o_totalprice, 0.5) AS exact_med,
        |       approx_quantile(o_totalprice, 0.5)
        |         BETWEEN quantile_cont(o_totalprice, 0.45)
        |             AND quantile_cont(o_totalprice, 0.55) AS approx_ok
        |FROM orders GROUP BY 1""".stripMargin,

    "q80_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
        |  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
        |cos0 AS (
        |  SELECT e.vec_id, s.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * s.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(s.cent, x -> x * x)))) AS cos
        |  FROM e, seeds s),
        |a1 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM cos0) WHERE rk = 1),
        |m AS (
        |  SELECT a1.cluster, u.i - 1 AS pos,
        |         CAST(sum(CAST(u.x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS m
        |  FROM a1 JOIN (SELECT vec_id, unnest(list_transform(embedding, (x, i) -> {'x': x, 'i': i})) AS u
        |                FROM e) ex USING (vec_id)
        |  GROUP BY 1, 2),
        |cents AS (
        |  SELECT s.cluster, coalesce(mm.cent, s.cent) AS cent
        |  FROM seeds s LEFT JOIN
        |    (SELECT cluster, list(m ORDER BY pos) AS cent FROM m GROUP BY 1) mm
        |    ON s.cluster = mm.cluster),
        |cos2 AS (
        |  SELECT e.vec_id, c.cluster,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> CAST(e.embedding[i] AS DOUBLE) * c.cent[i]))
        |           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * sqrt(list_sum(list_transform(c.cent, x -> x * x)))) AS cos
        |  FROM e, cents c),
        |a2 AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT vec_id, cluster,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster DESC) AS rk
        |    FROM cos2) WHERE rk = 1),
        |pair AS (
        |  SELECT a.vec_id AS lo, b.vec_id AS hi,
        |         unnest(ea.embedding) AS ua, unnest(eb.embedding) AS ub
        |  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id),
        |dropped AS (
        |  SELECT DISTINCT hi FROM (
        |    SELECT lo, hi,
        |           round(sum(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |             / (sqrt(sum(CAST(ua AS DOUBLE) * CAST(ua AS DOUBLE)))
        |              * sqrt(sum(CAST(ub AS DOUBLE) * CAST(ub AS DOUBLE)))), 6) AS cos
        |    FROM pair GROUP BY 1, 2) WHERE cos >= 0.35)
        |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
        |FROM a2 WHERE vec_id NOT IN (SELECT hi FROM dropped)""".stripMargin,

    // q105: the published fixed weight vector is embedded as the SAME
    // literal array the engine builds (single source of truth:
    // QualityModel.fixedWeights — Double.toString round-trips exactly
    // through DuckDB's literal parser). Token-order list_sum mirrors the
    // engine's ordered fold; round(…,6) absorbs the ≤1-ulp cross-engine
    // exp difference; keep is decided FROM the rounded score.
    "q105_quality_model" -> {
      val w = graft.operators.QualityModel.fixedWeights()
      val arr = w.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |         0.1 + list_sum(list_transform(string_split(text, ' '),
         |             t -> $arr[
         |               CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % ${w.length} AS INT) + 1]))
         |           / len(string_split(text, ' ')) AS z
         |  FROM documents)
         |SELECT doc_id,
         |       round(1.0 / (1.0 + exp(-z)), 6) AS model_score,
         |       round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
         |FROM scored""".stripMargin
    },

    // q106: the Efraimidis–Spirakis draw replayed literally — u from the
    // seeded 60-bit md5 hash (+0.5 absorbed identically by both engines'
    // round-to-nearest at this magnitude), key u^(1/n_chars), top-5 per
    // lang under the (key DESC, hash, id) total order.
    "q106_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY
        |           pow((('0x' || substr(md5('r18' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)
        |                 / 1152921504606846976.0,
        |               1.0 / CAST(n_chars AS DOUBLE)) DESC,
        |           ('0x' || substr(md5('r18' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |           CAST(doc_id AS VARCHAR)) AS rn
        |  FROM documents WHERE n_chars > 0)
        |WHERE rn <= 5""".stripMargin,

    // q117: q106's Efraimidis–Spirakis replay with NO stratum — one
    // global (key DESC, hash, id) total order, top-25. The engine side
    // plans TakeOrderedAndProject instead of a window; same draw.
    "q117_weighted_sample_global" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (ORDER BY
        |           pow((('0x' || substr(md5('r19' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)
        |                 / 1152921504606846976.0,
        |               1.0 / CAST(n_chars AS DOUBLE)) DESC,
        |           ('0x' || substr(md5('r19' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |           CAST(doc_id AS VARCHAR)) AS rn
        |  FROM documents WHERE n_chars > 0)
        |WHERE rn <= 25""".stripMargin,

    // q107: BPE merge round 1 — adjacent character-pair counts over the
    // (distinct word, count) relation, top-20 under the deterministic
    // (count DESC, l, r) merge-selection order.
    "q107_bpe_pairs" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1),
        |p AS (
        |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, sum(c) AS cnt
        |  FROM (SELECT w, c, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM wc WHERE length(w) >= 2)
        |  GROUP BY 1, 2)
        |SELECT l, r, CAST(cnt AS BIGINT) AS cnt
        |FROM p ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin,

    // q108: q105's scored relation through q91's budget arithmetic — the
    // kept set is definitionally the first 120 rows of the total order
    // (model_score DESC, md5Long(doc_id), doc_id); the engine computes
    // the same set threshold-wise without sorting the corpus.
    "q108_model_budget" -> {
      val w = graft.operators.QualityModel.fixedWeights()
      val arr = w.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |         round(1.0 / (1.0 + exp(-(
         |           0.1 + list_sum(list_transform(string_split(text, ' '),
         |               t -> $arr[
         |                 CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % ${w.length} AS INT) + 1]))
         |             / len(string_split(text, ' '))))), 6) AS model_score
         |  FROM documents)
         |SELECT doc_id, model_score FROM (
         |  SELECT doc_id, model_score,
         |         row_number() OVER (ORDER BY model_score DESC,
         |           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
         |           CAST(doc_id AS VARCHAR)) AS rn
         |  FROM scored)
         |WHERE rn <= 120""".stripMargin
    },

    // q109: q54's binding-stratum keep arithmetic under pow-derived
    // weights — both engines quantize w = pow(cnt, 0.5) to 6 decimals
    // (HALF-UP) before the ratio math, so the binding stratum's
    // floor-boundary cut computes on identical doubles.
    "q109_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS cnt FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1),
        |w AS (SELECT lang, cnt,
        |        round(pow(CAST(cnt AS DOUBLE), 0.5), 6) AS w FROM counts),
        |s AS (SELECT min(cnt / w) AS scale FROM w),
        |cuts AS (SELECT lang, floor(w * scale / cnt * 100) AS cut FROM w, s)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cuts USING (lang)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < cut""".stripMargin,

    // q110: greedy BPE encode replayed as a replace CHAIN over a
    // self-delimited symbol encoding — each symbol wrapped `(sym)`, each
    // merge one non-overlapping left-to-right replace `(l)(r)` → `(lr)`.
    //
    // Unicode parity (q110/q112/q114): both sides segment code POINTS —
    // this replay's regex wraps code points, and the engine's seed does
    // too (Spark's UTF8String-based split/regexp, measured round 19;
    // `java.lang.String.split("")` would split surrogate pairs, but the
    // engine never goes through it). BpeTrainSpec pins the astral-text
    // parity against this replay's own output, so no corpus envelope is
    // needed.
    // Full self-delimiting is what makes the replay exact: a consumed
    // match never eats a neighbor's delimiter (so "(a)(a)(a)(a)" merges
    // to "(aa)(aa)" in ONE pass, like the engine's fold), and a merge's
    // left symbol cannot match another symbol's suffix ("(xa)(b)" never
    // matches "(a)(b)"). The merge table is the SAME literal artifact as
    // the engine's BpeTrain.fixedMerges.
    "q110_bpe_encode" -> {
      val enc = graft.operators.BpeTrain.fixedMerges()
        .foldLeft("""regexp_replace(w, '([^ ])', '(\1)', 'g')""") {
          case (acc, (l, r)) => s"replace($acc, '($l)($r)', '($l$r)')"
        }
      s"""WITH e AS (
         |  SELECT doc_id, text,
         |    coalesce(array_to_string(
         |      list_transform(
         |        list_transform(
         |          list_filter(string_split(text, ' '), w -> length(w) > 0),
         |          w -> $enc),
         |        s -> replace(substr(s, 2, length(s) - 2), ')(', ' ')),
         |      ' '), '') AS bpe_text
         |  FROM documents)
         |SELECT doc_id, bpe_text,
         |  CASE WHEN text IS NULL THEN NULL
         |       WHEN bpe_text = '' THEN 0
         |       ELSE CAST(length(bpe_text) - length(replace(bpe_text, ' ', '')) + 1 AS BIGINT)
         |  END AS bpe_len
         |FROM e""".stripMargin
    },

    // q111: the UniMax waterfill replayed literally — ascending
    // (capacity, lang) order, the spent prefix kept as an EXACT integer
    // capacity sum (multiplied by the epoch cap once per use, so the
    // window sum's association order cannot perturb the doubles), the
    // capped prefix = everything before the FIRST violation, weights
    // rounded 6 HALF-UP like the engine, then q100's epoch-expansion
    // arithmetic verbatim.
    "q111_unimax_mixture" ->
      """WITH c AS (SELECT lang, sum(n_chars) AS ch FROM documents
        |           WHERE lang IS NOT NULL GROUP BY 1
        |           HAVING sum(n_chars) > 0),
        |tot AS (SELECT CAST(1.5 AS DOUBLE) * CAST(sum(ch) AS DOUBLE) AS b,
        |               count(*) AS l FROM c),
        |o AS (SELECT lang, ch,
        |        row_number() OVER (ORDER BY ch, lang) AS i,
        |        sum(ch) OVER (ORDER BY ch, lang ROWS UNBOUNDED PRECEDING) AS s
        |      FROM c),
        |v AS (SELECT coalesce(
        |        (SELECT min(i) FROM o, tot
        |         WHERE CAST(2.0 AS DOUBLE) * CAST(ch AS DOUBLE)
        |               > (tot.b - CAST(2.0 AS DOUBLE) * CAST(s - ch AS DOUBLE))
        |                 / (tot.l - i + 1)),
        |        (SELECT l FROM tot) + 1) - 1 AS k),
        |sk AS (SELECT coalesce((SELECT s FROM o, v WHERE o.i = v.k), 0) AS sc),
        |w AS (SELECT lang,
        |        round(CASE WHEN o.i <= v.k
        |              THEN CAST(2.0 AS DOUBLE) * CAST(ch AS DOUBLE)
        |              ELSE (tot.b - CAST(2.0 AS DOUBLE) * CAST(sk.sc AS DOUBLE))
        |                   / (tot.l - v.k)
        |              END / CAST(ch AS DOUBLE), 6) AS w
        |      FROM o, v, sk, tot),
        |d AS (SELECT doc_id, d.lang,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt,
        |        w.w AS w
        |      FROM documents d JOIN w USING (lang)),
        |cp AS (SELECT doc_id, lang,
        |         CAST(floor(w) AS INT)
        |           + CASE WHEN bkt < floor((w - floor(w)) * 100 + 0.5) THEN 1 ELSE 0 END AS copies
        |       FROM d)
        |SELECT doc_id, lang, CAST(unnest(generate_series(0, copies - 1)) AS INT) AS epoch
        |FROM cp WHERE copies > 0""".stripMargin,

    // q112: q108's model-score CTE + q110's tokenizer count (the
    // delimiter-arithmetic length only — the stream itself is not
    // needed) through q95's running-sum replay: the kept set is the
    // maximal prefix of (model_score DESC, md5Long(key), key) whose
    // running MODEL-token sum fits the budget; the engine computes the
    // same set threshold-wise without sorting corpus rows. The per-token
    // symbol count is PAREN-SAFE like q110's own arithmetic: it counts
    // `)(` symbol BOUNDARIES (+1), never bare `(` characters — a literal
    // paren in document text wraps to `(()` / `())`, whose inner paren a
    // bare-`(` count would read as a phantom token, and neither wrapped
    // form contains a spurious `)(` (merge symbols are trained alnum, so
    // no merge can manufacture one either).
    "q112_bpe_token_budget" -> {
      val w = graft.operators.QualityModel.fixedWeights()
      val arr = w.map(v => s"CAST($v AS DOUBLE)").mkString("[", ", ", "]")
      val enc = graft.operators.BpeTrain.fixedMerges()
        .foldLeft("""regexp_replace(t, '([^ ])', '(\1)', 'g')""") {
          case (acc, (l, r)) => s"replace($acc, '($l)($r)', '($l$r)')"
        }
      s"""WITH e AS (
         |  SELECT doc_id,
         |         round(1.0 / (1.0 + exp(-(
         |           0.1 + list_sum(list_transform(string_split(text, ' '),
         |               t -> $arr[
         |                 CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % ${w.length} AS INT) + 1]))
         |             / len(string_split(text, ' '))))), 6) AS model_score,
         |         list_sum(list_transform(
         |           list_filter(string_split(text, ' '), t -> length(t) > 0),
         |           t -> CAST((length($enc) - length(replace($enc, ')(', ''))) / 2 AS BIGINT) + 1)) AS bpe_len
         |  FROM documents),
         |r AS (SELECT *, sum(bpe_len) OVER (ORDER BY model_score DESC,
         |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
         |        CAST(doc_id AS VARCHAR)
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM e WHERE bpe_len > 0 AND model_score IS NOT NULL)
         |SELECT doc_id, model_score, CAST(bpe_len AS BIGINT) AS bpe_len
         |FROM r WHERE cum <= 40000""".stripMargin
    },

    // q114: q110's oracle VERBATIM — the engine side runs the production
    // rank-replay kernel (BpeTrain.bpeEncodeRank) against the same frozen
    // artifact; the replay below is kernel-independent (it states the
    // SEMANTICS — sequential greedy merges — which both kernels must
    // meet), so reusing it gates the production kernel end-to-end.
    "q114_bpe_encode_rank" -> {
      val enc = graft.operators.BpeTrain.fixedMerges()
        .foldLeft("""regexp_replace(w, '([^ ])', '(\1)', 'g')""") {
          case (acc, (l, r)) => s"replace($acc, '($l)($r)', '($l$r)')"
        }
      s"""WITH e AS (
         |  SELECT doc_id, text,
         |    coalesce(array_to_string(
         |      list_transform(
         |        list_transform(
         |          list_filter(string_split(text, ' '), w -> length(w) > 0),
         |          w -> $enc),
         |        s -> replace(substr(s, 2, length(s) - 2), ')(', ' ')),
         |      ' '), '') AS bpe_text
         |  FROM documents)
         |SELECT doc_id, bpe_text,
         |  CASE WHEN text IS NULL THEN NULL
         |       WHEN bpe_text = '' THEN 0
         |       ELSE CAST(length(bpe_text) - length(replace(bpe_text, ' ', '')) + 1 AS BIGINT)
         |  END AS bpe_len
         |FROM e""".stripMargin
    },

    // q115: q107's merge-round-1 pair counts under the BYTE-level seed —
    // the segmentation is each word's UTF-8 bytes as uppercase hex pairs
    // (`hex(encode(w))` two chars at a time), replayed position-for-
    // position, then the same (count DESC, l, r) top-20.
    "q115_bpe_pairs_bytes" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1),
        |h AS (SELECT hex(encode(w)) AS hx, c FROM wc),
        |p AS (
        |  SELECT substr(hx, i * 2 - 1, 2) AS l, substr(hx, i * 2 + 1, 2) AS r,
        |         sum(c) AS cnt
        |  FROM (SELECT hx, c, unnest(generate_series(1, length(hx) // 2 - 1)) AS i
        |        FROM h WHERE length(hx) >= 4)
        |  GROUP BY 1, 2)
        |SELECT l, r, CAST(cnt AS BIGINT) AS cnt
        |FROM p ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin,

    // q113: q63's drift KL (round-6) through the DoReMi softmax — the
    // exp factor quantizes straight to exact integer micro-units
    // (half-up), the normalizing sum is an exact BIGINT sum
    // (association-order-free), and the weight is one correctly-rounded
    // division, round-6.
    "q113_doremi_weights" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        |gc AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |gt AS (SELECT source, sum(c) AS gn FROM gc GROUP BY 1),
        |ct AS (SELECT t, sum(c) AS cc FROM gc GROUP BY 1),
        |tot AS (SELECT sum(c) AS tot FROM gc),
        |kl AS (SELECT source,
        |         round(sum((CAST(c AS DOUBLE) / gn)
        |                   * ln((CAST(c AS DOUBLE) / gn) / (CAST(cc AS DOUBLE) / tot))), 6) AS kl
        |       FROM gc JOIN gt USING (source) JOIN ct USING (t), tot
        |       GROUP BY source),
        |mu AS (SELECT source, kl,
        |         CAST(round(exp(CAST(50.0 AS DOUBLE) * kl) * 1000000.0, 0) AS BIGINT) AS m
        |       FROM kl),
        |s AS (SELECT sum(m) AS ms FROM mu)
        |SELECT source, kl,
        |       round(CAST(m AS DOUBLE) / CAST(ms AS DOUBLE), 6) AS weight
        |FROM mu, s""".stripMargin,

    // q118: interpolated Kneser–Ney bigram NLL, D = 0.75 — all four KN
    // statistics (context totals, forward/backward continuation type
    // counts, grand type count) reduce from the aggregated bigram relation,
    // mirroring the engine's formula tree term for term.
    "q118_kneser_ney_nll" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
        |  FROM tok WHERE len(tk) >= 2),
        |cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c) AS ctx, count(*) AS n1f FROM cbg GROUP BY 1),
        |back AS (SELECT w2, count(*) AS n1b FROM cbg GROUP BY 1),
        |ty AS (SELECT CAST(count(*) AS DOUBLE) AS types FROM cbg)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(-ln((CAST(c AS DOUBLE) - 0.75) / ctx
        |                     + 0.75 * CAST(n1f AS DOUBLE) / ctx
        |                       * (CAST(n1b AS DOUBLE) / types))), 6) AS nll
        |FROM bg JOIN cbg USING (w1, w2) JOIN ctx USING (w1) JOIN back USING (w2), ty
        |GROUP BY doc_id""".stripMargin,

    // q119: CCNet head/middle/tail triage — per-doc unigram NLL (q59's,
    // rounded FIRST so both engines quantize the same double), a fixed
    // 1e-3-grid histogram, tertile cut cells by integer arithmetic
    // (3·cum ≥ total), then a per-doc cell comparison.
    "q119_perplexity_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
        |tot AS (SELECT sum(freq) AS total FROM freq),
        |nll AS (SELECT doc_id,
        |          round(avg(-ln(CAST(freq AS DOUBLE) / total)), 6) AS nll
        |        FROM tok JOIN freq USING (tok), tot GROUP BY doc_id),
        |cells AS (SELECT doc_id, nll, CAST(floor(nll * 1000) AS BIGINT) AS cell FROM nll),
        |hist AS (SELECT cell, count(*) AS n FROM cells GROUP BY 1),
        |cum AS (SELECT cell, sum(n) OVER (ORDER BY cell) AS cum,
        |               sum(n) OVER () AS total FROM hist),
        |cuts AS (SELECT min(CASE WHEN cum * 3 >= total THEN cell END) AS t1,
        |                min(CASE WHEN cum * 3 >= total * 2 THEN cell END) AS t2
        |         FROM cum)
        |SELECT doc_id, nll,
        |       CASE WHEN cell <= t1 THEN 'head'
        |            WHEN cell <= t2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM cells, cuts""".stripMargin,

    // q120: TF–IDF cosine pairs over 5-token shingle vectors (duplicates
    // kept — tf, not set membership), lang-blocked; ubiquitous shingles
    // (df = N) drop before the inverted-index join; threshold on the
    // ROUNDED cosine, mirroring the engine. n = 5 keeps the gram universe
    // (31⁵) sparse — the selectivity the engine's inverted index needs.
    "q120_tfidf_cosine_pairs" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN len(tk) >= 5
        |              THEN list_transform(generate_series(1, len(tk) - 4),
        |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                          || ' ' || tk[i+3] || ' ' || tk[i+4])
        |              ELSE [array_to_string(tk, ' ')] END AS grams
        |  FROM t),
        |tfc AS (SELECT doc_id, lang, gram, count(*) AS tf
        |        FROM (SELECT doc_id, lang,
        |                ('0x' || substr(md5(unnest(grams)), 1, 15))::BIGINT AS gram
        |              FROM g)
        |        GROUP BY 1, 2, 3),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tfc),
        |dfq AS (SELECT gram, count(*) AS df FROM tfc GROUP BY 1),
        |w AS (SELECT doc_id, lang, gram, CAST(tf AS DOUBLE) * ln(n / df) AS w
        |      FROM tfc JOIN dfq USING (gram), nd WHERE df < n),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        |p AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id, sum(a.w * b.w) AS dot
        |      FROM w a JOIN w b
        |        ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT left_id, right_id, cosine FROM (
        |  SELECT left_id, right_id,
        |         round(dot / (na.nrm * nb.nrm), 6) AS cosine
        |  FROM p JOIN nrm na ON na.doc_id = left_id
        |         JOIN nrm nb ON nb.doc_id = right_id)
        |WHERE cosine >= 0.5""".stripMargin,

    // q121: decomposed-accent derivation (every 'a' → 'a' + U+0301), NFC
    // via utf8proc's nfc_normalize (the oracle twin of the engine's
    // java.text.Normalizer — both implement UAX #15), strip_accents
    // round-trip. Lengths are code points in both engines.
    "q121_normalize_text" ->
      """WITH d AS (
        |  SELECT doc_id, text, replace(text, 'a', 'a' || chr(769)) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |       CAST(length(raw) AS BIGINT) AS raw_len,
        |       CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_len,
        |       (strip_accents(raw) = text) AS roundtrip
        |FROM d""".stripMargin,

    // q123: q107's pair relation under the WordPiece criterion — symbol
    // totals join in as denominators; the score is one double division of
    // a double product of exact counts (bit-identical cross-engine, the
    // q64 lift rationale), ranked (score DESC, l, r).
    "q123_wordpiece_scores" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1),
        |p AS (
        |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, sum(c) AS cnt
        |  FROM (SELECT w, c, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM wc WHERE length(w) >= 2)
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT substr(w, i, 1) AS s, sum(c) AS sc
        |  FROM (SELECT w, c, unnest(generate_series(1, length(w))) AS i FROM wc)
        |  GROUP BY 1)
        |SELECT l, r, CAST(cnt AS BIGINT) AS cnt,
        |       CAST(cnt AS DOUBLE) / (CAST(cl.sc AS DOUBLE) * CAST(cr.sc AS DOUBLE)) AS score
        |FROM p JOIN sc cl ON cl.s = p.l JOIN sc cr ON cr.s = p.r
        |ORDER BY score DESC, l, r LIMIT 20""".stripMargin,

    // q124: q27's brute cosine walk restricted to the [0.25, 0.8) band on
    // the ROUNDED cosine — rank only in-band candidates, top-5 per query.
    "q124_hard_negatives" ->
      """WITH pair AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e.embedding) AS ue
        |  FROM embeddings q, embeddings e
        |  WHERE q.vec_id < 20 AND q.vec_id <> e.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, cosine, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
        |  FROM scored WHERE cosine >= 0.25 AND cosine < 0.8) WHERE rk <= 5""".stripMargin,

    // q125: q119's triage + a seeded md5 within-phase shuffle, first 100
    // of the (phase, key, doc_id) total order — the curriculum schedule.
    "q125_curriculum_order" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
        |tot AS (SELECT sum(freq) AS total FROM freq),
        |nll AS (SELECT doc_id,
        |          round(avg(-ln(CAST(freq AS DOUBLE) / total)), 6) AS nll
        |        FROM tok JOIN freq USING (tok), tot GROUP BY doc_id),
        |cells AS (SELECT doc_id, CAST(floor(nll * 1000) AS BIGINT) AS cell FROM nll),
        |hist AS (SELECT cell, count(*) AS n FROM cells GROUP BY 1),
        |cum AS (SELECT cell, sum(n) OVER (ORDER BY cell) AS cum,
        |               sum(n) OVER () AS total FROM hist),
        |cuts AS (SELECT min(CASE WHEN cum * 3 >= total THEN cell END) AS t1,
        |                min(CASE WHEN cum * 3 >= total * 2 THEN cell END) AS t2
        |         FROM cum),
        |lab AS (SELECT doc_id,
        |          CASE WHEN cell <= t1 THEN 'head'
        |               WHEN cell <= t2 THEN 'middle' ELSE 'tail' END AS bucket,
        |          CASE WHEN cell <= t1 THEN 0
        |               WHEN cell <= t2 THEN 1 ELSE 2 END AS phase,
        |          ('0x' || substr(md5('cur19:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS cur_key
        |        FROM cells, cuts)
        |SELECT doc_id, bucket, CAST(phase AS BIGINT) AS phase, cur_key
        |FROM lab ORDER BY phase, cur_key, doc_id LIMIT 100""".stripMargin,

    // q126: RRF fusion — q58's BM25 top-20 CTE verbatim + q27's cosine
    // walk for query vector 0, each rank quantized to exact micro-units
    // (round(1e12/(60+rank)) — half-up on positive values, identical in
    // both engines), summed as exact BIGINTs, top-20 by (score, id).
    "q126_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN tok = 'dup' THEN 1 ELSE 0 END) AS tf0,
        |         sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS tf1,
        |         sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS tf2
        |  FROM tok GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM perdoc),
        |bm AS (
        |  SELECT doc_id, dl,
        |         round(
        |             ln(CAST(1.0 AS DOUBLE) + (n - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE)))
        |               * (tf0 * CAST(2.2 AS DOUBLE)) / (tf0 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
        |           + ln(CAST(1.0 AS DOUBLE) + (n - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE)))
        |               * (tf1 * CAST(2.2 AS DOUBLE)) / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))
        |           + ln(CAST(1.0 AS DOUBLE) + (n - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE)))
        |               * (tf2 * CAST(2.2 AS DOUBLE)) / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)),
        |           6) AS score
        |  FROM perdoc, stats),
        |lex AS (
        |  SELECT doc_id, rk FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |    FROM bm WHERE score > 0) WHERE rk <= 20),
        |pair AS (
        |  SELECT e.vec_id AS doc_id, unnest(q.embedding) AS uq, unnest(e.embedding) AS ue
        |  FROM embeddings q, embeddings e
        |  WHERE q.vec_id = 0 AND q.vec_id <> e.vec_id),
        |cosd AS (
        |  SELECT doc_id,
        |         round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |           / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |            * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) AS cosine
        |  FROM pair GROUP BY 1),
        |den AS (
        |  SELECT doc_id, rk FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rk
        |    FROM cosd) WHERE rk <= 20),
        |terms AS (
        |  SELECT doc_id, CAST(round(1e12 / (60 + rk), 0) AS BIGINT) AS t FROM lex
        |  UNION ALL
        |  SELECT doc_id, CAST(round(1e12 / (60 + rk), 0) AS BIGINT) AS t FROM den)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_systems,
        |       CAST(sum(t) AS BIGINT) AS rrf_micro
        |FROM terms GROUP BY doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,

    // q127: recall@5 of SQ8 asymmetric search vs the exact brute truth —
    // the reconstruction replays q56's codec per element (floor(x/s+0.5)·s,
    // half-up via floor in BOTH engines: DuckDB round() is half-away-from-
    // zero, which differs on negative halves), then two q27-style walks
    // and the hit join.
    "q127_sq8_recall" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |r AS (
        |  SELECT vec_id,
        |         CASE WHEN s0 = 0 THEN list_transform(embedding, x -> 0.0)
        |              ELSE list_transform(embedding,
        |                x -> floor(CAST(x AS DOUBLE) / s0 + 0.5) * s0) END AS emb
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s0
        |        FROM e)),
        |tp AS (
        |  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e2.embedding) AS ue
        |  FROM e q, e e2 WHERE q.vec_id < 10 AND q.vec_id <> e2.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM tp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |cp AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(c.emb) AS ue
        |  FROM e q, r c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * ue)
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(ue * ue))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM cp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |hits AS (
        |  SELECT t.query_id, count(*) AS h
        |  FROM truth t JOIN cand c
        |    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        |  GROUP BY 1)
        |SELECT q.query_id, CAST(coalesce(h, 0) AS BIGINT) AS hits,
        |       round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM (SELECT DISTINCT query_id FROM truth) q LEFT JOIN hits USING (query_id)""".stripMargin,

    // q128: q41's connected-components CTE + q33's quality formula, then
    // the per-cluster arg-max keep (quality DESC, id) — the RefinedWeb
    // keep-best-member policy.
    "q128_quality_dedup_keep" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM documents),
        |pairs AS (
        |  SELECT left_id, right_id FROM (
        |    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
        |           CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
        |             / (len(a.s) + len(b.s) - len(list_filter(a.s, x -> list_contains(b.s, x)))) AS jaccard
        |    FROM tok a JOIN tok b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.95),
        |edges AS (SELECT left_id AS src, right_id AS dst FROM pairs
        |          UNION SELECT right_id, left_id FROM pairs),
        |reach(id, anc) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
        |canon AS (SELECT id AS doc_id, min(anc) AS canonical_id FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, round(
        |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
        |  + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |       / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)) * 0.3
        |  + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
        |       / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3, 6) AS quality
        |FROM documents)
        |SELECT doc_id, canonical_id, quality,
        |       (row_number() OVER (PARTITION BY canonical_id
        |          ORDER BY quality DESC, doc_id) = 1) AS kept
        |FROM canon JOIN q USING (doc_id)""".stripMargin,

    // q122: the Morton interleave replayed as plain integer arithmetic —
    // bit lanes are disjoint, so + ≡ | term-for-term with the engine's
    // bitwiseOR fold; same (zkey, l_orderkey, line_no) walk, top 100.
    "q122_zorder_layout" -> {
      val terms = (0 until 8).flatMap(j => Seq(
        s"((((l_partkey % 256) >> $j) & 1) << ${2 * j + 1})",
        s"((((l_suppkey % 256) >> $j) & 1) << ${2 * j})")).mkString(" + ")
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
         |       l_partkey, l_suppkey,
         |       CAST($terms AS BIGINT) AS zkey
         |FROM lineitem
         |ORDER BY zkey, l_orderkey, line_no
         |LIMIT 100""".stripMargin
    },

    // q129: systematic resampling replayed flat — one HUGEINT window
    // cumsum over the engine's exact (seeded-hash, id) line order where
    // the engine runs a BUCKETED prefix sum (order-aligned hash-prefix
    // buckets + driver offsets); identical because every quantity is
    // integer and // is exact. draws = g(2n·cum) − g(2n·(cum−w)),
    // g(X) = (X + W) // 2W, n = 2000.
    "q129_systematic_resample" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |         ('0x' || substr(md5('r19d' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
        |         CAST(n_chars AS HUGEINT) AS wt
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT doc_id, lang, n_chars, wt,
        |         sum(wt) OVER (ORDER BY h, CAST(doc_id AS VARCHAR)
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(wt) OVER () AS tot
        |  FROM w)
        |SELECT doc_id, lang, n_chars, draws FROM (
        |  SELECT doc_id, lang, n_chars,
        |         CAST((cum * 4000 + tot) // (tot + tot)
        |            - ((cum - wt) * 4000 + tot) // (tot + tot) AS BIGINT) AS draws
        |  FROM c)
        |WHERE draws >= 1""".stripMargin,

    // q130: q55's chunk CTEs verbatim, then the OTHER half of the
    // C4/CCNet line step — distinct-doc frequency per chunk text, df ≥ 3
    // dropped everywhere, documents rebuilt position-ordered from the
    // survivors (all-boilerplate docs come back empty, not absent).
    "q130_boilerplate_removal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok, len(tok) AS n,
        |        unnest(range(0, CASE WHEN n <= 16 THEN 1
        |                            ELSE 1 + CAST(ceil((n - 16) / 16.0) AS INT) END)) AS c
        |      FROM t),
        |segs AS (SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
        |        array_to_string(list_slice(tok, c * 16 + 1, c * 16 + 16), ' ') AS chunk_text
        |      FROM c),
        |f AS (SELECT chunk_text, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
        |k AS (SELECT s.doc_id, s.chunk_id, s.chunk_text, f.df < 3 AS keep
        |      FROM segs s JOIN f USING (chunk_text))
        |SELECT doc_id,
        |       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
        |                  FILTER (WHERE keep), '') AS clean_text,
        |       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS kept_passages,
        |       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS dropped_passages
        |FROM k GROUP BY doc_id""".stripMargin,

    // q131: length-grouped batching replayed literally — seeded-hash
    // shard, per-shard (len DESC, hash, id) row_number, consecutive
    // 32-runs, and the batch-grain padding arithmetic. The efficiency
    // division is double/double rounded to 6 in both engines.
    "q131_length_batching" ->
      """WITH s AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS k, CAST(n_chars AS BIGINT) AS len,
        |         ('0x' || substr(md5('r19e' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars >= 0),
        |r AS (
        |  SELECT len, CAST(h % 8 AS INT) AS shard,
        |         row_number() OVER (PARTITION BY h % 8
        |                            ORDER BY len DESC, h, k) AS rn
        |  FROM s),
        |b AS (SELECT shard, CAST((rn - 1) // 32 AS BIGINT) AS batch_id, len FROM r)
        |SELECT shard, batch_id,
        |       CAST(count(*) AS BIGINT) AS n_seqs,
        |       max(len) AS max_len,
        |       CAST(sum(len) AS BIGINT) AS real_tokens,
        |       CAST(count(*) * max(len) AS BIGINT) AS padded_tokens,
        |       CASE WHEN count(*) * max(len) = 0 THEN CAST(1.0 AS DOUBLE)
        |            ELSE round(CAST(sum(len) AS DOUBLE)
        |                         / CAST(count(*) * max(len) AS DOUBLE), 6)
        |       END AS efficiency
        |FROM b GROUP BY 1, 2""".stripMargin,

    // q132: q77's scored CTE feeding q129's replay — the likelihood-ratio
    // weight floor(exp(score)·1e6 + 0.5) is exact in both engines because
    // the score is 6-decimal-rounded upstream (libm exp ulps sit ~10
    // orders below the micro grain), then the same HUGEINT cumsum and
    // integral-division draw arithmetic, n = 1000.
    "q132_dsir_resample" ->
      """WITH tk AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |f AS (SELECT tok, count(*) AS cf,
        |             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tf
        |      FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS c_tot,
        |               CAST(sum(tf) + count(*) AS DOUBLE) AS tv
        |        FROM f),
        |scored AS (
        |  SELECT doc_id,
        |         round(avg(ln((tf + 1.0) / tv) - ln(CAST(cf AS DOUBLE) / c_tot)), 6)
        |           AS dsir_score
        |  FROM tk JOIN f USING (tok), tot
        |  GROUP BY 1),
        |w AS (
        |  SELECT doc_id, dsir_score,
        |         ('0x' || substr(md5('r19f' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
        |         CAST(floor(exp(dsir_score) * 1e6 + 0.5) AS HUGEINT) AS wt
        |  FROM scored
        |  WHERE floor(exp(dsir_score) * 1e6 + 0.5) > 0),
        |c AS (
        |  SELECT doc_id, dsir_score, wt,
        |         sum(wt) OVER (ORDER BY h, CAST(doc_id AS VARCHAR)
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(wt) OVER () AS tot
        |  FROM w)
        |SELECT doc_id, dsir_score, draws FROM (
        |  SELECT doc_id, dsir_score,
        |         CAST((cum * 2000 + tot) // (tot + tot)
        |            - ((cum - wt) * 2000 + tot) // (tot + tot) AS BIGINT) AS draws
        |  FROM c)
        |WHERE draws >= 1""".stripMargin,

    // q133: q127's recall walk with the candidate tier = dimension
    // truncation — both sides of the candidate search sliced to the
    // first 16 of 64 components (cosine is scale-invariant, no
    // renormalization), truth at full dimension, recall@5 per query.
    "q133_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (SELECT vec_id, list_slice(embedding, 1, 16) AS emb FROM e),
        |tp AS (
        |  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e2.embedding) AS ue
        |  FROM e q, e e2 WHERE q.vec_id < 10 AND q.vec_id <> e2.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM tp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |cp AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         unnest(q.emb) AS uq, unnest(c.emb) AS ue
        |  FROM p q, p c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM cp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |hits AS (
        |  SELECT t.query_id, count(*) AS h
        |  FROM truth t JOIN cand c
        |    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        |  GROUP BY 1)
        |SELECT q.query_id, CAST(coalesce(h, 0) AS BIGINT) AS hits,
        |       round(CAST(coalesce(h, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM (SELECT DISTINCT query_id FROM truth) q LEFT JOIN hits USING (query_id)""".stripMargin,

    // q134: q133's walks re-scored as NDCG@5 — the candidate keeps its
    // rank, each hit contributes 1/log2(rank+1), IDCG is the
    // perfect-ordering sum over min(5, |truth|) slots (a 5-row series
    // relation), ndcg = round(dcg/idcg, 6) like every family double.
    "q134_prefix_ndcg" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (SELECT vec_id, list_slice(embedding, 1, 16) AS emb FROM e),
        |tp AS (
        |  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
        |         unnest(q.embedding) AS uq, unnest(e2.embedding) AS ue
        |  FROM e q, e e2 WHERE q.vec_id < 10 AND q.vec_id <> e2.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM tp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |cp AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         unnest(q.emb) AS uq, unnest(c.emb) AS ue
        |  FROM p q, p c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id, rk FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY
        |             round(sum(CAST(uq AS DOUBLE) * CAST(ue AS DOUBLE))
        |               / (sqrt(sum(CAST(uq AS DOUBLE) * CAST(uq AS DOUBLE)))
        |                * sqrt(sum(CAST(ue AS DOUBLE) * CAST(ue AS DOUBLE)))), 6) DESC,
        |             neighbor_id) AS rk
        |    FROM cp GROUP BY query_id, neighbor_id) WHERE rk <= 5),
        |dcg AS (
        |  SELECT t.query_id, sum(1.0 / log2(c.rk + 1.0)) AS dcg
        |  FROM truth t JOIN cand c
        |    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        |  GROUP BY 1),
        |m AS (SELECT query_id, least(count(*), 5) AS m FROM truth GROUP BY 1),
        |idcg AS (
        |  SELECT mm.m, sum(1.0 / log2(s.i + 1.0)) AS idcg
        |  FROM (SELECT unnest(generate_series(1, 5)) AS m) mm
        |  JOIN (SELECT unnest(generate_series(1, 5)) AS i) s ON s.i <= mm.m
        |  GROUP BY 1)
        |SELECT m.query_id,
        |       round(coalesce(dcg, 0.0), 6) AS dcg,
        |       round(coalesce(dcg, 0.0) / idcg, 6) AS ndcg
        |FROM m JOIN idcg USING (m) LEFT JOIN dcg USING (query_id)""".stripMargin,
  )
}
