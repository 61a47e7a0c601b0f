package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Designed for a real cluster (the settings below are the ones that matter at
  * 100 TB: AQE re-planning, skew-join splitting, partition coalescing) but
  * testable on local[N]. Shuffle partitions default to the local core count —
  * on a cluster, set `spark.sql.shuffle.partitions` (or rely on AQE coalescing)
  * via spark-submit conf.
  */
object GraftSession {

  def builder(master: String = s"local[${defaultCpus}]",
              shufflePartitions: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // native engine functions (vector_dot / vector_cosine) — see graft.plans
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // pandas/Glue-parity: implicit casts + coerce-to-null instead of errors
      // (SURVEY §8.4: the reference runs non-ANSI PySpark on Glue 4.0).
      .config("spark.sql.ansi.enabled", "false")
      // the driver testdata stores events.ts as parquet INT64 TIMESTAMP(NANOS),
      // which Spark cannot represent natively; read as long and convert.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // id-shortlist fetches (the ANN refine tier's vector fetch) push an
      // isin over row-group-sorted ids into the parquet scan; past this
      // threshold Spark degrades the pushed In to a min/max range, which
      // skips nothing over hash-scattered ids — raise it to cover a
      // serving-shaped shortlist (row-group stat eval is per row GROUP,
      // so a 1024-term In costs microseconds per file)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(Runtime.getRuntime.availableProcessors(), 32))

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Lifecycle owner for the engine's internal persists. The dedup/ANN
    * operators persist intermediate relations (hashed token sets, SimHash
    * signatures, PPJoin prefixes) because their self-joins consume each one
    * twice and Catalyst does not reuse those exchanges (measured: q24/q26
    * run ~2×/1.5× slower without the persist). Those blocks are
    * session-scoped by design — a long-lived session calls this between
    * logical jobs to return to a clean block manager, exactly as
    * `graft.Bench` does between timed runs. */
  def releaseCaches(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking))
  }

  /** Structural form of the [[releaseCaches]] discipline: run `body` (which
    * may compose any number of dedup/ANN operators), then release every
    * persist it left behind — even on failure. The caller decides the
    * bracket boundary (one logical job), so leak-freedom stops depending on
    * remembering a manual release call.
    *
    * Persisted blocks created BEFORE the bracket are released too — the
    * engine's persists are session-scoped by design, so nest brackets only
    * around whole logical jobs, not inside one. `body`'s result must be
    * materialized (written/collected) before the bracket closes; a lazy
    * DataFrame that escapes would recompute its unpersisted lineage. */
  def withCaches[A](spark: SparkSession, blocking: Boolean = false)(body: => A): A =
    try body finally releaseCaches(spark, blocking)
}
