package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for 100 TB scans — Z-order (Morton 1966)
  * interleaved sort keys, the technique behind Delta Lake / Iceberg
  * `OPTIMIZE ZORDER BY`.
  *
  * Why it matters at scale: parquet prunes row groups and files by min/max
  * column statistics. A corpus sorted linearly on one key has tight stats on
  * THAT key only — a predicate on any other dimension reads everything. The
  * Z-order key interleaves the bits of several dimensions, so files cover a
  * small hyper-rectangle of the key space and min/max stats stay selective
  * on EVERY participating dimension at once: point/range predicates on any
  * of them skip most files. This is a write-time layout choice, not a query
  * operator — the scan-side win is free (Spark's parquet reader already
  * does stats pruning).
  *
  * The reference pipeline partitions its warehouse load by date only
  * (`glue_script.py` partition keys); this generalizes that single-dimension
  * layout to the multi-predicate scan pattern an analytics corpus serves.
  */
object Layout {

  /** Morton/Z-order key: interleaves the low `bits` bits of each column,
    * first column highest. Callers pre-quantize each dimension into
    * [0, 2^bits) — e.g. `pmod(col, 256)` for hash-like ids or a
    * (v−min)·scale range bucket for continuous values; higher bits are
    * masked off per-bit, so out-of-range inputs degrade gracefully instead
    * of corrupting neighbors' bit lanes.
    *
    * Pure composition of codegen'd bitwise builtins (shift/and/or) — a
    * per-row map with a constant-size expression tree (bits·dims terms),
    * zero shuffle, whole-stage-codegen friendly, and bit-for-bit
    * replayable in any engine (plain integer arithmetic). */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"z-order needs ≥ 2 dimensions, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a signed long: got $bits*${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * n + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet laid out in Z-order over `dims`: range-partition
    * by the Morton key (one shuffle — file count chosen by the caller to
    * hit the deployment's target file size), sort within each file, write.
    * Each output file then covers a compact Z-curve segment — a small
    * hyper-rectangle in dim space — so its min/max stats are tight on every
    * dimension. `LayoutSpec` asserts the skipping property directly: the
    * per-file extent product under this layout is orders of magnitude
    * smaller than under the natural (arrival-order) layout. */
  def writeZordered(df: DataFrame, dims: Seq[Column], bits: Int,
                    path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be ≥ 1, got $numFiles")
    val z = zorderKey(dims, bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Crash-safe in-place re-layout of an EXISTING parquet table into
    * Z-order — the Delta/Iceberg `OPTIMIZE ZORDER BY` maintenance job: a
    * table written by arrival order (or fragmented by many small appends)
    * is rewritten once so every later scan skips on all `dims`.
    *
    * The swap protocol is the stored index's compaction contract
    * ([[Similarity.ivfPqIndexCompact]]) at table grain — at every instant
    * the table's rows exist in the live tree or the staging tree, never
    * nowhere:
    *
    *   1. rewrite into `<path>_optimizing/fresh` (the staging dir);
    *   2. verify the fresh row count against the live count — a rewrite
    *      that lost rows aborts BEFORE any destructive step;
    *   3. retire the live tree INTO staging (`retired`), rename fresh
    *      over live, drop staging.
    *
    * A crashed run is healed on the next call before anything else: a
    * `retired` copy still in staging is the authoritative pre-optimize
    * table and ALWAYS wins (a live twin may be a partial rename on
    * object stores; rolling back a swap that completed merely redoes an
    * idempotent rewrite). A staging with no `retired` is a crash before
    * any destructive step — discarded. Single-maintainer contract: unlike
    * the index (which has concurrent appenders and carries a mutex/lease
    * protocol for them), a plain table has no writer API here, so run one
    * optimizer at a time — the job-scheduler invariant every OPTIMIZE
    * implementation documents.
    *
    * Scale: the rewrite is one range-exchange of the table (the same
    * shuffle any global sort pays) and streams through executors;
    * nothing collects. At 100 TB you run it per partition or per
    * fragmented subset — compose with a filtered read and a subdir path.
    * Returns the row count. */
  def optimizeZordered(spark: org.apache.spark.sql.SparkSession, path: String,
                       dims: Seq[Column], bits: Int, numFiles: Int): Long = {
    import org.apache.hadoop.fs.Path
    require(numFiles >= 1, s"numFiles must be ≥ 1, got $numFiles")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root.toString.stripSuffix("/") + "_optimizing")
    val retired = new Path(staging, "retired")
    val fresh = new Path(staging, "fresh")
    // existence is checked AFTER the heal: the crash-A state (retire done,
    // swap not) has NO live tree — the table exists only as the retired copy
    if (fs.exists(staging)) {
      // heal: the retired copy is the authoritative table when present
      if (fs.exists(retired)) {
        if (fs.exists(root)) fs.delete(root, true)
        require(fs.rename(retired, root),
          s"crash-heal rename of $retired to $root failed; staging " +
            "preserved — resolve manually before optimizing")
      }
      fs.delete(staging, true)
    }
    require(fs.exists(root), s"no table at $root")
    val live = spark.read.parquet(root.toString)
    val liveCount = live.count()
    val z = zorderKey(dims, bits)
    live.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .write.mode("overwrite").parquet(fresh.toString)
    val freshCount = spark.read.parquet(fresh.toString).count()
    if (freshCount != liveCount) {
      fs.delete(staging, true) // nothing destructive has happened yet
      throw new IllegalStateException(
        s"optimize rewrite row count $freshCount != live $liveCount; aborted")
    }
    require(fs.rename(root, retired), s"retire rename $root -> $retired failed")
    require(fs.rename(fresh, root), s"swap rename $fresh -> $root failed; " +
      s"the table is in staging at $retired — the next call heals it")
    fs.delete(staging, true)
    liveCount
  }
}
