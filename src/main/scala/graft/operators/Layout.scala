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
}
