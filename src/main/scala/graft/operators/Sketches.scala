package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for streams too wide to count exactly.
  *
  * The reference pipeline counts small relations exactly (api.py:9-24's
  * monthly_count); at 100 TB the per-key count table itself can exceed
  * memory, which is where a count-min sketch (Cormode & Muthukrishnan,
  * J.Algorithms '05) replaces it: a depth×width integer grid, each row an
  * independent hash, point estimate = min over rows — never an
  * undercount, overcount bounded by εN with ε = e/width at confidence
  * 1−(1/e)^depth.
  *
  * Everything here is deterministic and engine-portable: the row hashes
  * are [[TextAnalysis.md5Long]] of `"d|key"`, so a SQL oracle reproduces
  * the grid — and the estimates — bit-for-bit.
  */
object Sketches {

  private def md5Long(c: Column): Column = graft.functions.Md5LongFunction.md5Long(c)

  /** Bucket of `key` in sketch row `d` — the d-th independent hash. */
  private[graft] def cmsBucket(key: Column, d: Int, width: Int): Column =
    pmod(md5Long(concat(lit(s"$d|"), key)), lit(width.toLong))

  /** Build the count-min grid over one item column: returns (d, b, cnt)
    * rows, at most depth×width of them.
    *
    * Scale shape: the explode multiplies the stream by `depth`, but
    * partial aggregation collapses each partition to ≤ depth×width cells
    * before the (tiny, bounded) shuffle — the sketch IS the map-side
    * combine. Grids from disjoint shards merge by cell-wise addition
    * (same groupBy), the property that makes CMS distributable. */
  def countMinSketch(items: DataFrame, key: String,
                     depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth×$width")
    val k = col(key)
    items
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(k, d, width).as("b"))): _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate each probe key against a built grid: min over the
    * depth rows of the probed cell. `depth`/`width` must match the build.
    *
    * The probe side is usually small (a vocabulary, a watchlist), so each
    * probe expands to `depth` (d, b) lookups and broadcast-joins the grid
    * — the corpus is never touched again. The grid join is a LEFT join
    * with absent cells read as 0: [[countMinSketch]] materializes only
    * touched cells, and a never-seen probe key hitting an untouched cell
    * must estimate 0 (true CMS semantics — min over ALL depth rows), not
    * vanish or take min() over only its colliding cells. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth×$width")
    val k = col(key)
    val lookups = probes
      .select(k.as("cms_key"), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(k, d, width).as("b"))): _*)).as("db"))
      .select(col("cms_key"), col("db.d").as("d"), col("db.b").as("b"))
    lookups.join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy(col("cms_key").as(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
