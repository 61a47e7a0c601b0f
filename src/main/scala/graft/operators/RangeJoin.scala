package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable batch interval (range) join: left events matched to right events
  * of the same key within a bounded time gap — the batch twin of the
  * watermarked stream-stream join, and the other operator (with as-of) the
  * prompt's "range join" family names that Spark lacks natively.
  *
  * A naive `l.join(r, key && r.ts BETWEEN l.ts - gap AND l.ts)` plans as a
  * nested loop within key groups (O(n·m) per key). Here both sides are
  * bucketized on ⌊ts / gap⌋: a right row can only match left rows in its own
  * or the next bucket, so it is replicated into exactly those two buckets
  * and the join runs as a key-partitioned EQUI-join on (key, bucket) with
  * the exact range predicate as a residual filter. Output is identical to
  * the naive join; cost drops from quadratic-per-key to
  * O(candidates-in-adjacent-buckets) — the same bucketization Databricks'
  * range-join optimization and interval-join engines use.
  */
object RangeJoin {

  /** Match right rows with `l.ts - gapSeconds <= r.ts <= l.ts`, per key.
    * Column names: left keeps its columns; right value columns must not
    * collide (rename before calling). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   gapSeconds: Long): DataFrame = {
    val bucket = (ts: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(ts) / gapSeconds).cast("long")
    val l = left.withColumn("__b", bucket(col(leftTs)))
    // a right row at bucket b can match left rows in buckets b and b+1
    val r = right
      .withColumn("__b", explode(array(bucket(col(rightTs)), bucket(col(rightTs)) + 1)))
    l.join(r, Seq(key, "__b"))
      .where(col(rightTs) <= col(leftTs) &&
             col(rightTs) >= col(leftTs) - expr(s"INTERVAL $gapSeconds SECONDS"))
      .drop("__b")
  }
}
