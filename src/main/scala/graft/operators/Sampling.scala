package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling / split assignment for training-data pipelines.
  *
  * Spark's `sample`/`sampleBy` are seed-deterministic but partition-layout
  * dependent and implementation-specific — useless as a cross-engine or
  * cross-run contract. These operators derive the decision from a content
  * hash instead: md5 of the key modulo a bucket count. Any engine computes
  * the identical assignment (md5 is md5), re-runs are stable under
  * repartitioning, and adding data never reshuffles existing rows between
  * splits — the properties a train/val/test split must have.
  *
  * Scale: pure per-row expressions, no shuffle, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic fraction sample: keeps rows whose bucket < fraction·buckets. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          buckets: Int = 100): DataFrame =
    df.where(hashBucket(key, buckets) < lit((fraction * buckets).toLong))

  /** Stratified deterministic sample: a per-stratum keep fraction (e.g.
    * upsample rare languages, downsample English), decided by the same
    * content-hash bucket as [[deterministicSample]] so the kept set is
    * stable across runs, engines, and data growth — the property a training
    * mixture needs. Rows in strata absent from `fractions` keep
    * `defaultFraction`. Pure per-row expression, no shuffle. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Seq[(String, Double)],
                       defaultFraction: Double = 0.0,
                       buckets: Int = 100): DataFrame = {
    val cut = fractions.foldLeft(lit((defaultFraction * buckets).toLong)) {
      case (acc, (s, f)) => when(stratum === s, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.where(hashBucket(key, buckets) < cut)
  }

  /** Split assignment by cumulative bucket ranges, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions are
    * interpreted in bucket units (buckets=100 → percent granularity). */
  def deterministicSplit(df: DataFrame, key: Column,
                         splits: Seq[(String, Double)],
                         buckets: Int = 100): DataFrame = {
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * buckets)
    }.tail
    val b = hashBucket(key, buckets)
    val expr = splits.map(_._1).zip(bounds).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, hi)) =>
        when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }
}
