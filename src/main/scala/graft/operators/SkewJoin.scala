package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffled equi-joins.
  *
  * First line of defense at scale is AQE's skew-join splitting (enabled in
  * [[graft.GraftSession]]); salting is the explicit fallback for the cases
  * AQE can't fix — e.g. one key holding >1 executor-heap of build-side rows,
  * or a deterministic plan needed without runtime re-optimization.
  *
  * `saltedJoin` splits every hot key into `buckets` sub-keys: the big
  * (probe) side gets a per-row salt, the small (build) side is replicated
  * `buckets` times, and the join runs on (key, salt) — each shuffle
  * partition now holds ≤ 1/buckets of any key's rows. Row multiplicity is
  * unchanged, so the result is exactly the plain join's.
  *
  * Supported join types are the ones where replicating the small side is
  * multiplicity-preserving: inner/cross, and the left-* family (a left row
  * carries exactly one salt, so it meets each small-side key once; unmatched
  * left rows survive once). Right/full outer are rejected: an unmatched
  * small-side row exists in every replica and would be emitted `buckets`
  * times — for those, salt the other way around or fall back to AQE.
  */
object SkewJoin {

  private val SupportedJoinTypes =
    Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not support '$joinType': replicating the small side " +
        "would duplicate its unmatched rows in right/full outer joins")
    // deterministic per-row spread: hash of key + a physical-row discriminator
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
