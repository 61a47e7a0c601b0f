package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for 100 TB-scale corpora.
  *
  * Generalizes the reference's only dedup mechanism — the idempotent-load
  * anti-join on `reward_id` (reference `load_to_redshift_lambda.py:88-100`) —
  * into the dedup family a training-data pipeline needs:
  *
  *  - exact:   hash-groupBy on a content fingerprint (one shuffle on the
  *             fingerprint; representative = min id, deterministic).
  *  - MinHash: shingle → k min-hashes → LSH banding → bucket self-join.
  *             Candidate generation never compares all O(n²) pairs; the only
  *             shuffles are the explode-on-(band,bucket) exchange and the
  *             bucket join, both key-partitioned and skew-safe (bucket sizes
  *             are capped by banding width).
  *  - SimHash: 64-bit signature; candidates must share one of four 16-bit
  *             chunks (pigeonhole: hamming ≤ 3 guarantees a shared chunk).
  *  - n-gram Jaccard: exact verification predicate used behind both LSH
  *             front-ends, and usable alone within small blocks.
  *
  * Everything is built from codegen'd builtins (xxhash64, higher-order array
  * functions) — no UDFs, no driver-side loops.
  */
object Dedup {

  // ---------------------------------------------------------------- exact --

  /** Exact dedup: keep the smallest `idCol` per fingerprint group.
    * One hash-aggregate shuffle on the fingerprint — at scale this is the
    * canonical map-side-combinable dedup. */
  def exact(df: DataFrame, fingerprint: Column, idCol: Column): DataFrame =
    df.groupBy(fingerprint.as("fp"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Anti-join incremental load (reference J2): rows of `incoming` whose key
    * is absent from `existing`. Catalyst broadcasts `existing`'s key set when
    * small; at 100 TB it becomes a shuffled join on the key — still one pass. */
  def antiJoin(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key).distinct(), Seq(key), "left_anti")

  // -------------------------------------------------------------- jaccard --

  /** |A ∩ B| / |A ∪ B| over two pre-distinct token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Exact near-dup pairs within a blocking key (e.g. language): self-join on
    * the block, Jaccard over distinct token sets. Quadratic *within* a block —
    * use only when blocks are bounded; otherwise go through [[minHashPairs]]. */
  def jaccardPairs(df: DataFrame, id: String, tokenSet: String,
                   block: String, threshold: Double): DataFrame = {
    // Perf: J ≥ τ implies min(|A|,|B|) ≥ τ·max(|A|,|B|), so a cheap size-ratio
    // prefilter (epsilon only ever loosens it — results unchanged) prunes most
    // pairs before the O(|A|+|B|) intersection.
    val a = df.select(col(block), col(id).as("left_id"), col(tokenSet).as("ls"),
      size(col(tokenSet)).as("nl"))
    val b = df.select(col(block), col(id).as("right_id"), col(tokenSet).as("rs"),
      size(col(tokenSet)).as("nr"))
    a.join(b, Seq(block)).where(col("left_id") < col("right_id"))
      .where(col("nl") >= lit(threshold) * col("nr") - 1e-9 &&
             col("nr") >= lit(threshold) * col("nl") - 1e-9)
      .withColumn("inter", size(array_intersect(col("ls"), col("rs"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("nl") + col("nr") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  // -------------------------------------------------------------- minhash --

  /** Deterministic affine hash family over a base xxhash64: h_i(t) = a_i*H(t)+b_i
    * (wrapping Long arithmetic — this is hashing, overflow is the point). */
  private def hashFamily(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5EED5EEDL)
    Seq.fill(k)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  /** MinHash signature (array of k longs) of a token-array column. */
  def minHashSignature(tokenSet: Column, k: Int = 16): Column = {
    val sig = hashFamily(k).map { case (a, b) =>
      array_min(transform(tokenSet, t => xxhash64(t) * a + b))
    }
    array(sig: _*)
  }

  /** LSH candidate pairs: band the signature, bucket-join, dedup pairs.
    * `bands` bands of `k/bands` rows each; a pair is a candidate if any band
    * hashes identically. Returns (left_id, right_id) distinct.
    *
    * Scale shape: signatures come from explode → xxhash64 once per token →
    * groupBy(id) with k min-aggregates. That's one map-side-combinable
    * shuffle on id — tokens are never re-hashed per hash function, and no
    * wide per-row expression tree. Banding explodes k/rows rows per doc and
    * joins on (band,bucket) — both exchanges are key-partitioned. */
  def minHashPairs(df: DataFrame, id: String, tokenSet: String,
                   k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val fam = hashFamily(k)
    val tokenHashes = df.select(col(id).as("mh_id"), explode(col(tokenSet)).as("tok"))
      .select(col("mh_id"), xxhash64(col("tok")).as("h"))
    val sig = tokenHashes.groupBy("mh_id")
      .agg(min(col("h") * fam.head._1 + fam.head._2).as("m0"),
        fam.toSeq.tail.zipWithIndex.map { case ((a, b), i) =>
          min(col("h") * a + b).as(s"m${i + 1}") }: _*)
    val banded = sig.select(col("mh_id"), posexplode(
      array((0 until bands).map(bnd =>
        xxhash64(lit(bnd) +: (0 until rows).map(r => col(s"m${bnd * rows + r}")): _*)): _*)
    ).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("mh_id").as("left_id"))
    val r = banded.select(col("band"), col("bucket"), col("mh_id").as("right_id"))
    l.join(r, Seq("band", "bucket")).where(col("left_id") < col("right_id"))
      .select("left_id", "right_id").distinct()
  }

  /** Full MinHash-LSH near-dup detection: LSH candidates, then exact Jaccard
    * verification ≥ threshold. The verify join re-attaches token sets by id —
    * two shuffles on id, each O(candidates). */
  def minHashDedup(df: DataFrame, id: String, tokenSet: String,
                   threshold: Double, k: Int = 16, bands: Int = 4): DataFrame = {
    val cands = minHashPairs(df, id, tokenSet, k, bands)
    val toks = df.select(col(id), col(tokenSet))
    cands
      .join(toks.select(col(id).as("left_id"), col(tokenSet).as("ls")), Seq("left_id"))
      .join(toks.select(col(id).as("right_id"), col(tokenSet).as("rs")), Seq("right_id"))
      .withColumn("jaccard", jaccard(col("ls"), col("rs")))
      .where(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash --

  /** 64-bit SimHash of a token array: per-bit majority vote of token hashes,
    * unrolled at plan-build time into 64 fold expressions over the (small)
    * token array — all codegen'd builtins, fully distributed, no UDF. */
  def simHash64(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, t => xxhash64(t))
    (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (< 16).
    * Scale path: candidates must share one of four exact 16-bit chunks
    * (pigeonhole for hamming ≤ 3 when chunks=4); each chunk is an equi-join
    * key, so candidate generation is linear + a key-partitioned join. */
  def simHashPairs(df: DataFrame, id: String, tokenSet: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(id).as("sh_id"), simHash64(col(tokenSet)).as("sh"))
    val chunked = sigs.select(col("sh_id"), col("sh"), posexplode(
      array((0 until 4).map(c =>
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(0xFFFFL)): _*)
    ).as(Seq("chunk", "ckey")))
    val l = chunked.select(col("chunk"), col("ckey"),
      col("sh_id").as("left_id"), col("sh").as("lsh"))
    val r = chunked.select(col("chunk"), col("ckey"),
      col("sh_id").as("right_id"), col("sh").as("rsh"))
    l.join(r, Seq("chunk", "ckey")).where(col("left_id") < col("right_id"))
      .withColumn("hamming", bit_count(col("lsh").bitwiseXOR(col("rsh"))))
      .where(col("hamming") <= maxHamming)
      .select("left_id", "right_id", "hamming").distinct()
  }
}
