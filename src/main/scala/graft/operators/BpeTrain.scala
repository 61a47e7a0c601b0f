package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer training — the merge-table learner
  * (Sennrich et al. 2016 "Neural Machine Translation of Rare Words with
  * Subword Units"), the step a training-data pipeline runs BEFORE it can
  * count tokens the way the model will see them.
  *
  * The scale insight BPE training rides: after ONE corpus pass collapses
  * the text to (distinct word, count), every merge round touches only the
  * VOCABULARY relation — at 100 TB the corpus has billions of documents
  * but the distinct-word table is orders of magnitude smaller, and counts
  * carry the corpus weight. Per round:
  *
  *   1. adjacent-pair counts: a row-local zip of each word's current
  *      symbol array with its own tail, exploded and summed with map-side
  *      combine (shuffle width = distinct pairs, not occurrences);
  *   2. the arg-max pair under the TOTAL order (count DESC, left ASC,
  *      right ASC) — classic BPE breaks ties arbitrarily; a deterministic
  *      tie-break makes the merge table a pure function of the corpus;
  *   3. merge application: a row-local left fold over each word's symbol
  *      array (greedy left-to-right, the reference BPE semantics — "aaa"
  *      under (a,a) becomes [aa, a]).
  *
  * Each round's vocab is persisted and materialized before the previous
  * is released, so the fold lineage never re-computes — and every
  * `checkpointEvery` rounds (default 8) the vocab is `localCheckpoint`ed
  * so the PLAN stays bounded too: a persist does not truncate the
  * analyzed tree, each round nests one more fold layer onto it, and the
  * unbounded schedule was measured (round 19) to OOM the driver near
  * merge ~200 — while per-round analyzer cost is SUPERLINEAR in the
  * depth between checkpoints (~5 s/round at cadence 32 vs ~0.3 s/round
  * at cadence 8 on the sf0.01 vocab, measured), hence the short default.
  * BpeTrainSpec crosses the cadence boundary against the reference
  * trainer.
  *
  * [[bpeEncode]] applies a FIXED merge list to a corpus row-locally (no
  * shuffle) through a flat replace-chain kernel — one linear string
  * pass per merge, with a per-row fold fallback that keeps the
  * encoding total (see its scaladoc; the original all-fold kernel
  * measured 15.4 s at sf0.1 and the flat kernel 0.78 s, SCALE.md §R18).
  * Both kernels pay O(merges) passes per document — and the measured
  * rail is far TIGHTER than the runtime: a Θ(merges) expression tree
  * stops ANALYZING at ~100–256 nested layers ("Max iterations reached
  * for batch Resolution" at 256; StackOverflowError converting the
  * Column tree at 4096 — SCALE.md §R19), so [[bpeEncode]] is the
  * oracle-replayable artifact-scale kernel (the frozen 16-merge table),
  * not a production encoder. [[bpeEncodeRank]] is the production
  * kernel: merge-RANK replay per word through
  * [[graft.functions.BpeRankEncode]] (the GPT-2/HuggingFace runtime
  * algorithm — ships the table once per task as a rank lookup, replays
  * only the merges present in each word, cost independent of table
  * size: measured flat 0.07–0.10 s at sf0.1 from 16 through 4096
  * merges, SCALE.md §R19).
  * Equivalence to the sequential replay is by construction and
  * spec-asserted token-for-token (BpeTrainSpec); note that
  * vocab LONGEST-MATCH (WordPiece) is NOT an equivalent kernel — see
  * the expression's scaladoc for the two-merge counterexample.
  *
  * Oracle strategy (q107): merge ROUND 1's pair counts over the initial
  * character segmentation are plain SQL (adjacent character bigrams
  * weighted by word count) — the distributed-risk stage (the corpus pass
  * + the pair shuffle) is hash-gated at every SF, while the driver loop
  * (vocab-local, engine-independent) is pinned by BpeTrainSpec against an
  * independent single-threaded reference implementation on real data. */
object BpeTrain {

  /** ONE corpus pass: whitespace words → (word, count), map-side combined.
    * Empty tokens (doubled spaces) are dropped. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: each distinct word as its character array.
    * (No end-of-word sentinel: words are already whitespace-delimited in
    * this corpus model, so merges never need to know word boundaries —
    * the sentinel variant is a one-line change to this seed.)
    *
    * Unicode contract: "character" here is what `split(w, "")` yields —
    * a Unicode CODE POINT. (Measured, round 19: Spark's UTF8String-based
    * split and regexp machinery segment code points, so an astral emoji
    * seeds as ONE symbol — unlike `java.lang.String.split("")`, which
    * splits surrogate pairs; an earlier contract note here assumed the
    * Java behavior and was wrong.) A SQL engine's regex/`substr` count
    * code points too, so oracle parity holds for ALL of Unicode, astral
    * planes included — spec-pinned against the DuckDB replay's output on
    * astral text. A byte-level seed remains the production choice for
    * multilingual corpora and is what `byteSeed = true` does: each UTF-8 byte seeds
    * as an uppercase hex PAIR ("h" → "68"), so symbols stay ASCII-alnum
    * (the ()-delimited oracle replay and the q107-style pair-count SQL
    * both remain expressible — DuckDB's `hex(encode(w))` replays the
    * identical segmentation) and any byte sequence round-trips exactly
    * (`unhex(concat(tokens))` — spec-asserted on non-ASCII and astral
    * fixtures). */
  def initVocab(wc: DataFrame, byteSeed: Boolean = false): DataFrame =
    if (!byteSeed)
      wc.withColumn("syms", filter(split(col("w"), ""), s => length(s) > 0))
    else {
      val h = hex(encode(col("w"), "UTF-8"))
      wc.withColumn("syms",
        transform(sequence(lit(1), (length(h) / 2).cast("int")),
          i => h.substr(i * 2 - 1, lit(2))))
    }

  /** Adjacent-pair counts over the CURRENT segmentation, weighted by word
    * count: zip each symbol array with its own tail (row-local), explode,
    * sum. Overlapping pairs count fully ("aaa" contributes (a,a) twice),
    * matching the reference BPE counting. */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val n = size(col("syms"))
    vocab
      .where(n >= 2)
      .select(col("cnt"), explode(zip_with(
        slice(col("syms"), lit(1), n - 1),
        slice(col("syms"), lit(2), n - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** WordPiece pair scoring — the BERT tokenizer-trainer's merge criterion
    * (Schuster & Nakajima 2012; Devlin et al. 2019): rank candidate merges
    * by the likelihood ratio count(l,r) / (count(l)·count(r)) instead of
    * BPE's raw count, so a pair merges when it co-occurs MORE than its
    * parts' frequencies predict ("un"+"able" beats "e"+"s" even though the
    * latter is more frequent). Consumes the same segmentation relation as
    * [[pairCounts]]; one extra symbol-frequency reduce joins in the
    * denominators.
    *
    * Determinism: the score is one double division of a double product of
    * exact integer counts — correctly rounded IEEE ops on identical
    * operands, so any engine computes identical bits and the (score, l, r)
    * ranking replays exactly (the distinctiveTerms lift rationale). The
    * product is taken in DOUBLE: at corpus scale count(l)·count(r) exceeds
    * a long (1e14² at 100 TB), and a silent Long overflow here would
    * invert the ranking.
    *
    * Scale shape: [[pairCounts]]'s vocabulary-relation reduce plus one more
    * vocab-sized reduce for symbol totals; the join keys on single symbols
    * (≤ |alphabet| + merges rows) — metadata scale, never the corpus. */
  def wordPieceScores(vocab: DataFrame): DataFrame = {
    val sc = vocab.select(col("cnt"), explode(col("syms")).as("s"))
      .groupBy("s").agg(sum(col("cnt")).as("sc"))
    pairCounts(vocab)
      .join(sc.select(col("s").as("l"), col("sc").as("cl")), Seq("l"))
      .join(sc.select(col("s").as("r"), col("sc").as("cr")), Seq("r"))
      .select(col("l"), col("r"), col("cnt").cast("long").as("cnt"),
        (col("cnt").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double"))).as("score"))
  }

  /** Greedy left-to-right application of one merge to a symbol array —
    * the row-local fold shared by training and encoding. */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && s === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(s))))

  /** One merge round applied to the vocabulary. */
  def applyMerge(vocab: DataFrame, l: String, r: String): DataFrame =
    vocab.withColumn("syms", mergeFold(col("syms"), l, r))

  /** Train `merges` BPE merges over the corpus. Returns the ordered merge
    * table — a pure function of the corpus under the deterministic
    * tie-break. Stops early (shorter result) when no adjacent pair
    * remains. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int,
               byteSeed: Boolean = false,
               checkpointEvery: Int = 8): Seq[(String, String)] = {
    require(merges > 0, s"need a positive merge count, got $merges")
    require(checkpointEvery > 0,
      s"need a positive checkpoint cadence, got $checkpointEvery")
    var vocab = initVocab(wordCounts(df, textCol), byteSeed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val out = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    try {
      while (m < merges && !exhausted) {
        val top = pairCounts(vocab)
          .orderBy(desc("cnt"), asc("l"), asc("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r) = (top(0).getString(0), top(0).getString(1))
          out += ((l, r))
          // lineage/plan rail: each round nests one more fold layer onto
          // the vocab PLAN, and the persist does not truncate it — the
          // analyzer re-walks the whole tree every round, so an unbounded
          // schedule is quadratic driver CPU and (measured, round 19) an
          // OutOfMemoryError near merge ~200. localCheckpoint every
          // `checkpointEvery` rounds swaps the plan for the materialized
          // rows (LogicalRDD), bounding tree depth; eager, so it also
          // serves as the round's materialization.
          val grown = applyMerge(vocab, l, r)
          val next =
            if ((m + 1) % checkpointEvery == 0) grown.localCheckpoint(true)
            else {
              val p = grown.persist(StorageLevel.MEMORY_AND_DISK)
              p.count()
              p
            }
          vocab.unpersist()
          vocab = next
          m += 1
        }
      }
    } finally vocab.unpersist()
    out.result()
  }

  /** Published fixed merge table for the oracle-gated encode query
    * (q110): a tokenizer's merge list is a MODEL ARTIFACT — trained
    * once, then shipped frozen to every pipeline that must count tokens
    * the way the model will see them. This one was produced by
    * [[bpeTrain]] (16 merges, deterministic tie-break) over the sf0.01
    * driver corpus and then frozen, so the engine and the DuckDB oracle
    * embed the IDENTICAL literal table; [[bpeEncode]] is defined for any
    * corpus under any fixed table, and BpeTrainSpec pins train→encode
    * consistency on live data separately. Symbols are ASCII-alnum — free
    * of the `(`/`)` delimiters the oracle's replay encoding uses. */
  def fixedMerges(): Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t",
    "m" -> "er", "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "a" -> "s", "as" -> "h", "h" -> "ash",
    "r" -> "ow")

  /** The fast-kernel symbol delimiters: two control codepoints no text
    * corpus legitimately carries. Rows that DO carry one fall back to the
    * per-word fold kernel row-locally, so the encoding stays total. */
  private val SymL = "\u0001"
  private val SymR = "\u0002"

  /** Encode a corpus under a FIXED merge table — all row-local (zero
    * shuffle). Returns the input plus `bpe_tokens` (the full subword
    * stream in document order) and `bpe_len`.
    *
    * Two kernels, dispatched per row, same semantics:
    *
    *   - FAST (the default path): the whole text is rewritten once with
    *     every non-space char self-delimited (`␁c␂`), then each merge is
    *     ONE non-overlapping left-to-right `replace` of `␁l␂␁r␂` with
    *     `␁lr␂` over the whole string — the construction q110's oracle
    *     replays. Self-delimiting is what makes a flat string replace
    *     equal the per-word greedy fold: a consumed match never eats a
    *     neighbor's delimiter (so `aaaa` under (a,a) merges to [aa,aa]
    *     in one pass) and a merge's left symbol cannot match another
    *     symbol's suffix (`[xa,b]` never matches (a,b)); word gaps keep
    *     a space between delimiters, which no merge pattern can cross.
    *     Everything here is a flat built-in string expression —
    *     O(merges) passes over the text, no per-element lambda
    *     dispatch, no quadratic array rebuilds. Measured vs the fold
    *     kernel at bench scale (sf0.1, 16 merges): 15.4 s → sub-second.
    *
    *   - FOLD (the total-semantics fallback): the per-word
    *     [[mergeFold]] array fold, taken by exactly the rows whose text
    *     contains a delimiter codepoint (U+0001/U+0002 — there the
    *     string rewrite would be ambiguous). `when` is lazy per row, so
    *     clean corpora never pay it. (An earlier round also routed
    *     astral-plane rows here on the belief that `split(w, "")` seeds
    *     UTF-16 code units while the regex wrap segments code points;
    *     measured round 19, BOTH segment code points — Spark's split is
    *     UTF8String-based, not `String.split` — so the kernels agree on
    *     astral input outright and the per-row astral rlike was retired
    *     from this hot path.)
    *
    * Merge symbols must be free of spaces and the delimiter codepoints
    * (enforced; a trained table can never violate this — words are
    * space-split before seeding). Null text propagates as null tokens
    * AND null length: under the session's non-ANSI config size(null) is
    * the legacy -1, which a downstream token-budget sum would silently
    * subtract — the sibling operators' convention is null-in/null-out
    * (QualityModel scores null), never a sentinel that aggregates as
    * data. */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val clash = Seq("bpe_tokens", "bpe_len").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns collide with output names: ${clash.mkString(", ")}")
    merges.foreach { case (l, r) =>
      require(!(l + r).exists(c => c == ' ' || c == '\u0001' || c == '\u0002'),
        s"merge symbols must not contain spaces or U+0001/U+0002: ($l,$r)")
    }
    val text = col(textCol)
    // fold kernel: per word, seed chars then each merge's greedy fold
    val words = filter(split(text, " "), w => length(w) > 0)
    val encodedWord = (w: Column) => {
      val seed = filter(split(w, ""), s => length(s) > 0)
      merges.foldLeft(seed) { case (acc, (l, r)) => mergeFold(acc, l, r) }
    }
    val foldTokens = flatten(transform(words, encodedWord))
    // fast kernel: self-delimit every non-space char, replace-chain the
    // merges, collapse delimiter runs (word gaps included) to the token
    // separator, strip the ends, split
    val wrapped = regexp_replace(text, "([^ ])", SymL + "$1" + SymR)
    val chain = merges.foldLeft(wrapped) { case (acc, (l, r)) =>
      replace(acc, lit(SymL + l + SymR + SymL + r + SymR),
        lit(SymL + l + r + SymR))
    }
    val spaced = regexp_replace(chain, SymR + " *" + SymL, " ")
    val stripped = regexp_replace(spaced, "^ *" + SymL + "|" + SymR + " *$", "")
    val fastTokens = filter(split(stripped, " "), s => length(s) > 0)
    // dispatch to the fold kernel for exactly the rows the flat rewrite
    // cannot handle faithfully: delimiter-carrying text, where the
    // rewrite would be ambiguous (astral rows need no dispatch — both
    // kernels segment code points, measured and spec-pinned)
    val dirty = text.contains(SymL) || text.contains(SymR)
    df.withColumn("bpe_tokens", when(dirty, foldTokens).otherwise(fastTokens))
      .withColumn("bpe_len",
        when(col("bpe_tokens").isNull, lit(null).cast("long"))
          .otherwise(size(col("bpe_tokens")).cast("long")))
  }

  /** Encode a corpus under a FIXED merge table through the PRODUCTION
    * kernel — per-word merge-rank replay ([[graft.functions.BpeRankEncode]]):
    * the table ships once per task as a rank lookup, each word replays
    * only the merges present in it, and the cost is independent of the
    * table size (the replace chain's O(merges) passes per document are
    * its 32k-merge wall — SCALE.md §R19 ladders both kernels). Output
    * contract is [[bpeEncode]]'s exactly: `bpe_tokens` + `bpe_len`, null
    * text → null tokens AND null length, token-for-token equal to the
    * replace-chain/fold kernels on every input (spec-asserted; no dirty
    * dispatch needed — the kernel never rewrites the string, so
    * delimiter codepoints are ordinary symbols, and it seeds Unicode
    * code points exactly as [[initVocab]]'s measured contract, astral
    * planes included).
    *
    * `byteSeed = true` seeds each word's UTF-8 bytes as uppercase hex
    * pairs instead ([[initVocab]]'s byte-level contract) — the table
    * must then come from a byte-seeded [[bpeTrain]]. */
  def bpeEncodeRank(df: DataFrame, textCol: String,
                    merges: Seq[(String, String)],
                    byteSeed: Boolean = false): DataFrame = {
    val clash = Seq("bpe_tokens", "bpe_len").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns collide with output names: ${clash.mkString(", ")}")
    merges.foreach { case (l, r) =>
      require(!(l + r).exists(_ == ' '),
        s"merge symbols must not contain spaces: ($l,$r)")
      if (byteSeed)
        require((l + r).matches("(?:[0-9A-F]{2})+"),
          s"byte-seeded merge symbols must be uppercase hex pairs: ($l,$r)")
    }
    df.withColumn("bpe_tokens",
        graft.functions.BpeRankEncodeFunction.bpeRankEncode(
          col(textCol), merges, byteSeed))
      .withColumn("bpe_len",
        when(col("bpe_tokens").isNull, lit(null).cast("long"))
          .otherwise(size(col("bpe_tokens")).cast("long")))
  }

  /** Decode a byte-seeded token stream back to text: hex tokens
    * concatenate to the word's full UTF-8 hex (merges only ever
    * concatenate), so `unhex → UTF-8` is exact for ANY byte sequence —
    * the round-trip witness the byte-level seed exists for. Word
    * boundaries are not part of the stream (the corpus model is
    * whitespace-delimited); this decodes one word's tokens. */
  def decodeByteTokens(tokens: Column): Column =
    decode(unhex(concat_ws("", tokens)), "UTF-8")
}
