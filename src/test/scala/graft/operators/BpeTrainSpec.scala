package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-threaded BPE reference: plain Scala over collected
    * word counts, same total order (count DESC, l ASC, r ASC), same greedy
    * left-to-right merge application. The distributed trainer must replay
    * it exactly — any drift in pair counting, tie-breaking, or the fold
    * is a hard failure. */
  private def referenceTrain(wordCounts: Map[String, Long],
                             merges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < merges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val (l, r) = pairs.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += ((l, r))
        vocab = vocab.groupMapReduce {
          case (syms, _) => referenceApply(syms, l, r)
        } { case (_, c) => c }(_ + _)
        m += 1
      }
    }
    out.result()
  }

  private def referenceApply(syms: Vector[String], l: String,
                             r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
      else acc :+ s
    }

  private def referenceEncode(text: String,
                              merges: Seq[(String, String)]): Vector[String] =
    text.split(" ").filter(_.nonEmpty).toVector.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (l, r)) => referenceApply(syms, l, r)
      }
    }

  test("hand-verified fixture: merges, early exhaustion, overlap counting") {
    val df = Seq("aa ab", "aa").toDF("text")
    // word counts {aa: 2, ab: 1}; round 1 pairs: (a,a)=2, (a,b)=1 -> merge (a,a)
    // round 2: only ab=[a,b] has a pair -> merge (a,b); round 3: exhausted
    assert(BpeTrain.bpeTrain(df, "text", merges = 5) ===
      Seq(("a", "a"), ("a", "b")))
    // overlapping pairs count fully: "aaa" contributes (a,a) twice
    val pc = BpeTrain.pairCounts(BpeTrain.initVocab(
        BpeTrain.wordCounts(Seq("aaa").toDF("text"), "text")))
      .as[(String, String, Long)].collect()
    assert(pc === Array(("a", "a", 2L)))
  }

  test("greedy left-to-right merge: 'aaa' under (a,a) becomes [aa, a]") {
    val df = Seq("aaa").toDF("text")
    val enc = BpeTrain.bpeEncode(df, "text", Seq(("a", "a")))
      .select($"bpe_tokens", $"bpe_len").as[(Seq[String], Long)].collect()(0)
    assert(enc === ((Seq("aa", "a"), 2L)))
  }

  test("distributed trainer replays the reference implementation on real data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wc = BpeTrain.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    val expected = referenceTrain(wc, merges = 8)
    val got = BpeTrain.bpeTrain(docs, "text", merges = 8)
    assert(got === expected)
    assert(got.size === 8, "real corpus must not exhaust at 8 merges")
  }

  test("encode replays the reference fold and shrinks the symbol stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val merges = BpeTrain.bpeTrain(
      spark.read.parquet(s"$sf/documents.parquet"), "text", merges = 6)
    val got = BpeTrain.bpeEncode(docs, "text", merges)
      .select($"text", $"bpe_tokens").as[(String, Seq[String])].collect()
    got.foreach { case (text, toks) =>
      assert(toks === referenceEncode(text, merges), s"encode drift on: $text")
      val rawChars = text.split(" ").filter(_.nonEmpty).map(_.length).sum
      assert(toks.size < rawChars, "merges must compress the char stream")
      assert(toks.mkString === text.split(" ").filter(_.nonEmpty).mkString,
        "encoding must preserve the character stream")
    }
  }

  test("bpeEncode rejects output-name collisions and handles empty/multi-space text") {
    val clash = Seq((1L, "ab", 7L)).toDF("id", "text", "bpe_len")
    val e = intercept[IllegalArgumentException] {
      BpeTrain.bpeEncode(clash, "text", Seq(("a", "b")))
    }
    assert(e.getMessage.contains("bpe_len"))
    val weird = Seq(Option("a  b"), Option(""), Option.empty[String]).toDF("text")
    val rows = BpeTrain.bpeEncode(weird, "text", Seq(("a", "b")))
      .select($"bpe_tokens", $"bpe_len").collect()
    val asPairs = rows.map(r =>
      (Option(r.getSeq[String](0)), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(asPairs.contains((Some(Seq("a", "b")), Some(2L))),
      "doubled space must not emit empty symbols")
    assert(asPairs.contains((Some(Seq.empty[String]), Some(0L))),
      "empty text encodes to zero symbols")
    assert(asPairs.contains((None, None)),
      "null text must encode to null tokens AND null length — the legacy " +
        "size(null) = -1 sentinel would silently corrupt a token-budget sum")
  }

  test("merge application is symbol-exact: a left symbol never matches " +
    "another symbol's suffix, and earlier merges feed later ones") {
    // (x,a) first turns [x,a,b] into [xa,b]; the later (a,b) must NOT fire
    // against xa's trailing 'a' — the exact boundary case q110's
    // self-delimited oracle replay exists to preserve
    val enc = BpeTrain.bpeEncode(
        Seq("xab", "ab", "ther").toDF("text"), "text",
        Seq(("x", "a"), ("a", "b"), ("t", "h"), ("th", "e")))
      .select($"text", $"bpe_tokens").as[(String, Seq[String])].collect().toMap
    assert(enc("xab") === Seq("xa", "b"),
      "suffix of a merged symbol must not satisfy a later merge's left side")
    assert(enc("ab") === Seq("ab"))
    assert(enc("ther") === Seq("the", "r"),
      "a merge whose left side is an earlier merge's product must fire")
  }

  test("fixedMerges is a well-formed frozen artifact") {
    val ms = BpeTrain.fixedMerges()
    assert(ms.size === 16)
    // oracle delimiter safety: symbols stay clear of the ()-encoding
    val derived = scala.collection.mutable.Set[String]()
    ms.foreach { case (l, r) =>
      assert(l.matches("[a-z0-9]+") && r.matches("[a-z0-9]+"),
        s"symbols must be ASCII-alnum for the ()-delimited oracle replay: ($l,$r)")
      assert(l.length == 1 || derived(l),
        s"multi-char left '$l' must be an earlier merge's product")
      assert(r.length == 1 || derived(r),
        s"multi-char right '$r' must be an earlier merge's product")
      derived += (l + r)
    }
  }

  test("delimiter-carrying rows dispatch to the fold kernel and still " +
    "encode exactly (the fast kernel's escape hatch is total)") {
    // a text containing the fast kernel's U+0001/U+0002 delimiters must
    // take the per-word fold path; the reference fold is delimiter-free,
    // so the outputs still agree symbol-for-symbol
    val dirty = "a\u0001b ab a\u0002"
    val clean = "ab xab"
    val merges = Seq(("x", "a"), ("a", "b"))
    val got = BpeTrain.bpeEncode(Seq(dirty, clean).toDF("text"), "text", merges)
      .select($"text", $"bpe_tokens").as[(String, Seq[String])].collect().toMap
    assert(got(dirty) === referenceEncode(dirty, merges))
    assert(got(clean) === referenceEncode(clean, merges))
    assert(got(clean) === Seq("ab", "xa", "b"),
      "fast path: (x,a) fires first in 'xab', so (a,b) must not match xa's suffix")
    // a merge table carrying a delimiter or a space is rejected up front
    intercept[IllegalArgumentException] {
      BpeTrain.bpeEncode(Seq("x").toDF("text"), "text", Seq(("a", "\u0001")))
    }
    intercept[IllegalArgumentException] {
      BpeTrain.bpeEncode(Seq("x").toDF("text"), "text", Seq(("a b", "c")))
    }
  }

  test("plan shape: fixed-table encode is a pure per-row expression " +
    "(no join, no exchange) — q110's zero-shuffle contract") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = BpeTrain.bpeEncode(docs, "text", BpeTrain.fixedMerges())
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"a row-local encoder must not shuffle the corpus:\n$plan")
  }
}
