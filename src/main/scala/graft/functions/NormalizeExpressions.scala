package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[UnicodeNormalize]] — UAX #15 normalization via
  * `java.text.Normalizer` (ICU-equivalent for the normalization forms; both
  * implement the same Unicode standard tables DuckDB's utf8proc does, so
  * `nfc_normalize` in the oracle and NFC here agree byte-for-byte).
  *
  * The quick-check fast path matters at corpus scale: `isNormalized` is a
  * single forward scan with no allocation, and real pretraining corpora are
  * overwhelmingly already-NFC — the normalize allocation is only paid on the
  * rows that need it. */
object UnicodeNormalizeKernel {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKD)
}

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD) — the text-canonicalization
  * step every multilingual pretraining pipeline runs before tokenization and
  * dedup (CCNet, Dolma, and SentencePiece all normalize first: a composed
  * `á` and `a`+U+0301 must hash, shingle, and tokenize identically or the
  * dedup families silently miss cross-encoding duplicates).
  *
  * Spark ships no normalizer builtin, so this is a codegen'd
  * `UnaryExpression` (the repo's preferred extension tier — stays inside
  * whole-stage codegen, no UDF): a pure per-row map, zero shuffle,
  * embarrassingly parallel at 100 TB. The reference's only canonicalization
  * is lowercase/strip cleanup (`api.py:122-132`); this generalizes it to the
  * Unicode-correct form a crawl corpus needs.
  *
  * `form` is a case-class parameter (not a child expression): the form is a
  * query-plan constant, and folding it at construction keeps the generated
  * code branch-free. */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(formName),
    s"unknown normalization form '$formName' (expected NFC/NFD/NFKC/NFKD)")

  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string input, got ${other.catalogString}")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeKernel.normalize(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = formName.toLowerCase(java.util.Locale.ROOT)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalizeKernel.$kernel($c)")
  }
}

object NormalizeFunctions {
  /** UAX #15 normalization of a string column. */
  def unicodeNormalize(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  def nfc(c: Column): Column = unicodeNormalize(c, "NFC")
  def nfkc(c: Column): Column = unicodeNormalize(c, "NFKC")

  /** Accent/diacritic removal: NFD-decompose, drop combining marks
    * (general category Mn), recompose. Matches DuckDB's `strip_accents`
    * (utf8proc) on Latin diacritics — spec-pinned on the full
    * á é í ó ú ñ ü ç battery plus decomposed inputs. Composition of the
    * native normalizer with the codegen'd `regexp_replace` builtin: still
    * zero UDFs, still a narrow per-row map. */
  def stripAccents(c: Column): Column =
    nfc(regexp_replace(unicodeNormalize(c, "NFD"), "\\p{Mn}", ""))
}
