package graft.functions

import java.text.{Normalizer => JNorm}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text pipelines — the normalization pass
  * CCNet-class corpora run BEFORE hashing/dedup, because the same
  * visible text arrives in different encodings (composed `é` U+00E9 vs
  * `e`+U+0301) and un-normalized fingerprints silently miss those
  * duplicates.
  *
  * Spark ships no normalization function, so these are native Catalyst
  * expressions over the JDK's Unicode implementation
  * (`java.text.Normalizer` — the standard UAX #15 forms), codegen'd as
  * a single static call per row (map-side, zero shuffle):
  *
  *  - [[UnicodeNorm.normalize]]: NFC/NFD/NFKC/NFKD
  *  - [[UnicodeNorm.stripAccents]]: NFD decomposition with combining
  *    marks (category Mn) removed, recomposed to NFC — `'é' → 'e'`,
  *    `'mühle' → 'muhle'`; characters that are not base+mark pairs
  *    (ø, ß, æ) pass through untouched.
  *
  * Oracle parity: both engines implement the same Unicode standard
  * (JDK ICU data here, utf8proc in DuckDB's `nfc_normalize` /
  * `strip_accents`), so normalized strings hash-compare equal.
  */
object UnicodeNorm {

  /** UAX #15 normalization of a string column; `form` ∈ NFC/NFD/NFKC/NFKD. */
  def normalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(NormalizeExpr(
      org.apache.spark.sql.GraftExpressionBridge.expression(text), form))

  /** NFD → drop combining marks → NFC. */
  def stripAccents(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(StripAccentsExpr(
      org.apache.spark.sql.GraftExpressionBridge.expression(text)))

  // static entry points referenced from generated code
  def normalizeJ(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(
      JNorm.normalize(s.toString, JNorm.Form.valueOf(form)))

  def stripAccentsJ(s: UTF8String): UTF8String = {
    val nfd = JNorm.normalize(s.toString, JNorm.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(JNorm.normalize(sb.toString, JNorm.Form.NFC))
  }
}

case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalizeJ(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNorm.normalizeJ($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccentsJ(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNorm.stripAccentsJ($c)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
