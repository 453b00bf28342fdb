package graft.functions

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization — the curation step that runs BEFORE
  * quality gates and dedup: visually-identical strings with different
  * code-point sequences (é as U+00E9 vs e + U+0301) must hash, shingle,
  * and count identically, or near-dup detection silently fragments.
  * `java.text.Normalizer` (JDK, dependency-free) provides NFC/NFKC/
  * NFD/NFKD; both expressions are codegen'd Catalyst natives (no UDF —
  * they stay inside whole-stage codegen on the 100 TB hot path).
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects string, got ${child.dataType}")
    else if (!UnicodeNorm.forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of ${UnicodeNorm.forms.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeNorm.normalize(
      v.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"""graft.functions.UnicodeNorm.normalize($c.toString(), "$form"))""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Repair UTF-8-read-as-Latin-1 mojibake ("Ã©" → "é"): if every char
  * fits in Latin-1 AND the Latin-1 bytes decode as STRICTLY valid
  * UTF-8, the string is overwhelmingly likely a double-encoding victim
  * — decode it; otherwise return the input untouched. The strict-
  * validity guard is what makes the repair safe to run over a whole
  * corpus: genuine Latin-1-ish text ("voilà!") almost never forms
  * valid multi-byte UTF-8 sequences, and pure ASCII is a no-op by
  * construction (idempotent: repaired output re-repairs to itself
  * unless the text was double-mojibake'd, in which case a second pass
  * peels the next layer — the standard ftfy-style fixpoint).
  */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "mojibake_repair"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair expects string, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeNorm.repairMojibake(
      v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UnicodeNorm.repairMojibake($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepair =
    copy(child = newChild)
}

object UnicodeNorm {

  val forms: Set[String] = Set("NFC", "NFKC", "NFD", "NFKD")

  /** Java-callable kernel shared by interpreted and generated paths. */
  def normalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))

  /** Java-callable kernel: guarded latin1→utf8 re-decode (see
    * [[MojibakeRepair]]). */
  def repairMojibake(s: String): String = {
    var i = 0
    var hasHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return s // can't be a latin-1 read of raw bytes
      if (c > 0x7F) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII: nothing to repair
    val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => s } // not valid UTF-8: keep
  }

  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    bridge.column(UnicodeNormalize(bridge.expression(c), form))

  def mojibakeRepair(c: Column): Column =
    bridge.column(MojibakeRepair(bridge.expression(c)))
}
