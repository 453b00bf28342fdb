package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Truncate a string to at most `maxBytes` of UTF-8 WITHOUT splitting a
  * codepoint — the byte-budget guard every LLM ingestion path needs
  * (context windows, per-record storage caps, fixed-size buffers are
  * all BYTE limits, while `substring` counts characters: cutting a
  * multi-byte sequence mid-codepoint produces invalid UTF-8 that
  * poisons every downstream tokenizer/quality gate). A native Catalyst
  * `Expression` with `doGenCode`; the kernel walks BACKWARD from the
  * cut point over at most 3 continuation bytes, so cost is O(1) beyond
  * the byte copy.
  *
  * Surrogate note: the cut is codepoint-safe, not grapheme-safe — a
  * ZWJ emoji family may lose members but the result is always valid
  * UTF-8, which is the contract byte budgets need.
  */
case class Utf8Truncate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "utf8_truncate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"utf8_truncate expects (string, int), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Utf8Truncate.truncate(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Utf8Truncate.truncate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Utf8Truncate =
    copy(left = newLeft, right = newRight)
}

object Utf8Truncate {

  /** Kernel over Spark's zero-copy UTF8String: find the largest prefix
    * of at most `maxBytes` bytes that ends on a codepoint boundary.
    * UTF-8 property: continuation bytes are exactly those matching
    * 10xxxxxx, so backing up from the cut to the first non-continuation
    * byte (≤3 steps) lands on a boundary. */
  def truncate(s: UTF8String, maxBytes: Int): UTF8String = {
    val n = s.numBytes()
    if (maxBytes <= 0) return UTF8String.EMPTY_UTF8
    if (n <= maxBytes) return s
    var cut = maxBytes
    // if the byte AT the cut is a continuation byte, the cut splits a
    // codepoint: back up to the boundary
    while (cut > 0 && (s.getByte(cut) & 0xC0) == 0x80) cut -= 1
    UTF8String.fromBytes(s.getBytes, 0, cut)
  }

  /** Column API. */
  def utf8Truncate(s: Column, maxBytes: Column): Column =
    bridge.column(Utf8Truncate(bridge.expression(s),
      bridge.expression(maxBytes)))

  /** SQL registration: SELECT utf8_truncate(s, 100). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "utf8_truncate", exprs => Utf8Truncate(exprs(0), exprs(1)), "built-in")
}
