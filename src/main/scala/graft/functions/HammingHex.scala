package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-level Hamming distance between two equal-length hex fingerprint
  * strings (SimHash comparisons). A native Catalyst `Expression` with
  * `doGenCode` — stays inside whole-stage codegen, unlike a Scala UDF
  * which would break the codegen span and pay serialization per row.
  *
  * Returns NULL for NULL inputs; throws on length mismatch (fingerprint
  * corruption should fail loudly, not score 0).
  */
case class HammingHex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_hex"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.StringType &&
        right.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_hex expects (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    HammingHex.distance(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HammingHex.distance($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingHex =
    copy(left = newLeft, right = newRight)
}

object HammingHex {

  /** Java-callable kernel (used by both interpreted and generated
    * paths). Hex digits are decoded with Character.digit; popcount via
    * Integer.bitCount. */
  def distance(a: String, b: String): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"hamming_hex: fingerprint lengths differ (${a.length} vs ${b.length})")
    var i = 0
    var d = 0
    while (i < a.length) {
      val xa = Character.digit(a.charAt(i), 16)
      val xb = Character.digit(b.charAt(i), 16)
      if (xa < 0 || xb < 0)
        throw new IllegalArgumentException(s"hamming_hex: non-hex digit at $i")
      d += Integer.bitCount(xa ^ xb)
      i += 1
    }
    d
  }

  /** Column API. */
  def hammingHex(a: Column, b: Column): Column =
    bridge.column(HammingHex(bridge.expression(a), bridge.expression(b)))

  /** SQL registration: SELECT hamming_hex(fp1, fp2). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_hex", exprs => HammingHex(exprs(0), exprs(1)), "built-in")
}
