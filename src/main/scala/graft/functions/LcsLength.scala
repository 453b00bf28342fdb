package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Longest-common-subsequence length between two token arrays — the
  * kernel of ROUGE-L (the generation-eval metric clipped-n-gram BLEU
  * cannot express: LCS rewards in-ORDER overlap at any gap, so a
  * reordered candidate scores low even when every n-gram survives). A
  * native Catalyst `Expression` with `doGenCode`; the kernel is the
  * classic two-row DP — O(|a|·|b|) time, O(min-side) memory, no
  * allocation beyond the two rows.
  *
  * NULL in → NULL out; NULL ELEMENTS never match anything (a NULL
  * token is not equal to a NULL token, mirroring SQL equality).
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_length"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lcs_length expects (array<string>, array<string>), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    LcsLength.lcs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LcsLength.lcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** Two-row DP kernel shared by interpreted and generated paths. */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        val eq = ai != null && bj != null && ai.equals(bj)
        val diag = prev(j - 1) + (if (eq) 1 else 0)
        cur(j) = math.max(diag, math.max(prev(j), cur(j - 1)))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }

  /** Column API. */
  def lcsLength(a: Column, b: Column): Column =
    bridge.column(LcsLength(bridge.expression(a), bridge.expression(b)))

  /** SQL registration: SELECT lcs_length(split(a, ' '), split(b, ' ')). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lcs_length", exprs => LcsLength(exprs(0), exprs(1)), "built-in")
}
