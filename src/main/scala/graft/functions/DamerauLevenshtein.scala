package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau-Levenshtein distance — edit distance whose
  * atomic operations are insert, delete, substitute, AND transpose of
  * adjacent characters, with transposed blocks editable again (the
  * variant where CA→ABC costs 2, not the cheaper-to-implement
  * "optimal string alignment" restriction where it costs 3). Spark
  * ships plain `levenshtein` only, which bills the single most common
  * human typo — a swap — as TWO edits and wrecks threshold-based
  * fuzzy matching; this is the scorer record linkage actually wants.
  * Semantics pinned to DuckDB's `damerau_levenshtein` (verified
  * unrestricted on randomized cases before implementation; the q247
  * oracle re-verifies on every gate run). A native Catalyst
  * `Expression` with `doGenCode`. NULL in → NULL out.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.StringType &&
        right.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein expects (string, string), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.distance(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** The classic Lowrance-Wagner algorithm: full (n+2)×(m+2) matrix
    * with per-character last-occurrence bookkeeping, which is what
    * makes the unrestricted transposition (over any gap, re-editable)
    * exact. O(n·m) time and space — fine for the name/title-length
    * strings fuzzy matching runs on; candidate volume is bounded by
    * blocking upstream, not by this kernel. */
  def distance(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = Option(last.get(b.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Column API. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    bridge.column(DamerauLevenshtein(bridge.expression(a), bridge.expression(b)))

  /** SQL registration: SELECT damerau_levenshtein(a, b). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein", exprs => DamerauLevenshtein(exprs(0), exprs(1)),
      "built-in")
}
