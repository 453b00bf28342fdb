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
    * blocking upstream, not by this kernel.
    *
    * Kernel shape (optimization round 18): this runs once per
    * CANDIDATE PAIR inside whole-stage codegen, millions of times per
    * fuzzy-match query — the original row-of-arrays matrix plus a
    * boxed per-character HashMap allocated O(n) objects per call and
    * dominated the match stage in GC, not arithmetic. Now one flat
    * int[] for the matrix and an int[256] for ASCII last-occurrence
    * (lazy boxed map only for wider code points), zero boxing in the
    * inner loop. Same recurrence, same results (the q247 oracle pins
    * it against DuckDB's damerau_levenshtein every run). */
  def distance(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
    val lastAscii = new Array[Int](256)
    var lastWide: java.util.HashMap[Character, Integer] = null
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val k =
          if (bj < 256) lastAscii(bj)
          else if (lastWide == null) 0
          else {
            val v = lastWide.get(Character.valueOf(bj))
            if (v == null) 0 else v.intValue
          }
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      if (ai < 256) lastAscii(ai) = i
      else {
        if (lastWide == null) lastWide = new java.util.HashMap[Character, Integer]()
        lastWide.put(Character.valueOf(ai), Integer.valueOf(i))
      }
      i += 1
    }
    d((n + 1) * w + m + 1)
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
