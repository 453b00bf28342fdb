package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst `Expression`
  * with `doGenCode` — the fuzzy-matching scorer for entity resolution
  * that Spark has no builtin for (it ships `levenshtein` only), kept
  * inside whole-stage codegen instead of paying UDF serialization on
  * every candidate pair.
  *
  * Semantics are pinned to the standard definition DuckDB's
  * `jaro_winkler_similarity` also implements (verified cell-for-cell by
  * the q225 oracle): match window `max(|a|,|b|)/2 - 1`, transpositions
  * halved, Winkler prefix boost (scale 0.1, prefix capped at 4) applied
  * only when the Jaro score exceeds 0.7, and — matching DuckDB — an
  * EMPTY string scores 0.0 against anything, including another empty.
  * NULL in → NULL out.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.StringType &&
        right.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Java-callable kernel shared by the interpreted and generated
    * paths. Two linear-ish passes over char arrays, zero allocation
    * beyond the two match-flag arrays. */
  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // DuckDB convention: "" scores 0 vs ""
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b)))

  /** SQL registration: SELECT jaro_winkler(a, b). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
}
