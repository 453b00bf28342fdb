package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling hash of a string's code points:
  * fold (acc * BASE + codepoint) mod MOD — the classic document
  * fingerprint. Native Catalyst expression with codegen; constants are
  * chosen so the fold never overflows a signed 64-bit integer
  * (acc < MOD ≈ 1e15, acc*31 + cp < 3.2e16 ≪ 2^63), which makes the
  * arithmetic portable — the DuckDB oracle reproduces it with
  * list_reduce over unicode code points. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    RollingHash.hash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 31L
  val Mod = 1000000000000037L // < 2^50: Base*Mod + codepoint stays in Long

  /** Java-callable kernel shared by interpreted and generated paths.
    * Iterates Unicode code points (matches DuckDB's unicode()). */
  def hash(s: String): Long = {
    var acc = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) acc = (acc * Base + it.nextInt()) % Mod
    acc
  }

  def rollingHash(c: Column): Column = bridge.column(RollingHash(bridge.expression(c)))
}
