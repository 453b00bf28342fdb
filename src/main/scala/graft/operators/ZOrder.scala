package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities — the multi-dimensional data-layout
  * primitive behind file-level data skipping at lake scale.
  *
  * A table sorted by one column prunes scans only on that column; a
  * table laid out by the interleaved bits of TWO (or more) columns
  * keeps every file's min/max bounding box tight in BOTH dimensions,
  * so a rectangle predicate prunes most files no matter which
  * dimension it constrains (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * layout, Morton 1966). Nothing here is engine magic: the z-value is
  * pure integer bit arithmetic, computed per row inside whole-stage
  * codegen, and "layout" is just sort-or-bucket by that value — which
  * is exactly why it works unchanged on a 1000-executor writer: a
  * `repartitionByRange(zvalue)` write produces the skip-friendly files
  * without any coordination beyond the range exchange.
  *
  * Everything is exact integer arithmetic (shift/mask on longs), so a
  * SQL oracle replays it with `>>`/`&`/`div` bit-for-bit.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. The
    * result covers [0, 4^bits). Codegen-friendly: a fixed sum of
    * shift/mask terms, no UDF, no loop at runtime. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** Quantize a non-negative offset (`c - min`) onto [0, buckets) given
    * the inclusive span `max - min + 1`: floor(offset·buckets / span)
    * in EXACT decimal arithmetic (a double division would wobble past
    * 2^53 — real lake key spaces get there; decimal ÷ is the same
    * integral-division semantics DuckDB's `div` gives the oracle). */
  def quantize(offset: Column, span: Column, buckets: Int): Column =
    floor((offset.cast("decimal(38,0)") * lit(buckets.toLong)) /
      span.cast("decimal(38,0)")).cast("long")
}
