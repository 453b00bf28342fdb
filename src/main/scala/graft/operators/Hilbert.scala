package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert space-filling curve index, as pure Column arithmetic.
  *
  * Like the Z-curve ([[ZOrder]]), the Hilbert curve linearizes a 2-D
  * grid so range-partitioning the index co-locates spatially-near rows
  * into the same files — the layout decision behind multi-dimensional
  * data skipping. Hilbert improves on Z-order for clustering: every
  * consecutive pair of cells is grid-adjacent (the curve never jumps),
  * so a contiguous index range is a tighter rectangle than the Z
  * curve's (whose big-bit transitions teleport across the grid).
  * Delta/Iceberg compaction services offer exactly this pair of
  * layouts; the q185 gate query audits the bbox win empirically.
  *
  * The xy→d mapping is the classic iterative algorithm: for each bit
  * level s from `order-1` down to 0, accumulate the quadrant's
  * contribution and rotate the coordinate frame. All steps are integer
  * shifts, masks, and conditionals — whole-stage-codegen'd end to end,
  * no UDF.
  *
  * Two forms, same values: [[hindex]] builds ONE Column whose tree
  * doubles per level (each rotation references the previous x and y
  * twice) — fine for coarse grids (order ≤ 6), exponential beyond.
  * [[withHindex]] names each level's (x, y, d) as real projection
  * columns, so the plan grows LINEARLY with order — the form for
  * fine-grained file grids (order 10–16) at warehouse scale, and what
  * q185 uses.
  *
  * Scale path: `df.repartitionByRange(n, hindex)` +
  * `sortWithinPartitions(hindex)` on the writer — one range exchange,
  * identical topology to the Z-order writer.
  */
object Hilbert {

  /** Hilbert distance of cell (x, y) on a 2^order × 2^order grid.
    * Both inputs must already be quantized to [0, 2^order). */
  def hindex(x: Column, y: Column, order: Int): Column = {
    require(order >= 1 && order <= 31, s"order $order out of range")
    // iterate levels from the top bit down; (xc, yc, d) carried through.
    // The rotation reflects within the FULL grid (n-1-coord): bits above
    // the current level are never re-read at lower levels, so flipping
    // them is harmless, and the lower bits get exactly the sub-square
    // reflection the curve needs (the classic xy2d formulation).
    val n = 1L << order
    var xc = x.cast("long")
    var yc = y.cast("long")
    var d = lit(0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = when((xc.bitwiseAND(lit(s))) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when((yc.bitwiseAND(lit(s))) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s) * lit(s) * ((lit(3L) * rx).bitwiseXOR(ry))
      // rotate quadrant: if ry == 0 { if rx == 1 { reflect }; swap x/y }
      val xr = when(ry === 0,
        when(rx === 1, lit(n - 1) - yc).otherwise(yc)).otherwise(xc)
      val yr = when(ry === 0,
        when(rx === 1, lit(n - 1) - xc).otherwise(xc)).otherwise(yc)
      xc = xr
      yc = yr
      s >>= 1
    }
    d
  }

  /** Append Hilbert distance of (`x`, `y`) as column `out`, carrying
    * each bit level's state through NAMED intermediate columns —
    * Catalyst keeps multiply-referenced non-cheap aliases as separate
    * projections (CollapseProject's duplication guard), so the plan is
    * O(order), not O(2^order). Intermediates are dropped before
    * return. */
  def withHindex(df: DataFrame, x: Column, y: Column, order: Int,
                 out: String): DataFrame = {
    require(order >= 1 && order <= 31, s"order $order out of range")
    val n = 1L << order
    var cur = df
      .withColumn("__h_x", x.cast("long"))
      .withColumn("__h_y", y.cast("long"))
      .withColumn(out, lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = when(col("__h_x").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("__h_y").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("__h_rx", rx)
        .withColumn("__h_ry", ry)
        .withColumn(out, col(out) +
          lit(s) * lit(s) * ((lit(3L) * col("__h_rx")).bitwiseXOR(col("__h_ry"))))
        .withColumn("__h_xn", when(col("__h_ry") === 0,
          when(col("__h_rx") === 1, lit(n - 1) - col("__h_y"))
            .otherwise(col("__h_y"))).otherwise(col("__h_x")))
        .withColumn("__h_yn", when(col("__h_ry") === 0,
          when(col("__h_rx") === 1, lit(n - 1) - col("__h_x"))
            .otherwise(col("__h_x"))).otherwise(col("__h_y")))
        .withColumn("__h_x", col("__h_xn"))
        .withColumn("__h_y", col("__h_yn"))
      s >>= 1
    }
    cur.drop("__h_x", "__h_y", "__h_xn", "__h_yn", "__h_rx", "__h_ry")
  }

  /** Reference scalar implementation (specs only — pins the Column
    * version against the textbook algorithm and the curve's adjacency
    * invariant). */
  private[graft] def hindexScalar(x0: Long, y0: Long, order: Int): Long = {
    val n = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
