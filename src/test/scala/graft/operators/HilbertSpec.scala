package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("order-1 curve matches the textbook quadrant order") {
    // (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    assert(Hilbert.hindexScalar(0, 0, 1) === 0)
    assert(Hilbert.hindexScalar(0, 1, 1) === 1)
    assert(Hilbert.hindexScalar(1, 1, 1) === 2)
    assert(Hilbert.hindexScalar(1, 0, 1) === 3)
  }

  test("order-4 curve is a bijection whose consecutive cells are grid-adjacent") {
    val n = 16
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong, Hilbert.hindexScalar(x, y, 4))
    // bijection onto [0, 256)
    assert(cells.map(_._3).sorted === (0L until 256L))
    // the defining Hilbert property: d and d+1 are Manhattan-distance 1
    val byD = cells.map(c => c._3 -> (c._1, c._2)).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d=$d ($x1,$y1) and ${d + 1} ($x2,$y2)")
    }
  }

  test("Column implementation equals the scalar reference on the full grid") {
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = grid.withColumn("d", Hilbert.hindex(col("x"), col("y"), 4))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d === Hilbert.hindexScalar(x, y, 4), s"($x,$y)")
    }
  }

  test("withHindex (linear-size plan) equals the scalar reference at order 8") {
    // 256x256 grid — the nested single-Column form would be a ~2^8-node
    // expression tree here; the named-intermediate form stays O(order).
    // Sample a diagonal band plus the corners rather than all 65k cells.
    val pts = ((0 until 256).map(i => (i.toLong, ((i * 37) % 256).toLong))
      ++ Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))).toDF("x", "y")
    val got = Hilbert.withHindex(pts, col("x"), col("y"), 8, "d")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) =>
      assert(d === Hilbert.hindexScalar(x, y, 8), s"($x,$y)")
    }
  }

  test("contiguous Hilbert ranges have tighter bboxes than Z-order ranges") {
    // At power-of-4-ALIGNED run sizes (16, 32) both curves tile the
    // grid into identical rectangles — the Z curve's weakness only
    // shows when a run straddles a high-bit transition, where Z
    // teleports across the grid while Hilbert steps to an adjacent
    // cell. 24-cell runs (not 4^k-aligned) expose it: Hilbert max
    // span 10 vs Z-order 20 on this grid.
    def spans(index: (Long, Long) => Long): Seq[Long] = {
      val cells = for (x <- 0L until 16L; y <- 0L until 16L)
        yield (index(x, y) / 24, x, y)
      cells.groupBy(_._1).values.map { g =>
        val xs = g.map(_._2); val ys = g.map(_._3)
        (xs.max - xs.min) + (ys.max - ys.min)
      }.toSeq
    }
    // scalar Z-interleave, same bit convention as ZOrder.zvalue / the
    // q177 oracle: x on even bit positions, y on odd
    def zScalar(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val h = spans(Hilbert.hindexScalar(_, _, 4))
    val z = spans(zScalar(_, _, 4))
    assert(h.max < z.max, s"hilbert spans $h vs zorder $z")
  }
}
