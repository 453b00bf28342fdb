package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  /** Dense local replay with the identical quantization discipline —
    * the redundancy check that the distributed explode/join/aggregate
    * path computes the same linear algebra. */
  private def localReplay(rows: Seq[Array[Float]], dims: Int,
      iters: Int): Array[Long] = {
    val n = rows.length.toLong
    val x6 = rows.map(_.map(x => math.round(x.toDouble * 1e6)))
    val s6 = Array.tabulate(dims)(i => x6.map(_(i)).sum)
    val z = x6.map(r => Array.tabulate(dims)(i => n * r(i) - s6(i)))
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var v = Array.fill(dims)(1000000L)
    for (_ <- 1 to iters) {
      val y = z.map(r =>
        (0 until dims).map(i => q((r(i) * v(i)).toDouble / 1e3)).sum)
      val maxY = y.map(math.abs).max
      val y6 = y.map(yy => q(1e6 * (yy.toDouble / maxY.toDouble)))
      val w = Array.tabulate(dims)(i =>
        z.indices.map(r => q((z(r)(i) * y6(r)).toDouble / 1e3)).sum)
      val maxW = w.map(math.abs).max
      v = w.map(ww => q(1e6 * (ww.toDouble / maxW.toDouble)))
    }
    v
  }

  test("distributed power iteration equals the dense local replay") {
    val rnd = new scala.util.Random(7)
    val dims = 12
    val rows = (0 until 300).map(_ =>
      Array.fill(dims)((rnd.nextDouble() - 0.5).toFloat))
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .repartition(8)
    val (got, growth) = PowerIteration.dominantEigenvector(df, dims, iters = 3)
    val want = localReplay(rows, dims, iters = 3)
    assert(got.toSeq === want.toSeq)
    assert(growth.length === 3 && growth.forall(_ > 0))
  }

  test("top-2: planted first AND second axes are recovered, near-orthogonal") {
    val rnd = new scala.util.Random(13)
    val dims = 8
    // variance: dim 2 >> dim 5 >> everything else
    val rows = (0 until 600).map { _ =>
      val base = Array.fill(dims)(((rnd.nextDouble() - 0.5) * 0.04).toFloat)
      base(2) = ((rnd.nextDouble() - 0.5) * 0.9).toFloat
      base(5) = ((rnd.nextDouble() - 0.5) * 0.4).toFloat
      base
    }
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val (v1, v2) = PowerIteration.topTwoEigenvectors(df, dims, iters = 3)
    assert(v1.map(math.abs).zipWithIndex.maxBy(_._1)._2 === 2, v1.mkString(","))
    assert(v2.map(math.abs).zipWithIndex.maxBy(_._1)._2 === 5, v2.mkString(","))
    // near-orthogonality of the quantized pair
    val dot = v1.indices.map(i => v1(i).toDouble * v2(i)).sum
    val n1 = math.sqrt(v1.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(v2.map(x => x.toDouble * x).sum)
    assert(math.abs(dot) / (n1 * n2) < 0.01, (dot / (n1 * n2)).toString)
  }

  test("a planted dominant axis is recovered") {
    val rnd = new scala.util.Random(11)
    val dims = 8
    // variance along dim 2 is ~100x the others
    val rows = (0 until 500).map { _ =>
      val base = Array.fill(dims)(((rnd.nextDouble() - 0.5) * 0.05).toFloat)
      base(2) = ((rnd.nextDouble() - 0.5) * 0.9).toFloat
      base
    }
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val (v6, _) = PowerIteration.dominantEigenvector(df, dims, iters = 3)
    val dominant = v6.map(math.abs).zipWithIndex.maxBy(_._1)._2
    assert(dominant === 2, v6.mkString(","))
    // and it dominates clearly: every other component is small
    v6.zipWithIndex.filter(_._2 != 2).foreach { case (c, i) =>
      assert(math.abs(c) < 300000L, s"dim $i: $c")
    }
  }
}
