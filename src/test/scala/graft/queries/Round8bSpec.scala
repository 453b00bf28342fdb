package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-8 second wave: properties of the graph/eval/quantization/
  * filtering additions that the DuckDB replay can't distinguish from
  * a wrong-but-self-consistent implementation — metric identities
  * checked against independent computations, and structural
  * invariants of the outputs. */
class Round8bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q215: distance-0 tier is exactly the seed set") {
    val tiers = Extras.q215ShortestPaths.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nSeeds = graft.Tables.part(spark, dir)
      .filter(col("p_partkey") % 1000 === 0).count()
    assert(tiers(0L) === nSeeds)
    // reached tiers are nonempty and distances contiguous from 0
    assert(tiers.keySet === (0L until tiers.size.toLong).toSet)
  }

  test("q216: undamaged docs score exactly 1.0; damaged docs strictly less") {
    val rows = EvalMetrics.q216BleuEval.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rlen, p1, p2, bleu) =
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p1 > 0 && p1 <= 1.0); assert(p2 > 0 && p2 <= 1.0)
      // rlen <= 6: no 7th token to substitute, no truncation (rlen < 10)
      if (rlen <= 6) assert(bleu === 1.0, s"doc ${r.getLong(0)}")
      // rlen >= 10: truncation guarantees BP < 1, so bleu < 1
      if (rlen >= 10) assert(bleu < 1.0, s"doc ${r.getLong(0)}")
    }
  }

  test("q217: kappa matches an independent Fleiss computation") {
    val out = EvalMetrics.q217LabelAgreement.run(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // re-derive the synthetic labels with plain Scala md5 and compute
    // Fleiss' kappa from first principles, per source
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val labels = docs.flatMap { case (id, src) =>
      (1 to 3).map { a =>
        val noise = h(s"$id:$a")
        val t = id % 3
        val label = if (noise < 3) (t + 1 + noise % 2) % 3 else t
        (src, id, label)
      }
    }
    labels.groupBy(_._1).foreach { case (src, rows) =>
      val items = rows.groupBy(_._2).values.toSeq
      val nItems = items.size.toLong
      val sumsq = items.map { anns =>
        anns.groupBy(_._3).values.map(g => g.size.toLong * g.size).sum
      }.sum
      val a = sumsq - 3 * nItems
      val b = rows.groupBy(_._3).values
        .map(g => g.size.toLong * g.size).sum
      val kappa = (3 * nItems * a - 2 * b).toDouble /
        (2 * (9 * nItems * nItems - b)).toDouble
      val (gotN, gotPbar, gotPe, gotKappa) = out(src)
      assert(gotN === nItems)
      assert(math.abs(gotKappa - kappa) < 1e-6, s"$src: $gotKappa vs $kappa")
      assert(gotPbar > gotPe, s"$src agrees above chance")
    }
  }

  test("q218: codes are in range and errors are nonnegative with real spread") {
    val rows = VectorQueries.q218ProductQuantization.run(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 4)
      assert(r.getLong(2) >= 0 && r.getLong(2) < 4)
      assert(r.getDouble(3) >= -1e-6)
    }
    // quantization is lossy on a real corpus: most errors strictly positive
    assert(rows.count(_.getDouble(3) > 0) > rows.length / 2)
    // both subspaces actually discriminate (more than one code used)
    assert(rows.map(_.getLong(1)).distinct.length > 1)
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  test("q219: terciles are ordered and partition each source's docs") {
    val rows = QualityQueries.q219PerplexityFilter.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.size === 20)
    bySource.foreach { case (src, tiers) =>
      val sorted = tiers.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1L, 2L, 3L), src)
      // tercile sizes differ by at most one
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, src)
      // buckets are ordered ranges: bucket b's min >= bucket b-1's max
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(hi._4 >= lo._5, s"$src: ${hi._4} < ${lo._5}")
      }
    }
  }
}
