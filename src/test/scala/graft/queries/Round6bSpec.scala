package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 continuation: retrieval, attribution, privacy, and
  * link-analysis additions (q169-q172). Each test pins a property the
  * DuckDB hash-gate can't express — conservation laws, independent
  * local recomputation — rather than re-running the oracle SQL. */
class Round6bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q169: BM25 ranks are contiguous and every hit contains a probe term") {
    val rows = MlPrep.q169Bm25Retrieval.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    val probeTerms = Map(
      1L -> Set("spark", "join"),
      2L -> Set("window", "agg", "stream"),
      3L -> Set("hash", "table"))
    val docText = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byQuery.foreach { case (qid, hits) =>
      // ranks 1..k contiguous, scores non-increasing, all positive
      assert(hits.map(_.getLong(1)).sorted.toSeq === (1L to hits.length).toSeq)
      val ordered = hits.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
      assert(ordered.forall(_ > 0.0))
      // every retrieved doc really contains at least one probe term
      hits.foreach { h =>
        val toks = docText(h.getLong(2)).trim.split("\\s+").toSet
        assert(toks.intersect(probeTerms(qid)).nonEmpty)
      }
    }
  }

  test("q170: attributed value is conserved across channels") {
    val r = Extras.q170LinearAttribution.run(spark, dir).collect().head
    val credited = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
    val totalPurchase = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum("value")).collect().head.getDouble(0)
    // three independently-rounded(4) sums vs one raw sum
    assert(math.abs(credited - totalPurchase) < 1e-3)
    assert(r.getLong(1) <= r.getLong(0)) // n_direct <= n_purchases
  }

  test("q171: l-diversity bounds are internally consistent") {
    val r = Extras.q171LDiversity.run(spark, dir).collect().head
    val nCustomers = graft.Tables.customer(spark, dir).count()
    assert(r.getLong(0) > 0 && r.getLong(1) >= 1)
    assert(r.getLong(2) <= r.getLong(0)) // classes_below_l <= n_classes
    assert(r.getLong(3) <= nCustomers)   // rows_at_risk <= all rows
    val share = r.getDouble(4)
    assert(share >= 0.0 && share <= 1.0)
    assert(math.abs(share - r.getLong(3).toDouble / nCustomers) < 1e-5)
  }

  test("q172: HITS matches a driver-local recomputation at sf0.001") {
    val result = Extras.q172HitsAuthorities.run(spark, dir).collect()
    assert(result.nonEmpty)
    // independent local recomputation (same rounding schedule)
    val edges = graft.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def norm(m: Map[Long, Double]) = {
      val tot = m.values.sum; val n = m.size
      m.map { case (k, v) => k -> r9(v * n / tot) }
    }
    val a1 = norm(edges.groupBy(_._2).map { case (p, es) => p -> es.size.toDouble })
    val h1 = norm(edges.groupBy(_._1).map { case (c, es) =>
      c -> r9(es.map(e => a1(e._2)).sum) })
    val a2 = norm(edges.groupBy(_._2).map { case (p, es) =>
      p -> r9(es.map(e => h1(e._1)).sum) })
    val top = a2.toSeq.map { case (p, a) => (p, math.rint(a * 1e6) / 1e6) }
      .sortBy { case (p, a) => (-a, p) }.take(20)
    val got = result.map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // driver-local sums run in a different order than Spark's partial
    // aggregates; the 1e-9 snap absorbs all but boundary-straddling
    // ulp noise, so compare at the reported 1e-6 with a 1e-6 tolerance
    assert(top.map(_._1) === got.map(_._1))
    top.zip(got).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-6) }
  }
}
