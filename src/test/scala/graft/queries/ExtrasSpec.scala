package graft.queries

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("KMV distinct estimate is within sketch error bounds of exact") {
    val exact = Extras.q33DistinctExact.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Extras.q34DistinctApprox.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === approx.keySet)
    // KMV with k=64 has rsd ≈ 1/√(k−2) ≈ 12.7%; 4σ bound (and exact
    // below k by construction)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      if (n < 64) assert(a === n.toDouble, s"$k: sub-k group must be exact")
      else assert(math.abs(a - n) <= n * 0.51, s"$k: kmv $a vs exact $n")
    }
  }

  test("engine-native HLL alternate stays within its rsd of exact") {
    import org.apache.spark.sql.functions._
    val exact = Extras.q33DistinctExact.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hll = graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("n_users_approx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === hll.keySet)
    exact.foreach { case (k, n) =>
      val a = hll(k)
      assert(math.abs(a - n) <= math.max(3.0, n * 0.1),
        s"$k: approx $a vs exact $n")
    }
  }

  test("full outer covers keys present on only one side") {
    // sf0.01: custkeys 0..1499 but user_ids only 0..149 ⇒ orders-only
    // keys must appear with zero events
    val rows = Extras.q18FullOuter.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.exists(r => r.getLong(2) == 0L)) // orders-only key
    assert(rows.exists(r => r.getLong(1) > 0L && r.getLong(2) > 0L))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }
}
