package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Operator-level pins for the curation additions (q173-q176):
  * properties the DuckDB gate can't see — plan shape (no nested-loop
  * fallbacks), layout invariance, routing and edge-case semantics. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- EntityResolution -------------------------------------------------

  test("resolve matches within budget, routes past-budget rows with NULLs") {
    val clean = Seq((1L, "alpha-001"), (2L, "alpha-002"), (3L, "bravo-001"))
      .toDF("clean_key", "clean_name")
    val dirty = Seq((10L, "alpha-00X"), // dist 1 → ambiguous, ties to key 1
      (11L, "bravo-001"),               // exact
      (12L, "alpha-ZZZZZ"))             // dist > 2 → unmatched
      .toDF("dirty_id", "dirty_name")
    val out = EntityResolution.resolve(dirty, clean, substring(_, 1, 5), 2)
      .orderBy("dirty_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(2)))).toSeq ==
      Seq((10L, Some(1L)), (11L, Some(3L)), (12L, None)))
    assert(out(0).getLong(3) == 1L && out(1).getLong(3) == 0L)
  }

  test("resolve candidate join is an equi-join, not a nested loop") {
    val clean = Seq((1L, "alpha-001")).toDF("clean_key", "clean_name")
    val dirty = Seq((10L, "alpha-00X")).toDF("dirty_id", "dirty_name")
    val plan = EntityResolution.resolve(dirty, clean, substring(_, 1, 5), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // ---- IntervalJoin -----------------------------------------------------

  private def naiveOverlap(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]) =
    (for {
      (ai, as, ae) <- a; (bi, bs, be) <- b
      if as <= be && bs <= ae
    } yield (ai, bi)).sorted

  test("overlapJoin equals the naive inequality join, exactly once per pair") {
    // deterministic pseudo-random intervals spanning many buckets
    val a = (0L until 200L).map { i =>
      val s = (i * 7919) % 10000; (i, s, s + (i * 31) % 900)
    }
    val b = (0L until 60L).map { i =>
      val s = (i * 104729) % 10000; (i, s, s + (i * 17) % 2500)
    }
    val adf = a.toDF("a_id", "a_start", "a_end")
    val bdf = b.toDF("b_id", "b_start", "b_end")
    val got = IntervalJoin.overlapJoin(adf, bdf, bucketWidth = 500)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(got.toSeq.sorted == naiveOverlap(a, b))
  }

  test("overlapJoin width-1 buckets and huge buckets agree") {
    val a = Seq((1L, 0L, 5L), (2L, 10L, 10L)).toDF("a_id", "a_start", "a_end")
    val b = Seq((1L, 5L, 10L), (2L, 11L, 12L)).toDF("b_id", "b_start", "b_end")
    def pairs(w: Long) = IntervalJoin.overlapJoin(a, b, w)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    // touching endpoints overlap (closed intervals); disjoint don't
    assert(pairs(1) == Seq((1L, 1L), (2L, 1L)))
    assert(pairs(1) == pairs(1000000))
  }

  test("overlapJoin plans an equi-join on the bucket, no nested loop") {
    val a = Seq((1L, 0L, 5L)).toDF("a_id", "a_start", "a_end")
    val b = Seq((1L, 5L, 10L)).toDF("b_id", "b_start", "b_end")
    val plan = IntervalJoin.overlapJoin(a, b, 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // ---- KMeans -----------------------------------------------------------

  private val vecs = (0 until 40).map { i =>
    (i.toLong, Array((i % 4).toFloat, (i / 10).toFloat))
  }

  test("kmeans fit+assign is invariant to input layout") {
    val base = vecs.toDF("vec_id", "embedding")
    val shuffled = base.orderBy(md5(col("vec_id").cast("string"))).repartition(7)
    def labels(df: org.apache.spark.sql.DataFrame) = {
      val cents = KMeans.fit(df, k = 3, iters = 2)
      KMeans.assign(df, cents).select("vec_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    }
    assert(labels(base) == labels(shuffled))
  }

  test("kmeans assignment ties break to the lower cluster id") {
    val df = Seq((0L, Array(0f, 0f)), (1L, Array(2f, 0f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    // seeds at x=0 and x=2; x=1 is equidistant → cluster 0
    val cents = KMeans.fit(df, k = 2, iters = 0)
    val got = KMeans.assign(df, cents).filter(col("vec_id") === 2)
      .select("cluster").head().getInt(0)
    assert(got == 0)
  }

  test("kmeans drops emptied clusters, keeps surviving ids stable") {
    // duplicate seed vectors: every row ties toward cluster 0, so
    // cluster 1 empties on the first update and must drop out
    val df = (Seq((0L, Array(0f, 0f)), (1L, Array(0f, 0f))) ++
      (2 until 10).map(i => (i.toLong, Array(i.toFloat, 0f)))
      ).toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, k = 2, iters = 1)
    assert(cents.map(_._1).toSeq == Seq(0))
    // assignment against the surviving centroid still labels all rows
    assert(KMeans.assign(df, cents).select("cluster")
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("kmeans assignment is a narrow projection (no join, no explode)") {
    val df = vecs.toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, k = 3, iters = 1)
    val plan = KMeans.assign(df, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate"), plan)
  }
}
