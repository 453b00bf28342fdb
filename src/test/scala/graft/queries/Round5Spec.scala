package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Round-5 operators: bloom-prefiltered semi-join, C4-style span dedup,
  * n-gram novelty. Each test pins the property the oracle can't see —
  * the bloom prefilter's superset-then-exact contract, first-occurrence
  * conservation, and the novelty boundary conditions. */
class Round5Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q124: bloom prefilter passes a superset, exact semi-join restores equality") {
    val keep = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select("o_orderkey")
    val li = Tables.lineitem(spark, dir)
    val bf = keep.agg(
      graft.functions.Bloom.filterAgg(xxhash64(col("o_orderkey")), 20000L, 160000L)
        .as("bf"))
    val prefiltered = li
      .where(graft.functions.Bloom.mightContain(bf, xxhash64(col("l_orderkey"))))
    val exact = li.join(keep, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val nAll = li.count()
    val nPre = prefiltered.count()
    val nExact = exact.count()
    // no false negatives (superset) and genuine pruning before the shuffle
    assert(nPre >= nExact, "bloom dropped a true match")
    assert(nPre < nAll, "bloom pruned nothing — filter is pass-through")
    // the full query is bit-identical to the plain semi-join aggregate
    val viaBloom = Relational.q124BloomSemiJoin.run(spark, dir).collect()
    val viaExact = exact.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(viaBloom.toSeq === viaExact.toSeq)
    // SQL surface: the injected functions resolve from SQL text with a
    // scalar-subquery bloom argument (the form might_contain requires)
    keep.createOrReplaceTempView("r5_keep")
    li.createOrReplaceTempView("r5_li")
    val sqlPre = spark.sql(
      """SELECT count(*) FROM r5_li WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(o_orderkey), 20000L, 160000L) FROM r5_keep),
        |  xxhash64(l_orderkey))""".stripMargin).collect()(0).getLong(0)
    assert(sqlPre === nPre)
  }

  test("q122: exactly one span per distinct content survives, counts conserve") {
    val out = TextQueries.q122SpanDedup.run(spark, dir)
    val rows = out.collect()
    // kept ≤ total per doc; fractions in (0, 1]
    rows.foreach { r =>
      val (nSpans, nKept) = (r.getLong(1), r.getLong(2))
      assert(nKept >= 0 && nKept <= nSpans, s"doc ${r.getLong(0)}")
      val frac = r.getDouble(4)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // conservation: total kept spans == number of distinct span contents
    val span = 16
    val toks = graft.functions.Text.tokens(col("text"))
    val distinctSpans = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n_sp",
        greatest(lit(1), ceil(size(col("t")) / lit(span.toDouble)).cast("int")))
      .select(explode(sequence(lit(0), col("n_sp") - 1)).as("i"), col("t"))
      .select(md5(array_join(slice(col("t"), col("i") * span + 1, lit(span)), " ")).as("h"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum === distinctSpans)
  }

  test("q125: bigram LM bounds — one bigram per adjacent pair, ppl = exp(nll)") {
    val rows = QualityQueries.q125BigramLogprob.run(spark, dir).collect()
    val nToks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(graft.functions.Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === nToks(r.getLong(0)) - 1L, "n_bigrams must be n_tokens - 1")
      assert(r.getDouble(2) > 0.0, "self-scored corpus still surprises (interpolation)")
      assert(r.getDouble(3) >= 1.0, "perplexity below 1 is impossible")
    }
  }

  test("q125: single-token documents contribute no bigrams instead of crashing") {
    // sequence(1, 0) steps DOWNWARD and element_at(t, 0) throws — the
    // guard must turn degenerate docs into zero bigram rows (regression
    // for a crash the 10..99-token testdata never exercises)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q125_edge").toString
    try {
      Seq((1L, "solo", "en", "srcX", 4L),
          (2L, "", "en", "srcX", 0L),
          (3L, "three word doc", "en", "srcX", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = QualityQueries.q125BigramLogprob.run(spark, tmp).collect()
      assert(rows.map(_.getLong(0)).toSet === Set(3L),
        "only the multi-token doc has bigrams")
      assert(rows(0).getLong(1) === 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q126: compaction yields one latest row per user") {
    val ev = Tables.events(spark, dir)
    val rows = Extras.q126CdcCompaction.run(spark, dir).collect()
    assert(rows.length === ev.select("user_id").distinct().count().toInt)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // the reported last_ts is the max event second for that user
    val maxTs = ev.groupBy("user_id").agg(max(unix_timestamp(col("ts"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) === maxTs(r.getLong(0))))
  }

  test("q127: attribution partitions the user base; conversion bounded") {
    val rows = Extras.q127FirstTouch.run(spark, dir).collect()
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers, "every user attributed exactly once")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q128: constraint report flags the two planted business-rule breaches only") {
    val rows = Extras.q128ConstraintCheck.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(rows.keySet === Set("orderkey_not_null", "orderkey_unique",
      "totalprice_le_100k", "orderdate_before_2000", "status_in_domain", "custkey_fk"))
    // integrity constraints hold on the synthetic data
    Seq("orderkey_not_null", "orderkey_unique", "status_in_domain", "custkey_fk")
      .foreach { c => assert(rows(c) === ((0L, 1)), s"$c should pass") }
    // the business rules genuinely fail (violations counted, flag 0)
    Seq("totalprice_le_100k", "orderdate_before_2000").foreach { c =>
      assert(rows(c)._1 > 0 && rows(c)._2 === 0, s"$c should fail with counts")
    }
  }

  test("q129: pagerank mass bounded below by teleport, every graph node ranked") {
    val rows = Extras.q129PagerankCopurchase.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "degree 0 node cannot be in the edge list")
      assert(r.getDouble(2) >= 0.15, "rank below the teleport floor is impossible")
    }
    // symmetrized-graph invariant: total mass stays near node count
    // (exactly conserved only at the fixed point; 3 iterations from
    // uniform start keeps it within a loose band)
    val n = rows.length.toDouble
    val mass = rows.map(_.getDouble(2)).sum
    assert(mass > 0.5 * n && mass < 1.5 * n, s"mass $mass drifted from n=$n")
  }

  test("q130: melt triples the row count, one output row per metric") {
    val nLi = Tables.lineitem(spark, dir).count()
    val rows = Extras.q130UnpivotStats.run(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("discount", "extendedprice", "quantity"))
    rows.foreach(r => assert(r.getLong(1) === nLi))
  }

  test("q132: sketch set-op estimates land within sketch error of exact") {
    val r = Extras.q132KmvSetOps.run(spark, dir).collect()(0)
    val (estU, estI) = (r.getDouble(1), r.getDouble(4))
    val (exU, exI) = (r.getLong(5), r.getLong(6))
    assert(r.getLong(2) <= 128, "sketch agreement can't exceed k")
    val j = r.getDouble(3)
    assert(j >= 0.0 && j <= 1.0)
    // KMV rsd ≈ 1/√(k−2) ≈ 8.9% at k=128; allow ~4σ, intersection
    // compounds two estimates so gets double the band. Sub-k sides are
    // exact by construction, so the bands only matter when estimating.
    assert(math.abs(estU - exU) <= math.max(8.0, 0.36 * exU),
      s"union est $estU vs exact $exU")
    assert(math.abs(estI - exI) <= math.max(8.0, 0.72 * exI),
      s"intersection est $estI vs exact $exI")
  }

  test("q135: diff classes match the planted mutation exactly") {
    val o = Tables.orders(spark, dir)
    val nAll = o.count()
    val nRemoved = o.filter(col("o_orderkey") % 13 === 0).count()
    val nModified = o.filter(col("o_orderkey") % 13 =!= 0 &&
      col("o_orderkey") % 7 === 0).count()
    val got = Extras.q135TableDiff.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) === nRemoved)
    assert(got.getOrElse("modified", 0L) === nModified)
    assert(got.getOrElse("unchanged", 0L) === nAll - nRemoved - nModified)
    assert(!got.contains("added"), "mutation never adds keys")
  }

  test("q134: regression covers every event, coefficients finite") {
    val rows = Extras.q134GroupwiseRegression.run(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, dir).count())
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
      val c = r.getDouble(4)
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("q136: transition rows sum to n_events - n_users; each matrix row to 1") {
    val rows = Extras.q136EventTransitions.run(spark, dir).collect()
    val ev = Tables.events(spark, dir)
    val expectedPairs = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expectedPairs,
      "every consecutive pair within a user contributes exactly one transition")
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"row $prev sums to $total")
    }
  }

  test("q137: TWAP stays inside each user's value range, horizon positive") {
    val rows = Extras.q137TimeWeightedAvg.run(spark, dir).collect()
    val bounds = Tables.events(spark, dir).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      assert(r.getLong(2) > 0, "zero horizon means duplicate timestamps everywhere")
      val twap = r.getDouble(3)
      assert(twap >= lo - 1e-9 && twap <= hi + 1e-9,
        s"user ${r.getLong(0)}: twap $twap outside [$lo, $hi]")
    }
  }

  test("q138: rolling median is an actual window member, frames bounded at 7") {
    val rows = Extras.q138RollingMedian.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1 -> r._2).toMap
    val days = rows.map(_._1).sorted
    rows.foreach { case (day, _, nDays, med) =>
      assert(nDays >= 1 && nDays <= 7)
      // lower median must be one of the frame's daily revenues
      val frame = days.filter(d => d <= day &&
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(d), java.time.LocalDate.parse(day)) <= 6)
        .map(byDay)
      assert(frame.contains(med), s"$day: median $med not in frame $frame")
    }
  }

  test("q139: shared-substring fractions bounded; exact duplicate docs fully shared") {
    val rows = TextQueries.q139SubstringRepeats.run(spark, dir).collect()
    assert(rows.length === Tables.documents(spark, dir).count().toInt)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    // docs with byte-identical text (the corpus plants exact dups) must
    // report every window shared
    val dupIds = Tables.documents(spark, dir)
      .groupBy("text").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(explode(col("ids")).as("doc_id")).collect().map(_.getLong(0)).toSet
    if (dupIds.nonEmpty) {
      rows.filter(r => dupIds.contains(r.getLong(0)))
        .foreach(r => assert(r.getDouble(3) === 1.0,
          s"doc ${r.getLong(0)} is an exact dup but not fully shared"))
    }
  }

  test("q140: support/lift bounds and pair symmetry source") {
    val rows = Extras.q140BasketLift.run(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10, "5 types -> at most C(5,2) pairs")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs are ordered once")
      val support = r.getDouble(3)
      assert(support > 0.0 && support <= 1.0)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("q123: the earliest document is fully novel, ratios bounded") {
    val rows = TextQueries.q123NgramNovelty.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) === 1.0, "doc with smallest doc_id must be 100% novel")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // novelty must actually discriminate on this repetitive corpus
    assert(rows.exists(_.getDouble(3) < 1.0), "no shingle reuse found — suspicious")
  }
}
