package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup (1 word)
    (3L, "completely different content about spark engines and shuffles"),
    (4L, "spark engines and shuffles completely different content about") // perm of 3
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per content") {
    val r = Dedup.exact(docs).collect()
    assert(r.length === 4)
    val dup = r.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 0L)
  }

  test("containment surfaces a subset document that jaccard misses") {
    val subset = Seq(
      (0L, "a b c d e f g h i j k l"), // 10 trigram shingles
      (1L, "a b c d e"),               // 3 shingles, all inside doc 0
      (2L, "x y z q r s")              // unrelated
    ).toDF("doc_id", "text")
    // every shingle of doc 1 appears in doc 0: containment = 1.0
    val c = Dedup.containmentPairs(subset, threshold = 0.99).collect()
    assert(c.length === 1)
    assert((c.head.getAs[Long]("id_a"), c.head.getAs[Long]("id_b")) === ((0L, 1L)))
    assert(c.head.getAs[Double]("containment") === 1.0)
    // but jaccard = 3 / (10 + 3 - 3) = 0.3 — the symmetric screen
    // misses the embedded document entirely at any usual threshold
    assert(Dedup.ngramJaccardPairs(subset, threshold = 0.8).collect().isEmpty)
    // containment >= jaccard on every surfaced pair (C uses min, J union)
    val all = Dedup.containmentPairs(docs, threshold = 0.0).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("containment")).toMap
    Dedup.ngramJaccardPairs(docs, threshold = 0.0).collect().foreach { r =>
      val key = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(all(key) >= r.getAs[Double]("jaccard") - 1e-12, s"pair $key")
    }
  }

  test("minhash LSH surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.minHashCandidatePairs(docs, numHashes = 8, bandSize = 2, shingleLen = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(exact.exists(_._3 === 1.0))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L)) // near dup banded
    assert(!pairs.exists(p => p._2 == 3L && p._1 < 3L && p._1 != 4L ||
      p._1 == 3L && p._2 != 4L))
  }

  test("fastDigest (xxhash64) production path finds the same exact dups") {
    // exact duplicates share ALL shingles, so they collide under any
    // digest; near-dup statistics may differ from the md5 path (not
    // cross-engine portable), but the exact pair must always surface
    val pairs = Dedup.minHashCandidatePairs(docs, numHashes = 8, bandSize = 2,
        shingleLen = 3, digest = Dedup.fastDigest)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard"))).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 === 1.0))
    // deterministic across runs (seedless hash)
    val again = Dedup.minHashCandidatePairs(docs, numHashes = 8, bandSize = 2,
        shingleLen = 3, digest = Dedup.fastDigest)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    assert(again.toSet === pairs.map(p => (p._1, p._2)).toSet)
  }

  test("simhash: identical docs share fingerprints; near dups are close") {
    val sh = Dedup.simHash(docs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("simhash")).toMap
    assert(sh(0L) === sh(1L))
    assert(sh.values.forall(_.length == 8))
    def bits(h: String) = h.flatMap(c => (0 to 3).map(b =>
      (Integer.parseInt(c.toString, 16) >> b) & 1))
    def hamming(a: String, b: String) = bits(a).zip(bits(b)).count(p => p._1 != p._2)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)))
    // token-permutation invariance (bag-of-words hash)
    assert(sh(3L) === sh(4L))
  }

  test("ngram jaccard: exact pair scores 1.0, near pair high, others absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, shingleLen = 3, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.get((0L, 2L)).exists(j => j > 0.5 && j < 1.0))
    assert(!pairs.contains((0L, 3L)))
  }

  test("prefix-filtered jaccard join returns identical pairs to direct join") {
    val direct = Dedup.ngramJaccardPairs(docs, shingleLen = 3, threshold = 0.5,
        strategy = "direct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    val prefixed = Dedup.ngramJaccardPairs(docs, shingleLen = 3, threshold = 0.5,
        strategy = "prefix")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    assert(direct === prefixed)
    assert(direct.nonEmpty)
  }

  /** Zipfian-shaped corpus: three document-universal ("hot") leading
    * shingles, then a long unique tail per pair of near-dup docs —
    * hapax shingles dominate the vocabulary, like real text. */
  private lazy val zipfDocs = {
    val rows = (0 until 30).flatMap { p =>
      val tail = (0 until 6).map(w => s"w${p}_$w").mkString(" ")
      Seq((2L * p, s"the common header $tail"),
          (2L * p + 1, s"the common header $tail extra$p"))
    }
    rows.toDF("doc_id", "text")
  }

  test("adaptive strategy picks prefix on zipfian text, direct on uniform vocab") {
    def probe(d: org.apache.spark.sql.DataFrame) = Dedup.chooseJaccardStrategy(
      Dedup.shingleDocFreq(d.select($"doc_id".as("id"),
        explode(array_distinct(Text.wordShingles($"text", 3))).as("s"))))
    assert(probe(zipfDocs)) // hapax-dominated → prefix
    // uniform tiny vocabulary: every doc is the same 9 words → every
    // shingle's df equals the doc count → direct
    val uniform = (0L until 40L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    assert(!probe(uniform))
  }

  test("on zipfian text the prefix path prunes candidates and matches direct output") {
    val sh = zipfDocs.select($"doc_id".as("id"),
      explode(array_distinct(Text.wordShingles($"text", 3))).as("s")).cache()
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // candidate volume: direct join enumerates sum(df*(df-1)/2) pairs
    // (hot shingles quadratic); the prefix join must beat it
    val directPairs = Dedup.shingleDocFreq(sh)
      .select(sum($"df" * ($"df" - 1) / 2).cast("long")).first().getLong(0)
    val prefixPairs = Dedup.prefixCandidates(sh, counts, 0.5).count()
    assert(prefixPairs < directPairs / 10,
      s"prefix generated $prefixPairs candidates vs $directPairs direct")
    val direct = Dedup.ngramJaccardPairs(zipfDocs, shingleLen = 3, threshold = 0.5,
        strategy = "direct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    val adaptive = Dedup.ngramJaccardPairs(zipfDocs, shingleLen = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    assert(adaptive === direct)
    assert(adaptive.size >= 30) // every (2p, 2p+1) near-dup pair found
  }

  test("one-permutation signatures: full slots via densification, duplicate collision") {
    // tiny docs (4 words → 2 trigram shingles) leave most of the 8
    // bins empty — rotation densification must still fill every slot
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact duplicate of 1
      (3L, "epsilon zeta eta theta iota kappa"),
      (4L, "completely different words here entirely now"))
      .toDF("doc_id", "text")
    val sig = Dedup.ophSignaturesWide(docs, numHashes = 8, shingleLen = 3)
    val rows = sig.collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      (1 to 8).foreach(i => assert(!r.isNullAt(i), s"slot ${i - 1} null: $r"))
    }
    val pairs = Dedup.ophCandidatePairs(docs, numHashes = 8, bandSize = 2, shingleLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L)) // disjoint text stays out
  }

  test("connected components: chains collapse, separate clusters stay apart") {
    // two components: a 5-node chain 1-2-3-4-5 (needs multiple
    // propagation rounds) and a 2-clique 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert((1L to 5L).forall(cc(_) == 1L))
    assert(cc(10L) === 10L && cc(11L) === 10L)
    val surv = Dedup.clusterSurvivors(Dedup.connectedComponents(pairs)).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("cluster_size"))).toSet
    assert(surv === Set((1L, 1L, 5L), (10L, 10L, 2L)))
  }

  test("connected components: star rounds are logarithmic in chain length") {
    // a 1,000-node chain is the adversarial diameter case (crawl
    // mirrors): per-hop label propagation needs ~1,000 rounds; the
    // large-star/small-star alternation must collapse it in O(log n)
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(chain, "id_a", "id_b", maxIter = 50)
    assert(rounds <= 15, s"1,000-node chain took $rounds star rounds")
    val cc = labels.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
    assert(cc.length === 1000)
    assert(cc.forall(_._2 == 0L))
  }

  test("connected components: superseded checkpoint blocks are released eagerly") {
    val sc = spark.sparkContext
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = sc.getPersistentRDDs.keySet
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(chain, "id_a", "id_b", maxIter = 50)
    assert(rounds >= 3) // multiple superseded rounds actually existed
    // every superseded round's localCheckpoint blocks must be gone NOW
    // (explicit release), not whenever the ContextCleaner gets to them;
    // only the returned labels' cache may remain
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"lingering persistent RDDs: $leaked")
    assert(labels.count() === 301)
    labels.unpersist()
  }

  test("connected components: one convergence action per round (actions bounded)") {
    // the observable for "driver round-trips per round" is ACTIONS —
    // distinct SQL execution ids — not raw jobs (AQE splits one action
    // into a job per materialized query stage)
    val sc = spark.sparkContext
    val executions = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var rddJobs = 0 // jobs with no SQL execution (RDD actions)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val id = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        id match {
          case Some(e) => executions.add(e); ()
          case None    => rddJobs += 1
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(chain, "id_a", "id_b", maxIter = 50)
      labels.unpersist()
      // listener delivery is async: wait for the counts to stabilize
      var last = (-1, -1)
      var stable = 0
      while (stable < 4) { // 4 × 50ms with no new events
        Thread.sleep(50)
        val cur = (executions.size, rddJobs)
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      // per round: 1 eager-checkpoint action + 1 single-action
      // convergence test; plus the initial test and the final label
      // materialization. The OLD two-action test ran 3/round.
      val actions = executions.size + rddJobs
      val bound = 2 * rounds + 4
      assert(actions <= bound,
        s"$actions driver actions for $rounds rounds (bound $bound)")
    } finally sc.removeSparkListener(listener)
  }

  test("dedupClusters: survivors aggregate the same component frame") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val (components, survivors) = Dedup.dedupClusters(pairs)
    val cc = components.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert((1L to 5L).forall(cc(_) == 1L) && cc(10L) === 10L && cc(11L) === 10L)
    val surv = survivors.collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("cluster_size"))).toSet
    assert(surv === Set((1L, 1L, 5L), (10L, 10L, 2L)))
  }

  test("local union-find and distributed star rounds label identically") {
    // mixed shapes: two chains, a triangle with a chord, isolated
    // self-loop, and a star — plus duplicate/reversed edges
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L), (20L, 22L),
      (30L, 30L),
      (40L, 41L), (40L, 42L), (40L, 43L), (43L, 40L))
      .toDF("id_a", "id_b")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    val local = toMap(Dedup.connectedComponents(pairs)) // under threshold
    val dist = toMap(Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b", 50)._1)
    assert(local === dist)
    assert(local(5L) === 1L && local(12L) === 10L && local(22L) === 20L)
    assert(local(30L) === 30L && local(43L) === 40L)
    // forcing the distributed path through the public API must agree too
    spark.conf.set("spark.graft.cc.localThreshold", "0")
    try assert(toMap(Dedup.connectedComponents(pairs)) === local)
    finally spark.conf.unset("spark.graft.cc.localThreshold")
  }

  test("connected components: empty pair set yields empty labels, no NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
    assert(Dedup.clusterSurvivors(Dedup.connectedComponents(empty)).count() === 0)
  }

  test("fingerprint is word-order and duplication insensitive") {
    val fp = docs.select($"doc_id", Text.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(3L) === fp(4L))
    assert(fp(0L) !== fp(3L))
  }
}
