package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. All hash primitives are
  * md5-based (portable across engines and deterministic across runs —
  * no JVM hashCode, no seed state).
  *
  * Scale design: every operator is shingle-explode → hash-aggregate →
  * key-equi-join — each stage shuffles on a uniformly-distributed hash
  * key, so there is no skew cliff; candidate generation (LSH bands /
  * shared-shingle joins) keeps pair enumeration near-linear instead of
  * the O(n²) all-pairs cross join.
  */
object Dedup {

  /** Salted digest used by MinHash. md5 keeps results reproducible in
    * any engine (the oracle queries rely on it); `fastDigest` swaps in
    * xxhash64 for production runs — ~10× cheaper per shingle with the
    * same min-hash statistics, just not portable across engines. */
  type SaltedDigest = (Int, Column) => Column
  val md5Digest: SaltedDigest = (i, s) => md5(concat(lit(s"$i:"), s))
  val fastDigest: SaltedDigest = (i, s) => xxhash64(lit(i), s)

  /** Exact dedup by raw-text hash: one survivor (min id) per distinct
    * content, with the duplicate count. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Long-format MinHash signatures (id, h — hash index, mh): derived
    * from the wide form by unpivoting, so the digest contract stays in
    * one place. Salting the digest input emulates independent hash
    * permutations portably. */
  def minHashSignatures(docs: DataFrame, numHashes: Int, shingleLen: Int,
                        idCol: String = "doc_id", textCol: String = "text",
                        digest: SaltedDigest = md5Digest): DataFrame = {
    val wide = minHashSignaturesWide(docs, numHashes, shingleLen, idCol, textCol, digest)
    val pairs = (0 until numHashes).map(i =>
      struct(lit(i).as("h"), col(s"h$i").as("mh")))
    wide.select(col("id"), explode(array(pairs: _*)).as("p"))
      .select(col("id"), col("p.h").as("h"), col("p.mh").as("mh"))
  }

  /** Wide MinHash signatures: one row per doc, columns h0..h{n-1}.
    * The n salted digests are computed as n aggregate expressions over
    * one shingle explode — no ×n row amplification, one map-side-
    * combined shuffle keyed by doc. */
  def minHashSignaturesWide(docs: DataFrame, numHashes: Int, shingleLen: Int,
                            idCol: String = "doc_id", textCol: String = "text",
                            digest: SaltedDigest = md5Digest): DataFrame = {
    val sh = FanOut(docs).select(col(idCol).as("id"),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleLen))).as("s"))
    val mins = (0 until numHashes).map(i =>
      min(digest(i, col("s")).cast("string")).as(s"h$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: pairs sharing at least one band (bandSize
    * consecutive hashes identical), with the estimated Jaccard
    * (fraction of equal hashes). Only banded candidates are compared —
    * the all-pairs join never materializes.
    *
    * The signature columns ride THROUGH the band self-join, so scoring
    * is a projection on the join output and the duplicate band hits
    * collapse in one aggregation — versus the naive
    * distinct-then-rejoin-signatures-twice plan (2 extra shuffles, 3
    * extra stages). The self-join's two sides are the identical
    * subtree, so the signature computation and its exchange run ONCE
    * (ReusedExchange), no cache needed. Shuffle width grows by the
    * numHashes digest columns — bounded, and far cheaper than
    * re-shuffling the signature table twice by id. */
  def minHashCandidatePairs(docs: DataFrame, numHashes: Int = 8, bandSize: Int = 2,
                            shingleLen: Int = 3, idCol: String = "doc_id",
                            textCol: String = "text",
                            digest: SaltedDigest = md5Digest): DataFrame =
    bandedPairsFromWideSig(
      minHashSignaturesWide(docs, numHashes, shingleLen, idCol, textCol, digest),
      numHashes, bandSize)

  /** LSH banding + pair scoring over any wide (id, h0..h{n-1})
    * signature frame — shared by classic salted-digest MinHash and
    * the one-permutation path. Signature columns ride THROUGH the
    * band self-join (one ReusedExchange, scoring as a projection,
    * duplicate band hits collapsed in one aggregation). */
  private[operators] def bandedPairsFromWideSig(sig: DataFrame, numHashes: Int,
                                                bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val bandKeys = (0 until numHashes / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(i => col(s"h$i"))
      struct(lit(b).as("band"), concat_ws("|", cols: _*).as("key"))
    }
    val hashCols = (0 until numHashes).map(i => col(s"h$i"))
    val bands = sig
      .select((col("id") +: hashCols :+ explode(array(bandKeys: _*)).as("bk")): _*)
      .select((col("id") +: hashCols :+ col("bk.band").as("band")
        :+ col("bk.key").as("band_key")): _*)
    val eqCount = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") and col("a.band_key") === col("b.band_key") and
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (eqCount.cast("double") / lit(numHashes)).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** One-permutation MinHash signatures (Li/Owen/Zhang 2012, public
    * algorithm) with rotation densification: ONE digest per distinct
    * shingle — the 48-bit md5-prefix hash space is split into
    * `numHashes` equal bins, each slot takes its bin's minimum hash,
    * and an empty slot borrows from the nearest non-empty bin to its
    * cyclic right. Output is the same wide (id, h0..h{n-1}) shape as
    * [[minHashSignaturesWide]], so the banding/pair machinery applies
    * unchanged. At scale this removes the ×numHashes digest
    * amplification from the signature stage — classic MinHash's
    * dominant cost — while keeping an unbiased Jaccard estimate;
    * every step is integer arithmetic on the same md5 prefix both
    * engines compute, so signatures are bit-identical anywhere. */
  def ophSignaturesWide(docs: DataFrame, numHashes: Int = 8, shingleLen: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val b = numHashes
    require(b > 0 && b <= 1024, s"numHashes out of range: $b")
    val sh = FanOut(docs).select(col(idCol).as("id"),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleLen))).as("s"))
    val h = conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long")
    // bin = floor(h·b / 2^48) — h < 2^48 and b ≤ 2^10 keep h·b < 2^58
    val mins = sh
      .select(col("id"), shiftright(h * lit(b.toLong), 48).as("bin"), h.as("h"))
      .groupBy("id", "bin").agg(min("h").as("mh"))
    val packed = mins.groupBy("id")
      .agg(collect_list(struct(col("bin"), col("mh"))).as("bm"))
    val slots = (0 until b).map { slot =>
      element_at(array_sort(transform(col("bm"), e =>
        struct(pmod(e.getField("bin") - slot, lit(b.toLong)).as("d"),
          e.getField("mh").as("mh")))), 1)
        .getField("mh").as(s"h$slot")
    }
    packed.select(col("id") +: slots: _*)
  }

  /** [[minHashCandidatePairs]] over one-permutation signatures — same
    * banding, same output shape, one digest pass per shingle. */
  def ophCandidatePairs(docs: DataFrame, numHashes: Int = 8, bandSize: Int = 2,
                        shingleLen: Int = 3, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    bandedPairsFromWideSig(
      ophSignaturesWide(docs, numHashes, shingleLen, idCol, textCol),
      numHashes, bandSize)

  /** (id, band, band_key) LSH band table from a wide signature frame —
    * the shared candidate-generation key for batch pair joins and the
    * streaming registry. */
  def bandTable(sig: DataFrame, numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val bandKeys = (0 until numHashes / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(i => col(s"h$i"))
      struct(lit(b).as("band"), concat_ws("|", cols: _*).as("key"))
    }
    sig.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("band_key"))
  }

  /** 32-bit SimHash as an 8-hex-char fingerprint. Per token the first 8
    * md5 hex chars supply 32 bits; bit sums (+1/-1) per position are
    * signed into the fingerprint. Integer arithmetic only — portable.
    * `posWeight`: hex-digit position p in 1..8, bit b in 0..3. */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hexDigits = "0123456789abcdef"
    val toks = FanOut(docs).select(col(idCol).as("id"),
        explode(array_distinct(Text.tokens(col(textCol)))).as("tok"))
      .withColumn("hx", substring(md5(col("tok")), 1, 8))
      .select(col("id"), explode(sequence(lit(1), lit(8))).as("p"), col("hx"))
      .withColumn("nib", instr(lit(hexDigits), substring(col("hx"), col("p"), lit(1))) - 1)
    val sums = toks.groupBy("id", "p").agg(
      sum(when(col("nib") % 2 === 1, 1).otherwise(-1)).as("s0"),
      sum(when((col("nib") / 2).cast("int") % 2 === 1, 1).otherwise(-1)).as("s1"),
      sum(when((col("nib") / 4).cast("int") % 2 === 1, 1).otherwise(-1)).as("s2"),
      sum(when((col("nib") / 8).cast("int") % 2 === 1, 1).otherwise(-1)).as("s3"))
    val nibOut = (when(col("s0") > 0, 1).otherwise(0)
      + when(col("s1") > 0, 2).otherwise(0)
      + when(col("s2") > 0, 4).otherwise(0)
      + when(col("s3") > 0, 8).otherwise(0))
    sums
      .withColumn("ch", substring(lit(hexDigits), nibOut + 1, lit(1)))
      .groupBy("id")
      .agg(array_join(sort_array(collect_list(struct(col("p"), col("ch"))))
        .getField("ch"), "").as("simhash"))
  }

  /** n-gram Jaccard near-dup pairs above `threshold` — EXACT scores,
    * two candidate-generation strategies with identical output, chosen
    * adaptively by default:
    *
    *  - `"direct"`: shared-shingle equi-join. Right choice when the
    *    shingle vocabulary is small or uniform (like the synthetic
    *    corpus) — no shingle is rare, so prefix pruning only adds
    *    passes.
    *  - `"prefix"`: ppjoin-style prefix filtering (Chaudhuri/Xiao et
    *    al.; public algorithm): a pair with J(A,B) ≥ t must share one
    *    of each side's (|X| − ⌈t·|X|⌉ + 1) globally-rarest shingles,
    *    so only prefix shingles drive the candidate join. The scale
    *    path for real (zipfian) corpora, where ubiquitous shingles
    *    would otherwise dominate the join, skew its partitions, and
    *    explode the pair count.
    *  - `"adaptive"` (default): probes the shingle document-frequency
    *    distribution first — one map-side-combined aggregation over
    *    the cached shingle set plus a scalar collect, an AQE-style
    *    runtime plan decision ([[chooseJaccardStrategy]]). A mostly-
    *    rare vocabulary means prefix filtering has rare prefixes to
    *    exploit; a small/uniform vocabulary has none. */
  def ngramJaccardPairs(docs: DataFrame, shingleLen: Int = 3, threshold: Double = 0.8,
                        idCol: String = "doc_id", textCol: String = "text",
                        strategy: String = "adaptive"): DataFrame = {
    require(Set("adaptive", "direct", "prefix")(strategy), s"unknown strategy: $strategy")
    val sh = FanOut(docs).select(col(idCol).as("id"),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleLen))).as("s"))
      .cache()
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val usePrefix = strategy match {
      case "direct" => false
      case "prefix" => true
      case _        => chooseJaccardStrategy(shingleDocFreq(sh))
    }
    val inter =
      if (!usePrefix) {
        // direct shared-shingle join: best when the shingle vocabulary
        // is small/uniform (no rare prefix exists to exploit)
        sh.as("a").join(sh.as("b"),
            col("a.s") === col("b.s") and col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
      } else {
        val cands = prefixCandidates(sh, counts, threshold)
        val withA = cands.join(sh.toDF("id_a", "sa"), "id_a")
        val shB = sh.toDF("id_b", "sb")
        withA
          .join(shB, withA("id_b") === shB("id_b") and col("sa") === col("sb"))
          .groupBy(withA("id_a"), withA("id_b"))
          .agg(count(lit(1)).as("inter"))
          .select(col("id_a"), withA("id_b").as("id_b"), col("inter"))
      }
    inter
      .join(counts.toDF("id_a", "na"), "id_a")
      .join(counts.toDF("id_b", "nb"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "na", "nb", "jaccard")
  }

  /** Overlap-coefficient (containment) near-dup pairs:
    * `C(A,B) = |A∩B| / min(|A|,|B|) >= threshold` over distinct word
    * shingles. The asymmetric-size complement to [[ngramJaccardPairs]]:
    * a document embedded inside a much larger one has containment ~1
    * but Jaccard ~|small|/|large| — the quote/boilerplate/sub-document
    * case symmetric Jaccard structurally misses (C >= J always, so a
    * containment threshold is the stricter screen for subsets).
    * Candidate generation is the same bounded shared-shingle equi-join
    * as the direct Jaccard path — never an all-pairs product; on a
    * hapax-heavy corpus the ppjoin prefix filter composes here too
    * (with the overlap-coefficient prefix bound n - ceil(t·n) + 1)
    * exactly as it does for Jaccard. */
  def containmentPairs(docs: DataFrame, shingleLen: Int = 3,
                       threshold: Double = 0.9, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    sharedShinglePairCounts(docs, shingleLen, idCol, textCol)
      .withColumn("containment",
        col("inter").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "inter", "na", "nb", "containment")

  /** (id_a, id_b, inter, na, nb) for every pair sharing at least one
    * distinct shingle — the exact pair-counting core any set-overlap
    * score (Jaccard, containment, Dice, …) divides differently. The
    * shingle frame is cached: the counts branch and both join sides
    * consume it. */
  private def sharedShinglePairCounts(docs: DataFrame, shingleLen: Int,
                                      idCol: String, textCol: String): DataFrame = {
    val sh = FanOut(docs).select(col(idCol).as("id"),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleLen))).as("s"))
      .cache()
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") and col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.toDF("id_a", "na"), "id_a")
      .join(counts.toDF("id_b", "nb"), "id_b")
  }

  /** Connected components over near-duplicate pairs — the clustering
    * step between pair generation (MinHash/SimHash/embedding) and
    * survivor selection: every document gets the minimum reachable id
    * as its cluster label.
    *
    * Alternating large-star/small-star rounds (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond" — public
    * algorithm): each round every node hooks its strictly-larger
    * neighbors onto its neighborhood minimum (large-star), then every
    * node collapses its smaller neighborhood onto that minimum
    * (small-star). Both operations preserve connectivity and shrink
    * the graph toward a forest of stars rooted at each component's
    * minimum id, converging in O(log diameter) rounds — a 1,000-node
    * chain collapses in ~10 rounds where per-hop min-label
    * propagation needs ~1,000. Every shuffle keys on uniformly-hashed
    * node ids; per-round edge sets are cached and the previous round
    * unpersisted, so lineage stays bounded. Convergence is an EXACT
    * structural test (the edge set is a star forest), not a
    * hash-compare of successive rounds.
    *
    * Adaptive execution: near-dup graphs are usually MUCH smaller than
    * the corpus (only colliding documents appear). When the canonical
    * edge set fits comfortably on the driver
    * (`spark.graft.cc.localThreshold`, default 500k edges — a few MB),
    * a driver-local union-find replaces the iterative star rounds: the
    * same answer without 2·rounds distributed barriers, exactly the
    * broadcast-join trade. Above the threshold — or for non-bigint id
    * types — the O(log diameter) distributed algorithm runs unchanged.
    * Both paths produce identical labels
    * (min reachable id), spec-pinned against each other.
    *
    * @param pairs undirected near-dup edges (aCol, bCol)
    * @return (id, component) for every id appearing in `pairs`
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val spark = pairs.sparkSession
    val longIds = pairs.schema(aCol).dataType == LongType &&
      pairs.schema(bCol).dataType == LongType
    if (!longIds) return connectedComponentsWithRounds(pairs, aCol, bCol, maxIter)._1
    val threshold = spark.conf.get("spark.graft.cc.localThreshold", "500000").toLong
    val edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("hi"),
        least(col(aCol), col(bCol)).as("lo"))
      .distinct().cache()
    val n = edges.count()
    if (n > threshold) {
      edges.unpersist()
      connectedComponentsWithRounds(pairs, aCol, bCol, maxIter)._1
    } else {
      val collected = edges.collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val labels = localUnionFind(collected)
      import spark.implicits._
      labels.toSeq.toDF("id", "component")
    }
  }

  /** Driver-local min-label connected components: union-find with
    * union-by-min (the smaller root adopts) and path compression.
    * Self-loops register the node and label it itself. */
  private def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keysIterator.map(k => k -> find(k)).toMap
  }

  /** [[connectedComponents]] plus the number of star rounds executed —
    * exposed so the convergence-rate contract (logarithmic in chain
    * length, not linear) is testable. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 50): (DataFrame, Int) = {
    val nodes = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id"))).distinct().cache()
    // canonical undirected storage: hi > lo, self-loops dropped (their
    // endpoints survive via `nodes`)
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("hi"),
        least(col(aCol), col(bCol)).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct().cache()
    var rounds = 0
    var converged = isStarForest(edges)
    while (!converged && rounds < maxIter) {
      // large-star: node u sends each neighbor v > u to m = min(N(u) ∪ {u});
      // m ≤ u < v keeps the (v, m) output canonical with no self-loop
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val nbrMin = sym.groupBy("u").agg(min("v").as("mnv"))
        .select(col("u"), least(col("mnv"), col("u")).as("m"))
      val large = sym.join(nbrMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star: node hi sends its ≤-neighborhood (all its lo's,
      // plus itself) to m = min of that neighborhood; the lo–m edges
      // need re-canonicalizing, the hi–m edge is already oriented
      val nbhMin = large.groupBy("hi").agg(min("lo").as("m"))
      // eager localCheckpoint, not cache: each round's plan references
      // the previous round's ~12×, so without lineage truncation the
      // logical plan grows 12^rounds and the driver OOMs composing it
      // long before the data is a problem. Blocks are dropped by the
      // context cleaner once the round's RDD is unreferenced.
      val next = large.join(nbhMin, "hi")
        .select(greatest(col("lo"), col("m")).as("hi"),
          least(col("lo"), col("m")).as("lo"))
        .filter(col("hi") =!= col("lo"))
        .union(nbhMin.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(true)
      converged = isStarForest(next)
      release(edges)
      edges = next
      rounds += 1
    }
    // at the fixpoint every edge is (leaf, component-min); nodes absent
    // from `hi` are the roots (and isolated nodes), labeling themselves.
    // The min-aggregation is an identity when converged (each hi appears
    // once) but makes maxIter exhaustion DEGRADE — unique, possibly
    // unconverged labels — instead of silently duplicating ids through
    // a multi-match join.
    val labels = nodes
      .join(edges.select(col("hi").as("id"), col("lo").as("component")),
        Seq("id"), "left")
      .groupBy("id")
      .agg(min(coalesce(col("component"), col("id"))).as("component"))
      .cache()
    labels.count() // materialize before releasing the inputs
    nodes.unpersist()
    release(edges)
    (labels, rounds)
  }

  /** Release a superseded round's storage NOW: the cache entry (first
    * round) and the localCheckpoint's truncated-lineage RDD blocks
    * (later rounds). Without the explicit RDD unpersist, checkpoint
    * blocks linger until the ContextCleaner GCs the RDD reference —
    * `spark.catalog.clearCache()` never touches them — so a long-lived
    * session running many clusterings accumulates dead blocks in the
    * block manager. Safe here because the checkpointed frame is never
    * recomputed after its successor round materializes. */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Exact star-forest test: every `hi` appears exactly once and never
    * as a `lo` ⟺ the edges are disjoint stars centered at their
    * component minima — the alternating algorithm's fixpoint. ONE
    * scalar action (a two-level aggregation ending in a single row)
    * over the (shrinking, checkpointed) edge set per round — driver
    * round-trips per round: this plus the eager checkpoint's count. */
  private def isStarForest(edges: DataFrame): Boolean = {
    val sym = edges.select(col("hi").as("node"), lit(1L).as("nh"), lit(0L).as("nl"))
      .union(edges.select(col("lo").as("node"), lit(0L).as("nh"), lit(1L).as("nl")))
    val r = sym.groupBy("node")
      .agg(sum("nh").as("nh"), sum("nl").as("nl"))
      .agg(max(when(col("nh") > 1 or (col("nh") > 0 and col("nl") > 0), 1)
        .otherwise(0)).as("bad"))
      .first()
    r.isNullAt(0) || r.getInt(0) == 0
  }

  /** One survivor (the min id) per cluster plus its cluster size —
    * composing [[connectedComponents]] into the dedup decision. */
  def clusterSurvivors(components: DataFrame): DataFrame =
    components.groupBy("component")
      .agg(min("id").as("keep_id"), count(lit(1)).as("cluster_size"))

  /** Compose-once dedup clustering: cluster labels AND the survivor
    * decision derived from ONE materialized component frame (the
    * [[connectedComponents]] result is computed exactly once; survivors
    * are a single aggregate over it). A pipeline that needs both —
    * the usual case: tag every document with its cluster, then keep
    * one per cluster — must use this instead of calling the two
    * operators separately, or it pays pair generation and the star
    * rounds twice.
    *
    * @return (components (id, component), survivors (component,
    *         keep_id, cluster_size))
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "id_a",
                    bCol: String = "id_b", maxIter: Int = 50): (DataFrame, DataFrame) = {
    val components = connectedComponents(pairs, aCol, bCol, maxIter)
    (components, clusterSurvivors(components))
  }

  /** Global shingle document frequencies (s, df) — the skew probe input. */
  private[operators] def shingleDocFreq(sh: DataFrame): DataFrame =
    sh.groupBy("s").agg(count(lit(1)).as("df"))

  /** true ⇒ prefix filtering. Chosen when the median shingle document
    * frequency is small (≤ 4): at least half the vocabulary is then
    * rare, so each document's prefix lands on low-df shingles and the
    * candidate join stays near-linear. Zipfian text corpora (hapax-
    * dominated vocabularies) always qualify; small synthetic
    * vocabularies — where every shingle is common and prefix passes
    * prune nothing — do not. The probe is one aggregation over the
    * shingle set; at 100 TB that is one map-side-combined pass, paid
    * once to avoid a quadratic, skew-pinned join. */
  private[operators] def chooseJaccardStrategy(dfS: DataFrame): Boolean = {
    val m = dfS.select(percentile_approx(col("df"), lit(0.5), lit(1000)).as("m")).first()
    !m.isNullAt(0) && m.getLong(0) <= 4
  }

  /** ppjoin prefix candidates: each document keyed by its
    * (|X| − ⌈t·|X|⌉ + 1) globally-rarest shingles; only prefix-sharing
    * pairs survive. */
  private[operators] def prefixCandidates(sh: DataFrame, counts: DataFrame,
                                          threshold: Double): DataFrame = {
    val ranked = sh.join(shingleDocFreq(sh), "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("s").asc)))
      .join(counts, "id")
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select("id", "s", "rk", "n")
    // ppjoin positional filter (Xiao et al., public algorithm): both
    // docs' shingle sets are sorted by the SAME global rarity order,
    // so for the FIRST shared prefix shingle — at ranks (rk_a, rk_b) —
    // everything before it on either side is provably disjoint from
    // the other doc, bounding the overlap at 1 + min(n_a−rk_a,
    // n_b−rk_b). J ≥ t needs overlap ≥ ⌈(n_a+n_b)·t/(1+t)⌉; pairs
    // whose LOOSEST bound (max over matches ≥ the first-match bound)
    // can't reach that floor are pruned before the intersection join
    // pays for them. Output-identical: the exact Jaccard filter
    // downstream is unchanged.
    val a = ranked.toDF("id_a", "s", "rk_a", "n_a")
    val b = ranked.toDF("id_b", "sb", "rk_b", "n_b")
    // length filter: J(A,B) ≥ t forces t·|A| ≤ |B| ≤ |A|/t — applied
    // inside the join so out-of-band pairs never reach the aggregation
    a.join(b, col("s") === col("sb") and col("id_a") < col("id_b")
        and col("n_b") >= col("n_a") * threshold
        and col("n_a") >= col("n_b") * threshold)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(max(least(col("n_a") - col("rk_a"),
        col("n_b") - col("rk_b"))).as("rest"))
      .filter(col("rest") + 1 >=
        ceil((col("n_a") + col("n_b")) * threshold / (1 + threshold)))
      .select("id_a", "id_b")
  }
}
