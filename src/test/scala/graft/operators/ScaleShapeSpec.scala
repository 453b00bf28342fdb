package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partitioning-invariance of the LLM dedup path.
  *
  * Every gate query runs over the driver's single-file parquet; a
  * 100 TB corpus arrives as thousands of hash-distributed files in
  * arbitrary row order. This spec pins the property that scale
  * actually stresses: the full dedup→clustering→survivors pipeline
  * must produce IDENTICAL results when the same corpus is stored as
  * many shuffled files — no dependence on input file count, row
  * order, or partition assignment.
  */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def pipelineResults(docs: org.apache.spark.sql.DataFrame) = {
    val pairs = Dedup.minHashCandidatePairs(docs,
        numHashes = 8, bandSize = 2, shingleLen = 3)
      .filter(col("est_jaccard") >= 0.5)
    val (components, survivors) = Dedup.dedupClusters(pairs)
    val comp = components.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"))).toSet
    val surv = survivors.collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("cluster_size"))).toSet
    val exact = Dedup.exact(docs).collect()
      .map(r => (r.getAs[String]("content_hash"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("dup_count"))).toSet
    (comp, surv, exact)
  }

  test("dedup -> CC -> survivors is invariant to file layout and row order") {
    val single = graft.Tables.documents(spark, dir)
    val (comp1, surv1, exact1) = pipelineResults(single)
    assert(comp1.nonEmpty && surv1.nonEmpty)

    // the same corpus as a multi-file, hash-partitioned, row-shuffled
    // copy — the storage shape a distributed writer produces
    val multiDir = java.nio.file.Files
      .createTempDirectory("graft_scale_shape").toString
    try {
      single
        .repartition(8, col("doc_id"))
        .sortWithinPartitions(md5(col("text"))) // scramble row order
        .write.mode("overwrite").parquet(multiDir)
      val files = new java.io.File(multiDir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files >= 4, s"expected a genuinely multi-file copy, got $files")

      val multi = spark.read.parquet(multiDir)
      assert(multi.count() === single.count())
      val (comp2, surv2, exact2) = pipelineResults(multi)
      assert(comp2 === comp1)
      assert(surv2 === surv1)
      assert(exact2 === exact1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(multiDir))
    }
  }

  /** Same property for the round-5 span-dedup/novelty pair: both pick
    * global FIRST occurrences (min over (doc_id, span_idx) / doc_id),
    * which a partial aggregation computes per partition before the
    * final merge — so the winner must not depend on which partition
    * saw a span first. A max/min formulated over arrival order instead
    * of the key tuple would pass single-file and silently drift
    * multi-file. */
  test("span dedup and n-gram novelty are invariant to file layout and row order") {
    def res(name: String, d: String) =
      graft.SparkEntry.queries(name)(spark, d).collect().map(_.toSeq).toSeq
    val multiRoot = java.nio.file.Files
      .createTempDirectory("graft_scale_shape_span").toString
    try {
      graft.Tables.documents(spark, dir)
        .repartition(8, col("doc_id"))
        .sortWithinPartitions(md5(col("text")))
        .write.mode("overwrite").parquet(s"$multiRoot/documents.parquet")
      for (q <- Seq("q122_span_dedup", "q123_ngram_novelty")) {
        val one = res(q, dir)
        assert(one.nonEmpty)
        assert(res(q, multiRoot) === one, s"$q drifted under re-layout")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(multiRoot))
    }
  }

  /** Same property for the vector path: the IVF quantizer trains on a
    * deterministic md5-ordered bounded sample (TakeOrderedAndProject),
    * so the trained model — and with it every cell assignment, probe
    * set, and near-dup pair — must not depend on how the embedding
    * corpus is laid out on disk. A layout-sensitive sample would make
    * ANN results change under compaction, the classic silent-drift
    * bug in production vector pipelines. */
  test("IVF ANN + embedding near-dup are invariant to file layout and row order") {
    val emb = graft.Tables.embeddings(spark, dir)
    def results(e: org.apache.spark.sql.DataFrame) = {
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val topk = Similarity.ivfTopK(queries, corpus, k = 5, nCentroids = 16, nProbe = 16)
        .select(col("qid"), col("rank"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val pairs = Similarity.cosineNearDupPairs(corpus, threshold = 0.4, nCentroids = 16)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (topk, pairs)
    }
    val (topk1, pairs1) = results(emb)
    assert(topk1.nonEmpty && pairs1.nonEmpty)

    val multiDir = java.nio.file.Files
      .createTempDirectory("graft_scale_shape_vec").toString
    try {
      emb.repartition(8, col("vec_id"))
        .sortWithinPartitions(md5(col("vec_id").cast("string")))
        .write.mode("overwrite").parquet(multiDir)
      val multi = spark.read.parquet(multiDir)
      assert(multi.count() === emb.count())
      val (topk2, pairs2) = results(multi)
      assert(topk2 === topk1)
      assert(pairs2 === pairs1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(multiDir))
    }
  }

  test("containment pairs and filtered ANN are invariant to file layout and row order") {
    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    def contain(d: org.apache.spark.sql.DataFrame) =
      Dedup.containmentPairs(d, threshold = 0.8).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("inter"))).toSet
    def filtered(e: org.apache.spark.sql.DataFrame) = {
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("label"))
      val corpus = e.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"), col("label"))
      Similarity.filteredTopK(queries, corpus, Seq("label"), k = 3)
        .select(col("qid"), col("rank"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val (c1, f1) = (contain(docs), filtered(emb))
    assert(c1.nonEmpty && f1.nonEmpty)
    val docDir = java.nio.file.Files.createTempDirectory("graft_ss_contain").toString
    val embDir = java.nio.file.Files.createTempDirectory("graft_ss_fann").toString
    try {
      docs.repartition(8, col("doc_id"))
        .sortWithinPartitions(md5(col("text")))
        .write.mode("overwrite").parquet(docDir)
      emb.repartition(8, col("vec_id"))
        .sortWithinPartitions(md5(col("vec_id").cast("string")))
        .write.mode("overwrite").parquet(embDir)
      assert(contain(spark.read.parquet(docDir)) === c1)
      assert(filtered(spark.read.parquet(embDir)) === f1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(docDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(embDir))
    }
  }
}
