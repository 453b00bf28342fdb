package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Measured on this box at sf0.1 (full 85-query run): local[4]/sh4
    // 111s, local[32]/sh8 137s, local[32]/sh32 190s — at bench SFs the
    // many-small-stage queries are bounded by per-task fixed costs and
    // local-scheduler overhead, not CPU, so modest parallelism wins.
    // This is a single-JVM measurement artifact: the 100 TB sizing
    // (partitions ≈ cores, AQE coalesce) is per-cluster, see SURVEY §4.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
    QueryDef.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // registry order (stable) — a Map would randomize which query pays
    // JVM warm-up; also run one tiny warm-up action first so the first
    // measured query isn't charged for classloading/codegen bootstrap.
    spark.range(1000).selectExpr("sum(id)").collect()
    // optional subset for bisection: SPARK_GRAFT_ONLY=q24_...,q26_...
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.registry
      .filter(q => only.forall(_.contains(q.name)))
    // Per-query codegen warm-up at the smallest SF: whole-stage codegen
    // compiles once per expression shape per JVM — a cluster pays that
    // once per executor lifetime, not per query, so timing the JIT into
    // every md5/HOF-heavy query at bench SF would measure the compiler,
    // not the engine (q24 cold 5–6 s vs 0.96 s warm). The warm-up pass
    // runs on sf0.001 (skipped if absent) and is excluded from timings.
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p =>
        val w = new java.io.File(p, "sf0.001")
        if (w.exists() && w.getPath != sfDir) Some(w.getPath) else None
    }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = selected.map { q =>
      warmDir.foreach { d =>
        try { q.run(spark, d).count() } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators cache intermediates (minhash signatures, shingles);
      // drop them so queries are isolated and memory doesn't accumulate
      spark.catalog.clearCache()
      q.name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
