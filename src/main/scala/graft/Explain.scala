package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection / micro-timing CLI:
  *
  *   runMain graft.Explain <queryName> [sfDir] [runs]
  *
  * Prints the formatted physical plan and per-run wall times (run 1 is
  * cold — codegen + JIT; later runs show the steady-state data path).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <queryName> [sfDir] [runs]; " +
      s"known: ${SparkEntry.registry.map(_.name).mkString(", ")}")
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val q = SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    QueryDef.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    q.run(spark, sfDir).explain("formatted")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
