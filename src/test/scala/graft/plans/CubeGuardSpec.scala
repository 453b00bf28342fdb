package graft.plans

import graft.SparkSpec
import graft.pipeline.{FactBuilder, Pipeline}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions-injected dense-cube size guard
  * (SURVEY §7.4-4): CubeGuard carries both materializations; the
  * ResolveCubeGuard rule substitutes dense or sparse from the
  * optimizer's cardinality estimate. */
class CubeGuardSpec extends SparkSpec {

  private lazy val fixture: String = {
    val csv =
      """Order ID,Product,Quantity Ordered,Price Each,Order Date,Purchase Address
        |141234,iPhone,1,700,01/22/19 21:25,"944 Walnut St, Boston, MA 02215"
        |141235,USB-C Charging Cable,2,11.95,01/17/19 13:33,"185 Maple St, Portland, OR 97035"
        |141236,Wired Headphones,1,11.99,01/07/19 11:27,"83 7th St, Portland, ME 04101"
        |141237,27in FHD Monitor,1,149.99,01/05/19 17:20,"172 Church St, New York City, NY 10001"
        |141238,Google Phone,1,600,01/30/19 00:01,"11 2nd St, Seattle, WA 98101"
        |""".stripMargin
    val dir = Files.createTempDirectory("cubeguard_fixture")
    val f = dir.resolve("orders.csv")
    Files.writeString(f, csv)
    f.toString
  }

  private lazy val r = Pipeline.run(spark, fixture, denseFact = false)

  /** The optimizer's own estimate for the dense branch — analyzed-plan
    * sizeInBytes estimates multiply through join chains, so this is an
    * enormous upper bound; the spec thresholds bracket it to exercise
    * both sides of the guard. (In production the default 4 GiB
    * threshold sits far below any 100 TB cube estimate.) */
  private lazy val denseEstimate: BigInt = org.apache.spark.sql.graft.bridge
    .analyzed(FactBuilder(r.cleansed, r.productDim, r.locationDim, r.timeDim,
      dense = true))
    .stats.sizeInBytes

  private def guarded(threshold: BigInt) = FactBuilder.applyGuarded(
    spark, r.cleansed, r.productDim, r.locationDim, r.timeDim, threshold)

  test("under the threshold the rule keeps the dense cube (zero-filled cells)") {
    val df = guarded(denseEstimate + 1)
    val expected = r.timeDim.count() * r.productDim.count() * r.locationDim.count()
    assert(df.count() === expected)
    assert(df.filter(col("quantity_ordered") === 0).count() > 0)
  }

  test("past the threshold the rule rewrites to the sparse fact (no cross join)") {
    val df = guarded(denseEstimate - 1)
    df.collect()
    assert(df.count() === r.cleansed.count()) // order grain, no amplification
    assert(df.filter(col("quantity_ordered") === 0).count() === 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the dense branch's dimension cross joins are gone (plan text
    // repeats cached subtrees, so compare against dense rather than
    // count absolutes)
    val denseDf = guarded(denseEstimate + 1)
    denseDf.collect()
    def nlj(p: String) = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj(plan) < nlj(denseDf.queryExecution.executedPlan.toString))
  }

  test("the default threshold (4 GiB) rewrites this pipeline's cube to sparse") {
    // even the toy fixture's dense estimate dwarfs 4 GiB — at 100 TB
    // the guard always lands on the sparse branch
    val df = FactBuilder.applyGuarded(
      spark, r.cleansed, r.productDim, r.locationDim, r.timeDim)
    assert(df.count() === r.cleansed.count())
  }

  test("both branches expose the identical schema, so the guard is transparent") {
    // nullability may tighten per branch (the guard promises the weaker
    // contract); names and types must agree exactly
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.map(f => (f.name, f.dataType))
    assert(shape(guarded(denseEstimate + 1)) === shape(guarded(denseEstimate - 1)))
  }

  test("the guard node itself never reaches the optimized plan") {
    val qe = guarded(denseEstimate - 1).queryExecution
    assert(!qe.optimizedPlan.toString.contains("CubeGuard"))
    assert(!qe.analyzed.toString.contains("CubeGuard"))
  }

  test("quantity mass is conserved across the rewrite") {
    val dense = guarded(denseEstimate + 1).agg(sum("quantity_ordered")).first().getLong(0)
    val sparse = guarded(denseEstimate - 1).agg(sum("quantity_ordered")).first().getLong(0)
    val cleansed = r.cleansed.agg(sum("quantity_ordered")).first().getLong(0)
    assert(dense === cleansed)
    assert(sparse === cleansed)
  }
}
