package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.graftshim.StatsCacheShim

import graft.sources.GraftV1Scan

/** Surfaces [[graft.sources.GraftTable]] manifest statistics to
  * Catalyst's join sizing on the SQL path.
  *
  * [[GraftV1Scan]] implements `SupportsReportStatistics`, but Spark's
  * V1 bridge wraps every `V1Scan` in a `V1ScanWrapper` during scan
  * push-down, and `DataSourceV2ScanRelation.computeStats` checks the
  * WRAPPER for the statistics interface — so a graft read planned
  * through SQL text reports `defaultSizeInBytes` (8 EiB) and the
  * optimizer can never choose a broadcast join for it, no matter how
  * selective the read. At 1000 executors that mis-sizing turns a
  * metadata-provably-tiny dimension read into a 100 TB shuffle.
  *
  * No public extension point runs between scan push-down ("Early
  * Filter and Projection Push-Down", where the wrapper is created —
  * AFTER the pre-CBO hook) and physical planning (where JoinSelection
  * consumes the stats). The seam that remains is the plan's stats
  * CACHE: this strategy never claims a node (always returns Nil), but
  * as a pre-pass — injected strategies run before the built-in ones on
  * every plan fragment — it walks the fragment and caches the
  * manifest's post-pruning rowCount/sizeInBytes onto each graft scan
  * relation. JoinSelection then reads exactly those numbers.
  * Overwriting is deliberate: an optimizer rule that touched
  * `leaf.stats` earlier (e.g. InjectRuntimeFilter) would have cached
  * the 8 EiB default, which must lose to the real manifest stats. */
object AttachGraftScanStats extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = {
    plan.foreach {
      case r: DataSourceV2ScanRelation => r.scan match {
        case w: V1ScanWrapper => w.v1Scan match {
          case g: GraftV1Scan =>
            val (rows, bytes) = g.manifestStats
            StatsCacheShim.attach(r,
              Statistics(sizeInBytes = BigInt(bytes),
                rowCount = Some(BigInt(rows))))
          case _ => ()
        }
        case _ => ()
      }
      case _ => ()
    }
    Nil // a pure pre-pass: never plans anything itself
  }
}
