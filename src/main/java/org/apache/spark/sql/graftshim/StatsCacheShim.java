package org.apache.spark.sql.graftshim;

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Statistics;

/**
 * Writes a logical plan node's statistics cache.
 *
 * {@code LogicalPlanStats.statsCache} is {@code protected} in the Scala
 * signature, but its trait accessors compile to PUBLIC bytecode on
 * {@code LogicalPlan} — so plain Java (which sees only the bytecode)
 * can set it without reflection. Used by
 * {@code graft.plans.AttachGraftScanStats} to surface GraftTable
 * manifest statistics on DSv2 scan relations whose {@code V1ScanWrapper}
 * hides {@code SupportsReportStatistics} from
 * {@code DataSourceV2ScanRelation.computeStats} (no public extension
 * point runs between scan push-down and join planning, so the cache is
 * the only seam).
 */
public final class StatsCacheShim {
  private StatsCacheShim() {}

  /** Overwrites any cached statistics on {@code p} with {@code s}. */
  public static void attach(LogicalPlan p, Statistics s) {
    p.statsCache_$eq(scala.Option.apply(s));
  }
}
