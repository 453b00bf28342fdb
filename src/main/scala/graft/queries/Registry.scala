package graft.queries

import graft.GraftQuery

/** Union of all per-domain query registries exposed to the driver
  * through [[graft.SparkEntry]]. Order is stable (bench reports keyed
  * by name). Names must be unique — asserted at first access. */
object Registry {
  def all: Seq[GraftQuery] = {
    val qs = Relational.all ++ PipelineShaped.all ++ AsofSession.all ++
      Extras.all ++ TpchClassics.all ++ TextQueries.all ++ VectorQueries.all ++
      MlPrep.all ++ QualityQueries.all ++ StreamingQueries.all ++
      MultimodalQueries.all ++ Curation.all ++ LayoutQueries.all ++
      EvalMetrics.all ++ SourceQueries.all ++ MaintenanceQueries.all ++
      EtlEndToEnd.all ++ SqlSurface.all ++ PostTraining.all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship for SparkEntry.entry: a multi-join + agg that exercises
    * scan→broadcast-join→shuffle-agg in one plan. */
  def flagship: GraftQuery = Relational.q02RevenueByNation
}
