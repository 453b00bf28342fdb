package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** Bloom-filter semi-join primitives over Spark's own runtime-filter
  * expressions (BloomFilterAggregate / BloomFilterMightContain — the
  * pair InjectRuntimeFilter plants automatically when statistics allow;
  * surfaced here so a query can DECLARE the prefilter and not depend on
  * optimizer heuristics firing).
  *
  * Contract: `mightContain` is free of false negatives, so
  * filter-then-exact-semi-join returns exactly the semi-join's rows
  * while shuffling only the prefiltered survivors — the 100 TB shape
  * when the keep side is too large to broadcast but its key set fits a
  * few MB of bloom bits (~8 bits/key for ≈2% false positives). */
object Bloom {

  /** Aggregate: build the serialized bloom filter over `hashedKey`
    * (must be xxhash64(key) — the probe side must hash identically). */
  def filterAgg(hashedKey: Column, estimatedItems: Long, numBits: Long): Column =
    bridge.column(new BloomFilterAggregate(bridge.expression(hashedKey),
      org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Probe: `hashedKey` possibly-in the one-row/one-column bloom
    * DataFrame `bloom`, attached as a scalar subquery (the only
    * non-literal form BloomFilterMightContain accepts). */
  def mightContain(bloom: DataFrame, hashedKey: Column): Column =
    bridge.column(BloomFilterMightContain(
      ScalarSubquery(bridge.analyzed(bloom)),
      bridge.expression(hashedKey)))
}
