package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.bridge

/** Top-k-per-group as a first-class Catalyst operator: logical node →
  * planner strategy → two-phase physical execution with bounded heaps.
  *
  * Spark's stock plan for "top k rows per group" is
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`: a full
  * shuffle of EVERY row followed by a full sort of EVERY group, with
  * the filter applied only after ranking. At 100 TB that sorts and
  * shuffles the whole table to keep a handful of rows per key.
  *
  * This operator keeps a size-k bounded heap per group in each input
  * partition (partial pass — shrinks the data to ≤ k·groups rows per
  * partition BEFORE the exchange), then re-applies the same heap per
  * group after a hash exchange on the group keys (final pass). The
  * shuffle moves at most k·groups·partitions rows instead of the whole
  * input, and nothing is ever globally sorted. The algebra is the
  * same partial/final split Spark uses for aggregates, applied to
  * order statistics.
  *
  * The ordering must be total (add a unique tiebreak column) for
  * deterministic output — same contract as any top-k query.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Physical bounded-heap pass. `partial = true` runs on arbitrary
  * partitioning (map-side shrink); `partial = false` demands the group
  * keys clustered (EnsureRequirements inserts the hash exchange) and
  * produces the exact per-group top-k.
  *
  * Memory safety: the partial pass tracks at most `maxPartialGroups`
  * groups per partition; rows of groups past that bound stream
  * THROUGH untrimmed (the same shape as Spark's hash-aggregate
  * fallback: a partial pass is an optimization, so skipping reduction
  * for overflow rows costs shuffle volume, never correctness — the
  * final pass re-heaps everything). Without the bound, a partition
  * with high group-key cardinality (top-k per user at 100 TB) holds
  * k rows for EVERY distinct group with no fallback. The final pass
  * is exempt: after clustering, its map holds exactly this
  * partition's OUTPUT (≤ k rows per group actually returned), which
  * any exact top-k must materialize anyway. */
case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, partial: Boolean, maxPartialGroups: Int,
                            child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val g = groupExprs
    val o = order
    val kk = k
    val maxGroups = if (partial) maxPartialGroups else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(g, schema)
      val ord = GenerateOrdering.generate(o, schema)
      // heap head = the currently-worst kept row (max in sort order),
      // so admission is one compare and eviction is O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      new Iterator[InternalRow] {
        private var passThrough: InternalRow = _
        private var drain: Iterator[InternalRow] = _
        override def hasNext: Boolean = {
          if (passThrough != null) return true
          if (drain != null) return drain.hasNext
          while (iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null && heaps.size() < maxGroups) {
              heap = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reversed())
              heaps.put(key.copy(), heap)
            }
            if (heap == null) {
              // overflow group: emit immediately, unreduced (no copy
              // needed — consumed before the next iter.next())
              passThrough = row
              return true
            }
            if (heap.size() < kk) heap.add(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }
          }
          import scala.jdk.CollectionConverters._
          drain = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (passThrough != null) {
            val r = passThrough; passThrough = null; r
          } else drain.next()
        }
      }
    }
  }
}

/** Plans the logical node as partial → (exchange via required
  * distribution) → final. The partial pass's group-map bound comes
  * from `spark.graft.topk.maxPartialGroups` (default 65536: at k=10
  * that is ≤ ~650k buffered rows per partition before overflow rows
  * start streaming through unreduced). */
object TopKStrategy extends SparkStrategy {
  val maxPartialGroupsKey = "spark.graft.topk.maxPartialGroups"
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val maxGroups = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(maxPartialGroupsKey, "65536").toInt
      val partial = TopKPerGroupExec(g, o, k, partial = true, maxGroups, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, maxGroups, partial) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top `k` rows per group of `df`, ordered by `orderCols` (use
    * `.desc`/`.asc` columns; include a unique tiebreak for
    * determinism). Requires [[GraftExtensions]] on the session.
    *
    * Column→Expression conversion goes through the analyzer (a
    * throwaway sortWithinPartitions plan) so the harvested
    * [[SortOrder]]s are pure serializable catalyst trees — the direct
    * bridge conversion leaves Connect-side column nodes inside, which
    * fail task serialization. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val probe = bridge.analyzed(df.sortWithinPartitions(groupCols.map(_.asc) ++ orderCols: _*))
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val groupExprs = probe.order.take(groupCols.size).map(_.child)
    val order = probe.order.drop(groupCols.size)
    bridge.ofRows(df.sparkSession,
      TopKPerGroup(groupExprs, order, k, probe.child))
  }
}
