package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, count, lit, max, when}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** `MERGE INTO graft.t USING s ON ... WHEN MATCHED THEN UPDATE/DELETE
  * WHEN NOT MATCHED THEN INSERT` — the statement every warehouse
  * migration actually writes (reference analogue: the SCD2 update
  * flow, ProductDimension.sql:88-130), routed onto the SAME
  * [[GraftTable.applyCdcBatch]] commit path the Scala CDC API uses
  * (one pruned copy-on-write commit, OCC retry, change feed).
  *
  * Spark's own MERGE support requires `SupportsRowLevelOperations`
  * (a full group-based rewrite protocol); graft instead rewrites the
  * analyzed [[MergeIntoTable]] into [[GraftMergeCommand]] via an
  * injected resolution rule ([[RewriteGraftMerge]]). The command
  * computes a keyed CDC batch with ONE outer join — source rows
  * against the current snapshot on the merge condition (FULL outer
  * when `WHEN NOT MATCHED BY SOURCE` actions need the target-only
  * rows, LEFT outer otherwise), each surviving row tagged `replace`
  * or `delete` by the FIRST action whose guard holds within its
  * branch (SQL MERGE's documented order semantics) — then hands it to
  * `applyCdcBatch`, whose file pruning touches only the files whose
  * key interval contains an affected key: a 1,000-row MERGE against a
  * 100 TB table rewrites a few files, never the table. The `replace`
  * op writes assignment results VERBATIM — `SET col = NULL` nulls the
  * column (ANSI), never the CDC partial-update coalesce.
  *
  * Cardinality contract (ANSI MERGE): a target row matched by MORE
  * than one source row fails the statement (same error Delta raises) —
  * detected with one aggregation over the batch, not trusted to luck.
  */
case class GraftMergeCommand(
    root: String,
    key: String,
    target: LogicalPlan,
    source: LogicalPlan,
    cond: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_rewritten", IntegerType, nullable = false)(),
    AttributeReference("files_carried", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = bridge.ofRows(spark, target)
    val s = bridge.ofRows(spark, source)
    val tAttrs = target.output
    val tByName = tAttrs.map(a => a.name -> a).toMap
    val keyAttr = tByName.getOrElse(key, throw new IllegalStateException(
      s"graft MERGE: table at $root has no key column '$key'"))

    // source ⟗ current-snapshot on the merge condition. LEFT OUTER
    // when only MATCHED / NOT MATCHED branches exist (target rows that
    // match nothing are untouched and need not flow); FULL OUTER when
    // NOT MATCHED BY SOURCE actions exist — those fire on exactly the
    // target-only rows, and there is no sound file-level shortcut: a
    // target row OUTSIDE the source's key range is still "not matched
    // by source" and must receive the action. The cost stays one scan
    // + one join; the COMMIT stays pruned — applyCdcBatch rewrites
    // only the files whose key interval contains an AFFECTED key, and
    // unmatched target rows whose guards all fail drop out of the
    // batch before pruning (a guarded close-out touches only the files
    // holding rows it actually flips).
    val mMark = "__graft_matched"
    val sMark = "__graft_from_source"
    val bySource = notMatchedBySourceActions.nonEmpty
    val joined = s.withColumn(sMark, lit(true))
      .join(t.withColumn(mMark, lit(true)),
        bridge.column(cond), if (bySource) "full_outer" else "left_outer")
    val fromSource = coalesce(col(sMark), lit(false))
    val matched = fromSource && coalesce(col(mMark), lit(false))
    val targetOnly = !fromSource

    def guard(a: MergeAction): Column =
      a.condition.map(bridge.column).getOrElse(lit(true))

    // first-action-wins selector per branch: −1 = no action applies
    def selector(actions: Seq[MergeAction]): Column =
      actions.zipWithIndex.foldRight(lit(-1): Column) {
        case ((a, i), els) => when(guard(a), lit(i)).otherwise(els)
      }
    val mSel = when(matched, selector(matchedActions)).otherwise(lit(-1))
    val nSel = when(fromSource && !matched, selector(notMatchedActions))
      .otherwise(lit(-1))
    val bSel = when(targetOnly, selector(notMatchedBySourceActions))
      .otherwise(lit(-1))

    def assignmentMap(as: Seq[Assignment]): Map[String, Expression] =
      as.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"graft MERGE: cannot assign to $other (nested fields are " +
              "not supported)")
        }
        name -> a.value
      }.toMap

    // per-action value of each table column
    def valueOf(a: MergeAction, attr: Attribute): Column = a match {
      case u: UpdateAction =>
        val m = assignmentMap(u.assignments)
        if (attr.name == key) m.get(key) match {
          case None => bridge.column(keyAttr)
          case Some(ar: AttributeReference) if ar.exprId == keyAttr.exprId =>
            bridge.column(keyAttr)
          case Some(other) => throw new UnsupportedOperationException(
            s"graft MERGE: UPDATE must not reassign the key column " +
              s"'$key' (got $other) — a key change is a delete + insert")
        }
        else m.get(attr.name).map(bridge.column)
          .getOrElse(bridge.column(attr))
      case _: DeleteAction =>
        // only the key matters for a delete row; carry the target value
        bridge.column(attr)
      case i: InsertAction =>
        val m = assignmentMap(i.assignments)
        m.get(attr.name).map(bridge.column).getOrElse(
          bridge.column(Literal.create(null, attr.dataType)))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported action $other")
    }

    // UPDATE / INSERT rows ride the CDC 'replace' op: the batch row is
    // the COMPLETE post-action row (unassigned columns already carry
    // the target's value via valueOf), so an assignment that evaluates
    // to NULL writes NULL — ANSI UPDATE semantics, NOT the partial-
    // update coalesce of the 'upsert' CDC op.
    def opOf(a: MergeAction): String = a match {
      case _: DeleteAction => "delete"
      case _ => "replace"
    }

    def branch(sel: Column, actions: Seq[MergeAction],
        value: MergeAction => Column): Column =
      actions.zipWithIndex.foldRight(lit(null): Column) {
        case ((a, i), els) => when(sel === i, value(a)).otherwise(els)
      }

    val opCol =
      when(matched, branch(mSel, matchedActions, a => lit(opOf(a))))
        .when(targetOnly,
          branch(bSel, notMatchedBySourceActions, a => lit(opOf(a))))
        .otherwise(branch(nSel, notMatchedActions, a => lit(opOf(a))))
    val valueCols = tAttrs.map { attr =>
      when(matched, branch(mSel, matchedActions, valueOf(_, attr)))
        .when(targetOnly,
          branch(bSel, notMatchedBySourceActions, valueOf(_, attr)))
        .otherwise(branch(nSel, notMatchedActions, valueOf(_, attr)))
        .cast(attr.dataType).as(attr.name)
    }

    val batch = joined
      .select(valueCols :+ opCol.as("_op"): _*)
      .filter(col("_op").isNotNull) // rows no action claimed: untouched
      .cache()
    try {
      // ANSI MERGE cardinality: two source rows claiming one target key
      // (or two inserts minting the same key) is an error, not a race
      val dup = batch.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(count(lit(1)).as("k"), max(col(key)).as("ex"))
        .collect()(0)
      if (dup.getLong(0) > 0) throw new IllegalStateException(
        s"graft MERGE: ${dup.getLong(0)} key(s) targeted by more than " +
          s"one merge row (e.g. $key=${dup.get(1)}) — ANSI MERGE " +
          "requires each target row to match at most one source row")
      val (v, rewritten, carried) =
        GraftTable.applyCdcBatch(spark, root, batch, key)
      Seq(Row(v.toLong, rewritten, carried))
    } finally batch.unpersist()
  }
}

/** `UPDATE graft.t SET col = expr, ... WHERE ...` — the row-level
  * UPDATE statement, routed like [[GraftMergeCommand]] onto
  * `applyCdcBatch`: matching rows re-emitted with assignments applied,
  * tagged `replace` (assignments land verbatim — `SET col = NULL`
  * writes NULL, ANSI semantics), ONE pruned copy-on-write commit
  * (only files whose key interval contains an updated key rewrite).
  * Key reassignment refuses — a key change is a delete + insert,
  * exactly as in MERGE. */
case class GraftUpdateCommand(
    root: String,
    key: String,
    target: LogicalPlan,
    assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_rewritten", IntegerType, nullable = false)(),
    AttributeReference("files_carried", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = bridge.ofRows(spark, target)
    val byName = assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"graft UPDATE: cannot assign to $other (nested fields are " +
            "not supported)")
      }
      name -> a.value
    }.toMap
    val keyAttr = target.output.find(_.name == key).getOrElse(
      throw new IllegalStateException(
        s"graft UPDATE: table at $root has no key column '$key'"))
    byName.get(key).foreach {
      case ar: AttributeReference if ar.exprId == keyAttr.exprId => ()
      case other => throw new UnsupportedOperationException(
        s"graft UPDATE: must not reassign the key column '$key' " +
          s"(got $other) — a key change is a delete + insert")
    }
    val matched = condition.map(c => t.filter(bridge.column(c))).getOrElse(t)
    val batch = matched.select(target.output.map { attr =>
      byName.get(attr.name).map(bridge.column)
        .getOrElse(bridge.column(attr))
        .cast(attr.dataType).as(attr.name)
    } :+ lit("replace").as("_op"): _*)
    val (v, rewritten, carried) =
      GraftTable.applyCdcBatch(spark, root, batch, key)
    Seq(Row(v.toLong, rewritten, carried))
  }
}

/** Analyzer rewrite: a fully-resolved [[MergeIntoTable]] or
  * [[UpdateTable]] whose target is a graft catalog table becomes the
  * corresponding graft command. Non-graft targets are left for Spark's
  * own row-level-operation machinery (and its error messages). */
case class RewriteGraftMerge() extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan)
    : Option[(GraftSqlTable, LogicalPlan)] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftSqlTable => Some((g, r))
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case None => u
        case Some((g, _)) =>
          require(g.writable,
            s"cannot UPDATE a time-travelled graft table " +
              s"(VERSION AS OF ${g.snapshotVersion})")
          val spark = SparkSession.active
          val key = GraftTable.keyColumn(spark, g.root).getOrElse(
            throw new IllegalStateException(
              s"table at ${g.root} records no key column"))
          GraftUpdateCommand(g.root, key, u.table, u.assignments,
            u.condition)
      }
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case None => m
        case Some((g, _)) =>
          require(g.writable,
            s"cannot MERGE INTO a time-travelled graft table " +
              s"(VERSION AS OF ${g.snapshotVersion})")
          if (m.schemaEvolutionEnabled)
            throw new UnsupportedOperationException(
              "graft MERGE: WITH SCHEMA EVOLUTION is not supported; run " +
                "GraftTable.evolveAddColumns first")
          val spark = SparkSession.active
          val key = GraftTable.keyColumn(spark, g.root).getOrElse(
            throw new IllegalStateException(
              s"table at ${g.root} records no key column"))
          GraftMergeCommand(g.root, key, m.targetTable, m.sourceTable,
            m.mergeCondition, m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)
      }
  }
}
