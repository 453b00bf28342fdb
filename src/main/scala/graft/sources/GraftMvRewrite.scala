package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BinaryOperator, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the Snowflake/BigQuery
  * capability: a `GROUP BY` query over a graft table is answered from
  * a REGISTERED, FRESH [[GraftMv]] instead of the table, without the
  * query changing a character. `SELECT cust, count(*), sum(cents)
  * FROM cat.orders GROUP BY cust` over a 100 TB fact becomes a read
  * of the (groups-sized) MV — the scan drops from the table's bytes
  * to the answer's.
  *
  * Opt-in and sound by construction:
  *  - `spark.graft.mv.rewrite.views` names the candidate MV roots
  *    (comma-separated). Empty (the default) → the rule is a no-op.
  *  - FRESHNESS is checked at planning: the MV's refresh cursor must
  *    sit exactly at the source's current version (an MV one commit
  *    behind serves stale rows — the rule then leaves the plan
  *    alone; `REFRESH MATERIALIZED VIEW` re-arms it). A crash-pending
  *    cursor reads as not-fresh until refresh recovery settles it.
  *  - STRUCTURE must match exactly: grouping on the MV's group
  *    column, every aggregate one of the MV's maintained ones (by
  *    kind + input column, not by alias — the query's aliases are
  *    free), result data types identical. A FILTERED MV serves only
  *    a query whose WHERE is semantically EQUAL to the MV's stored
  *    predicate (parsed, resolved against the relation, literal
  *    types aligned, then compared canonically — commutative AND/OR
  *    order-free). Subsumption (query predicate ⊂ view predicate)
  *    is deliberately out of scope: a containment proof is where MV
  *    rewrites historically go wrong, and wrong is worse than slow.
  *
  * The substituted plan projects the MV's columns under the
  * Aggregate's own output expression ids, so every downstream
  * reference resolves unchanged (the [[graft.plans.ResolveCubeGuard]]
  * idiom). Ref: transparent aggregate routing in Snowflake MVs /
  * BigQuery MVs; Goldstein & Larson, "Optimizing queries using
  * materialized views" (SIGMOD '01) for the containment framing. */
case class GraftMvRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def registered: Seq[String] = {
    val explicit = session.conf.getOption("spark.graft.mv.rewrite.views")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // DISCOVERY mode: point at warehouse base dir(s) — every child
    // table carrying an MV definition becomes a rewrite candidate, so
    // `CREATE MATERIALIZED VIEW cat.mv AS …` is immediately servable
    // with zero further registration (the Snowflake UX). One listing
    // per TTL window per base; the per-MV def/freshness checks below
    // are unchanged.
    val discovered = session.conf
      .getOption("spark.graft.mv.rewrite.discover")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
      .flatMap(memoDiscover)
    (explicit ++ discovered).distinct
  }

  private val discoverMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Seq[String])]()

  private def memoDiscover(base: String): Seq[String] = {
    val now = System.currentTimeMillis()
    val hit = discoverMemo.get(base)
    if (hit != null && now - hit._1 < memoTtlMs) hit._2
    else {
      val v = try {
        val p = new org.apache.hadoop.fs.Path(base)
        val f = p.getFileSystem(session.sparkContext.hadoopConfiguration)
        if (!f.exists(p)) Seq.empty
        else f.listStatus(p).filter(_.isDirectory).map(_.getPath)
          .filter(d => f.exists(
            new org.apache.hadoop.fs.Path(d, "_log/mv.def")))
          .map(_.toUri.getPath).toSeq
      } catch { case _: Exception => Seq.empty }
      discoverMemo.put(base, (now, v))
      v
    }
  }

  /** PLANNING-TAX guard: the operator-optimization batch runs to a
    * fixed point, re-visiting every non-matching Aggregate each
    * iteration — without a memo each visit would re-read the MV def
    * and re-list the source's version log. A sub-second TTL keeps
    * those at ~one metadata read per QUERY while still observing a
    * refresh that lands between queries. Every memo additionally
    * carries the [[GraftTable.commitEpoch]] it was read at and is
    * DEAD the instant any same-session commit (table write or MV
    * cursor advance) lands — read-your-writes freshness is exact
    * in-process; only cross-process writers see the TTL window, which
    * is equivalent to the unavoidable plan-to-execute TOCTOU any
    * planning-time freshness check carries. */
  private val memoTtlMs = 500L
  private val defMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, Option[(String, String, Seq[MvAgg], Int, Option[String])])]()
  private val headMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, Int)]()

  private def memoDef(mvRoot: String)
    : Option[(String, String, Seq[MvAgg], Int, Option[String])] = {
    val now = System.currentTimeMillis()
    val epoch = GraftTable.commitEpoch.get()
    val hit = defMemo.get(mvRoot)
    if (hit != null && hit._1 == epoch && now - hit._2 < memoTtlMs) hit._3
    else {
      val v = GraftMv.defFor(session, mvRoot)
      defMemo.put(mvRoot, (epoch, now, v))
      v
    }
  }

  private def memoHead(root: String): Int = {
    val now = System.currentTimeMillis()
    val epoch = GraftTable.commitEpoch.get()
    val hit = headMemo.get(root)
    if (hit != null && hit._1 == epoch && now - hit._2 < memoTtlMs) hit._3
    else {
      val v = GraftTable.latestVersion(session, root)
      headMemo.put(root, (epoch, now, v))
      v
    }
  }

  /** The graft table root a plan node scans — WITH the snapshot
    * version the scan is pinned to — if it is a plain (unfiltered,
    * unprojected-or-attr-only) read of one. The version matters:
    * `.option("versionAsOf", v)` loads stay `writable = true`, so a
    * GROUP BY over a HISTORICAL snapshot reaches here too, and
    * serving it from an MV sitting at the source's head would be
    * silently wrong — the caller requires the pinned version to equal
    * the MV's refresh cursor before rewriting. */
  private def rootOf(plan: LogicalPlan): Option[(String, Int)] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSqlTable if t.writable =>
        Some((t.root, t.snapshotVersion))
      case _ => None
    }
    case s: DataSourceV2ScanRelation => s.scan match {
      case g: GraftBatchScan if g.pushedAgg.isEmpty && g.branch.isEmpty =>
        Some((g.root, g.version))
      case _ => None
    }
    // a column-pruning Project of plain attributes is transparent
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      rootOf(child)
    case _ => None
  }

  /** The MV alias serving one aggregate function call, if maintained
    * — matched by (kind, input column), never by name (the query's
    * aliases are free). */
  private def servedAlias(fn: org.apache.spark.sql.catalyst.expressions
      .aggregate.AggregateFunction, aggs: Seq[MvAgg]): Option[String] = {
    val wanted: Option[(String, String)] = fn match {
      case Count(Seq(Literal(1, _))) => Some(("count", ""))
      case Sum(c: AttributeReference, _) => Some(("sum", c.name))
      case Min(c: AttributeReference) => Some(("min", c.name))
      case Max(c: AttributeReference) => Some(("max", c.name))
      case Average(c: AttributeReference, _) => Some(("avg", c.name))
      case _ => None
    }
    wanted.flatMap { case (kind, colName) =>
      aggs.find(a => a.kind == kind &&
        (kind == "count" || a.col == colName)).map(_.alias)
    }
  }

  /** Rewrite one output expression of the Aggregate onto the MV's
    * columns: every [[AggregateExpression]] in the tree substitutes
    * with its served MV attribute (same data type required — a swap
    * that widened or narrowed would corrupt downstream arithmetic),
    * the group attribute substitutes with the MV key, and any scalar
    * expression AROUND them (round, arithmetic, casts) rides along
    * unchanged — `round(avg(v), 4)` serves from the MV's avg. None if
    * any aggregate in the tree is not maintained. */
  private def rewriteOutput(e: NamedExpression, g: AttributeReference,
      group: String, aggs: Seq[MvAgg],
      byName: Map[String, Attribute]): Option[Expression] = {
    var ok = true
    val t = e.transformUp {
      case ae @ AggregateExpression(fn, _, false, None, _) =>
        servedAlias(fn, aggs).flatMap(byName.get)
          .filter(_.dataType == ae.dataType) match {
          case Some(attr) => attr
          case None => ok = false; ae
        }
      case a: AttributeReference if a.exprId == g.exprId =>
        byName.get(group) match {
          case Some(attr) if attr.dataType == a.dataType => attr
          case _ => ok = false; a
        }
    }
    if (ok) Some(t) else None
  }

  /** Literal coerced to `dt` at plan time — how the analyzer's type
    * coercion left the PLAN side's literals, re-done on the parsed
    * side so canonical comparison sees identical trees. */
  private def castLit(l: Literal, dt: org.apache.spark.sql.types.DataType)
    : Option[Literal] =
    try Option(Cast(l, dt).eval(null)).map(Literal(_, dt))
    catch { case _: Exception => None }

  /** Does the MV's stored predicate text mean EXACTLY the plan's
    * filter condition over this relation? Parse → resolve attributes
    * by name → align literal types across binary operators (the
    * analyzer did the same to the plan) → semantic comparison
    * (canonicalization reorders commutative AND/OR). Any parse or
    * resolution surprise answers false — never rewrite on doubt. */
  private def filterMatches(txt: String, cond: Expression,
      out: Seq[Attribute]): Boolean =
    try {
      val byName = out.map(a => a.name -> a).toMap
      var ok = true
      val resolved = session.sessionState.sqlParser.parseExpression(txt)
        .transformUp {
          case u: UnresolvedAttribute => byName.get(u.name) match {
            case Some(a) => a
            case None => ok = false; u
          }
        }
      if (!ok) return false
      val coerced = resolved.transformUp {
        case b: BinaryOperator if b.left.dataType != b.right.dataType =>
          (b.left, b.right) match {
            case (a, l: Literal) =>
              castLit(l, a.dataType)
                .map(nl => b.withNewChildren(Seq(a, nl))).getOrElse(b)
            case (l: Literal, a) =>
              castLit(l, a.dataType)
                .map(nl => b.withNewChildren(Seq(nl, a))).getOrElse(b)
            case _ => b
          }
      }
      // conjunct-SET comparison: the optimizer's
      // InferFiltersFromConstraints decorates the plan's filter with
      // `isnotnull` conjuncts IMPLIED by its null-intolerant
      // predicates — those are discardable iff some MV-side conjunct
      // referencing the attribute is itself NULL-INTOLERANT in it
      // (then the MV's own build/refresh filter rejected NULLs
      // identically, so the isnotnull adds nothing). Reference alone
      // is NOT enough: an MV filter like `v IS NULL OR v > 3`
      // references v but KEEPS its NULL rows — discarding the query's
      // `v IS NOT NULL` against it would serve rows the query
      // excludes.
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      // conservatively null-intolerant: the tree contains NO node that
      // can evaluate to TRUE while a referenced input is NULL — any
      // Or / null-test / coalesce / conditional / negation anywhere
      // disqualifies (over-refusing only skips a rewrite, never
      // serves a wrong row)
      def nullIntolerant(e: Expression): Boolean = {
        import org.apache.spark.sql.catalyst.expressions._
        def tolerant(x: Expression): Boolean = x match {
          case _: Or | _: Not | _: IsNull | _: IsNotNull |
               _: EqualNullSafe | _: Coalesce | _: CaseWhen | _: If |
               _: AtLeastNNonNulls | _: Nvl2 | _: NullIf => true
          case _ => x.children.exists(tolerant)
        }
        !tolerant(e)
      }
      val mvCs = conjuncts(coerced)
      val mvStrictIds = mvCs.filter(nullIntolerant)
        .flatMap(_.references.toSeq).map(_.exprId).toSet
      val planCs = conjuncts(cond).filterNot {
        case org.apache.spark.sql.catalyst.expressions
          .IsNotNull(a: AttributeReference) => mvStrictIds.contains(a.exprId)
        case _ => false
      }
      planCs.size == mvCs.size &&
        planCs.forall(p => mvCs.exists(_.semanticEquals(p))) &&
        mvCs.forall(m => planCs.exists(_.semanticEquals(m)))
    } catch { case _: Exception => false }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = registered
    if (views.isEmpty) return plan
    // peel attribute-only Projects (column pruning inserts them on
    // either side of the Filter depending on batch ordering) and
    // collect the filter condition, down to the relation
    def peel(p: LogicalPlan): (Option[Expression], LogicalPlan) = p match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[Attribute]) => peel(c)
      case Filter(c, r) =>
        val (inner, rel) = peel(r)
        (inner match {
          case Some(i) =>
            Some(org.apache.spark.sql.catalyst.expressions.And(c, i))
          case None => Some(c)
        }, rel)
      case other => (None, other)
    }
    plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child0, _)
          if rootOf(peel(child0)._2).isDefined =>
        val (cond, rel) = peel(child0)
        val (srcRoot, scanV) = rootOf(rel).get
        val candidate = views.iterator.flatMap { mvRoot =>
          memoDef(mvRoot) match {
            case Some((source, group, mvAggs, lastV, mvFilter))
                if source == srcRoot && group == g.name &&
                  lastV >= 0 &&
                  // the scan's PINNED snapshot must be the exact
                  // version the MV is refreshed to (a versionAsOf
                  // historical read must never serve from a
                  // head-fresh MV), and that version must be the
                  // source's current head
                  scanV == lastV &&
                  lastV == memoHead(source) &&
                  // unfiltered query ↔ unfiltered MV; filtered query ↔
                  // an MV whose predicate means exactly the same
                  ((cond, mvFilter) match {
                    case (None, None) => true
                    case (Some(c), Some(txt)) =>
                      filterMatches(txt, c, rel.output)
                    case _ => false
                  }) =>
              val mvPlan = GraftMv.read(session, mvRoot)
                .queryExecution.analyzed
              val byName = mvPlan.output.map(a => a.name -> a).toMap
              // every output must rewrite onto the MV's columns
              val mapped = aggExprs.map(e =>
                rewriteOutput(e, g, group, mvAggs, byName))
              if (mapped.forall(_.isDefined)) Some((mvPlan, mapped))
              else None
            case _ => None
          }
        }.take(1).toSeq.headOption
        candidate match {
          case Some((mvPlan, mapped)) =>
            // re-alias under the Aggregate's exprIds so downstream
            // references stay resolved
            Project(agg.output.zip(mapped).map { case (out, Some(t)) =>
              t match {
                case ne: NamedExpression if ne.exprId == out.exprId => ne
                case other => Alias(other, out.name)(exprId = out.exprId)
              }
            }, mvPlan)
          case None => agg
        }
    }
  }
}
