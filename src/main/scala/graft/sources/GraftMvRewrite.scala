package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BinaryOperator, Cast, Expression, ExprId, Literal, NamedExpression}
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
  *    sit exactly at the source's current version AND at the scan's
  *    pinned snapshot (an MV one commit behind — or a `versionAsOf`
  *    historical read — is never served; `REFRESH MATERIALIZED VIEW`
  *    re-arms). A crash-pending cursor reads as not-fresh until
  *    refresh recovery settles it.
  *  - STRUCTURE must match exactly: the query's grouping SET must
  *    biject onto the MV's group columns — bare columns by attribute,
  *    derived GRAINS (`days(ts)`) by semantic equality against the
  *    transform's analyzed expression — and every aggregate must be
  *    one of the MV's maintained ones (by kind + input column, not by
  *    alias). Result data types identical.
  *  - FILTERS: a filtered MV serves a query whose WHERE is
  *    semantically EQUAL to the MV's stored predicate; additionally,
  *    EXTRA conjuncts referencing ONLY the MV's bare group columns
  *    are allowed on either MV form and become a POST-FILTER on the
  *    MV read — group-column predicates commute with GROUP BY, the
  *    one provably-safe subsumption step. General subsumption (query
  *    predicate ⊂ view predicate over aggregated columns) stays
  *    deliberately out of scope: containment proofs are where MV
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
    String, (Long, Long, Option[GraftMv.MvFacts])]()
  private val headMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, Int)]()

  private def memoDef(mvRoot: String): Option[GraftMv.MvFacts] = {
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

  /** Strip no-op casts (`Cast(e, e.dataType)`) everywhere in a tree —
    * the analyzer and `functions.*` builders sprinkle them
    * differently, and SimplifyCasts may or may not have run before
    * this rule's batch. */
  private def stripNoopCasts(e: Expression): Expression = e.transformUp {
    case c: Cast if c.child.dataType == c.dataType => c.child
  }

  private def sameExpr(a: Expression, b: Expression): Boolean =
    stripNoopCasts(a).semanticEquals(stripNoopCasts(b))

  /** Analyzed grain expression templates, cached per (transform expr,
    * schema signature): `days(ts)`'s value column is built from
    * unresolved `functions` calls, so resolving it needs the analyzer
    * — run ONCE over an empty frame with the relation's schema, then
    * re-bound per call by name (cheap transformUp). */
  private val grainMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Option[Expression]]()

  /** The grain transform of `g`, analyzed and bound to `out`'s
    * attributes — None when the transform can't resolve against the
    * relation (wrong column, type error): never rewrite on doubt. */
  private def grainExpr(g: MvGroup, out: Seq[Attribute])
    : Option[Expression] = {
    val sig = out.map(a => a.name + ":" + a.dataType.catalogString)
      .mkString(",")
    val template = grainMemo.computeIfAbsent((g.expr, sig), _ =>
      try {
        val schema = org.apache.spark.sql.types.StructType(out.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType,
            a.nullable)))
        val empty = session.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
        empty.select(PartitionTransform.parse(g.expr).valueCol.as("__g"))
          .queryExecution.analyzed match {
          case Project(Seq(Alias(child, _)), _) => Some(child)
          case _ => None
        }
      } catch { case _: Exception => None })
    template.map { t =>
      val byName = out.map(a => a.name -> a).toMap
      t.transformUp {
        case a: AttributeReference if byName.contains(a.name) =>
          byName(a.name)
      }
    }
  }

  /** Biject the query's grouping expressions onto the MV's group
    * columns: bare groups match a plan attribute by name (over this
    * relation), grains match by semantic equality with the analyzed
    * transform. Returns the (planExpr, mvGroupAlias) substitution
    * pairs in plan order, or None. */
  private def matchGroups(planGs: Seq[Expression], groups: Seq[MvGroup],
      out: Seq[Attribute]): Option[Seq[(Expression, MvGroup)]] = {
    if (planGs.size != groups.size) return None
    val outIds = out.map(_.exprId).toSet
    val remaining = scala.collection.mutable.ArrayBuffer(groups: _*)
    val pairs = planGs.map { pg =>
      val m = remaining.zipWithIndex.find { case (g, _) =>
        if (g.isBare) pg match {
          case a: AttributeReference =>
            a.name == g.alias && outIds.contains(a.exprId)
          case _ => false
        }
        else grainExpr(g, out).exists(ge => sameExpr(ge, pg))
      }
      m match {
        case Some((g, i)) => remaining.remove(i); Some((pg, g))
        case None => None
      }
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
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
    * each matched grouping expression substitutes with its MV group
    * column, and any scalar expression AROUND them (round,
    * arithmetic, casts) rides along unchanged — `round(avg(v), 4)`
    * serves from the MV's avg. None if any aggregate in the tree is
    * not maintained. */
  private def rewriteOutput(e: NamedExpression,
      groupSub: Seq[(Expression, MvGroup)], aggs: Seq[MvAgg],
      byName: Map[String, Attribute]): Option[Expression] = {
    var ok = true
    val t = e.transformUp {
      case ae @ AggregateExpression(fn, _, false, None, _) =>
        servedAlias(fn, aggs).flatMap(byName.get)
          .filter(_.dataType == ae.dataType) match {
          case Some(attr) => attr
          case None => ok = false; ae
        }
      case x if groupSub.exists(p => p._1.semanticEquals(x) ||
          sameExpr(p._1, x)) =>
        val g = groupSub.find(p => p._1.semanticEquals(x) ||
          sameExpr(p._1, x)).get._2
        byName.get(g.alias) match {
          case Some(attr) if attr.dataType == x.dataType => attr
          case _ => ok = false; x
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

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Conservatively null-intolerant: the tree contains NO node that
    * can evaluate to TRUE while a referenced input is NULL — any
    * Or / null-test / coalesce / conditional / negation anywhere
    * disqualifies (over-refusing only skips a rewrite, never serves
    * a wrong row). */
  private def nullIntolerant(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def tolerant(x: Expression): Boolean = x match {
      case _: Or | _: Not | _: IsNull | _: IsNotNull |
           _: EqualNullSafe | _: Coalesce | _: CaseWhen | _: If |
           _: AtLeastNNonNulls | _: Nvl2 | _: NullIf => true
      case _ => x.children.exists(tolerant)
    }
    !tolerant(e)
  }

  /** The MV's stored predicate text, parsed, resolved against the
    * relation and literal-coerced the way the analyzer left the plan
    * side. None on any parse/resolution surprise. */
  private def resolvedMvFilter(txt: String, out: Seq[Attribute])
    : Option[Expression] =
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
      if (!ok) return None
      Some(resolved.transformUp {
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
      })
    } catch { case _: Exception => None }

  /** Match the plan's filter condition against the MV's stored
    * predicate, allowing a RESIDUAL of extra conjuncts that reference
    * ONLY the MV's bare group columns (`bareGroupIds`) — those commute
    * with GROUP BY and post-filter the MV read, the one provably-safe
    * subsumption widening. Returns Some(residualConjuncts) when the
    * rewrite may serve (possibly empty — exact match), None when it
    * must not.
    *
    * Rules, in order:
    *  - every MV conjunct must be matched semantically by a plan
    *    conjunct (the plan must be AT LEAST as restrictive in exactly
    *    the MV's own terms — never serve a SUPERSET of the MV's rows);
    *  - the optimizer's inferred `isnotnull(a)` decorations are
    *    absolved only by a NULL-INTOLERANT MV conjunct referencing
    *    `a` (a null-tolerant predicate like `v IS NULL OR v > 3`
    *    keeps NULL rows — its isnotnull is load-bearing) — or kept as
    *    residual when `a` is a bare group column;
    *  - every remaining plan conjunct must reference only bare group
    *    columns → residual. Anything else refuses. */
  private def filterResidual(mvFilter: Option[String],
      cond: Option[Expression], out: Seq[Attribute],
      bareGroupIds: Set[ExprId]): Option[Seq[Expression]] = {
    val mvCs: Seq[Expression] = mvFilter match {
      case None => Seq.empty
      case Some(txt) => resolvedMvFilter(txt, out) match {
        case Some(r) => conjuncts(r)
        case None => return None
      }
    }
    val planCs = cond.map(conjuncts).getOrElse(Seq.empty)
    // every MV conjunct must appear in the plan (else the query asks
    // for MORE rows than the MV aggregated)
    if (!mvCs.forall(m => planCs.exists(_.semanticEquals(m)))) return None
    val mvStrictIds = mvCs.filter(nullIntolerant)
      .flatMap(_.references.toSeq).map(_.exprId).toSet
    val leftovers = planCs.filterNot(p => mvCs.exists(_.semanticEquals(p)))
      .filterNot {
        // inferred isnotnull absolved by a null-intolerant MV conjunct
        case org.apache.spark.sql.catalyst.expressions
          .IsNotNull(a: AttributeReference) => mvStrictIds.contains(a.exprId)
        case _ => false
      }
    // residual admissibility: bare group columns only (group-column
    // predicates commute with GROUP BY; anything touching aggregated
    // columns or grain INPUTS does not)
    if (leftovers.forall(l =>
        l.references.nonEmpty &&
        l.references.forall(r => bareGroupIds.contains(r.exprId))))
      Some(leftovers)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = registered
    if (views.isEmpty) return plan
    // peel Projects of attributes AND aliases (column pruning inserts
    // attribute-only ones; PullOutGroupingExpressions rewrites a
    // complex grouping expression — a grain like days(ts) — into an
    // `Alias AS _groupingexpression` in a Project below the Aggregate)
    // and collect the filter condition plus the alias→expression map,
    // down to the relation. The caller INLINES the aliases back so
    // grouping/output matching sees the real expressions.
    def peel(p: LogicalPlan): (Option[Expression],
        Map[ExprId, Expression], LogicalPlan) = p match {
      case Project(ps, c) if ps.forall(e =>
          e.isInstanceOf[Attribute] || e.isInstanceOf[Alias]) =>
        val (cond, m0, rel) = peel(c)
        val m = ps.collect { case al: Alias =>
          al.exprId -> al.child.transformUp {
            case a: AttributeReference if m0.contains(a.exprId) =>
              m0(a.exprId)
          }
        }.toMap
        (cond, m0 ++ m, rel)
      case Filter(c, r) =>
        val (inner, m0, rel) = peel(r)
        (inner match {
          case Some(i) =>
            Some(org.apache.spark.sql.catalyst.expressions.And(c, i))
          case None => Some(c)
        }, m0, rel)
      case other => (None, Map.empty, other)
    }
    plan.transformUp {
      case agg @ Aggregate(groupingExprs0, aggExprs0, child0, _)
          if groupingExprs0.nonEmpty &&
            rootOf(peel(child0)._3).isDefined =>
        val (cond0, aliasMap, rel) = peel(child0)
        def inline(e: Expression): Expression = e.transformUp {
          case a: AttributeReference if aliasMap.contains(a.exprId) =>
            aliasMap(a.exprId)
        }
        def inlineNamed(e: NamedExpression): NamedExpression = e match {
          case a: AttributeReference if aliasMap.contains(a.exprId) =>
            Alias(aliasMap(a.exprId), a.name)(exprId = a.exprId)
          case other => inline(other).asInstanceOf[NamedExpression]
        }
        val groupingExprs = groupingExprs0.map(inline)
        val aggExprs = aggExprs0.map(inlineNamed)
        val cond = cond0.map(inline)
        val (srcRoot, scanV) = rootOf(rel).get
        val relByName = rel.output.map(a => a.name -> a).toMap
        val candidate = views.iterator.flatMap { mvRoot =>
          memoDef(mvRoot) match {
            case Some(facts)
                if facts.source == srcRoot && facts.lastV >= 0 &&
                  // the scan's PINNED snapshot must be the exact
                  // version the MV is refreshed to (a versionAsOf
                  // historical read must never serve from a
                  // head-fresh MV), and that version must be the
                  // source's current head
                  scanV == facts.lastV &&
                  facts.lastV == memoHead(facts.source) =>
              val bareGroupIds = facts.groups.filter(_.isBare)
                .flatMap(g => relByName.get(g.alias)).map(_.exprId).toSet
              (matchGroups(groupingExprs, facts.groups, rel.output),
                filterResidual(facts.filter, cond, rel.output,
                  bareGroupIds)) match {
                case (Some(groupSub), Some(residual)) =>
                  val mvPlan = GraftMv.read(session, mvRoot)
                    .queryExecution.analyzed
                  val byName = mvPlan.output.map(a => a.name -> a).toMap
                  // every output must rewrite onto the MV's columns
                  val mapped = aggExprs.map(e =>
                    rewriteOutput(e, groupSub, facts.aggs, byName))
                  // the residual re-binds onto the MV's group columns
                  // (same names, the MV's exprIds)
                  var resOk = true
                  val boundResidual = residual.map(_.transformUp {
                    case a: AttributeReference =>
                      byName.get(a.name) match {
                        case Some(m) if m.dataType == a.dataType => m
                        case _ => resOk = false; a
                      }
                  })
                  if (mapped.forall(_.isDefined) && resOk)
                    Some((mvPlan, mapped, boundResidual))
                  else None
                case _ => None
              }
            case _ => None
          }
        }.take(1).toSeq.headOption
        candidate match {
          case Some((mvPlan, mapped, boundResidual)) =>
            val base =
              if (boundResidual.isEmpty) mvPlan
              else Filter(boundResidual.reduce(
                org.apache.spark.sql.catalyst.expressions.And(_, _)),
                mvPlan)
            // re-alias under the Aggregate's exprIds so downstream
            // references stay resolved
            Project(agg.output.zip(mapped).map { case (out, Some(t)) =>
              t match {
                case ne: NamedExpression if ne.exprId == out.exprId => ne
                case other => Alias(other, out.name)(exprId = out.exprId)
              }
            }, base)
          case None => agg
        }
    }
  }
}
