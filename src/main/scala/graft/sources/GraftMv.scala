package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One aggregate column of a materialized view: `kind` ∈
  * count | sum | min | max | avg (`col` ignored for count). Values
  * are maintained as longs — the engine-wide cents/epoch idiom, exact
  * under delta arithmetic (no float drift across refreshes). `avg`
  * never materializes the quotient (that would turn an exact delta
  * into a lossy one): the MV stores a hidden exact (sum, non-null
  * count) pair and [[GraftMv.read]] serves `sum / count` — a
  * delta-maintained avg with zero drift. */
final case class MvAgg(kind: String, col: String, alias: String) {
  require(Set("count", "sum", "min", "max", "avg")(kind),
    s"MvAgg kind must be count|sum|min|max|avg, got '$kind'")
}

/** One GROUP BY column of a materialized view: a bare source column
  * (`alias == expr`) or a DERIVED GRAIN — a [[PartitionTransform]]
  * expression (`days(ts)`, `months(ts)`, `years(ts)`,
  * `truncate(w,c)`, `bucket(n,c)`) evaluated to its long value and
  * served under `alias`. The transform set is exactly the DPP/layout
  * machinery's, so write-side grouping, refresh-side feed grouping,
  * and the rewrite matcher all share one evaluation and can never
  * drift. */
final case class MvGroup(alias: String, expr: String) {
  require(alias.nonEmpty && !alias.startsWith("__mv_"),
    s"bad MV group alias '$alias'")
  def isBare: Boolean = expr == alias
  /** The group value of a row (the transform's long for grains). */
  def valueCol: Column =
    if (isBare) col(alias) else PartitionTransform.parse(expr).valueCol
}

/** INCREMENTAL MATERIALIZED VIEWS over a graft table — the engine's
  * answer to "keep this GROUP BY fresh without recomputing it": the
  * MV is itself a graft table (keyed by the group tuple — every
  * read/time-travel/SQL capability applies), its definition and
  * refresh cursor live next to its log, and [[refresh]] advances it
  * by reading the SOURCE's change feed ([[GraftTable.changes]] in
  * retraction form) instead of the source:
  *
  *  - count/sum MVs refresh by PURE DELTA MERGE: the feed's ±
  *    contributions fold into the stored values per dirty group —
  *    the source is NEVER read, cost O(feed + dirty groups) however
  *    large the source (the DBSP/Materialize z-set rule, in batch
  *    clothing).
  *  - min/max MVs cannot subtract (a deleted max needs the
  *    runner-up), so dirty groups RE-AGGREGATE from a source read
  *    SEMI-JOIN-pruned to those groups — cost O(rows of dirty
  *    groups), still never O(source). The standard retractable-agg
  *    trade, documented rather than hidden.
  *
  * GROUP keys: one or more columns, each a bare column or a derived
  * GRAIN (`days(ts)` — the reference's own fact cube is
  * time×product×location, FactTable.sql:78-110). A single bare group
  * keys the MV table on that column directly; a composite (or
  * grained) group synthesizes a hidden `__mv_g` STRING key — the
  * group values joined with a unit separator — and rides the
  * hash-ledgered string-key machinery ([[GraftTable.keyHashMode]]):
  * exact tuple identity, no hash-collision group merging.
  *
  * A hidden `__mv_n` live-row count rides every MV (delta-able group
  * death is `__mv_n → 0` — those groups DELETE from the MV rather
  * than linger as zeros). Refresh is CRASH-SAFE via a write-ahead
  * intent in the cursor file: the apply commits to the MV table
  * first, the cursor advances second, and recovery decides by
  * comparing the MV's version against the intent — a re-run never
  * double-applies a delta window. Single concurrent refresher
  * assumed (it is a maintenance job, like OPTIMIZE).
  *
  * Refs: the reference's rollup relations are rebuilt wholesale — the
  * `fact_staging1..3` CTAS chain (FactTable.sql:15-110) recomputes
  * every aggregation level from scratch on each run; this is the
  * scale-path replacement. */
object GraftMv {

  private def defPath(mvRoot: String) =
    new org.apache.hadoop.fs.Path(mvRoot, "_log/mv.def")

  /** Definition facts as the rewrite rule and tooling consume them. */
  final case class MvFacts(source: String, groups: Seq[MvGroup],
      aggs: Seq[MvAgg], lastV: Int, filter: Option[String])

  private final case class MvDef(source: String, sourceKey: String,
      groups: Seq[MvGroup], aggs: Seq[MvAgg], lastV: Int,
      pending: Option[(Int, Int, Int)], // (from, to, expectedMvVersion)
      filter: Option[String] = None) // row predicate (SQL expression)

  private def render(d: MvDef): String = {
    val b = new StringBuilder
    b ++= s"source\t${d.source}\n"
    b ++= s"sourceKey\t${d.sourceKey}\n"
    // legacy 2-field form for a single bare column (older readers keep
    // working); 3-field `group\talias\texpr` for grains/composites
    d.groups.foreach { g =>
      if (d.groups.size == 1 && g.isBare) b ++= s"group\t${g.alias}\n"
      else b ++= s"group\t${g.alias}\t${g.expr}\n"
    }
    d.filter.foreach(f => b ++= s"filter\t$f\n")
    d.aggs.foreach(a => b ++= s"agg\t${a.kind}\t${a.col}\t${a.alias}\n")
    b ++= s"lastv\t${d.lastV}\n"
    d.pending.foreach { case (f, t, e) => b ++= s"pending\t$f\t$t\t$e\n" }
    b.result()
  }

  private def writeDef(spark: SparkSession, mvRoot: String,
      d: MvDef): Unit = {
    val p = defPath(mvRoot)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = f.create(p, true)
    try os.write(render(d).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    // a cursor advance changes rewrite-visible freshness exactly like
    // a table commit — invalidate same-session planning memos
    GraftTable.commitEpoch.incrementAndGet()
  }

  private def readDef(spark: SparkSession, mvRoot: String): MvDef = {
    val p = defPath(mvRoot)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p), s"no materialized view at $mvRoot")
    val in = f.open(p)
    val text =
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    var source = ""; var sourceKey = ""
    val groups = Seq.newBuilder[MvGroup]
    val aggs = Seq.newBuilder[MvAgg]
    var lastV = -1; var pending: Option[(Int, Int, Int)] = None
    var filt: Option[String] = None
    text.linesIterator.filter(_.nonEmpty).foreach { l =>
      l.split('\t') match {
        case Array("source", v) => source = v
        case Array("sourceKey", v) => sourceKey = v
        case Array("group", v) => groups += MvGroup(v, v)
        case Array("group", a, e) => groups += MvGroup(a, e)
        case Array("filter", v) => filt = Some(v)
        case Array("agg", k, c, a) => aggs += MvAgg(k, c, a)
        case Array("lastv", v) => lastV = v.toInt
        case Array("pending", f0, t, e) =>
          pending = Some((f0.toInt, t.toInt, e.toInt))
        case _ => () // forward compatibility
      }
    }
    MvDef(source, sourceKey, groups.result(), aggs.result(), lastV,
      pending, filt)
  }

  private val HiddenN = "__mv_n"
  private val HiddenG = "__mv_g"
  private def nnOf(alias: String) = s"__mv_nn_$alias"
  private def sOf(alias: String) = s"__mv_s_$alias"

  /** Whether the MV needs the synthesized composite key (anything but
    * a single bare group column). */
  private def composite(groups: Seq[MvGroup]): Boolean =
    groups.size > 1 || !groups.head.isBare

  /** The MV table's key column name. */
  private def keyOf(groups: Seq[MvGroup]): String =
    if (composite(groups)) HiddenG else groups.head.alias

  /** The hidden composite key value from the (already materialized)
    * group ALIAS columns: group values joined with the unit separator,
    * NULLs encoded distinctly — exact tuple identity (it rides the
    * hash-ledgered string-key machinery; the ledger hashes, row
    * operations compare the full string). */
  private def gidCol(groups: Seq[MvGroup]): Column =
    concat_ws("\u001F", groups.map(g =>
      when(col(g.alias).isNull, lit("\u0000"))
        .otherwise(col(g.alias).cast("string"))): _*)

  /** Materialize every group column (bare passthrough; grains compute
    * the transform value under the alias). */
  private def withGroups(df: DataFrame, groups: Seq[MvGroup]): DataFrame =
    groups.foldLeft(df)((d, g) =>
      if (g.isBare) d else d.withColumn(g.alias, g.valueCol))

  /** The STORED user-visible aggregate aliases — avg stores only its
    * hidden (sum, count) pair and is computed at [[read]] time. */
  private def visibleStored(aggs: Seq[MvAgg]): Seq[String] =
    aggs.filterNot(_.kind == "avg").map(_.alias)

  /** Full-aggregation columns: the user's aggregates, plus a NON-NULL
    * count per sum column (SQL sum of zero non-null inputs is NULL —
    * a pure ± delta can't know when the last non-null contribution
    * left, so the MV carries the count), plus avg's exact hidden
    * (sum, non-null count) pair, plus the live-row count. */
  private def aggCols(aggs: Seq[MvAgg]): Seq[org.apache.spark.sql.Column] =
    (aggs.flatMap {
      case MvAgg("count", _, alias) => Seq(count(lit(1)).as(alias))
      case MvAgg("sum", c, alias) => Seq(sum(col(c).cast("long")).as(alias))
      case MvAgg("min", c, alias) => Seq(min(col(c).cast("long")).as(alias))
      case MvAgg("max", c, alias) => Seq(max(col(c).cast("long")).as(alias))
      case MvAgg("avg", _, _) => Seq.empty // hidden pair below
      case a => sys.error(s"unreachable: $a")
    }) ++ aggs.flatMap {
      case MvAgg("sum", c, alias) => Seq(count(col(c)).as(nnOf(alias)))
      case MvAgg("avg", c, alias) => Seq(
        sum(col(c).cast("long")).as(sOf(alias)),
        count(col(c)).as(nnOf(alias)))
      case _ => Seq.empty
    } :+ count(lit(1)).as(HiddenN)

  private def hiddenCols(aggs: Seq[MvAgg]): Seq[String] =
    aggs.flatMap {
      case MvAgg("sum", _, alias) => Seq(nnOf(alias))
      case MvAgg("avg", _, alias) => Seq(sOf(alias), nnOf(alias))
      case _ => Seq.empty
    } :+ HiddenN

  /** Define + fully build a materialized view of
    * `SELECT groups…, aggs… FROM source GROUP BY groups…` at
    * `mvRoot`. Single-bare-group form — see the [[MvGroup]] overload
    * for multi-column / grained groups. */
  def create(spark: SparkSession, mvRoot: String, sourceRoot: String,
      group: String, aggs: Seq[MvAgg], nBuckets: Int = 8,
      filter: Option[String] = None): Int =
    createGrouped(spark, mvRoot, sourceRoot, Seq(MvGroup(group, group)),
      aggs, nBuckets, filter)

  /** [[create]] for MULTI-COLUMN and GRAIN group keys — the
    * reference's own cube shape (time×product×location,
    * FactTable.sql:78-110): `Seq(MvGroup("cust","cust"),
    * MvGroup("day","days(ts)"))`. */
  def createGrouped(spark: SparkSession, mvRoot: String,
      sourceRoot: String, groups: Seq[MvGroup], aggs: Seq[MvAgg],
      nBuckets: Int = 8, filter: Option[String] = None): Int = {
    require(groups.nonEmpty, "an MV needs at least one group column")
    require(groups.map(_.alias).distinct.size == groups.size,
      "MV group aliases must be distinct")
    require(aggs.nonEmpty, "an MV needs at least one aggregate")
    require(aggs.map(_.alias).distinct.size == aggs.size,
      "MV aliases must be distinct")
    require(!aggs.exists(_.alias.startsWith("__mv_")),
      "MV aliases must not start with the reserved '__mv_' prefix " +
        "(it names the hidden bookkeeping columns)")
    require(groups.map(_.alias).intersect(aggs.map(_.alias)).isEmpty,
      "MV group and aggregate aliases must not collide")
    // grains must parse up front (fail at create, not first refresh)
    groups.filterNot(_.isBare).foreach(g => PartitionTransform.parse(g.expr))
    filter.foreach(f => require(!f.exists(c => c == '\t' || c == '\n'),
      "MV filter must be a single-line SQL expression"))
    val srcV = GraftTable.latestVersion(spark, sourceRoot)
    require(srcV >= 0, s"no source table at $sourceRoot")
    val srcKey = GraftTable.keyColumn(spark, sourceRoot).getOrElse(
      sys.error(s"MV source at $sourceRoot needs a recorded key column"))
    // a FILTERED MV aggregates the predicate's row subset; the same
    // predicate applied per change-feed row keeps the delta exact (a
    // row-level predicate commutes with the feed's ± retraction form —
    // an update crossing the boundary is exactly one −old/+new pair)
    val src0 = GraftTable.read(spark, sourceRoot, Some(srcV))
    val src = withGroups(
      filter.map(f => src0.filter(expr(f))).getOrElse(src0), groups)
    val gCols = groups.map(g => col(g.alias))
    val full0 = src.groupBy(gCols: _*)
      .agg(aggCols(aggs).head, aggCols(aggs).tail: _*)
    val (full, key) =
      if (composite(groups))
        (full0.withColumn(HiddenG, gidCol(groups)), HiddenG)
      else (full0, groups.head.alias)
    GraftTable.create(spark, mvRoot, full, key, nBuckets)
    writeDef(spark, mvRoot,
      MvDef(sourceRoot, srcKey, groups, aggs, srcV, None, filter))
    srcV
  }

  /** Definition facts the TRANSPARENT REWRITE rule needs. None if no
    * MV lives at `mvRoot`. */
  private[sources] def defFor(spark: SparkSession, mvRoot: String)
    : Option[MvFacts] = {
    val p = defPath(mvRoot)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val d = readDef(spark, mvRoot)
      // an UNRESOLVED crash intent means the cursor may understate
      // lastV — the conservative read for freshness is "not fresh";
      // refresh() recovery will settle it
      val lastV = if (d.pending.isDefined) -1 else d.lastV
      Some(MvFacts(d.source, d.groups, d.aggs, lastV, d.filter))
    }
  }

  /** The MV's rows WITHOUT the bookkeeping columns — avg aliases are
    * served here as `sum / count` from the hidden exact pair (NULL
    * when no non-null contribution lives, the SQL avg rule). */
  def read(spark: SparkSession, mvRoot: String): DataFrame = {
    val d = readDef(spark, mvRoot)
    var df = GraftTable.read(spark, mvRoot)
    d.aggs.foreach {
      case MvAgg("avg", _, a) =>
        df = df.withColumn(a,
          when(col(nnOf(a)) > 0L,
            col(sOf(a)).cast("double") / col(nnOf(a)).cast("double"))
            .otherwise(lit(null).cast("double")))
      case _ => ()
    }
    df.select((d.groups.map(g => col(g.alias)) ++
      d.aggs.map(a => col(a.alias))): _*)
  }

  /** Drop the MV at `mvRoot`: its definition, cursor, and backing
    * table (log + data, recursively). REFUSES a root without an MV
    * definition — a plain table must never be deletable through the
    * MV verb. Returns true (throws on a non-MV root); idempotent
    * callers should check [[defFor]] first. Invalidates same-session
    * rewrite memos via the commit epoch. */
  def drop(spark: SparkSession, mvRoot: String): Boolean = {
    val p = defPath(mvRoot)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p),
      s"no materialized view at $mvRoot (DROP MATERIALIZED VIEW " +
        "refuses plain tables)")
    val removed = f.delete(new org.apache.hadoop.fs.Path(mvRoot), true)
    GraftTable.commitEpoch.incrementAndGet()
    removed
  }

  /** Advance the MV to the source's current head by change-feed
    * delta. Returns (sourceVersionCaughtUpTo, dirtyGroups) —
    * (lastV, 0) when already fresh. Crash-safe: see class doc. */
  def refresh(spark: SparkSession, mvRoot: String,
      nBuckets: Int = 8): (Int, Long) = {
    var d = readDef(spark, mvRoot)
    // RECOVERY: an interrupted refresh left an intent. If the MV's
    // version reached the intent's expectation the window WAS
    // applied — finalize the cursor; otherwise drop the intent and
    // redo the window.
    d.pending.foreach { case (from, to, expectV) =>
      val applied = GraftTable.latestVersion(spark, mvRoot) >= expectV
      d = d.copy(lastV = if (applied) to else from, pending = None)
      writeDef(spark, mvRoot, d)
    }
    val srcHead = GraftTable.latestVersion(spark, d.source)
    if (srcHead == d.lastV) return (d.lastV, 0L)
    require(srcHead > d.lastV,
      s"source at ${d.source} went backwards ($srcHead < ${d.lastV})")
    // a filtered MV sees only the feed rows its predicate keeps: the
    // predicate commutes with retraction form, so an update moving a
    // row across the boundary arrives as exactly the −old or +new
    // side that crossed
    val feed0 = GraftTable.changes(spark, d.source, d.lastV, srcHead,
      d.sourceKey, withPreimages = true)
    val feed = withGroups(
      d.filter.map(f => feed0.filter(expr(f))).getOrElse(feed0), d.groups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val groups = d.groups
      val gNames = groups.map(_.alias)
      val gCols = gNames.map(col)
      val comp = composite(groups)
      val mvKey = keyOf(groups)
      // COMPOSITE tuples join on the NON-NULL encoded key: a grain
      // over a nullable column yields NULL group values, and a plain
      // column equi-join treats NULL ≠ NULL — the stored row and its
      // delta would miss each other and the apply batch would carry
      // one key twice (the NULL-group corruption a null-safe identity
      // column prevents by construction). Single bare groups keep the
      // direct column join (their value IS the table key, which is
      // non-null by the write path's stats contract).
      val keyed = if (comp) feed.withColumn(HiddenG, gidCol(groups))
        else feed
      val joinKeys = if (comp) Seq(HiddenG) else gNames
      val grpKeys = (joinKeys ++ gNames).distinct
      val dirty = keyed.select(grpKeys.map(col): _*).distinct()
      val deltaable = d.aggs.forall(a =>
        a.kind == "count" || a.kind == "sum" || a.kind == "avg")
      val mvCols = visibleStored(d.aggs) ++ hiddenCols(d.aggs)
      // rows the MV currently stores for the dirty groups
      val old = GraftTable.read(spark, mvRoot)
        .join(dirty.select(joinKeys.map(col): _*).distinct(),
          joinKeys, "left_semi").as("o")
      val rebuilt: DataFrame =
        if (deltaable) {
          // PURE DELTA: ± contributions per group, source never read
          val sign = when(col("_change").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L))
          val dAggs = (d.aggs.flatMap {
            case MvAgg("count", _, alias) => Seq(sum(sign).as(alias))
            case MvAgg("sum", c, alias) =>
              // sum skips NULL contributions; the nn delta tracks them
              Seq(sum(when(col(c).isNotNull, sign).otherwise(lit(0L)) *
                coalesce(col(c).cast("long"), lit(0L))).as(alias))
            case MvAgg("avg", _, _) => Seq.empty // hidden pair below
            case a => sys.error(s"unreachable: $a")
          }) ++ d.aggs.flatMap {
            case MvAgg("sum", c, alias) =>
              Seq(sum(when(col(c).isNotNull, sign).otherwise(lit(0L)))
                .as(nnOf(alias)))
            case MvAgg("avg", c, alias) => Seq(
              sum(when(col(c).isNotNull, sign).otherwise(lit(0L)) *
                coalesce(col(c).cast("long"), lit(0L))).as(sOf(alias)),
              sum(when(col(c).isNotNull, sign).otherwise(lit(0L)))
                .as(nnOf(alias)))
            case _ => Seq.empty
          } :+ sum(sign).as(HiddenN)
          val deltas = keyed.groupBy(grpKeys.map(col): _*)
            .agg(dAggs.head, dAggs.tail: _*).as("d")
          def merged(c: String) =
            coalesce(col(s"o.$c"), lit(0L)) + coalesce(col(s"d.$c"), lit(0L))
          // group VALUE columns: unified by the Seq join for bare
          // single groups; coalesced across sides for composite (the
          // encoded key is the join identity, the values describe it)
          val groupOut =
            if (comp) groups.map(g =>
              coalesce(col(s"d.${g.alias}"), col(s"o.${g.alias}"))
                .as(g.alias))
            else gCols
          old.join(deltas, joinKeys, "full_outer")
            .select((joinKeys.filter(_ == HiddenG).map(col) ++ groupOut ++
              mvCols.map { c =>
                val isSum = d.aggs.exists(a =>
                  a.kind == "sum" && a.alias == c)
                // SQL exactness: a sum with ZERO non-null live inputs
                // is NULL, not 0 — the nn ledger decides
                (if (isSum) when(merged(nnOf(c)) <= 0L,
                    lit(null).cast("long")).otherwise(merged(c))
                 else merged(c)).as(c)
              }): _*)
        } else {
          // RE-AGG the dirty groups from a group-pruned source read
          // (the MV's filter applies here too — it defines the
          // aggregated relation)
          val src0 = GraftTable.read(spark, d.source, Some(srcHead))
          val srcG = withGroups(
            d.filter.map(f => src0.filter(expr(f))).getOrElse(src0), groups)
          val srcK = if (comp) srcG.withColumn(HiddenG, gidCol(groups))
            else srcG
          val agged = srcK
            .join(dirty.select(joinKeys.map(col): _*).distinct(),
              joinKeys, "left_semi")
            .groupBy(grpKeys.map(col): _*)
            .agg(aggCols(d.aggs).head, aggCols(d.aggs).tail: _*)
          // groups whose rows ALL disappeared produce nothing here;
          // re-attach them via the dirty list so they delete below
          if (comp) {
            val a = agged.as("a"); val dd = dirty.as("dd")
            a.join(dd, joinKeys, "full_outer")
              .select((Seq(col(HiddenG)) ++
                groups.map(g => coalesce(col(s"a.${g.alias}"),
                  col(s"dd.${g.alias}")).as(g.alias)) ++
                mvCols.map(col)): _*)
          } else agged.join(dirty, gNames, "full_outer")
        }
      val op = "__mv_op"
      val batch = rebuilt.withColumn(op,
          when(coalesce(col(HiddenN), lit(0L)) <= 0L, "delete")
            .otherwise("replace"))
        .select(((if (comp) Seq(col(HiddenG)) else Seq.empty)
          ++ gCols ++ mvCols.map(col) :+ col(op)): _*)
      val nDirty = dirty.count()
      // WRITE-AHEAD INTENT, then apply, then finalize the cursor
      val expectV = GraftTable.latestVersion(spark, mvRoot) + 1
      writeDef(spark, mvRoot,
        d.copy(pending = Some((d.lastV, srcHead, expectV))))
      GraftTable.applyCdcBatch(spark, mvRoot, batch, mvKey, op, nBuckets)
      writeDef(spark, mvRoot, d.copy(lastV = srcHead, pending = None))
      (srcHead, nDirty)
    } finally feed.unpersist()
  }
}
