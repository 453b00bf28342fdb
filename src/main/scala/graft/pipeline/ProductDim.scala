package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F3/J8/J9/W1 + SCD Type 2 — product dimension
  * (ref: ProductDimension.sql:2-157), set-based.
  *
  * The reference walks distinct (name, price, date) triples in date
  * order with a cursor, inserting each unseen (name, price) version and
  * flipping status/flags on older versions (ref:
  * ProductDimension.sql:52-141). Net final-state semantics, derived by
  * tracing the loop:
  *
  *  - one dimension row per (product_name, price_each) version, with
  *    last_update_date = MIN(order_date) of that version (the cursor
  *    only inserts on first encounter, which date-order makes the min);
  *  - active_status: the version with the latest first-seen date is
  *    'Y', all others 'N' (each later insert demotes older versions,
  *    ProductDimension.sql:92-106);
  *  - action_flag: single-version names keep 'I'; for multi-version
  *    names every version is 'U' — except an *older* version whose
  *    last_update_date is exactly DATE '2019-01-01' (the reference's
  *    hard-coded initial-load guard, ProductDimension.sql:112) which
  *    keeps its insert-time 'I'. The latest version always gets 'U'
  *    via the new-row branch (ProductDimension.sql:116-119), which has
  *    no such guard;
  *  - product_id = 'P' + LPAD(dense_rank over product_name, 6, '0') —
  *    all versions of a name share one id (ProductDimension.sql:143-152).
  *
  * Date ties between two versions of one name are broken by price (the
  * reference's cursor order is unspecified there — documented
  * deviation, SURVEY §7.4-1).
  */
object ProductDim {

  /** The reference's hard-coded initial-load guard date. */
  val initialLoadGuard = "2019-01-01"

  def apply(cleansed: DataFrame): DataFrame =
    assignIds(flagVersions(versionsOf(cleansed)))

  /** all_products: distinct (name, price, first-seen date) — the
    * NOT-EXISTS-on-empty-target insert degenerates to DISTINCT
    * (ref: ProductDimension.sql:30-39), and per-(name,price) MIN(date)
    * collapses the cursor's first-encounter-wins insert. */
  private def versionsOf(cleansed: DataFrame): DataFrame = cleansed
    .select(col("product").as("product_name"),
      col("price_each"),
      col("order_date").cast("date").as("order_date"))
    .groupBy("product_name", "price_each")
    .agg(min("order_date").as("last_update_date"))

  /** active_status / action_flag from the version set alone — the flag
    * semantics are a pure per-name function of the final versions,
    * which is what makes the incremental [[merge]] exact. */
  private def flagVersions(versions: DataFrame): DataFrame = {
    val byName = Window.partitionBy("product_name")
    versions
      .withColumn("n_versions", count(lit(1)).over(byName))
      .withColumn("latest",
        max(struct(col("last_update_date"), col("price_each"))).over(byName))
      .withColumn("is_latest",
        col("last_update_date") === col("latest.last_update_date") and
          col("price_each") === col("latest.price_each"))
      .withColumn("active_status", when(col("is_latest"), "Y").otherwise("N"))
      .withColumn("action_flag",
        when(col("n_versions") === 1, "I")
          .when(col("is_latest"), "U")
          .when(col("last_update_date") === to_date(lit(initialLoadGuard)), "I")
          .otherwise("U"))
  }

  /** product_id = 'P' + zero-padded dense rank over product_name.
    * Zero-pad to 6 but never truncate (LPAD cuts longer strings —
    * would collide IDs past 999,999 products). Rank is the two-phase
    * [[graft.operators.GlobalRank.denseRank]] — a 100×-scale catalog
    * has millions of SKUs, and a plain `Window.orderBy` would funnel
    * them all through one task (same contract LocationDim and Cleanse
    * already use). */
  private def assignIds(flagged: DataFrame): DataFrame = {
    val ranked = graft.operators.GlobalRank
      .denseRank(flagged, "__rk", col("product_name"))
    val rankStr = col("__rk").cast("string")
    ranked
      .withColumn("product_id",
        concat(lit("P"),
          when(length(rankStr) < 6, lpad(rankStr, 6, "0")).otherwise(rankStr)))
      .select("product_id", "product_name", "price_each",
        "last_update_date", "active_status", "action_flag")
  }

  /** Incremental SCD2 merge (apply-changes): fold a staged batch of
    * new observations into an existing dimension built by [[apply]].
    *
    * Provably equivalent to rebuilding over the union of histories —
    * the gate query's oracle IS the full rebuild — because every flag
    * is a pure per-name function of the final version set. The
    * incremental win is where the work lands: version collapse and
    * flag windows run ONLY over names present in the batch (semi-join
    * current, union staged, re-derive), while the untouched bulk of
    * the dimension streams through with its stored flags — at scale
    * the nightly batch is orders of magnitude smaller than the
    * dimension, so the expensive recompute is batch-sized, not
    * history-sized. Ids follow the reference's dense-rank-over-name
    * contract (ProductDimension.sql:143-152) and are re-derived over
    * the dictionary-sized name set (a new name can shift later ranks;
    * stable-id assignment is the separate G3 max+1 contract in
    * [[Cleanse]]). */
  def merge(current: DataFrame, stagedCleansed: DataFrame): DataFrame = {
    val stagedVersions = versionsOf(stagedCleansed)
    val affected = stagedVersions.select("product_name").distinct()
    val touched = flagVersions(
      current
        .join(affected, Seq("product_name"), "left_semi")
        .select("product_name", "price_each", "last_update_date")
        .union(stagedVersions)
        .groupBy("product_name", "price_each")
        .agg(min("last_update_date").as("last_update_date")))
      .select("product_name", "price_each", "last_update_date",
        "active_status", "action_flag")
    val untouched = current
      .join(affected, Seq("product_name"), "left_anti")
      .select("product_name", "price_each", "last_update_date",
        "active_status", "action_flag")
    assignIds(touched.union(untouched))
  }
}
