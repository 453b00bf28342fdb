package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.operators.{Hilbert, ZOrder}

/** Physical data-layout operators: the write-side decisions that make
  * 100 TB reads cheap. Nothing here changes rows — the queries audit
  * the LAYOUT (per-file min/max bounding boxes, which files a
  * predicate would scan), the statistics every lake format (parquet
  * row groups, Delta/Iceberg file stats) keys data skipping on. */
object LayoutQueries {

  /** Z-order layout audit: orders are quantized onto a 16×16
    * (customer, order-day) grid, assigned to 16 "files" two ways —
    * z-curve buckets (each = one contiguous 4×4 tile of the grid) vs
    * the natural insertion order (o_orderkey ranges) — and each
    * layout's per-file bounding boxes are read against the rectangle
    * predicate x∈[4,7] ∧ y∈[4,7].
    *
    * The audited effect: under z-order exactly ONE file's bbox
    * intersects the rectangle (the curve keeps both dimensions tight),
    * while natural order scans ~all 16 (order keys are uncorrelated
    * with both dimensions, so every file's bbox spans the full grid).
    * At scale the layout step is just
    * `repartitionByRange(zvalue).sortWithinPartitions(zvalue)` on the
    * writer — one range exchange, no coordination — and the same
    * min/max stats this query computes are what the parquet reader
    * prunes row groups with. All arithmetic is integer shift/mask +
    * exact decimal quantization, replayed bit-for-bit by the oracle's
    * `>>`/`&`/`//`. */
  val q177ZorderLayout = GraftQuery(
    "q177_zorder_layout",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("d"))
      val stats = o.agg(
        min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
        min("d").as("min_d"), max("d").as("max_d"),
        min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
      val g = o.crossJoin(broadcast(stats))
        .withColumn("xq", ZOrder.quantize(col("o_custkey") - col("min_ck"),
          col("max_ck") - col("min_ck") + 1, 16))
        .withColumn("yq", ZOrder.quantize(
          datediff(col("d"), col("min_d")).cast("long"),
          (datediff(col("max_d"), col("min_d")) + 1).cast("long"), 16))
        .withColumn("zbucket", shiftright(ZOrder.zvalue(col("xq"), col("yq"), 4), 4))
        .withColumn("nbucket", ZOrder.quantize(col("o_orderkey") - col("min_ok"),
          col("max_ok") - col("min_ok") + 1, 16))
      def fileStats(bucket: String, layout: String) =
        g.groupBy(col(bucket).as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min("xq").as("min_x"), max("xq").as("max_x"),
            min("yq").as("min_y"), max("yq").as("max_y"))
          .withColumn("layout", lit(layout))
      fileStats("zbucket", "zorder").unionByName(fileStats("nbucket", "natural"))
        .withColumn("scanned", !(col("max_x") < 4 || col("min_x") > 7 ||
          col("max_y") < 4 || col("min_y") > 7))
        .select(col("layout"), col("bucket"), col("n_rows"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          col("scanned"))
        .orderBy("layout", "bucket")
    },
    Some("""WITH o AS (
           |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d
           |  FROM orders),
           |st AS (
           |  SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
           |         min(d) AS min_d, max(d) AS max_d,
           |         min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
           |  FROM o),
           |g AS (
           |  SELECT
           |    ((o_custkey - min_ck) * 16) // (max_ck - min_ck + 1) AS xq,
           |    (date_diff('day', min_d, d) * 16)
           |      // (date_diff('day', min_d, max_d) + 1) AS yq,
           |    ((o_orderkey - min_ok) * 16) // (max_ok - min_ok + 1) AS nbucket
           |  FROM o CROSS JOIN st),
           |z AS (
           |  SELECT xq, yq, nbucket,
           |    (((xq >> 0) & 1) * 1 + ((yq >> 0) & 1) * 2
           |   + ((xq >> 1) & 1) * 4 + ((yq >> 1) & 1) * 8
           |   + ((xq >> 2) & 1) * 16 + ((yq >> 2) & 1) * 32
           |   + ((xq >> 3) & 1) * 64 + ((yq >> 3) & 1) * 128) >> 4 AS zbucket
           |  FROM g),
           |b AS (
           |  SELECT 'zorder' AS layout, zbucket AS bucket,
           |    count(*) AS n_rows, min(xq) AS min_x, max(xq) AS max_x,
           |    min(yq) AS min_y, max(yq) AS max_y
           |  FROM z GROUP BY 2
           |  UNION ALL
           |  SELECT 'natural', nbucket, count(*), min(xq), max(xq),
           |    min(yq), max(yq)
           |  FROM z GROUP BY 2)
           |SELECT layout, bucket, n_rows, min_x, max_x, min_y, max_y,
           |  NOT (max_x < 4 OR min_x > 7 OR max_y < 4 OR min_y > 7) AS scanned
           |FROM b ORDER BY layout, bucket""".stripMargin))

  /** One Hilbert xy→d iteration as oracle SQL (order-4 grid, n-1=15).
    * Per-iteration column names (x1/y1/d1 …) keep every expression
    * referencing the PREVIOUS CTE's columns — no lateral-alias
    * ambiguity. Mirrors [[Hilbert.hindex]]'s loop body exactly. */
  private def hilbertStep(k: Int, s: Int): String = {
    val p = k - 1
    val rx = s"(CASE WHEN (x$p & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y$p & $s) > 0 THEN 1 ELSE 0 END)"
    s"""it$k AS (SELECT xq, yq, nbucket,
       |  d$p + ${s * s} * xor(3 * $rx, $ry) AS d$k,
       |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN 15 - y$p ELSE y$p END)
       |       ELSE x$p END AS x$k,
       |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN 15 - x$p ELSE x$p END)
       |       ELSE y$p END AS y$k
       |FROM it$p)""".stripMargin
  }

  /** Hilbert-curve layout audit, the q177 experiment re-run with the
    * better curve: same 16×16 (customer, order-day) quantization, 16
    * "files" of 16 consecutive curve cells each, same rectangle
    * predicate. The Hilbert property being audited: every file's bbox
    * is a compact square-ish region (consecutive cells are always
    * grid-adjacent — HilbertSpec pins the curve itself), so the
    * per-file min/max stats prune at least as hard as Z-order's, and
    * contiguous index ranges never teleport across the grid the way
    * the Z curve's high-bit transitions do. The oracle replays the
    * iterative xy→d algorithm in four explicit CTE steps — an
    * independent SQL implementation, not a lookup table exported from
    * the engine. */
  val q185HilbertLayout = GraftQuery(
    "q185_hilbert_layout",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("d"))
      val stats = o.agg(
        min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
        min("d").as("min_d"), max("d").as("max_d"),
        min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
      val quantized = o.crossJoin(broadcast(stats))
        .withColumn("xq", ZOrder.quantize(col("o_custkey") - col("min_ck"),
          col("max_ck") - col("min_ck") + 1, 16))
        .withColumn("yq", ZOrder.quantize(
          datediff(col("d"), col("min_d")).cast("long"),
          (datediff(col("max_d"), col("min_d")) + 1).cast("long"), 16))
      // linear-size form (named per-level intermediates) — at order 4
      // either works; this is the shape that scales to order-12 grids
      val g = Hilbert.withHindex(quantized, col("xq"), col("yq"), 4, "hidx")
        .withColumn("hbucket", shiftright(col("hidx"), 4))
        .withColumn("nbucket", ZOrder.quantize(col("o_orderkey") - col("min_ok"),
          col("max_ok") - col("min_ok") + 1, 16))
      def fileStats(bucket: String, layout: String) =
        g.groupBy(col(bucket).as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min("xq").as("min_x"), max("xq").as("max_x"),
            min("yq").as("min_y"), max("yq").as("max_y"))
          .withColumn("layout", lit(layout))
      fileStats("hbucket", "hilbert").unionByName(fileStats("nbucket", "natural"))
        .withColumn("scanned", !(col("max_x") < 4 || col("min_x") > 7 ||
          col("max_y") < 4 || col("min_y") > 7))
        .select(col("layout"), col("bucket"), col("n_rows"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          col("scanned"))
        .orderBy("layout", "bucket")
    },
    Some(s"""WITH o AS (
           |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d
           |  FROM orders),
           |st AS (
           |  SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
           |         min(d) AS min_d, max(d) AS max_d,
           |         min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
           |  FROM o),
           |it0 AS (
           |  SELECT
           |    ((o_custkey - min_ck) * 16) // (max_ck - min_ck + 1) AS xq,
           |    (date_diff('day', min_d, d) * 16)
           |      // (date_diff('day', min_d, max_d) + 1) AS yq,
           |    ((o_orderkey - min_ok) * 16) // (max_ok - min_ok + 1) AS nbucket,
           |    0 AS d0,
           |    ((o_custkey - min_ck) * 16) // (max_ck - min_ck + 1) AS x0,
           |    (date_diff('day', min_d, d) * 16)
           |      // (date_diff('day', min_d, max_d) + 1) AS y0
           |  FROM o CROSS JOIN st),
           |${hilbertStep(1, 8)},
           |${hilbertStep(2, 4)},
           |${hilbertStep(3, 2)},
           |${hilbertStep(4, 1)},
           |b AS (
           |  SELECT 'hilbert' AS layout, d4 >> 4 AS bucket,
           |    count(*) AS n_rows, min(xq) AS min_x, max(xq) AS max_x,
           |    min(yq) AS min_y, max(yq) AS max_y
           |  FROM it4 GROUP BY 2
           |  UNION ALL
           |  SELECT 'natural', nbucket, count(*), min(xq), max(xq),
           |    min(yq), max(yq)
           |  FROM it4 GROUP BY 2)
           |SELECT layout, bucket, n_rows, min_x, max_x, min_y, max_y,
           |  NOT (max_x < 4 OR min_x > 7 OR max_y < 4 OR min_y > 7) AS scanned
           |FROM b ORDER BY layout, bucket""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q177ZorderLayout, q185HilbertLayout)
}
