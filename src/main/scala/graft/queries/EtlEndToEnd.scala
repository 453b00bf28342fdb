package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.pipeline.{Ingest, Pipeline, Schemas}

/** q193 — the reference ETL, ORACLE-GATED END TO END.
  *
  * Every pipeline stage has its own piecewise gate (q04/q08/q09/q10/
  * q14/q15/q16/q17) and the composition is pinned by
  * `GoldenPipelineSpec` on the reference's own CSV — but the
  * composition itself (`MotherProcedure.sql:2-25`: dirty CSV →
  * cleanse/route → location/time/product dims → as-of fact → dense
  * cube) was never DuckDB-checked. This query closes that: it
  * synthesizes a dirty CSV deterministically FROM THE TESTDATA inside
  * the query, writes it to disk, runs the REAL `Pipeline.run` (file
  * ingest and all), and emits one (component, n_rows, checksum) row
  * per pipeline output. The oracle replays the entire ETL — dirt
  * synthesis, routing, order-id backfill, dedup, all three dims with
  * their surrogate-rank contracts, the SCD2 as-of interval join, and
  * the dense cube with its reference-faithful per-version row
  * multiplicity — in DuckDB CTEs over the same `orders` table. A
  * single byte of drift in any stage flips a checksum.
  *
  * Dirt taxonomy (Cleansing.sql:37-124), keyed by `o_orderkey % 101`
  * so the classes are mutually exclusive and appear at every SF:
  *   r=0 NULL product (null-routed) · r=1 unparseable quantity
  *   (cast-routed) · r=2 NULL order_id (max+1 backfill, NOT invalid) ·
  *   r=3 exact duplicate row (DISTINCT collapses) · r=4 repeated
  *   header line as data (cast-routed) · r=5 `,,,,,` all-NULL row
  *   (null-routed).
  *
  * The clean attributes are key-derived with SMALL moduli on purpose:
  * dates land in a 40-day window, products in 17 names (12 with a
  * price change ⇒ two SCD2 versions), locations in 50 addresses — so
  * the dense cube stays bounded (the reference's own cube semantics;
  * unbounded inputs go through CubeGuard's sparse form, gated
  * elsewhere) while the cleansed row count still scales with SF.
  *
  * Scale note: the single-file CSV write (`repartition(1)`) is gate
  * harness, not engine — Pipeline.run itself ingests a directory of
  * CSVs with one task per file block.
  */
object EtlEndToEnd {

  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    sys.addShutdownHook {
      tempDirs.forEach(f =>
        org.apache.commons.io.FileUtils.deleteQuietly(f): Unit)
    }: Unit
  }

  /** The deterministic dirty landing feed, one CSV row per order key
    * (two for the r=3 duplicate class), all six raw columns as
    * strings. */
  private[queries] def dirtyFeed(s: SparkSession, dir: String): DataFrame = {
    val key = col("key")
    val r = key % 101
    val day = date_add(to_date(lit("2019-03-01")), (key % 40).cast("int"))
    val nameIdx = key % 17
    val bumped = (key % 40 >= 20) and (nameIdx < 12)
    val cents = (lit(199) + nameIdx * 100 +
      when(bumped, 50).otherwise(0)).cast("long")
    val priceStr = concat(floor(cents / 100).cast("long").cast("string"),
      lit("."), lpad((cents % 100).cast("string"), 2, "0"))
    val loc = key % 50
    val street = concat(((loc % 10) + 1).cast("string"), lit(" Main St"))
    val city = concat(lit("City"), (loc % 5).cast("string"))
    val state = concat(lit("S"), (loc % 3).cast("string"))
    val postal = concat(lit("9000"), (loc % 4).cast("string"))
    val address = concat(street, lit(", "), city, lit(", "),
      state, lit(" "), postal)
    val wname = concat(lit("Widget "), nameIdx.cast("string"))
    val qty = ((key % 9) + 1).cast("string")
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey").as("key"))
      .select(
        r.as("r"),
        when(r === 2 or r === 5, lit(null))
          .when(r === 4, "Order ID")
          .otherwise(key.cast("string")).as("order_id"),
        when(r === 0 or r === 5, lit(null))
          .when(r === 4, "Product")
          .otherwise(wname).as("product"),
        when(r === 5, lit(null))
          .when(r === 1, "abc")
          .when(r === 4, "Quantity Ordered")
          .otherwise(qty).as("quantity_ordered"),
        when(r === 5, lit(null))
          .when(r === 4, "Price Each")
          .otherwise(priceStr).as("price_each"),
        when(r === 5, lit(null))
          .when(r === 4, "Order Date")
          .otherwise(concat(date_format(day, "MM/dd/yy"), lit(" 12:00")))
          .as("order_date"),
        when(r === 5, lit(null))
          .when(r === 4, "Purchase Address")
          .otherwise(address).as("purchase_address"))
    base.unionAll(base.filter(col("r") === 3))
      .select(Schemas.rawColumns.map(col): _*)
  }

  /** One (component, n_rows, checksum) row: md5-slice sum over a
    * canonical '|'-joined string rendering with explicit NULL
    * sentinels (concat_ws SKIPS nulls, which would alias distinct
    * rows — every column is coalesced first). */
  private def sig(name: String, df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(conv(substring(md5(concat_ws("|",
        cols.map(c => coalesce(c.cast("string"), lit("@NULL@"))): _*)),
        1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("h")), lit(0L)).as("checksum"))
      .select(lit(name).as("component"), col("n_rows"), col("checksum"))

  private def cents(c: Column): Column = (c * 100).cast("long")

  val q193EtlEndToEnd = GraftQuery(
    "q193_etl_end_to_end",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_etl_e2e").toFile
      tempDirs.add(tmp)
      val csvPath = s"${tmp.getAbsolutePath}/feed"
      // single file => Spark's header option skips exactly one line
      dirtyFeed(s, dir).repartition(1).write
        .option("header", "true").mode("overwrite").csv(csvPath)
      val p = Pipeline.run(s, csvPath)
      val raw = Schemas.rawColumns.map(col)
      sig("1_landing", p.landing, raw)
        .unionAll(sig("2_invalid", p.invalid, raw))
        .unionAll(sig("3_cleansed", p.cleansed, Seq(
          col("order_id"), col("product"), col("quantity_ordered"),
          cents(col("price_each")), col("order_date").cast("date"),
          col("street"), col("city"), col("state"), col("postal"))))
        .unionAll(sig("4_location_dim", p.locationDim, Seq(
          col("location_id"), col("street_id"), col("street_name"),
          col("city_id"), col("city_name"), col("state_id"),
          col("state_name"), col("postal"), col("full_address"))))
        .unionAll(sig("5_time_dim", p.timeDim, Seq(
          col("time_id"), col("time_desc"), col("week_id"), col("week_desc"),
          col("month_id"), col("month_desc"), col("quarter_id"),
          col("quarter_desc"), col("half_year_id"), col("half_year_desc"),
          col("year_id"), col("year_desc"))))
        .unionAll(sig("6_product_dim", p.productDim, Seq(
          col("product_id"), col("product_name"), cents(col("price_each")),
          col("last_update_date"), col("active_status"), col("action_flag"))))
        .unionAll(sig("7_fact", p.fact, Seq(
          col("time_id"), col("product_id"), col("product"),
          cents(col("price_each")), col("quantity_ordered"),
          col("order_date"), col("week_id"), col("month_id"),
          col("quarter_id"), col("half_year_id"), col("year_id"),
          col("location_id"), col("street_name"), col("street_id"),
          col("city_name"), col("city_id"), col("state_name"),
          col("state_id"), col("postal"))))
        .orderBy("component")
    },
    Some("""WITH vals AS (
           |  SELECT o_orderkey AS key, o_orderkey % 101 AS r,
           |    DATE '2019-03-01' + CAST(o_orderkey % 40 AS INT) AS day,
           |    199 + (o_orderkey % 17) * 100 +
           |      CASE WHEN o_orderkey % 40 >= 20 AND o_orderkey % 17 < 12
           |           THEN 50 ELSE 0 END AS cents,
           |    'Widget ' || (o_orderkey % 17) AS wname,
           |    CAST(((o_orderkey % 50) % 10) + 1 AS VARCHAR) || ' Main St' AS street,
           |    'City' || ((o_orderkey % 50) % 5) AS city,
           |    'S' || ((o_orderkey % 50) % 3) AS state,
           |    '9000' || ((o_orderkey % 50) % 4) AS postal,
           |    (o_orderkey % 9) + 1 AS qty
           |  FROM orders),
           |landing0 AS (
           |  SELECT key, r, day, cents, wname, street, city, state, postal, qty,
           |    CASE WHEN r IN (2, 5) THEN NULL WHEN r = 4 THEN 'Order ID'
           |         ELSE CAST(key AS VARCHAR) END AS order_id,
           |    CASE WHEN r IN (0, 5) THEN NULL WHEN r = 4 THEN 'Product'
           |         ELSE wname END AS product,
           |    CASE WHEN r = 5 THEN NULL WHEN r = 1 THEN 'abc'
           |         WHEN r = 4 THEN 'Quantity Ordered'
           |         ELSE CAST(qty AS VARCHAR) END AS quantity_ordered,
           |    CASE WHEN r = 5 THEN NULL WHEN r = 4 THEN 'Price Each'
           |         ELSE (cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0')
           |         END AS price_each,
           |    CASE WHEN r = 5 THEN NULL WHEN r = 4 THEN 'Order Date'
           |         ELSE strftime(day, '%m/%d/%y') || ' 12:00' END AS order_date,
           |    CASE WHEN r = 5 THEN NULL WHEN r = 4 THEN 'Purchase Address'
           |         ELSE street || ', ' || city || ', ' || state || ' ' || postal
           |         END AS purchase_address
           |  FROM vals),
           |landing AS (
           |  SELECT * FROM landing0
           |  UNION ALL SELECT * FROM landing0 WHERE r = 3),
           |seed AS (
           |  SELECT GREATEST(0, COALESCE(MAX(CASE WHEN r NOT IN (2, 4, 5)
           |    THEN key END), 0)) AS v FROM landing0),
           |backfilled AS (
           |  SELECT key, (SELECT v FROM seed) + ROW_NUMBER() OVER (ORDER BY
           |    product, order_date, purchase_address, quantity_ordered,
           |    price_each) AS new_id
           |  FROM landing0 WHERE r = 2),
           |cleansed AS (
           |  SELECT CASE WHEN l.r = 2 THEN b.new_id ELSE l.key END AS order_id,
           |    l.wname AS product, l.qty AS quantity_ordered, l.cents,
           |    l.day, l.street, l.city, l.state, l.postal
           |  FROM landing0 l LEFT JOIN backfilled b ON l.key = b.key
           |  WHERE l.r NOT IN (0, 1, 4, 5)),
           |locs AS (SELECT DISTINCT street, city, state, postal FROM cleansed),
           |lranks AS (
           |  SELECT street, city, state, postal,
           |    'SA' || lpad(CAST(DENSE_RANK() OVER (ORDER BY state, postal)
           |      AS VARCHAR), 6, '0') AS state_id,
           |    'CT' || lpad(CAST(DENSE_RANK() OVER (ORDER BY city, state, postal)
           |      AS VARCHAR), 6, '0') AS city_id,
           |    'ST' || lpad(CAST(DENSE_RANK() OVER (ORDER BY street, city, state,
           |      postal) AS VARCHAR), 6, '0') AS street_id
           |  FROM locs),
           |location_dim AS (
           |  SELECT 'L' || lpad(CAST(ROW_NUMBER() OVER (ORDER BY street_id,
           |      city_id, state_id) AS VARCHAR), 6, '0') AS location_id,
           |    street_id, street AS street_name, city_id, city AS city_name,
           |    state_id, state AS state_name, postal,
           |    street || ', ' || city || ', ' || state || ' ' || postal
           |      AS full_address
           |  FROM lranks),
           |spine AS (
           |  -- generate_series needs constant bounds in DuckDB; the day
           |  -- window is 40 days by construction, so enumerate it and
           |  -- clip to the observed [min, max]
           |  SELECT DATE '2019-03-01' + CAST(g AS INT) AS d
           |  FROM (SELECT unnest(generate_series(0, 39)) AS g)
           |  WHERE DATE '2019-03-01' + CAST(g AS INT)
           |    BETWEEN (SELECT MIN(day) FROM cleansed)
           |        AND (SELECT MAX(day) FROM cleansed)),
           |time_dim AS (
           |  SELECT 'D' || strftime(d, '%Y%m%d') AS time_id, d AS time_desc,
           |    'W' || lpad(CAST(DENSE_RANK() OVER (ORDER BY
           |      date_trunc('week', d)) AS VARCHAR), 3, '0') AS week_id,
           |    'W' || lpad(CAST(weekofyear(d) AS VARCHAR), 2, '0') ||
           |      strftime(d, '%y') AS week_desc,
           |    'M' || lpad(CAST(DENSE_RANK() OVER (ORDER BY year(d) * 100 +
           |      month(d)) AS VARCHAR), 3, '0') AS month_id,
           |    'M' || strftime(d, '%m%y') AS month_desc,
           |    'Q' || lpad(CAST(DENSE_RANK() OVER (ORDER BY year(d) * 10 +
           |      quarter(d)) AS VARCHAR), 3, '0') AS quarter_id,
           |    'Q' || quarter(d) || strftime(d, '%y') AS quarter_desc,
           |    'H' || lpad(CAST(DENSE_RANK() OVER (ORDER BY year(d) * 10 +
           |      CASE WHEN month(d) <= 6 THEN 1 ELSE 2 END) AS VARCHAR), 3, '0')
           |      AS half_year_id,
           |    'H' || year(d) || '-' || CASE WHEN month(d) <= 6 THEN 1 ELSE 2 END
           |      AS half_year_desc,
           |    'Y' || year(d) AS year_id,
           |    CAST(year(d) AS VARCHAR) AS year_desc
           |  FROM spine),
           |versions AS (
           |  SELECT product AS product_name, cents,
           |    MIN(day) AS last_update_date
           |  FROM cleansed GROUP BY 1, 2),
           |flagged AS (
           |  SELECT *, COUNT(*) OVER (PARTITION BY product_name) AS nv,
           |    ROW_NUMBER() OVER (PARTITION BY product_name
           |      ORDER BY last_update_date DESC, cents DESC) AS rn
           |  FROM versions),
           |product_dim AS (
           |  SELECT 'P' || lpad(CAST(DENSE_RANK() OVER (ORDER BY product_name)
           |      AS VARCHAR), 6, '0') AS product_id,
           |    product_name, cents, last_update_date,
           |    CASE WHEN rn = 1 THEN 'Y' ELSE 'N' END AS active_status,
           |    CASE WHEN nv = 1 THEN 'I' WHEN rn = 1 THEN 'U'
           |         WHEN last_update_date = DATE '2019-01-01' THEN 'I'
           |         ELSE 'U' END AS action_flag
           |  FROM flagged),
           |intervals AS (
           |  SELECT product_name AS pi_name, cents AS pi_cents,
           |    last_update_date AS valid_from,
           |    LEAD(last_update_date) OVER (PARTITION BY product_name
           |      ORDER BY last_update_date, cents) AS valid_to
           |  FROM versions),
           |s3 AS (
           |  SELECT t.time_id, p.product_id, l.location_id,
           |    c.quantity_ordered
           |  FROM cleansed c
           |  JOIN (SELECT product_id, product_name FROM product_dim) p
           |    ON c.product = p.product_name
           |  LEFT JOIN intervals i ON c.product = i.pi_name
           |    AND i.valid_from <= c.day
           |    AND (i.valid_to IS NULL OR i.valid_to > c.day)
           |  JOIN location_dim l ON c.street = l.street_name
           |    AND c.city = l.city_name AND c.state = l.state_name
           |    AND c.postal = l.postal
           |  JOIN time_dim t ON c.day = t.time_desc),
           |fact AS (
           |  SELECT cb.time_id, cb.product_id, cb.product, cb.cents,
           |    COALESCE(s.quantity_ordered, 0) AS quantity_ordered,
           |    cb.order_date, cb.week_id, cb.month_id, cb.quarter_id,
           |    cb.half_year_id, cb.year_id, cb.location_id, cb.street_name,
           |    cb.street_id, cb.city_name, cb.city_id, cb.state_name,
           |    cb.state_id, cb.postal
           |  FROM (SELECT t.time_id, t.time_desc AS order_date, t.week_id,
           |          t.month_id, t.quarter_id, t.half_year_id, t.year_id,
           |          p.product_id, p.product_name AS product, p.cents, l.*
           |        FROM time_dim t CROSS JOIN product_dim p
           |        CROSS JOIN location_dim l) cb
           |  LEFT JOIN s3 s ON cb.product_id = s.product_id
           |    AND cb.time_id = s.time_id AND cb.location_id = s.location_id),
           |sigs AS (
           |  SELECT '1_landing' AS component, COUNT(*) AS n_rows,
           |    COALESCE(SUM(('0x' || substr(md5(
           |      COALESCE(order_id, '@NULL@') || '|' ||
           |      COALESCE(product, '@NULL@') || '|' ||
           |      COALESCE(quantity_ordered, '@NULL@') || '|' ||
           |      COALESCE(price_each, '@NULL@') || '|' ||
           |      COALESCE(order_date, '@NULL@') || '|' ||
           |      COALESCE(purchase_address, '@NULL@')), 1, 8))::BIGINT), 0)
           |      AS checksum
           |  FROM landing
           |  UNION ALL
           |  SELECT '2_invalid', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      COALESCE(order_id, '@NULL@') || '|' ||
           |      COALESCE(product, '@NULL@') || '|' ||
           |      COALESCE(quantity_ordered, '@NULL@') || '|' ||
           |      COALESCE(price_each, '@NULL@') || '|' ||
           |      COALESCE(order_date, '@NULL@') || '|' ||
           |      COALESCE(purchase_address, '@NULL@')), 1, 8))::BIGINT), 0)
           |  FROM landing WHERE r IN (0, 1, 4, 5)
           |  UNION ALL
           |  SELECT '3_cleansed', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      order_id || '|' || product || '|' || quantity_ordered || '|' ||
           |      cents || '|' || day || '|' || street || '|' || city || '|' ||
           |      state || '|' || postal), 1, 8))::BIGINT), 0)
           |  FROM cleansed
           |  UNION ALL
           |  SELECT '4_location_dim', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      location_id || '|' || street_id || '|' || street_name || '|' ||
           |      city_id || '|' || city_name || '|' || state_id || '|' ||
           |      state_name || '|' || postal || '|' || full_address),
           |      1, 8))::BIGINT), 0)
           |  FROM location_dim
           |  UNION ALL
           |  SELECT '5_time_dim', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      time_id || '|' || time_desc || '|' || week_id || '|' ||
           |      week_desc || '|' || month_id || '|' || month_desc || '|' ||
           |      quarter_id || '|' || quarter_desc || '|' || half_year_id ||
           |      '|' || half_year_desc || '|' || year_id || '|' || year_desc),
           |      1, 8))::BIGINT), 0)
           |  FROM time_dim
           |  UNION ALL
           |  SELECT '6_product_dim', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      product_id || '|' || product_name || '|' || cents || '|' ||
           |      last_update_date || '|' || active_status || '|' || action_flag),
           |      1, 8))::BIGINT), 0)
           |  FROM product_dim
           |  UNION ALL
           |  SELECT '7_fact', COUNT(*),
           |    COALESCE(SUM(('0x' || substr(md5(
           |      time_id || '|' || product_id || '|' || product || '|' ||
           |      cents || '|' || quantity_ordered || '|' || order_date || '|' ||
           |      week_id || '|' || month_id || '|' || quarter_id || '|' ||
           |      half_year_id || '|' || year_id || '|' || location_id || '|' ||
           |      street_name || '|' || street_id || '|' || city_name || '|' ||
           |      city_id || '|' || state_name || '|' || state_id || '|' ||
           |      postal), 1, 8))::BIGINT), 0)
           |  FROM fact)
           |SELECT component, n_rows, CAST(checksum AS BIGINT) AS checksum
           |FROM sigs ORDER BY component""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q193EtlEndToEnd)
}
