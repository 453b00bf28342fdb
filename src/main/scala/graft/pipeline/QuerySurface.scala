package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Analyst-facing SQL surface (SURVEY §7.1 module 8): registers every
  * pipeline output as a temp view so `spark.sql` works against the
  * warehouse exactly as psql worked against the reference's tables —
  * plus the canned queries the reference's README implies (revenue by
  * city/month/product, §7.2's minimum slice).
  */
object QuerySurface {

  val viewNames = Seq("landing", "invalid", "cleansed", "location_dimension",
    "time_dimension", "product_dimension", "fact_table")

  def register(r: Pipeline.Result): Unit = {
    r.landing.createOrReplaceTempView("landing")
    r.invalid.createOrReplaceTempView("invalid")
    r.cleansed.createOrReplaceTempView("cleansed")
    r.locationDim.createOrReplaceTempView("location_dimension")
    r.timeDim.createOrReplaceTempView("time_dimension")
    r.productDim.createOrReplaceTempView("product_dimension")
    r.fact.createOrReplaceTempView("fact_table")
  }

  /** §7.2's minimum end-to-end slice: January revenue by city. */
  def revenueByCity(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT city, round(sum(price_each * quantity_ordered), 2) AS revenue
      FROM cleansed
      GROUP BY city
      ORDER BY revenue DESC""")

  /** Monthly revenue off the fact table (hierarchy roll-up). */
  def revenueByMonth(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT month_id, round(sum(price_each * quantity_ordered), 2) AS revenue,
             sum(quantity_ordered) AS units
      FROM fact_table
      GROUP BY month_id
      ORDER BY month_id""")

  /** Top products by units, dense-cube zero cells excluded. */
  def topProducts(spark: SparkSession, k: Int = 10): DataFrame =
    spark.sql(s"""
      SELECT product, sum(quantity_ordered) AS units,
             round(sum(price_each * quantity_ordered), 2) AS revenue
      FROM fact_table
      WHERE quantity_ordered > 0
      GROUP BY product
      ORDER BY units DESC, product
      LIMIT $k""")

  /** The correlated as-of subquery exactly as the reference writes it
    * (FactTable.sql:18-27) — Catalyst decorrelates it; kept as the
    * SQL-mode witness that the engine accepts the original shape. */
  def asOfPriceSql(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT c.order_id, c.product,
        (SELECT pd2.price_each
         FROM product_dimension pd2
         WHERE pd2.product_name = c.product
           AND pd2.last_update_date <= c.order_date
         ORDER BY pd2.last_update_date DESC
         LIMIT 1) AS price_each
      FROM cleansed c""")
}
