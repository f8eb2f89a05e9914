package graft.operators

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.9 Composite analytics over the star schema (TPC-H-shaped).
  * Scale notes: dimension sides (region/nation/customer) are broadcast;
  * the lineitem-side aggregations are partial+final (map-side combine)
  * automatically; date filters sit directly on the scans so parquet
  * row-group pruning applies before any join.
  */
object Analytics extends OpRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_monthly_trend" -> ((s, dir) => {
      // Time-series rollup + month-over-month delta: date_trunc to month,
      // exact decimal revenue, lag window for the delta (subtraction stays
      // decimal until the output boundary). The trend window is global
      // (ORDER BY month, no partition) — fine for a bounded month count;
      // a 100 TB deployment with an unbounded time axis would partition
      // the window by year and stitch the year boundaries.
      val m = t(s, dir)("orders")
        .groupBy(to_date(date_trunc("MONTH", col("o_orderdate"))).as("month"))
        .agg(sum(dec(col("o_totalprice"))).as("rev_dec"), count(lit(1)).as("n_orders"))
      val w = Window.orderBy("month")
      m.withColumn("prev_dec", lag("rev_dec", 1).over(w))
        .select(col("month"), col("rev_dec").cast("double").as("revenue"), col("n_orders"),
          (col("rev_dec") - col("prev_dec")).cast("double").as("mom_delta"))
        .orderBy("month")
    }),
    "q_revenue_by_region" -> ((s, dir) => {
      val tt = t(s, dir) _
      val o = tt("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      // unhinted: dims is CUSTOMER-sized (grows with SF), not a bounded
      // dim — AQE broadcasts while small, shuffle-joins at scale
      val dims = (
        tt("customer").select("c_custkey", "c_nationkey")
          .join(tt("nation"), col("c_nationkey") === col("n_nationkey"))
          .join(tt("region"), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey", "r_name"))
      tt("lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name")
        .agg(decSumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("line_cnt"))
        .orderBy("r_name")
    }),
    "q_top_unshipped" -> ((s, dir) => {
      val tt = t(s, dir) _
      val c = tt("customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = tt("orders").filter(col("o_orderdate") < lit("1996-03-15"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = tt("lineitem").filter(col("l_shipdate") > lit("1996-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        // unhinted: c is customer-sized; AQE decides by measured size
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(decSumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q_parts_share" -> ((s, dir) => {
      val tt = t(s, dir) _
      val rev = dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      tt("lineitem").select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        // unhinted: part scales with SF; AQE decides by measured size
        .join(tt("part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(trunc(col("l_shipdate").cast("date"), "month").as("ship_month"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(dec(lit(0)))).cast("double").as("promo_rev"),
          sum(rev).cast("double").as("total_rev"))
        .withColumn("promo_share", r6(col("promo_rev") / col("total_rev")))
        .orderBy("ship_month")
    }),
    "q_customer_ltv" -> ((s, dir) => {
      val tt = t(s, dir) _
      val spend = tt("orders")
        .groupBy("o_custkey")
        .agg(decSumOut(col("o_totalprice")).as("spend"),
          count(lit(1)).as("order_cnt"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("spend").desc, col("c_custkey"))
      tt("customer").select("c_custkey", "c_mktsegment")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("spend"),
          col("order_cnt"), col("first_order"), col("last_order"),
          rank().over(w).as("seg_rank"))
        .orderBy("c_custkey")
    }),

    "q_yoy_growth" -> ((s, dir) => {
      // Year-over-year growth per customer nation: yearly decimal revenue,
      // lag window for delta and ratio. The yearly rollup shrinks the data
      // to |nation|×|year| rows before the window, so the (unavoidable)
      // per-nation sort is over a tiny aggregate, never the fact table.
      val tt = t(s, dir) _
      val yearly = tt("orders")
        // customer unhinted (scales with SF; AQE decides); nation stays
        // hinted — 25 rows at any scale
        .join(tt("customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(tt("nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(sum(dec(col("o_totalprice"))).as("rev_dec"), count(lit(1)).as("n_orders"))
      val w = Window.partitionBy("n_name").orderBy("yr")
      yearly.withColumn("prev_dec", lag("rev_dec", 1).over(w))
        .select(col("n_name"), col("yr"),
          col("rev_dec").cast("double").as("revenue"), col("n_orders"),
          (col("rev_dec") - col("prev_dec")).cast("double").as("yoy_delta"),
          r6(col("rev_dec").cast("double") / col("prev_dec").cast("double") - lit(1.0))
            .as("yoy_growth"))
        .orderBy("n_name", "yr")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_yoy_growth" -> s"""
      WITH yearly AS (
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_dec,
               COUNT(1) AS n_orders
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2),
      l AS (
        SELECT n_name, yr, rev_dec, n_orders,
               LAG(rev_dec) OVER (PARTITION BY n_name ORDER BY yr) AS prev_dec
        FROM yearly)
      SELECT n_name, yr, CAST(rev_dec AS DOUBLE) AS revenue, n_orders,
             CAST(rev_dec - prev_dec AS DOUBLE) AS yoy_delta,
             ${r6Sql("CAST(rev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE) - 1.0")} AS yoy_growth
      FROM l ORDER BY n_name, yr""",
    "q_monthly_trend" -> """
      WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                        SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_dec,
                        COUNT(1) AS n_orders
                 FROM orders GROUP BY 1)
      SELECT month, CAST(rev_dec AS DOUBLE) AS revenue, n_orders,
             CAST(rev_dec - LAG(rev_dec) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
      FROM m ORDER BY month""",
    "q_revenue_by_region" -> """
      SELECT r_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
             COUNT(1) AS line_cnt
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY r_name ORDER BY r_name""",
    "q_top_unshipped" -> """
      SELECT l_orderkey, o_orderdate,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-03-15'
        AND l_shipdate > TIMESTAMP '1996-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_parts_share" -> s"""
      SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
             CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_rev,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_rev,
             ${r6Sql("CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)")} AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY ship_month""",
    "q_customer_ltv" -> """
      WITH spend AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend,
               COUNT(1) AS order_cnt, MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders GROUP BY o_custkey)
      SELECT c_custkey, c_mktsegment, spend, order_cnt, first_order, last_order,
             CAST(RANK() OVER (PARTITION BY c_mktsegment
                               ORDER BY spend DESC, c_custkey) AS INT) AS seg_rank
      FROM customer JOIN spend ON c_custkey = o_custkey
      ORDER BY c_custkey""",
  )
}
