package graft.operators

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 Projections / filters / predicates. Fixtures contain no natural
  * NULLs (FIXTURES.md), so three-valued-logic coverage synthesizes them
  * via NULLIF.
  */
object Filters extends OpRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_pred" -> ((s, dir) =>
      t(s, dir)("lineitem")
        .filter((col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
          || col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_in_like" -> ((s, dir) =>
      t(s, dir)("customer")
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
          && col("c_name").like("%5"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    "filter_null3vl" -> ((s, dir) => {
      val e = t(s, dir)("lineitem")
        .withColumn("a", nullif(col("l_discount"), lit(0.0)))
        .withColumn("b", nullif(col("l_tax"), lit(0.0)))
      e.agg(
        count(lit(1)).as("total"),
        count(when(col("a").isNull, 1)).as("a_null"),
        count(col("a")).as("a_notnull"),
        count(when(col("a").isNull && col("b").isNull, 1)).as("both_null"),
        count(when(col("a") <=> col("b"), 1)).as("nullsafe_eq"),
        count(when(col("a") === col("b"), 1)).as("plain_eq"))
    }),

    "project_expr" -> ((s, dir) =>
      t(s, dir)("lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("double").as("revenue"),
          when(col("l_quantity") > 25, lit("bulk")).otherwise(lit("small")).as("qty_class"),
          concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("flag_status"))
        .orderBy("l_orderkey", "l_linenumber")),
  )

  def oracleSql: Map[String, String] = Map(
    "filter_pred" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
      FROM lineitem
      WHERE (l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05) OR l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",
    "filter_in_like" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING') AND c_name LIKE '%5'
      ORDER BY c_custkey""",
    "filter_null3vl" -> """
      SELECT COUNT(1) AS total,
             COUNT(1) FILTER (WHERE a IS NULL) AS a_null,
             COUNT(a) AS a_notnull,
             COUNT(1) FILTER (WHERE a IS NULL AND b IS NULL) AS both_null,
             COUNT(1) FILTER (WHERE a IS NOT DISTINCT FROM b) AS nullsafe_eq,
             COUNT(1) FILTER (WHERE a = b) AS plain_eq
      FROM (SELECT NULLIF(l_discount, 0.0) AS a, NULLIF(l_tax, 0.0) AS b FROM lineitem)""",
    "project_expr" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
             CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS qty_class,
             concat_ws('/', l_returnflag, l_linestatus) AS flag_status
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
  )
}
