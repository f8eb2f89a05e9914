package graft.operators

import graft.{Helpers, OpRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.7 Set operations & dedup. `dedup_by_key` is the deterministic
  * keep-first pattern (row_number over a full tiebreak) — never bare
  * `dropDuplicates(keys)`, whose survivor depends on partitioning.
  */
object SetOps extends OpRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_all" -> ((s, dir) => {
      val o = t(s, dir)("orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      a.unionAll(b).orderBy("o_orderkey")
    }),

    "set_union_distinct" -> ((s, dir) => {
      val o = t(s, dir)("orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      a.union(b).distinct().orderBy("o_orderkey")
    }),

    "set_intersect" -> ((s, dir) => {
      val c = t(s, dir)("customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
      val o = t(s, dir)("orders").select(col("o_custkey").as("custkey"))
      c.intersect(o).orderBy("custkey")
    }),

    "set_except" -> ((s, dir) => {
      val o = t(s, dir)("orders").select(col("o_custkey").as("custkey"))
      val c = t(s, dir)("customer").filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"))
      o.except(c).orderBy("custkey")
    }),

    "set_except_all" -> ((s, dir) => {
      // Multiset difference: each matching right-side row cancels ONE
      // left-side occurrence (vs set except which removes all).
      val o = t(s, dir)("orders").select(col("o_custkey").as("custkey"))
      val c = t(s, dir)("customer").filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"))
      o.exceptAll(c).orderBy("custkey")
    }),

    "set_intersect_all" -> ((s, dir) => {
      // Multiset intersection: min of the two occurrence counts per value.
      val o = t(s, dir)("orders").select(col("o_custkey").as("custkey"))
      val c = t(s, dir)("customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
      o.intersectAll(c).orderBy("custkey")
    }),

    "set_symmetric_diff" -> ((s, dir) => {
      // Symmetric difference (A △ B) with PROVENANCE — the reconciliation
      // primitive (which keys exist on exactly one side, and which side):
      // customers with AUTOMOBILE segment vs customers who placed a
      // high-value order. One full-outer join on the two distinct key
      // sets, keep single-sided rows — ONE shuffle, where the naive
      // (A∪B)−(A∩B) rewrite pays three set operators and loses the
      // side flag a reconciliation report needs.
      val a = t(s, dir)("customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey")).distinct()
        .withColumn("in_a", lit(1))
      val b = t(s, dir)("orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey")).distinct()
        .withColumn("in_b", lit(1))
      a.join(b, Seq("custkey"), "full")
        .filter(col("in_a").isNull || col("in_b").isNull)
        .select(col("custkey"),
          when(col("in_a").isNotNull, "a_only").otherwise("b_only").as("side"))
        .orderBy("custkey")
    }),

    "distinct_rows" -> ((s, dir) =>
      t(s, dir)("orders").select("o_orderstatus", "o_orderpriority")
        .distinct().orderBy("o_orderstatus", "o_orderpriority")),

    "dedup_by_key" -> ((s, dir) =>
      Helpers.keepFirst(
        t(s, dir)("orders").select("o_custkey", "o_orderkey", "o_orderdate"),
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
        .orderBy("o_custkey")),
  )

  def oracleSql: Map[String, String] = Map(
    "set_symmetric_diff" -> """
      WITH a AS (SELECT DISTINCT c_custkey AS custkey FROM customer
                 WHERE c_mktsegment = 'AUTOMOBILE'),
      b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
            WHERE o_totalprice > 400000)
      SELECT COALESCE(a.custkey, b.custkey) AS custkey,
             CASE WHEN a.custkey IS NOT NULL THEN 'a_only' ELSE 'b_only' END AS side
      FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      WHERE a.custkey IS NULL OR b.custkey IS NULL
      ORDER BY custkey""",
    "set_union_all" -> """
      SELECT * FROM (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY o_orderkey""",
    "set_union_distinct" -> """
      SELECT * FROM (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY o_orderkey""",
    "set_intersect" -> """
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders
      ORDER BY custkey""",
    "set_except" -> """
      SELECT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      ORDER BY custkey""",
    "set_except_all" -> """
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      ORDER BY custkey""",
    "set_intersect_all" -> """
      SELECT o_custkey AS custkey FROM orders
      INTERSECT ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      ORDER BY custkey""",
    "distinct_rows" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders ORDER BY o_orderstatus, o_orderpriority""",
    "dedup_by_key" -> """
      SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
      WHERE rn = 1 ORDER BY o_custkey""",
  )
}
