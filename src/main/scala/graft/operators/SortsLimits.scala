package graft.operators

import graft.OpRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.6 Sorts / limits / top-k. `limit_topk_global` compiles to Spark's
  * TakeOrderedAndProject — a per-partition top-k + single merge, never a
  * full cluster sort; that is the 100 TB-safe shape for "top N of huge".
  */
object SortsLimits extends OpRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi_nulls" -> ((s, dir) =>
      // NULLs synthesized (status 'P' -> NULL); explicit NULLS LAST on a
      // DESC key + ASC tiebreaks. Spark ASC default is NULLS FIRST, DuckDB's
      // is NULLS LAST — the oracle spells every direction out.
      t(s, dir)("orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
          col("o_totalprice"))
        .orderBy(col("status_or_null").desc_nulls_last,
          col("o_totalprice").desc_nulls_last, col("o_orderkey"))),

    "limit_topk_global" -> ((s, dir) =>
      t(s, dir)("lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc_nulls_last,
          col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    "limit_offset" -> ((s, dir) =>
      t(s, dir)("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100).limit(100)),

    "limit_topk_with_ties" -> ((s, dir) => {
      // FETCH FIRST .. WITH TIES semantics (argmax-with-ties per group):
      // ALL rows achieving each (returnflag, linestatus) group's maximum
      // quantity — the correctness difference WITH TIES exists for: a
      // top-k report that silently drops tied rows (row_number) misstates
      // every tied key. The naive plan is rank() <= 1 over a window
      // partitioned by the group key — which sorts the ENTIRE fact inside
      // ≤6 partitions, the skew shape that dies at 100 TB. For k=1 the
      // rewrite is exact: group-max is a partial aggregate (map-side
      // combine, groups-sized result), broadcast back, equality filter —
      // no sort anywhere, one fact scan. The oracle keeps the RANK()=1
      // form, so the rewrite's equivalence is differentially certified.
      val li = t(s, dir)("lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          col("l_orderkey"), col("l_linenumber"))
      val mx = li.groupBy("l_returnflag", "l_linestatus")
        .agg(max(col("qty")).as("qty_max"))
      li.join(broadcast(mx), Seq("l_returnflag", "l_linestatus"))
        .filter(col("qty") === col("qty_max"))
        .select("l_returnflag", "l_linestatus", "qty", "l_orderkey",
          "l_linenumber")
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "sort_multi_nulls" -> """
      SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null, o_totalprice
      FROM orders
      ORDER BY status_or_null DESC NULLS LAST, o_totalprice DESC NULLS LAST, o_orderkey ASC""",
    "limit_topk_global" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC, l_linenumber ASC
      LIMIT 100""",
    "limit_offset" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 100""",
    "limit_topk_with_ties" -> """
      SELECT l_returnflag, l_linestatus, qty, l_orderkey, l_linenumber
      FROM (SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber,
                   RANK() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY CAST(l_quantity AS BIGINT) DESC) AS rk
            FROM lineitem)
      WHERE rk = 1
      ORDER BY l_returnflag, l_linestatus, l_orderkey, l_linenumber""",
  )
}
