package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-6 evidence: hand-computed fixtures for the trade-backbone
  * BFS (chain + unreachable node), the bitmap exact-distinct (bucket
  * boundary + duplicates), and the supplier-concentration HHI.
  */
class Round12dSpec extends GraftSuite {
  import spark.implicits._

  test("graph_bfs_distance: chain backbone 0-1-2 gives hops 0,1,2; isolated nation is -1") {
    val dir = TestSpark.tempDir("graft_r12d_bfs_")
    Seq((0L, "A", 0L), (1L, "B", 0L), (2L, "C", 0L), (3L, "D", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // customer c1 in nation 0, c2 in nation 1; supplier s1 in nation 1,
    // s2 in nation 2 → order 10 links 0-1, order 20 links 1-2; nation 3
    // appears in no trade at all.
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (20L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("graph_bfs_distance")(spark, dir)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("dist"))).toSeq
    assert(rows === Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, -1L)), s"got $rows")
  }

  test("agg_bitmap_distinct: duplicates collapse, ids across bucket boundaries sum") {
    val dir = TestSpark.tempDir("graft_r12d_bm_")
    // custkey 32770 lands in a different bitmap bucket than 1/2 (bucket
    // width 32768) — the per-month total must sum disjoint popcounts.
    Seq(
      (1L, 1L, "1997-01-03"), (2L, 1L, "1997-01-09"),
      (3L, 2L, "1997-01-15"), (4L, 32770L, "1997-01-21"),
      (5L, 7L, "1997-02-02"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("agg_bitmap_distinct")(spark, dir)
      .collect().map(r => (r.getAs[java.sql.Date]("month").toString,
        r.getAs[Long]("n_cust"), r.getAs[Long]("n_orders"))).toSeq
    assert(rows === Seq(("1997-01-01", 3L, 4L), ("1997-02-01", 1L, 1L)),
      s"got $rows")
  }

  test("q_supplier_concentration: two suppliers at 300/100 give HHI 0.625 exactly") {
    val dir = TestSpark.tempDir("graft_r12d_hhi_")
    Seq((0L, "ALGERIA", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 0L), (2L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // supplier 1 revenue 300 (two lines), supplier 2 revenue 100
    Seq((1L, 100.0, 0.0), (1L, 200.0, 0.0), (2L, 100.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_supplier_concentration")(spark, dir)
      .collect().map(r => (r.getAs[String]("n_name"),
        r.getAs[Long]("n_suppliers"), r.getAs[Double]("revenue"),
        r.getAs[Double]("hhi6"))).toSeq
    // HHI = (300² + 100²) / 400² = 0.625
    assert(rows === Seq(("ALGERIA", 2L, 400.0, 0.625)), s"got $rows")
  }
}
