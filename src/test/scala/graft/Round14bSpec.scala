package graft

import org.apache.spark.sql.functions._

/** Round-14 batch B: star-schema analytics — repeat rate, ship-lag
  * percentiles, weekday profile, margin spread, order-gap median, and
  * the V-shape row-pattern window. Tests pin the integer-rank boundaries
  * and dialect shims the fixture oracle can't isolate.
  */
class Round14bSpec extends GraftSuite {
  import spark.implicits._

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, String, String, String, Double)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_orderpriority", "d",
        "o_orderstatus", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("q_customer_repeat_rate: ppm truncates like both engines' integer div") {
    val dir = TestSpark.tempDir("graft_r14b_rr_")
    // nation 0: 3 buyers, 1 repeat => 333333 ppm exactly (truncated)
    writeOrders(dir, Seq(
      (1L, 1L, "P", "1995-01-01", "O", 10.0), (2L, 1L, "P", "1995-02-01", "O", 10.0),
      (3L, 2L, "P", "1995-01-01", "O", 10.0), (4L, 3L, "P", "1995-01-01", "O", 10.0)))
    Seq((1L, "c1", 0), (2L, "c2", 0), (3L, "c3", 0))
      .toDF("c_custkey", "c_name", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0, "NATION_0")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val r = SparkEntry.queries("q_customer_repeat_rate")(spark, dir).collect()(0)
    assert((r.getAs[Long]("n_buyers"), r.getAs[Long]("n_repeat"),
      r.getAs[Long]("repeat_ppm")) === ((3L, 1L, 333333L)))
  }

  test("q_ship_lag_percentiles: nearest-rank (n*p+99) div 100 at n=4") {
    val dir = TestSpark.tempDir("graft_r14b_lag_")
    // lags 1,2,3,4 => r50=(299)//100=2 -> lag 2; r90=(459)//100=4 -> lag 4
    writeOrders(dir, (1L to 4L).map(k =>
      (k, 1L, "1-URGENT", "1995-01-01", "O", 10.0)))
    (1L to 4L).map(k => (k, s"1995-01-0${k + 1}"))
      .toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_ship_lag_percentiles")(spark, dir).collect()(0)
    assert((r.getAs[Long]("n_lines"), r.getAs[Long]("p50_days"),
      r.getAs[Long]("p90_days"), r.getAs[Long]("p99_days")) === ((4L, 2L, 4L, 4L)))
  }

  test("q_order_weekday_profile: 1995-01-02 was a Monday => isodow 1; share ppm exact") {
    val dir = TestSpark.tempDir("graft_r14b_dow_")
    writeOrders(dir, Seq(
      (1L, 1L, "P", "1995-01-02", "O", 100.0),   // Monday
      (2L, 1L, "P", "1995-01-08", "O", 200.0),   // Sunday
      (3L, 1L, "P", "1995-01-09", "O", 300.0)))  // Monday
    val out = SparkEntry.queries("q_order_weekday_profile")(spark, dir)
      .collect().map(r => (r.getAs[Int]("isodow"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("dow_share_ppm"))).toSeq
    assert(out === Seq((1, 2L, 666666L), (7, 1L, 333333L)))
  }

  test("q_customer_order_gap: same-date orders gap 0; even-count median splits lo/hi") {
    val dir = TestSpark.tempDir("graft_r14b_gap_")
    // cust 1: dates 1,1,5 => gaps {0,4}; median lo=0 hi=4 (even count)
    writeOrders(dir, Seq(
      (1L, 1L, "P", "1995-01-01", "O", 10.0), (2L, 1L, "P", "1995-01-01", "O", 10.0),
      (3L, 1L, "P", "1995-01-05", "O", 10.0)))
    Seq((1L, "c1", "BUILDING")).toDF("c_custkey", "c_name", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q_customer_order_gap")(spark, dir).collect()(0)
    assert((r.getAs[Long]("n_gaps"), r.getAs[Long]("med_lo"),
      r.getAs[Long]("med_hi")) === ((2L, 0L, 4L)))
  }

  test("win_pattern_vshape: strict V matches; a flat trough does not") {
    val dir = TestSpark.tempDir("graft_r14b_v_")
    // series (cents): 500, 400, 300, 450  => V at day 3 (down,down,up)
    // then 450, 450, 600: plateau is NOT two strict downs — no match
    val days = Seq("01" -> 5.0, "02" -> 4.0, "03" -> 3.0, "04" -> 4.5,
      "05" -> 4.5, "06" -> 6.0)
    writeOrders(dir, days.zipWithIndex.map { case ((dd, v), i) =>
      ((i + 1).toLong, 1L, "P", s"1995-01-$dd", "O", v) })
    val out = SparkEntry.queries("win_pattern_vshape")(spark, dir)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("rev_c"), r.getAs[Long]("depth_c"),
        r.getAs[Long]("rebound_c"))).toSeq
    assert(out === Seq(("1995-01-03", 300L, 200L, 150L)))
  }

  test("q_part_margin_spread: exact decimal ratio of realized to list revenue") {
    val dir = TestSpark.tempDir("graft_r14b_mg_")
    // one line: qty 2 at retail 10.00, sold extprice 20.00 with 25% discount
    // => realized 15.00, list 20.00, depth = 0.25
    Seq((1L, 2.0, 20.0, 0.25))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "Brand#1", 10.0)).toDF("p_partkey", "p_brand", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("q_part_margin_spread")(spark, dir).collect()(0)
    assert(r.getAs[Double]("realized_rev") === 15.0)
    assert(r.getAs[Double]("list_rev") === 20.0)
    assert(r.getAs[Double]("discount_depth6") === 0.25)
  }
}
