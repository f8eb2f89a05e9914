package graft

import org.apache.spark.sql.functions._

/** Round-14 batch G: Holt linear smoothing, debounced alerting, cohort
  * revenue triangle, discount elasticity, backbone assortativity,
  * malformed-CSV ingestion.
  */
class Round14gSpec extends GraftSuite {
  import spark.implicits._

  private val nsPerDay = 86400000000000L
  private val nsPerHour = 3600000000000L

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestSpark.tempDir("graft_r14g_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events_holt_linear: perfect linear series tracks exactly") {
    // daily counts 2,4,6,8 (milli 2000..8000): l0=2000; t=1: b0=2000,
    // l=4000,b=2000; ... level=8000, trend=2000, forecast7=22000
    val rows = (0 to 3).flatMap(d => (1 to 2 * (d + 1)).map(i =>
      ((d * 10 + i).toLong, d * nsPerDay + i, 1L, "view", 1.0)))
    val r = SparkEntry.queries("events_holt_linear")(spark, writeEvents(rows))
      .collect()(0)
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("level_milli"),
      r.getAs[Long]("trend_milli"), r.getAs[Long]("forecast7_milli"))
      === ((4L, 8000L, 2000L, 22000L)))
  }

  test("events_holt_linear: negative trend divides like both engines") {
    // counts 3,1,1: l0=3000; t=1: b0=-2000, l=1000, b=-2000;
    // t=2: l=(1000+1000-2000)/2=0, b=(0-1000-2000)/2=-1500
    val rows = Seq((1L, 1L, 1L, "v", 1.0), (2L, 2L, 1L, "v", 1.0),
      (3L, 3L, 1L, "v", 1.0),
      (4L, nsPerDay + 1, 1L, "v", 1.0),
      (5L, 2 * nsPerDay + 1, 1L, "v", 1.0))
    val r = SparkEntry.queries("events_holt_linear")(spark, writeEvents(rows))
      .collect()(0)
    assert((r.getAs[Long]("level_milli"), r.getAs[Long]("trend_milli"),
      r.getAs[Long]("forecast7_milli")) === ((0L, -1500L, -10500L)))
  }

  test("events_alert_debounce: 3+ consecutive hot hours fire, 2 don't") {
    // error counts: h0..h3 = 5 (hot run of 4), h5,h6 = 5 (run of 2,
    // dropped), h4,h7,h8,h9 = 1; mean gate: 10c > 34 => c >= 4.
    // "view" noise at h20 must be excluded by the type filter.
    val hot = Seq(0, 1, 2, 3, 5, 6).flatMap(h => (1 to 5).map(i =>
      ((h * 10 + i).toLong, h * nsPerHour + i, 1L, "error", 1.0)))
    val cold = Seq(4, 7, 8, 9).map(h =>
      ((h * 10).toLong, h * nsPerHour + 1, 1L, "error", 1.0))
    val noise = (1 to 50).map(i => ((900 + i).toLong, 20 * nsPerHour + i, 2L,
      "view", 1.0))
    val out = SparkEntry.queries("events_alert_debounce")(
      spark, writeEvents(hot ++ cold ++ noise)).collect()
    assert(out.length === 1)
    assert((out(0).getAs[Long]("start_hr"), out(0).getAs[Long]("n_hours"),
      out(0).getAs[Long]("peak_count")) === ((0L, 4L, 5L)))
  }

  test("q_cohort_revenue_triangle: first-order year pins the cohort") {
    val dir = TestSpark.tempDir("graft_r14g_coh_")
    // cust 1: first 1995, buys 1995 (100) and 1996 (50)
    // cust 2: first 1996, buys 1996 (200)
    Seq((1L, 1L, "P", "1995-03-01", "O", 100.0),
      (2L, 1L, "P", "1996-07-01", "O", 50.0),
      (3L, 2L, "P", "1996-01-01", "O", 200.0))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "d",
        "o_orderstatus", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_cohort_revenue_triangle")(spark, dir)
      .collect().map(r => (r.getAs[Int]("cohort_yr"), r.getAs[Int]("order_yr"),
        r.getAs[Long]("n_customers"), r.getAs[Double]("revenue"))).toSeq
    assert(out === Seq((1995, 1995, 1L, 100.0), (1995, 1996, 1L, 50.0),
      (1996, 1996, 1L, 200.0)))
  }

  test("q_discount_quantity_elasticity: planted y=10+2x line => corr 1, slope 2") {
    val dir = TestSpark.tempDir("graft_r14g_el_")
    Seq((1L, 10L, 0.00, 10.0), (2L, 10L, 0.05, 20.0), (3L, 10L, 0.10, 30.0))
      .toDF("l_orderkey", "l_partkey", "l_discount", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "Brand#1")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("q_discount_quantity_elasticity")(spark, dir)
      .collect()(0)
    assert((r.getAs[Long]("n_lines"), r.getAs[Double]("corr6"),
      r.getAs[Double]("slope6")) === ((3L, 1.0, 2.0)))
  }

  test("graph_assortativity: backbone statistic exists and is a correlation") {
    val r = q("graph_assortativity").collect()(0)
    assert(r.getAs[Long]("m_arcs") > 0)
    val a = r.getAs[Double]("assortativity6")
    assert(!r.isNullAt(r.fieldIndex("assortativity6")) && a >= -1.0 && a <= 1.0)
  }

  test("source_csv_badrecords: corrupt rows quarantined, never dropped or fatal") {
    val orders = Tables.load(spark, sfDir, "orders")
    val total = orders.count()
    val bad = orders.filter(col("o_orderkey") % 100 === 0).count()
    val r = q("source_csv_badrecords").collect()(0)
    assert((r.getAs[Long]("n_good"), r.getAs[Long]("n_corrupt"))
      === ((total - bad, bad)))
    assert(bad > 0, "fixture must exercise the corrupt path")
    assert(r.getAs[Double]("sum_price_good") > 0.0)
  }
}
