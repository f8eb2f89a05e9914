package graft

import org.apache.spark.sql.functions._

/** Round-14 batch I: in-session conversion, weekly mix drift, open-order
  * aging, parquet bloom sink, collation surface.
  */
class Round14iSpec extends GraftSuite {
  import spark.implicits._

  private val nsPerMin = 60000000000L
  private val nsPerDay = 86400000000000L

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestSpark.tempDir("graft_r14i_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events_session_conversion: purchase must follow the view IN-session") {
    val dir = writeEvents(Seq(
      // u1: view then purchase 10 min later, same session -> converted
      (1L, 0L, 1L, "view", 1.0), (2L, 10 * nsPerMin, 1L, "purchase", 1.0),
      // u2: view; purchase 2h later = NEW session -> NOT converted
      (3L, 0L, 2L, "view", 1.0), (4L, 120 * nsPerMin, 2L, "purchase", 1.0),
      // u3: purchase BEFORE the view, same session -> NOT converted
      (5L, 0L, 3L, "purchase", 1.0), (6L, 1 * nsPerMin, 3L, "view", 1.0)))
    val r = SparkEntry.queries("events_session_conversion")(spark, dir)
      .collect()(0)
    assert((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_with_view"),
      r.getAs[Long]("n_converted"), r.getAs[Long]("cvr_ppm"))
      === ((4L, 3L, 1L, 333333L)))
  }

  test("events_mix_drift_weekly: planted 75/25 vs 50/50 corpus => tv 250000") {
    val w0 = Seq.fill(3)("view") ++ Seq("click")
    val w1 = Seq("view") ++ Seq.fill(3)("click")
    val rows = w0.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, i.toLong, 1L, t, 1.0) } ++
      w1.zipWithIndex.map { case (t, i) =>
        ((10 + i).toLong, 7 * nsPerDay + i, 1L, t, 1.0) }
    val out = SparkEntry.queries("events_mix_drift_weekly")(
      spark, writeEvents(rows)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_events") === 4L)
      assert(r.getAs[Long]("tv_ppm") === 250000L)
      // |d| ties at 250000 for both types -> smallest type wins
      assert(r.getAs[String]("top_drift_type") === "click")
    }
  }

  test("q_open_order_aging: buckets split at 30/60/90; F excluded") {
    val dir = TestSpark.tempDir("graft_r14i_age_")
    Seq((1L, "O", "1995-03-22", 10.0),   // age 10 -> 00-29
      (2L, "P", "1995-02-15", 20.0),     // age 45 -> 30-59
      (3L, "O", "1994-12-22", 40.0),     // age 100 -> 90+
      (4L, "F", "1995-04-01", 99.0))     // snapshot anchor, excluded
      .toDF("o_orderkey", "o_orderstatus", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_open_order_aging")(spark, dir)
      .collect().map(r => (r.getAs[String]("bucket"),
        r.getAs[Long]("n_orders"), r.getAs[Double]("open_value"))).toSeq
    assert(out === Seq(("00-29", 1L, 10.0), ("30-59", 1L, 20.0),
      ("90+", 1L, 40.0)))
  }

  test("sink_parquet_bloom: bloom-indexed readback equals the direct filter") {
    val direct = Tables.load(spark, sfDir, "orders")
      .filter(col("o_custkey") === 7L).count()
    val r = q("sink_parquet_bloom").collect()(0)
    assert(r.getAs[Long]("n_rows") === direct)
  }

  test("fn_collate: case variants collapse to one group per name") {
    val parts = Tables.load(spark, sfDir, "part")
    val distinctNames = parts.select("p_name").distinct().count()
    val out = q("fn_collate")
    assert(out.count() === distinctNames)
    assert(out.agg(sum("n_variants")).collect()(0).getLong(0)
      === 2 * parts.count())
  }
}
