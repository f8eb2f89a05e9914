package graft

import org.apache.spark.sql.functions._

/** Unit evidence for the round-11 batch-5 ops (agg_histogram,
  * join_interval_overlap, docs_nll_histogram): hand-computed integer
  * bucket boundaries, a hand-built session/busy-hour overlap, and
  * mass-conservation of the NLL histogram against the quality filter.
  */
class Round11gSpec extends GraftSuite {
  import spark.implicits._

  test("agg_histogram: integer bucket arithmetic matches the hand formula at the edges") {
    // prices 1.00/2.00/3.00 -> c 100/200/300, lo 100, hi 300, span 201:
    // buckets 0 / 9 / 19 (min lands in 0, max in 19 — never 20).
    val dir = TestSpark.tempDir("graft_r11g_li_")
    Seq(1.00, 2.00, 3.00).toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("agg_histogram")(spark, dir)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("bucket_lo_centi"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("min_centi"),
        r.getAs[Long]("max_centi"), r.getAs[Long]("share_ppm")))
    assert(rows.toSeq === Seq(
      (0L, 100L, 1L, 100L, 100L, 333333L),
      (9L, 190L, 1L, 200L, 200L, 333333L),
      (19L, 290L, 1L, 300L, 300L, 333333L)))
  }

  test("agg_histogram on the fixture: buckets in [0,20), counts conserve the fact") {
    val rows = q("agg_histogram").collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 20 })
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 6000L) // sf0.001 lineitem
    rows.foreach { r =>
      assert(r.getAs[Long]("min_centi") >= r.getAs[Long]("bucket_lo_centi")) }
  }

  test("join_interval_overlap: busy-hour cut and overlap micros by hand") {
    // user 1: events at H+0, H+10min (one session), H+90min (second
    // session). Hour H has 2 events, hour H+1h has 1; total 3 over 2
    // hours -> busy = {H} only (2*2 > 3; 1*2 < 3). Session 1 overlaps
    // H by 10 minutes; session 2 does not overlap any busy hour.
    val hUs = 3600000000L
    val h0 = hUs * 1000
    val dir = TestSpark.tempDir("graft_r11g_ev_")
    Seq(
      (1L, h0 * 1000L, 1L, "click"),
      (2L, (h0 + 600000000L) * 1000L, 1L, "click"),
      (3L, (h0 + 5400000000L) * 1000L, 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("join_interval_overlap")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid"),
        r.getAs[Long]("s_start"), r.getAs[Long]("s_end"),
        r.getAs[Long]("n_busy_hours"), r.getAs[Long]("overlap_us")))
    assert(rows.toSeq === Seq(
      (1L, 1L, h0, h0 + 600000000L, 1L, 600000000L)))
  }

  test("docs_nll_histogram: per-lang doc mass equals the quality filter's; shares are exact ppm") {
    val hist = q("docs_nll_histogram").collect()
    val filt = q("docs_lm_quality_filter").collect()
    val histByLang = hist.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val filtByLang = filt.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    assert(histByLang == filtByLang, s"$histByLang vs $filtByLang")
    hist.foreach { r =>
      val expected = r.getAs[Long]("n_docs") * 1000000L / histByLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("share_ppm") == expected)
      assert(r.getAs[Long]("lo_micro_nats") == r.getAs[Long]("bucket") * 500000L)
    }
  }
}
