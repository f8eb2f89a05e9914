package graft

import org.apache.spark.sql.functions._

/** Round-11 edge-case hardening, part 2: degenerate/boundary inputs for the
  * r10 event-analytics family that the uniform fixtures never produce —
  * single-event users, exact window-frame boundaries, simultaneous events,
  * ntile with fewer rows than tiles, and touching (non-overlapping)
  * sessions. Same purpose-built-fixture protocol as Round11Spec.
  */
class Round11bSpec extends GraftSuite {
  import spark.implicits._

  /** events fixture rows: (event_id, ts NANOS, user_id, event_type). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11b_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val us = 1000L // 1 micro in fixture nanos

  test("events_markov_transitions: single-event users contribute no transitions; same-ts order is the event_id tiebreak") {
    val dir = writeEvents(Seq(
      (1L, 100L * us, 1L, "view"), (2L, 200L * us, 1L, "click"), // view>click
      (3L, 500L * us, 2L, "view"), // single event: no transition
      // user 3: both events share ts 700us — (ts, event_id) order makes the
      // transition purchase>error, never error>purchase
      (10L, 700L * us, 3L, "purchase"), (11L, 700L * us, 3L, "error")))
    val rows = SparkEntry.queries("events_markov_transitions")(spark, dir)
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_trans"), r.getAs[Long]("p_ppm")))
    assert(rows.toSet === Set(
      ("purchase", "error", 1L, 1000000L),
      ("view", "click", 1L, 1000000L)))
  }

  test("scd2_type_history: a reinstated type opens a NEW interval, never extends the old one") {
    val dir = writeEvents(Seq(
      (1L, 100L * us, 1L, "view"), (2L, 200L * us, 1L, "view"), // same run
      (3L, 300L * us, 1L, "click"),
      (4L, 400L * us, 1L, "view"))) // view again: new interval
    val rows = SparkEntry.queries("scd2_type_history")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.toLong),
        r.getAs[Int]("is_current")))
    assert(rows.toSeq === Seq(
      ("view", 100L, Some(300L), 0),
      ("click", 300L, Some(400L), 0),
      ("view", 400L, None, 1)))
  }

  test("events_conversion_lag: purchase-before-signup is a negative lag and NOT converted_after; no purchase is NULL lag") {
    val dir = writeEvents(Seq(
      (1L, 200L * us, 1L, "signup"), (2L, 100L * us, 1L, "purchase"), // before
      (3L, 100L * us, 2L, "signup"), // never purchases
      (4L, 100L * us, 3L, "signup"), (5L, 300L * us, 3L, "purchase"), // after
      (6L, 100L * us, 4L, "purchase"))) // no signup: filtered out entirely
    val rows = SparkEntry.queries("events_conversion_lag")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[java.lang.Long]("lag_us")).map(_.toLong),
          r.getAs[Boolean]("converted_after")))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L), "purchase-only user must not appear")
    assert(rows(1L) === ((Some(-100L), false)))
    assert(rows(2L) === ((None, false)))
    assert(rows(3L) === ((Some(200L), true)))
  }

  test("events_dau_wau: the trailing window is exactly 7 days — day 0 counts toward day 6, not day 7") {
    val dayUs = 86400000000L
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view"), // day 0
      (2L, 6L * dayUs * 1000L, 2L, "view"), // day 6
      (3L, 7L * dayUs * 1000L, 3L, "view"))) // day 7
    val rows = SparkEntry.queries("events_dau_wau")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau")))).toMap
    assert(rows(0L) === ((1L, 1L)))
    assert(rows(6L) === ((1L, 2L)), "day 0 is inside [day-6, day]")
    assert(rows(7L) === ((1L, 2L)), "day 0 must age out at day 7; day 6 stays")
  }

  test("events_burst_detect: 5 events inside 60s are bursty; events exactly 60s apart never are") {
    val dir = writeEvents(
      // user 1: 5 events spanning 59.999999 s — all 5 share one window
      Seq.tabulate(5)(i => ((i + 1).toLong,
        (if (i == 4) 59999999L else i.toLong * 14999999L) * us, 1L, "view")) ++
      // user 2: 5 events exactly 60 s apart — the RANGE frame is
      // (t-59999999, t], so each predecessor is 1 us outside it
      Seq.tabulate(5)(i => ((i + 11).toLong, i.toLong * 60000000L * us, 2L, "view")))
    val rows = SparkEntry.queries("events_burst_detect")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("max_burst_1m"), r.getAs[Boolean]("is_bursty")))).toMap
    assert(rows(1L) === ((5L, true)))
    assert(rows(2L) === ((1L, false)))
  }

  test("events_pareto_share: fewer users than tiles yields one-user deciles and shares that sum to exactly 1e6 ppm") {
    val dir = writeEvents(
      Seq.tabulate(4)(i => ((i + 1).toLong, (i + 1).toLong * 1000L * us, 1L, "view")) ++
      Seq.tabulate(2)(i => ((i + 11).toLong, (i + 1).toLong * 1000L * us, 2L, "view")) ++
      Seq.tabulate(2)(i => ((i + 21).toLong, (i + 1).toLong * 1000L * us, 3L, "view")))
    val rows = SparkEntry.queries("events_pareto_share")(spark, dir)
      .collect().map(r => (r.getAs[Int]("decile"), r.getAs[Long]("users"),
        r.getAs[Long]("events"), r.getAs[Long]("share_ppm")))
    assert(rows.toSeq === Seq(
      (1, 1L, 4L, 500000L), (2, 1L, 2L, 250000L), (3, 1L, 2L, 250000L)))
  }

  test("events_interarrival_hist: a zero gap (simultaneous events) lands in the 1-digit bucket") {
    val dir = writeEvents(Seq(
      (1L, 500L * us, 1L, "view"), (2L, 500L * us, 1L, "click")))
    val rows = SparkEntry.queries("events_interarrival_hist")(spark, dir)
      .collect().map(r => (r.getAs[Int]("gap_digits"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("min_gap_us"), r.getAs[Long]("max_gap_us")))
    assert(rows.toSeq === Seq((1, 1L, 0L, 0L)))
  }

  test("events_concurrency: sessions touching at exactly 30 minutes do not overlap") {
    val sessUs = 1800000000L
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view"), (2L, sessUs * us, 1L, "view"), // touching: close sorts first
      (3L, 0L, 2L, "view"), (4L, (sessUs - 1L) * us, 2L, "view"))) // 1us overlap
    val rows = SparkEntry.queries("events_concurrency")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("max_concurrent"), r.getAs[Long]("first_peak_us")))).toMap
    assert(rows(1L) === ((1L, 0L)), "back-to-back sessions must not double-count")
    assert(rows(2L) === ((2L, sessUs - 1L)))
  }

  test("events_top_paths: users with fewer than 3 events contribute no paths") {
    val dir = writeEvents(Seq(
      (1L, 100L * us, 1L, "view"), (2L, 200L * us, 1L, "click"), // only 2 events
      (3L, 100L * us, 2L, "view"), (4L, 200L * us, 2L, "click"),
      (5L, 300L * us, 2L, "purchase")))
    val rows = SparkEntry.queries("events_top_paths")(spark, dir)
      .collect().map(r => (r.getAs[String]("path"), r.getAs[Long]("n")))
    assert(rows.toSeq === Seq(("view>click>purchase", 1L)))
  }

  test("events_user_overlap: disjoint audiences score 0 ppm; identical audiences score exactly 1e6") {
    val dir = writeEvents(Seq(
      // users 1,2: both view AND click (identical audiences for that pair)
      (1L, 100L * us, 1L, "view"), (2L, 200L * us, 1L, "click"),
      (3L, 100L * us, 2L, "view"), (4L, 200L * us, 2L, "click"),
      // user 3: only error — disjoint from everything
      (5L, 100L * us, 3L, "error")))
    val rows = SparkEntry.queries("events_user_overlap")(spark, dir)
      .collect().map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    assert(rows(("click", "view")) === 1000000L)
    assert(rows.get(("click", "error")).isEmpty,
      "pairs with no co-occurring user must not appear (n_both comes from co-occurrence)")
  }
}
