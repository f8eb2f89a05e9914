package graft

import org.apache.spark.sql.functions._

/** Round-14 batch C: time-series — drawdown, rolling median, downtime
  * intervals, session-depth histogram, weekly seasonality strength.
  * Fixtures plant the exact boundary each op's math must honor.
  */
class Round14cSpec extends GraftSuite {
  import spark.implicits._

  private val usPerDayNs = 86400000000000L
  private val usPerMinNs = 60000000000L

  /** events rows: (event_id, ts NANOS, user_id, event_type, value). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestSpark.tempDir("graft_r14c_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events_drawdown: peak-to-trough exact; earliest trough wins ties") {
    // daily values (cents): +500, -300, -100, +600 => cum 500,200,100,700
    // runmax 500,500,500,700; dd 0,300,400,0 => max dd 400 at day 2
    val dir = writeEvents(Seq(
      (1L, 0 * usPerDayNs, 1L, "view", 5.0),
      (2L, 1 * usPerDayNs, 1L, "view", -3.0),
      (3L, 2 * usPerDayNs, 1L, "view", -1.0),
      (4L, 3 * usPerDayNs, 1L, "view", 6.0)))
    val r = SparkEntry.queries("events_drawdown")(spark, dir).collect()(0)
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("max_drawdown_c"),
      r.getAs[Long]("trough_day")) === ((4L, 400L, 2L)))
  }

  test("events_rolling_median: even frame emits the lo/hi pair, no interpolation") {
    // daily counts: day0=1, day1=3 => frame at day1 = [1,3]: lo=1, hi=3
    val dir = writeEvents(
      Seq((1L, 0L, 1L, "view", 1.0)) ++
      (1 to 3).map(k => (k + 1L, 1 * usPerDayNs + k * 1000L, 1L, "view", 1.0)))
    val out = SparkEntry.queries("events_rolling_median")(spark, dir)
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Int]("k"),
        r.getAs[Long]("med_lo"), r.getAs[Long]("med_hi"))).toSeq
    assert(out === Seq((0L, 1, 1L, 1L), (1L, 2, 1L, 3L)))
  }

  test("events_downtime_intervals: 59-silent-minute gap ignored, 60+ counted") {
    // active minutes: 0, 60, 121 => gaps of 59 (below threshold) and 60
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 60 * usPerMinNs, 1L, "view", 1.0),
      (3L, 121 * usPerMinNs, 1L, "view", 1.0)))
    val out = SparkEntry.queries("events_downtime_intervals")(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getAs[Long]("n_outages"), r.getAs[Long]("down_minutes"),
      r.getAs[Long]("max_outage_min"), r.getAs[Long]("first_outage_start_min"))
      === ((1L, 60L, 60L, 61L)))
  }

  test("events_session_depth_hist: 30-min break rule splits; 20+ tail buckets") {
    // user 1: 3 events 10 min apart (depth 3), then a 31-min jump starts a
    // second session of 1; user 2: 25 rapid events => bucket 20
    val u1 = Seq(0L, 10L, 20L).map(m => m * usPerMinNs) :+ (51L * usPerMinNs)
    val rows = u1.zipWithIndex.map { case (ts, i) => (i + 1L, ts, 1L, "view", 1.0) } ++
      (1 to 25).map(k => (100L + k, k * 1000000L, 2L, "view", 1.0))
    val dir = writeEvents(rows)
    val out = SparkEntry.queries("events_session_depth_hist")(spark, dir)
      .collect().map(r => (r.getAs[Long]("depth_bucket"),
        r.getAs[Long]("n_sessions"))).toMap
    assert(out === Map(1L -> 1L, 3L -> 1L, 20L -> 1L))
  }

  test("events_weekly_seasonality_strength: pure-weekly signal => strength 1") {
    // 14 days, counts depend ONLY on dow: dow d gets d events. Within-group
    // variance 0 => SSB = SST => strength6 = 1.0 exactly.
    var id = 0L
    val rows = (0 until 14).flatMap { day =>
      val dow = (day + 3) % 7 + 1
      (1 to dow).map { k => id += 1; (id, day * usPerDayNs + k * 1000L, 1L, "view", 1.0) }
    }
    val dir = writeEvents(rows)
    val r = SparkEntry.queries("events_weekly_seasonality_strength")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("ssb_num") === r.getAs[Long]("sst_num"))
    assert(r.getAs[Double]("strength6") === 1.0)
    assert(r.getAs[Long]("sst_num") > 0)
  }
}
