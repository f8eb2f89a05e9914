package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

/** §2.10 streaming-equivalence tests with MemoryStream: batch parity for
  * the availableNow ops, and the genuinely incremental semantics (late-data
  * drop past the watermark) that have no batch twin.
  */
class StreamingSpec extends GraftSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("watermark drops late data beyond the delay") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val agg = ms.toDF().toDF("ts_ts", "user_id", "value")
      .withWatermark("ts_ts", "10 minutes")
      .groupBy(window($"ts_ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
    val qn = "wmtest_" + System.nanoTime()
    val query = agg.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: events in hour 10:00; max event time 11:55
      ms.addData((ts(5), 1L, 1.0), (ts(10), 1L, 1.0), (ts(115), 1L, 1.0))
      query.processAllAvailable() // watermark -> 11:45
      // batch 2: late event at 10:20 — far below watermark, must be dropped
      ms.addData((ts(20), 1L, 99.0))
      query.processAllAvailable()
      // batch 3: advance time far enough to close all windows
      ms.addData((ts(300), 1L, 1.0))
      query.processAllAvailable()
      val out = spark.table(qn)
        .select(unix_micros($"window.start").as("ws"), $"cnt").as[(Long, Long)]
        .collect().toMap
      val hour10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
      assert(out(hour10) == 2L, s"late event leaked into closed window: $out")
    } finally query.stop()
  }

  test("stream-static join enriches across batches; unmatched keys coalesce; no join state") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("k", "tier")
    val ms = MemoryStream[(Timestamp, Long)]
    val enriched = ms.toDF().toDF("ts_ts", "user_id")
      .withWatermark("ts_ts", "10 minutes")
      .join(dim, $"user_id" === $"k", "left_outer")
      .withColumn("tier", coalesce($"tier", lit("UNKNOWN")))
      .groupBy(window($"ts_ts", "1 hour"), $"tier")
      .agg(count(lit(1)).as("cnt"))
    val qn = "sstest_" + System.nanoTime()
    val query = enriched.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 9L)) // 9 has no dim row
      query.processAllAvailable()
      ms.addData((ts(10), 1L)) // second batch re-probes the static side
      query.processAllAvailable()
      ms.addData((ts(300), 2L)) // close the hour-10 window
      query.processAllAvailable()
      val lp = query.lastProgress
      val hour10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
      val out = spark.table(qn)
        .filter(unix_micros($"window.start") === hour10)
        .select($"tier", $"cnt").as[(String, Long)].collect().toMap
      assert(out === Map("GOLD" -> 2L, "SILVER" -> 1L, "UNKNOWN" -> 1L),
        s"enrichment across batches wrong: $out")
      // static side holds no JOIN state: the only stateful operator is the
      // window aggregation (a symmetric stream-stream join would add one)
      assert(lp.stateOperators.length === 1,
        s"expected only the window-agg state operator: ${lp.stateOperators.map(_.operatorName).mkString(",")}")
    } finally query.stop()
  }

  test("streaming dedup equals batch distinct") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val dd = ms.toDF().toDF("ts_ts", "event_id")
      .withWatermark("ts_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val qn = "ddtest_" + System.nanoTime()
    val query = dd.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 1L)) // dup within batch
      query.processAllAvailable()
      ms.addData((ts(4), 2L), (ts(5), 3L)) // dup across batches
      query.processAllAvailable()
      val ids = spark.table(qn).select("event_id").as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
    } finally query.stop()
  }

  test("stateful running count converges to batch groupBy count") {
    // the availableNow op over the fixture must equal the batch count
    val streaming = q("stream_stateful_count")
      .as[(Long, Long)].collect().toMap
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(streaming == batch)
  }

  test("tumbling window batch twin: counts sum to table size") {
    val total = q("stream_tumbling_1h").agg(sum("cnt")).head().getLong(0)
    assert(total == Tables.load(spark, sfDir, "events").count())
    // sliding: each event in exactly 4 windows
    val sliding = q("stream_sliding_1h_15m").agg(sum("cnt")).head().getLong(0)
    assert(sliding == 4 * total)
  }

  test("stream_stream_join equals the batch interval join on the fixture") {
    val streaming = q("stream_stream_join")
    val e = Tables.load(spark, sfDir, "events")
      .withColumn("ts_us", Helpers.tsDivMicros($"ts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_us"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
    val batch = c.join(p, $"user_id" === $"pu"
        && $"purchase_us" >= $"click_us"
        && $"purchase_us" <= $"click_us" + 1800000000L)
      .select("user_id", "click_id", "purchase_id", "click_us", "purchase_us")
    assert(streaming.count() > 0, "fixture must contain click->purchase pairs")
    assert(streaming.except(batch).isEmpty && batch.except(streaming).isEmpty)
  }

  test("stream-stream join: timely match emits, state-evicted late purchase does not") {
    implicit val ctx = spark.sqlContext
    val mc = MemoryStream[(Timestamp, Long, Long)]
    val mp = MemoryStream[(Timestamp, Long, Long)]
    val clicks = mc.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "10 minutes")
    val purchases = mp.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val joined = clicks.join(purchases,
      $"c_user" === $"p_user" && $"p_ts" >= $"c_ts"
        && $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES"))
    val qn = "ssjtest_" + System.nanoTime()
    val query = joined.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: one in-range pair for user 1 + far-future rows on BOTH
      // sides (user 9) so the min-of-streams watermark advances to ~110min
      mc.addData((ts(0), 1L, 100L), (ts(120), 9L, 101L))
      mp.addData((ts(5), 1L, 200L), (ts(120), 9L, 201L))
      query.processAllAvailable()
      // batch 2: purchase at 10min is in-range for click 100, but the
      // watermark (110min) passed c_ts + 30min + 10min delay long ago —
      // the click's join state is evicted, so no match may emit
      mp.addData((ts(10), 1L, 202L))
      query.processAllAvailable()
      val got = spark.table(qn).select("click_id", "purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(got.contains((100L, 200L)) && got.contains((101L, 201L)), s"got $got")
      assert(!got.contains((100L, 202L)),
        s"late purchase matched evicted click state: $got")
    } finally query.stop()
  }

  test("sessionization: session bounds are consistent and gap-respecting") {
    val s30 = q("stream_session_30m").cache()
    assert(s30.filter($"sess_start_us" > $"sess_end_us").count() == 0)
    // events per user sum to user's event count
    val perUser = s30.groupBy("user_id").agg(sum("cnt").as("n"))
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").count()
    val bad = perUser.join(batch, "user_id").filter($"n" =!= $"count").count()
    assert(bad == 0)
    s30.unpersist()
  }
}
