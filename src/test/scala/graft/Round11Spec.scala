package graft

import org.apache.spark.sql.functions._

/** Round-11 edge-case hardening (VERDICT r10 #5): degenerate inputs for the
  * newest r10 ops — no-following-purchase as-of, the exact 24h attribution
  * boundary, 1-row / all-equal percentile groups, prefix==full Matryoshka.
  * Each test builds a purpose-built fixture dir (unique temp path, same
  * parquet schemas as the driver fixtures) and runs the REGISTRY op on it.
  */
class Round11Spec extends GraftSuite {
  import spark.implicits._

  /** events fixture rows: (event_id, ts NANOS, user_id, event_type). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("join_asof_forward: a user with no following purchase gets NULL") {
    val us = 1000L // 1 micro in nanos
    val dir = writeEvents(Seq(
      // user 1: click, never purchases afterward (purchase is BEFORE it)
      (1L, 50L * us, 1L, "purchase"),
      (2L, 100L * us, 1L, "click"),
      // user 2: click then purchase
      (3L, 100L * us, 2L, "click"),
      (4L, 200L * us, 2L, "purchase")))
    val rows = SparkEntry.queries("join_asof_forward")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("next_purchase_ts"))) None
         else Some(r.getAs[Long]("next_purchase_ts")))).toMap
    assert(rows(2L).isEmpty, "no following purchase must yield NULL, not the past one")
    assert(rows(3L).contains(200L), "user 2's click finds its next purchase")
  }

  test("join_asof_forward: same-micros purchase included iff event_id >= click's") {
    val us = 1000L
    val dir = writeEvents(Seq(
      // user 1: purchase shares the click's exact micros but has a SMALLER
      // event_id — the (ts, event_id) ROWS frame excludes it
      (5L, 100L * us, 1L, "purchase"),
      (6L, 100L * us, 1L, "click"),
      // user 2: same-micros purchase with a LARGER event_id — included
      (7L, 100L * us, 2L, "click"),
      (8L, 100L * us, 2L, "purchase")))
    val rows = SparkEntry.queries("join_asof_forward")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("next_purchase_ts"))) None
         else Some(r.getAs[Long]("next_purchase_ts")))).toMap
    assert(rows(6L).isEmpty, "smaller-id same-ts purchase sits before the frame")
    assert(rows(7L).contains(100L), "larger-id same-ts purchase is in the frame")
  }

  test("events_attribution_first_touch: the exact 24h boundary is attributed, +1us is not") {
    val us = 1000L
    val dayUs = 86400000000L
    val dir = writeEvents(Seq(
      // user 1: click EXACTLY 24h before the purchase — RANGE frame is
      // inclusive at -lookback, so it attributes with gap == 24h
      (1L, 0L, 1L, "click"),
      (2L, dayUs * us, 1L, "purchase"),
      // user 2: click 24h + 1us before — outside the frame
      (3L, 0L, 2L, "click"),
      (4L, (dayUs + 1L) * us, 2L, "purchase")))
    val rows = SparkEntry.queries("events_attribution_first_touch")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(rows(2L).getAs[Int]("attributed") == 1)
    assert(rows(2L).getAs[Long]("gap_us") == dayUs, "boundary gap is exactly 24h")
    assert(rows(4L).getAs[Int]("attributed") == 0)
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("first_click_ts")))
  }

  test("agg_percentiles_exact: n=1 group and all-equal group collapse to the value") {
    val dir = TestSpark.tempDir("graft_r11_ord_")
    val one = Seq(("1-SINGLE", 42.5))
    val eq = (1 to 100).map(_ => ("2-EQUAL", 7.0))
    (one ++ eq).toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("agg_percentiles_exact")(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val s1 = rows("1-SINGLE")
    assert(s1.getAs[Long]("n_rows") == 1L)
    for (p <- Seq("p50", "p90", "p99"))
      assert(s1.getAs[Double](p) == 42.5, s"$p of a 1-row group is the row")
    val s2 = rows("2-EQUAL")
    assert(s2.getAs[Long]("n_rows") == 100L)
    for (p <- Seq("p50", "p90", "p99"))
      assert(s2.getAs[Double](p) == 7.0, s"$p of an all-equal group is the value")
  }

  test("vec_matryoshka_recall: zero tail (prefix==full) gives perfect overlap") {
    val dir = TestSpark.tempDir("graft_r11_vec_")
    // 30 vectors whose dims 17..64 are all ZERO: the 16-dim prefix dot
    // equals the full dot bit-for-bit, so both rankings coincide exactly
    val vecs = (0 until 30).map { i =>
      val emb = Array.tabulate(64)(j =>
        if (j < 16) (((i * 31 + j * 17) % 13) - 6).toFloat / 10.0f else 0.0f)
      (i.toLong, emb)
    }
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("vec_matryoshka_recall")(spark, dir).collect()
    assert(rows.length == 10, "one verdict row per query vector")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 5L,
        s"query ${r.getAs[Long]("qid")}: degenerate prefix must preserve all of top-5")
      assert(r.getAs[Int]("top1_same") == 1)
    }
  }
}
