package graft

import org.apache.spark.sql.functions._

/** Round-13 widening batch 4: corpus-QA screens (char-class mix, PII
  * incidence, vocabulary growth, source overlap) and the seasonal-adjusted
  * anomaly / length-outlier gates.
  */
class Round13bSpec extends GraftSuite {
  import spark.implicits._

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("text_char_class_profile: hand-counted class mix; pure-punct slice reads 100% other") {
    val dir = TestSpark.tempDir("graft_r13_cc_")
    // en: "abc 12" = 3 alpha + 2 digit + 1 space (n=6) and "zz" = 2 alpha;
    // xx: "!!!" = 3 other chars only
    writeDocs(dir, Seq(
      (1L, "abc 12", "en", "s0"), (2L, "zz", "en", "s0"),
      (3L, "!!!", "xx", "s0")))
    val out = SparkEntry.queries("text_char_class_profile")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("alpha_ppm"),
          r.getAs[Long]("digit_ppm"), r.getAs[Long]("space_ppm"),
          r.getAs[Long]("other_ppm"))).toMap
    assert(out("en") === ((8L, 625000L, 250000L, 125000L, 0L)), s"en: $out")
    assert(out("xx") === ((3L, 0L, 0L, 0L, 1000000L)), s"xx: $out")
  }

  test("docs_pii_rate_by_source: sparse augmentation + a real in-text email both fire") {
    val dir = TestSpark.tempDir("graft_r13_pii_")
    // ids 0..13 in one source: augmentation adds email at id%7==0 (0,7)
    // and phone at id%11==0 (0,11); id 1 carries a REAL in-text email —
    // the detector must flag it identically to the augmented ones
    val rows = (0L to 13L).map { i =>
      val text = if (i == 1L) "reach me a@b.co now" else s"w$i soup words"
      (i, text, "en", "s0")
    }
    writeDocs(dir, rows)
    val out = SparkEntry.queries("docs_pii_rate_by_source")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 14L, s"row: $r")
    assert(r.getAs[Long]("docs_email") === 3L, s"emails (0,7 aug + 1 real): $r")
    assert(r.getAs[Long]("docs_phone") === 2L, s"phones (0,11): $r")
    assert(r.getAs[Long]("docs_any") === 4L, s"any (0,1,7,11): $r")
    assert(r.getAs[Long]("pii_ppm") === 4L * 1000000L / 14L, s"ppm: $r")
  }

  test("docs_vocab_growth_heaps: first-occurrence buckets and cumulative curve") {
    val dir = TestSpark.tempDir("graft_r13_hp_")
    // span [0,2] ⇒ buckets id*10//3 = 0, 3, 6 — one doc each; vocab:
    // bucket 0 introduces {a,b}, bucket 3 introduces {c}, bucket 6 nothing
    writeDocs(dir, Seq(
      (0L, "a b", "en", "s0"), (1L, "a c", "en", "s0"), (2L, "b c", "en", "s0")))
    val out = SparkEntry.queries("docs_vocab_growth_heaps")(spark, dir)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab_new"),
        r.getAs[Long]("docs_cum"), r.getAs[Long]("tokens_cum"),
        r.getAs[Long]("vocab_cum"))).toSeq
    assert(out === Seq(
      (0L, 1L, 2L, 2L, 1L, 2L, 2L),
      (3L, 1L, 2L, 1L, 2L, 4L, 3L),
      (6L, 1L, 2L, 0L, 3L, 6L, 3L)), s"curve: $out")
  }

  test("docs_source_overlap_jaccard: shared-token pair scores 1/3; disjoint pairs absent") {
    val dir = TestSpark.tempDir("graft_r13_ov_")
    writeDocs(dir, Seq(
      (1L, "a b", "en", "s0"), (2L, "b c", "en", "s1"), (3L, "x", "en", "s2")))
    val out = SparkEntry.queries("docs_source_overlap_jaccard")(spark, dir)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("va"), r.getAs[Long]("vb"),
        r.getAs[Long]("jac_ppm"))).toSeq
    assert(out === Seq(("s0", "s1", 1L, 2L, 2L, 333333L)),
      s"only the sharing pair may appear: $out")
  }

  test("docs_length_outliers: med2/MAD hand-check — one short, one long, middle band clean") {
    val dir = TestSpark.tempDir("graft_r13_lo_")
    // lengths [1,8,9,10,10,10,11,12,100]: med2 = 10+10 = 20; devs |2v-20|
    // sorted = 0,0,0,2,2,4,4,18,180 ⇒ mad4 = 2+2 = 4; cut 2·dev > 12 ⇒
    // dev > 6 flags ONLY len 1 (short) and len 100 (long)
    val lens = Seq(1, 8, 9, 10, 10, 10, 11, 12, 100)
    writeDocs(dir, lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, "a" * n, "en", "s0") })
    val out = SparkEntry.queries("docs_length_outliers")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 9L, s"row: $r")
    assert(r.getAs[Long]("med2_chars") === 20L, s"row: $r")
    assert(r.getAs[Long]("mad4_chars") === 4L, s"row: $r")
    assert(r.getAs[Long]("n_short") === 1L, s"row: $r")
    assert(r.getAs[Long]("n_long") === 1L, s"row: $r")
    assert(r.getAs[Long]("n_outliers") === 2L, s"row: $r")
  }

  test("events_anomaly_seasonal: burst flags against its hod baseline; quiet days weigh it") {
    val dir = TestSpark.tempDir("graft_r13_as_")
    val usDay = 86400000000L; val usHour = 3600000000L
    def ns(day: Long, hour: Long, i: Long): Long = (day * usDay + hour * usHour + i * 1000000L) * 1000L
    // hod 0: day0 n=1, day1 n=1, day2 n=4 (burst); hod 1: day0 only, n=2.
    // D=3, S(h0)=6, S(h1)=2. Flags (2nD >= 3S): d2h0 (24>=18) and d0h1
    // (12>=6 — a single-observation cell is 3x its quiet-day-weighted
    // baseline, exactly the semantics); peak = 2*3e6//2 = 3000000.
    val rows = Seq(
      (1L, ns(0, 0, 0), 10L, "view"), (2L, ns(1, 0, 0), 10L, "view"),
      (3L, ns(2, 0, 0), 10L, "view"), (4L, ns(2, 0, 1), 11L, "view"),
      (5L, ns(2, 0, 2), 12L, "view"), (6L, ns(2, 0, 3), 13L, "view"),
      (7L, ns(0, 1, 0), 10L, "view"), (8L, ns(0, 1, 1), 11L, "view"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_anomaly_seasonal")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 3L, s"row: $r")
    assert(r.getAs[Long]("n_hour_cells") === 4L, s"row: $r")
    assert(r.getAs[Long]("n_events") === 8L, s"row: $r")
    assert(r.getAs[Long]("n_anom_3halfx") === 2L, s"row: $r")
    assert(r.getAs[Long]("peak_ratio_ppm") === 3000000L, s"row: $r")
  }

  test("stream_outer_join_watermark: match emits, closed unmatched flushes -1, open tail stays silent") {
    val dir = TestSpark.tempDir("graft_r13_soj_")
    val usMin = 60000000L
    // day-1 base: an event AT epoch 0 equals the stream's initial
    // watermark and is dropped as late — shift everything off it
    val base = 1440L
    def ns(min: Long): Long = (base + min) * usMin * 1000L
    // wm = min(max click, max purchase) - 10min = min(100, 120) - 10 = 90min.
    // click 1 @0 matches purchase 101 @10; click 2 @5 unmatched and CLOSED
    // (5+30 < 90) -> the -1 row the no-data final batch must flush;
    // click 3 @100 unmatched but OPEN (100+30 >= 90) -> must emit nothing.
    val rows = Seq(
      (1L, ns(0), 1L, "click"), (101L, ns(10), 1L, "purchase"),
      (2L, ns(5), 2L, "click"),
      (3L, ns(100), 3L, "click"),
      (109L, ns(120), 9L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("stream_outer_join_watermark")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("purchase_id"), r.getAs[Long]("click_us"),
        r.getAs[Long]("purchase_us"))).toSeq
    assert(out === Seq(
      (1L, 1L, 101L, base * usMin, (base + 10L) * usMin),
      (2L, 2L, -1L, (base + 5L) * usMin, -1L)), s"rows: $out")
  }

  test("multimodal_phash_dedup: one-char edit scores Hamming 1; distinct payloads stay apart; clone augmentation fires") {
    val dir = TestSpark.tempDir("graft_r13_ph_")
    // d1/d2 differ by one appended '.' (bucket 46 parity flip -> Hamming
    // 1); d3 occupies a disjoint bucket range (Hamming 25/26 vs d1/d2);
    // d100 triggers the %100 clone augmentation -> planted pair at +1e7
    writeDocs(dir, Seq(
      (1L, "abcdefghijklm", "en", "s0"),
      (2L, "abcdefghijklm.", "en", "s0"),
      (3L, "nopqrstuvwxyz", "en", "s0"),
      (100L, "hello world", "en", "s0")))
    val out = SparkEntry.queries("multimodal_phash_dedup")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSeq
    assert(out === Seq((1L, 2L, 1L), (100L, 10000100L, 1L)), s"pairs: $out")
  }

  test("multimodal_phash_dedup: per-cell occupancy cap bounds identical-payload blowup at 64") {
    val dir = TestSpark.tempDir("graft_r13_phc_")
    writeDocs(dir, (1L to 70L).map(i => (i, "dup", "en", "s0")))
    val out = SparkEntry.queries("multimodal_phash_dedup")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(out.length === 64 * 63 / 2, s"expected C(64,2) capped pairs, got ${out.length}")
    assert(out.map(_._2).max === 64L, "docs beyond the cap must appear in no pair")
  }

  test("events_cohort_ltv_curve: first-touch cohorts, only purchases monetize, cum + per-user div") {
    val dir = TestSpark.tempDir("graft_r13_ltv_")
    val usWk = 604800000000L
    def ns(week: Long, i: Long): Long = (week * usWk + i * 60000000L) * 1000L
    // cohort w0 = {u1 (buys 10.00 in w0, 5.00 in w1), u2 (never buys)};
    // cohort w1 = {u3 (buys 2.50 in w2)}
    val rows = Seq(
      (1L, ns(0, 1), 1L, "view", 0.0), (2L, ns(0, 2), 1L, "purchase", 10.0),
      (3L, ns(1, 1), 1L, "purchase", 5.0),
      (4L, ns(0, 3), 2L, "view", 0.0),
      (5L, ns(1, 2), 3L, "click", 0.0), (6L, ns(2, 1), 3L, "purchase", 2.5))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_cohort_ltv_curve")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("cohort_size"), r.getAs[Long]("n_buyers"),
        r.getAs[Long]("wk_cents"), r.getAs[Long]("cum_cents"),
        r.getAs[Long]("ltv_cents_per_user"))).toSeq
    assert(out === Seq(
      (0L, 0L, 2L, 1L, 1000L, 1000L, 500L),
      (0L, 1L, 2L, 1L, 500L, 1500L, 750L),
      (1L, 1L, 1L, 1L, 250L, 250L, 250L)), s"curve: $out")
  }

  test("stream_restart_checkpoint: resumed state sums both phases; phase-A-only type survives the log") {
    val dir = TestSpark.tempDir("graft_r13_rc_")
    // even event_ids land in run 1, odd in run 2: 'view' spans both
    // (resumed state must add, not reset), 'click' is run-1-only (its
    // final row must survive from the earlier batch in the log),
    // 'purchase' is run-2-only (new key in resumed state)
    val rows = Seq(
      (2L, 1000L, 1L, "view", 1.0), (4L, 2000L, 1L, "view", 2.0),
      (3L, 3000L, 2L, "view", 3.0),
      (6L, 4000L, 3L, "click", 10.0), (8L, 5000L, 3L, "click", 20.0),
      (5L, 6000L, 4L, "purchase", 5.5))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("stream_restart_checkpoint")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toSeq
    assert(out === Seq(("click", 2L, 3000L), ("purchase", 1L, 550L),
      ("view", 3L, 600L)), s"rows: $out")
  }

  test("merge_view_refresh_incremental: snapshot + delta fold equals full recompute; snapshot reuse is stable") {
    def full() = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority", "yr")
      .collect().toSeq
    val expected = full()
    val r1 = q("merge_view_refresh_incremental").collect().toSeq
    val r2 = q("merge_view_refresh_incremental").collect().toSeq // landed-snapshot path
    assert(r1 === expected, "refresh must equal the full recompute")
    assert(r2 === expected, "second refresh (snapshot reused) must be identical")
  }

  test("profile_join_skew_report: hand-counted key frequencies, min-key tiebreak, integer ppm") {
    val dir = TestSpark.tempDir("graft_r13_sk_")
    Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(7L, 7L, 7L, 8L).toDF("o_custkey").write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("profile_join_skew_report")(spark, dir)
      .collect().map(r => (r.getAs[String]("tbl"), r.getAs[String]("col_name")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"), r.getAs[Long]("max_cnt"),
          r.getAs[Long]("heavy_key"), r.getAs[Long]("skew_ppm"))).toMap
    assert(out(("lineitem", "l_orderkey")) === ((3L, 2L, 2L, 1L, 2000000L)), s"$out")
    assert(out(("lineitem", "l_partkey"))  === ((3L, 3L, 1L, 1L, 1000000L)), s"$out")
    assert(out(("lineitem", "l_suppkey"))  === ((3L, 2L, 2L, 1L, 2000000L)), s"$out")
    assert(out(("orders", "o_custkey"))    === ((4L, 2L, 3L, 7L, 1500000L)), s"$out")
  }

  test("vec_ann_recall_curve: 3-row curve, recall bounded and hits monotone in k") {
    val rows = q("vec_ann_recall_curve")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm"))).toSeq
    assert(rows.map(_._1) === Seq(1L, 3L, 5L), s"curve: $rows")
    assert(rows.forall(_._2 == 10L), s"panel must be the 10 queries: $rows")
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000000L), s"recall out of [0,1]: $rows")
    assert(rows.forall(r => r._3 <= r._1 * r._2), s"hits exceed k*nq: $rows")
    val hits = rows.map(_._3)
    assert(hits == hits.sorted, s"hits must be monotone in k: $rows")
    // the fixture index is known-good (the r12 probe measured recall 1.0);
    // anything below 0.8 at k=5 means a kernel drifted
    assert(rows.last._4 >= 800000L, s"recall@5 collapsed: $rows")
  }
}
