package graft

import org.apache.spark.sql.functions._

/** Round-13 widening batch 7: lakehouse history audit, growth accounting,
  * tokenizer fertility, and the IVF index-health report.
  */
class Round13cSpec extends GraftSuite {
  import spark.implicits._

  test("scan_describe_history: v1 row certifies the appended shifted commit against the v0 read") {
    val rows = q("scan_describe_history")
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_key"), r.getAs[Long]("n_regions"))).toSeq
    assert(rows.map(_._1) === Seq(0L, 1L), s"versions: $rows")
    val (v0, v1) = (rows(0), rows(1))
    // the fixture commit appends one shifted copy per source row
    // (keys +1000, regions +100 — disjoint domains)
    assert(v1._2 === 2 * v0._2, s"v1 rows: $rows")
    assert(v1._3 === 2 * v0._3 + 1000 * v0._2, s"v1 key sum: $rows")
    assert(v1._4 === 2 * v0._4, s"v1 regions: $rows")
    // and v0 equals the source table itself (time-travel isolation)
    val src = Tables.load(spark, sfDir, "nation")
      .agg(count(lit(1)), sum("n_nationkey")).head()
    assert(v0._2 === src.getLong(0) && v0._3 === src.getLong(1), s"v0 vs source: $rows")
  }

  test("docs_token_fertility: hand-counted per-lang token sums; token-free lang yields NULL ratio, not inf") {
    val dir = TestSpark.tempDir("graft_r13_tf_")
    // en: "ab cd" (5 chars, 2 ws, bpe [ab,cd]=2) + "x1" (2 chars, 1 ws,
    // bpe [x,1]=2); zz: "??? !!!" (7 chars, 2 ws, bpe 0 — the ratio guard)
    Seq((1L, "ab cd", "en", "s0"), (2L, "x1", "en", "s0"),
        (3L, "??? !!!", "zz", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_token_fertility")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
          r.getAs[Long]("sum_ws_tokens"), r.getAs[Long]("sum_bpe_tokens")),
         (Option(r.getAs[java.lang.Double]("chars_per_bpe4")),
          Option(r.getAs[java.lang.Double]("chars_per_ws4"))))).toMap
    assert(out("en")._1 === ((2L, 7L, 3L, 4L)), s"en sums: $out")
    assert(out("en")._2 === ((Some(1.75), Some(2.3333))), s"en ratios: $out")
    assert(out("zz")._1 === ((1L, 7L, 2L, 0L)), s"zz sums: $out")
    assert(out("zz")._2 === ((None, Some(3.5))), s"zz ratios: $out")
  }

  test("events_user_lifecycle: hand-built ledger — new/retained/resurrected classes, silent-day churn, capped tail") {
    val dir = TestSpark.tempDir("graft_r13_lc_")
    val nsPerDay = 86400000000000L
    // u1 active days {0, 1, 3}; u2 active day {1} twice (distinct collapses).
    // Expected: d0 (1 active, 1 new) · d1 (2 active: u1 retained, u2 new)
    // · d2 (silent: zeros except 2 churned — u1 gap, u2 exit) · d3
    // (1 active: u1 resurrected; u1's post-d3 churn is beyond max_d, capped)
    val rows = Seq(
      (1L, 0L * nsPerDay + 1000L, 1L, "view", 1.0),
      (2L, 1L * nsPerDay + 1000L, 1L, "view", 1.0),
      (3L, 3L * nsPerDay + 1000L, 1L, "view", 1.0),
      (4L, 1L * nsPerDay + 1000L, 2L, "click", 2.0),
      (5L, 1L * nsPerDay + 2000L, 2L, "view", 2.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_user_lifecycle")(spark, dir)
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))).toSeq
    assert(out === Seq(
      (0L, 1L, 1L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 0L),
      (2L, 0L, 0L, 0L, 0L, 2L),
      (3L, 1L, 0L, 0L, 1L, 0L)), s"ledger: $out")
    // identity: every active user is exactly one of new/retained/resurrected
    out.foreach { r => assert(r._2 === r._3 + r._4 + r._5, s"identity: $r") }
  }

  test("limit_topk_with_ties: every max-achieving row survives (the row_number-drop bug)") {
    val dir = TestSpark.tempDir("graft_r13_ties_")
    // group (R,F) has a TIE at qty 50: both rows must come back — a
    // row_number()-based top-1 would arbitrarily drop one of them
    Seq((1L, 1, 50.0, "R", "F"), (2L, 1, 50.0, "R", "F"), (3L, 1, 49.0, "R", "F"),
        (4L, 1, 10.0, "N", "O"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("limit_topk_with_ties")(spark, dir)
      .collect().map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[String]("l_linestatus"), r.getAs[Long]("qty"),
        r.getAs[Long]("l_orderkey"))).toSeq
    assert(out === Seq(("N", "O", 10L, 4L), ("R", "F", 50L, 1L),
      ("R", "F", 50L, 2L)), s"rows: $out")
  }

  test("docs_mixture_epoch_plan: sqrt-temperature shares; tail source upsampled past 1 epoch") {
    val dir = TestSpark.tempDir("graft_r13_mix_")
    // A: 4 tokens, B: 1 token → w = 2000/1000 milli-sqrt; shares 2/3, 1/3;
    // epochs = share·total/tokens = (2/3)·5/4 = 0.833333 and (1/3)·5/1 =
    // 1.666667 — the tail repeats, the head is subsampled
    Seq((1L, "a b c d", "en", "A"), (2L, "x", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_mixture_epoch_plan")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("share_ppm"), r.getAs[Double]("epochs6")))).toMap
    assert(out("A") === ((1L, 4L, 666666L, 0.833333)), s"A: $out")
    assert(out("B") === ((1L, 1L, 333333L, 1.666667)), s"B: $out")
  }

  test("q_order_backlog_daily: open/close flows and the running balance over a zero-filled grid") {
    val dir = TestSpark.tempDir("graft_r13_bk_")
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 00:00:00")
    // order 1 opens d0, last line ships d2; order 2 opens d1, ships d1.
    // backlog: d0 → 1, d1 → 1 (one opened, one closed), d2 → 0
    Seq((1L, ts("1995-01-01")), (2L, ts("1995-01-02")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1, ts("1995-01-01")), (1L, 2, ts("1995-01-03")),
        (2L, 1, ts("1995-01-02")))
      .toDF("l_orderkey", "l_linenumber", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_order_backlog_daily")(spark, dir)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_opened"), r.getAs[Long]("n_closed"),
        r.getAs[Long]("backlog"))).toSeq
    assert(out === Seq(("1995-01-01", 1L, 0L, 1L),
      ("1995-01-02", 1L, 1L, 1L), ("1995-01-03", 0L, 1L, 0L)), s"ledger: $out")
  }

  test("fn_try_arith: the poisoned row nulls all three TRY paths except the key-0 no-overflow boundary") {
    val dir = TestSpark.tempDir("graft_r13_try_")
    // key 0 is poisoned (0 % 100000 == 0): zero denominator and OOB index
    // null out, but MaxValue + 0 does NOT overflow — the boundary row;
    // key 100000 is poisoned AND overflows; key 7 is clean
    Seq((0L, 1, 25.0, 100.0, "R"), (100000L, 1, 5.0, 20.0, "A"),
        (7L, 1, 10.0, 50.0, "N"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("fn_try_arith")(spark, dir)
      .collect().map(r => r.getAs[Long]("l_orderkey") ->
        ((Option(r.getAs[java.lang.Double]("cents_per_qty")),
          Option(r.getAs[java.lang.Long]("add_overflow")),
          r.getAs[Long]("mul_ok"),
          Option(r.getAs[String]("elem_probe"))))).toMap
    assert(out(0L) === ((None, Some(Long.MaxValue), 0L, None)), s"key0: $out")
    assert(out(100000L) === ((None, None, 200000L, None)), s"key100k: $out")
    assert(out(7L) === ((Some(500.0), Some(7L), 14L, Some("N"))), s"key7: $out")
  }

  test("text_winnowing_fingerprints: the w+k-1 shared-run guarantee fires; unique and tiny docs stay clean") {
    val dir = TestSpark.tempDir("graft_r13_win_")
    // docs 1 and 2 share the 8-token run "c d e f g h i j" (≥ w+k−1 = 6
    // tokens) behind different prefixes — winnowing MUST select at least
    // one shared fingerprint in both; doc 3 is all-unique; doc 4 is too
    // short to shingle at all
    Seq((1L, "p q c d e f g h i j", "en", "s0"),
        (2L, "x y z c d e f g h i j", "en", "s0"),
        (3L, "uu vv ww xx yy zz aa bb", "en", "s0"),
        (4L, "t1 t2", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_winnowing_fingerprints")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_fps"),
          r.getAs[Long]("n_shared"),
          Option(r.getAs[java.lang.Long]("shared_ppm"))))).toMap
    assert(out(1L)._1 === 8L && out(2L)._1 === 9L, s"shingle counts: $out")
    assert(out(1L)._3 >= 1L, s"doc1 must share a fingerprint: $out")
    assert(out(2L)._3 >= 1L, s"doc2 must share a fingerprint: $out")
    assert(out(3L)._3 === 0L && out(3L)._4 === Some(0L), s"unique doc clean: $out")
    assert(out(4L) === ((0L, 0L, 0L, None)), s"tiny doc: $out")
    // fingerprints can never exceed window starts (n_shingles - w + 1)
    out.values.foreach(v => assert(v._2 <= math.max(0L, v._1 - 3L), s"fp bound: $out"))
  }

  test("docs_curation_funnel: each stage drops exactly the planted casualties; ppm vs raw") {
    val dir = TestSpark.tempDir("graft_r13_fn_")
    // d4 dies at the quality gate (2 tokens); d2/d3 scrub to the same
    // content (digits → <num>) so dedup keeps only d2; d1 sails through
    Seq((1L, "alpha beta gamma delta epsilon", "en", "s0"),
        (2L, "alpha beta gamma delta 123", "en", "s0"),
        (3L, "alpha beta gamma delta 456", "en", "s0"),
        (4L, "x y", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_curation_funnel")(spark, dir)
      .collect().map(r => (r.getAs[Long]("stage"), r.getAs[String]("stage_name"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("kept_ppm"))).toSeq
    assert(out === Seq((0L, "raw", 4L, 1000000L), (1L, "quality", 3L, 750000L),
      (2L, "dedup", 2L, 500000L)), s"funnel: $out")
  }

  test("events_slo_burn_rate: hand-built burn ledger — page only on the double-window trip; silent hour reads NULL") {
    val dir = TestSpark.tempDir("graft_r13_slo_")
    val nsPerHour = 3600000000000L
    // hour 0: 10 events, 2 errors (burn1 20.0x → trips both windows);
    // hour 1: silent (zero-filled, burn NULL, no page);
    // hour 2: 5 events, 0 errors (burn1 0; 6h window sees 2/15)
    val rows = (0 until 8).map(i => (i.toLong, 0L * nsPerHour + i * 1000L, 1L,
        if (i < 2) "error" else "view", 1.0)) ++
      (10 until 15).map(i => (i.toLong, 2L * nsPerHour + i * 1000L, 1L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_slo_burn_rate")(spark, dir)
      .collect().map(r => (r.getAs[Long]("hour_us") / 3600000000L,
        r.getAs[Long]("n_events"), r.getAs[Long]("n_errors"),
        Option(r.getAs[java.lang.Long]("burn1_x1000")),
        Option(r.getAs[java.lang.Long]("burn6_x1000")),
        r.getAs[Int]("page_alert"))).toSeq
    assert(out === Seq(
      (0L, 8L, 2L, Some(25000L), Some(25000L), 1),
      (1L, 0L, 0L, None, Some(25000L), 0),
      (2L, 5L, 0L, Some(0L), Some(15384L), 0)), s"ledger: $out")
  }

  test("vec_ivf_probe_cost: 30-row table, own cells at radius 0, cumulative in radius, probe bounds") {
    val rows = q("vec_ivf_probe_cost")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("radius"),
        r.getAs[Long]("cells_hit"), r.getAs[Long]("n_candidates"))).toSeq
    assert(rows.length === 30, s"10 queries x 3 radii: ${rows.length}")
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val byR = rs.sortBy(_._2)
      assert(byR.map(_._2) === Seq(0L, 1L, 2L), s"radii for $qid: $byR")
      // the query's own cell exists in each of the 4 tables
      assert(byR.head._3 === 4L, s"radius-0 cells_hit must be 4: $byR")
      // counts are cumulative in radius and bounded by probed cells
      assert(byR.map(_._3) == byR.map(_._3).sorted, s"cells not monotone: $byR")
      assert(byR.map(_._4) == byR.map(_._4).sorted, s"cands not monotone: $byR")
      assert(byR(1)._3 <= 4L * 7 && byR(2)._3 <= 4L * 22, s"cell bound: $byR")
    }
  }

  test("q_segment_migration: hand-built transitions incl. churn-to-none; rows sum to the customer count") {
    val dir = TestSpark.tempDir("graft_r13_mig_")
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 00:00:00")
    // cust 1: 1995 $1.5M (high ≥ 1e8 cents), 1996 $600k (mid);
    // cust 2: 1995 $100k (low), 1996 inactive (none)
    Seq((1L, 1L, 1500000.0, ts("1995-03-01")),
        (2L, 1L, 600000.0, ts("1996-03-01")),
        (3L, 2L, 100000.0, ts("1995-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_segment_migration")(spark, dir)
      .collect().map(r => (r.getAs[Long]("year_from"),
        r.getAs[String]("from_tier"), r.getAs[String]("to_tier"),
        r.getAs[Long]("n_customers"))).toSeq
    assert(out === Seq((1995L, "high", "mid", 1L), (1995L, "low", "none", 1L)),
      s"matrix: $out")
    assert(out.map(_._4).sum === 2L, "rows must sum to the customer count")
  }

  test("docs_tokenize_offsets: offsets reconstruct every token by substring") {
    val dir = TestSpark.tempDir("graft_r13_off_")
    Seq((1L, "ab c dd", "en", "s0"), (2L, "xyz", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_tokenize_offsets")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("idx"),
        r.getAs[String]("token"), r.getAs[Long]("start_off"),
        r.getAs[Long]("end_off"))).toSeq
    assert(out === Seq((1L, 0, "ab", 0L, 2L), (1L, 1, "c", 3L, 4L),
      (1L, 2, "dd", 5L, 7L), (2L, 0, "xyz", 0L, 3L)), s"offsets: $out")
    // the alignment contract on the real fixture: substring(start, len) == token
    val probe = q("docs_tokenize_offsets").limit(500)
      .join(Tables.load(spark, sfDir, "documents").select("doc_id", "text"), "doc_id")
      .filter(expr("substring(text, cast(start_off + 1 as int), cast(end_off - start_off as int)) <> token"))
      .count()
    assert(probe === 0L, "every fixture offset must reconstruct its token")
  }

  test("events_bot_screen: burst bot, night bot, min-support guard, clean human") {
    val dir = TestSpark.tempDir("graft_r13_bot_")
    val nsPerHour = 3600000000000L
    // u1: 60 events one day (burst bot); u2: 12 events all at 02:00 (night
    // bot); u3: 5 daytime events (human); u4: 2 night events (min-support
    // guard — NOT a bot despite 100% night share)
    val rows =
      (0 until 60).map(i => (100L + i, 12L * nsPerHour + i * 1000L, 1L, "view", 1.0)) ++
      (0 until 12).map(i => (200L + i, 2L * nsPerHour + i * 1000L + 86400000000000L * i, 2L, "view", 1.0)) ++
      (0 until 5).map(i => (300L + i, 15L * nsPerHour + 86400000000000L * i, 3L, "view", 1.0)) ++
      (0 until 2).map(i => (400L + i, 3L * nsPerHour + 86400000000000L * i, 4L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_bot_screen")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("max_per_day"),
          r.getAs[Long]("night_ppm"), r.getAs[Int]("is_bot")))).toMap
    assert(out(1L) === ((60L, 60L, 0L, 1)), s"burst bot: $out")
    assert(out(2L) === ((12L, 1L, 1000000L, 1)), s"night bot: $out")
    assert(out(3L) === ((5L, 1L, 0L, 0)), s"human: $out")
    assert(out(4L) === ((2L, 1L, 1000000L, 0)), s"guarded: $out")
  }

  test("agg_percentile_interp: hand-computed cont interpolation incl. the exact-rank frac-0 case") {
    val dir = TestSpark.tempDir("graft_r13_pct_")
    // priority A: [10,20,30,40,50] → p50 pos 3 exact = 30 (frac 0),
    // p90 pos 4.6 = 46, p99 pos 4.96 = 49.6
    (1 to 5).map(i => (i.toLong, "A", i * 10.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("agg_percentile_interp")(spark, dir)
      .collect().map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("n_rows"), r.getAs[Double]("p50c"),
        r.getAs[Double]("p90c"), r.getAs[Double]("p99c"))).toSeq
    assert(out === Seq(("A", 5L, 30.0, 46.0, 49.6)), s"interp: $out")
  }

  test("q_nation_trade_balance: canonical orientation, net identity, composition ties to the flows kernel") {
    val bal = q("q_nation_trade_balance").collect()
    assert(bal.nonEmpty, "balance matrix must be non-empty")
    bal.foreach { r =>
      assert(r.getAs[String]("nation_a") < r.getAs[String]("nation_b"),
        s"canonical a<b violated: $r")
      assert(math.abs(r.getAs[Double]("net_ab") -
        (r.getAs[Double]("rev_ab") - r.getAs[Double]("rev_ba"))) == 0.0,
        s"net identity violated: $r")
    }
    // composition: total lines across the matrix == total flow lines
    val flowLines = q("q_nation_trade_flows")
      .agg(sum("line_cnt")).head().getLong(0)
    assert(bal.map(_.getAs[Long]("total_lines")).sum === flowLines,
      "balance matrix must conserve the flows' line count")
  }

  test("docs_license_filter: sparse augmentation + a real in-text notice both fire") {
    val dir = TestSpark.tempDir("graft_r13_lic_")
    // ids 0..17: augmentation adds copyright at %13==0 (0,13) and license
    // at %17==0 (0,17); id 1 carries a REAL in-text notice
    val rows = (0L to 17L).map { i =>
      val text = if (i == 1L) "this work all rights reserved today"
                 else s"w$i soup words"
      (i, text, "en", "s0")
    }
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_license_filter")(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 18L, s"row: $r")
    assert(r.getAs[Long]("docs_copyright") === 3L, s"copyright (0,13 aug + 1 real): $r")
    assert(r.getAs[Long]("docs_license") === 2L, s"license (0,17): $r")
    assert(r.getAs[Long]("docs_flagged") === 4L, s"flagged (0,1,13,17): $r")
    assert(r.getAs[Long]("flagged_ppm") === 4L * 1000000L / 18L, s"ppm: $r")
  }

  test("set_symmetric_diff: single-sided keys with provenance") {
    val dir = TestSpark.tempDir("graft_r13_sym_")
    Seq((1L, "AUTOMOBILE"), (2L, "AUTOMOBILE"), (3L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 2L, 500000.0), (11L, 3L, 450000.0), (12L, 3L, 600000.0),
        (13L, 4L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("set_symmetric_diff")(spark, dir)
      .collect().map(r => (r.getAs[Long]("custkey"), r.getAs[String]("side"))).toSeq
    // a = {1,2}; b = {2,3} → 1 only in a, 3 only in b (2 in both, 4 in neither)
    assert(out === Seq((1L, "a_only"), (3L, "b_only")), s"diff: $out")
  }

  test("events_feature_rollup_pit: post-cutoff events leak nothing; recency and last-type from the pre-cutoff slice") {
    val dir = TestSpark.tempDir("graft_r13_pit_")
    // span 0..10s → cutoff at 8s; u1's click at 10s is AFTER the cutoff
    // and must not appear in any feature
    val rows = Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 5000000000L, 1L, "purchase", 2.0),
      (3L, 10000000000L, 1L, "click", 3.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_feature_rollup_pit")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_purchases"), r.getAs[Long]("last_ts_us"),
        r.getAs[Long]("days_since_last"), r.getAs[String]("last_type"))).toSeq
    assert(out === Seq((1L, 2L, 1L, 5000000L, 0L, "purchase")), s"features: $out")
  }

  test("q_top_growth_parts: positive, NEGATIVE (sign-safe div), and no-base-year rows order correctly") {
    val dir = TestSpark.tempDir("graft_r13_gr_")
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 00:00:00")
    Seq((1L, "BrandA"), (2L, "BrandB"), (3L, "BrandC"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, ts("1996-05-01"), 100.0, 0.0), (1L, ts("1997-05-01"), 150.0, 0.0),
        (2L, ts("1996-05-01"), 200.0, 0.0), (2L, ts("1997-05-01"), 100.0, 0.0),
        (3L, ts("1997-05-01"), 50.0, 0.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_top_growth_parts")(spark, dir)
      .collect().map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("rev96"),
        r.getAs[Long]("rev97"),
        Option(r.getAs[java.lang.Long]("growth_ppm")))).toSeq
    assert(out === Seq(
      ("BrandA", 10000L, 15000L, Some(500000L)),
      ("BrandB", 20000L, 10000L, Some(-500000L)),
      ("BrandC", 0L, 5000L, None)), s"growth: $out")
  }

  test("vec_ivf_cell_stats: per-table row, vector conservation, cell bound, skew floor") {
    val rows = q("vec_ivf_cell_stats")
      .collect().map(r => (r.getAs[Long]("tbl"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_cells"), r.getAs[Long]("max_occ"),
        r.getAs[Long]("singleton_cells"), r.getAs[Long]("heavy_cell"),
        r.getAs[Long]("occ_skew_ppm"))).toSeq
    assert(rows.map(_._1) === Seq(0L, 1L, 2L, 3L), s"tables: $rows")
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    rows.foreach { r =>
      assert(r._2 === nVecs, s"every vector lands in exactly one cell per table: $r")
      assert(r._3 >= 1 && r._3 <= 64, s"cells bounded by 2^planes: $r")
      assert(r._4 >= (nVecs + r._3 - 1) / r._3, s"max >= ceil(mean): $r")
      assert(r._5 <= r._3, s"singletons <= cells: $r")
      assert(r._6 >= 0 && r._6 < 64, s"heavy cell id in range: $r")
      assert(r._7 >= 1000000L, s"skew ppm >= 1e6 (max >= floor-mean): $r")
    }
  }
}
