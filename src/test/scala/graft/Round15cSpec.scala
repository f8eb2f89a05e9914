package graft

import org.apache.spark.sql.functions._

/** Round-15 batch C: estimator calibration, band occupancy, token-length
  * profile, dow×hod heatmap, seasonal decomposition. */
class Round15cSpec extends GraftSuite {
  import spark.implicits._

  test("dedup_minhash_estimate_error: replica pair lands in k=8 with zero error; counts cover all pairs") {
    val dir = TestSpark.tempDir("graft_r15_est_")
    (0L until 12L).map(i =>
        (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_minhash_estimate_error")(spark, dir)
      .collect().map(r => r.getAs[Int]("k_rows") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_exact_ppm"),
          r.getAs[Long]("mean_abs_err_ppm"))).toMap
    // doc 7 carries doc 6's text (plantedDocs): identical signature AND
    // identical shingles → k=8 with exact J = 1e6 ppm, abs err 0
    assert(rows(8) === ((1L, 1000000L, 0L)))
    // all C(12,2)=66 pairs accounted for across the k buckets
    assert(rows.values.map(_._1).sum === 66L)
    // unrelated planted docs share no shingles: k=0 bucket has exact 0
    assert(rows(0)._2 === 0L)
  }

  test("dedup_band_occupancy: bucket counts reconcile with the corpus key count") {
    val dir = TestSpark.tempDir("graft_r15_occ_")
    (0L until 10L).map(i =>
        (i, s"a$i b$i c$i d$i e$i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_band_occupancy")(spark, dir)
      .collect().map(r => (r.getAs[Long]("occ"), r.getAs[Long]("n_buckets")))
    // Σ occ·n_buckets = total keys = 2 bands × 10 docs (doc 7 duplicates
    // doc 6's signature → its 2 keys collapse into occupancy-2 buckets)
    assert(out.map { case (o, n) => o * n }.sum === 20L)
    assert(out.toMap.getOrElse(2L, 0L) >= 2L,
      "the planted replica must produce occupancy-2 buckets")
  }

  test("text_token_length_profile: exact percentiles and rates on a planted histogram") {
    val dir = TestSpark.tempDir("graft_r15_tlp_")
    // lang x: tokens of lengths 1,2,3,4 (p50 = 2: cum 2/4 ≥ 50%;
    // p90 = 4), one 16-char token in lang y → long_ppm = 500000
    Seq(("x", "a bb ccc dddd"), ("y", "aaaaaaaaaaaaaaaa b"))
      .toDF("lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_token_length_profile")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("mean_len_ppm"), r.getAs[Long]("long_ppm"))).toMap
    assert(out("x") === ((4L, 2L, 4L, 2500000L, 0L)))
    assert(out("y") === ((2L, 1L, 16L, 8500000L, 500000L)))
  }

  test("events_dow_hod_heatmap: dow anchored to a known Monday (2024-01-01 -> 0)") {
    // The op's contract is dow = (epoch_day + 3) % 7 with 0 = Monday
    // (epoch day 0 = Thursday → 3); pinned concretely:
    // 2024-01-01 (epoch day 19723) was a MONDAY → dow must be 0.
    val dir = TestSpark.tempDir("graft_r15_dow_")
    val mondayUs = 19723L * 86400000000L + 5L * 3600000000L // 05:00 Monday
    Seq((1L, mondayUs * 1000L, 10L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("events_dow_hod_heatmap")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("dow") === 0L, "2024-01-01 is a Monday → dow 0")
    assert(r.getAs[Long]("hod") === 5L)
    assert(r.getAs[Long]("n_events") === 1L)
    assert(r.getAs[Long]("n_users") === 1L)
  }

  test("q_order_value_deciles: exact nearest-rank boundaries on a planted 10-value table") {
    val dir = TestSpark.tempDir("graft_r15_dec_")
    // orders valued 100.5, 200.5, ..., 1000.5 → dollar values 100..1000;
    // n=10: decile d boundary = smallest v with cum ≥ d (cum·10 ≥ 10·d)
    (1L to 10L).map(i => (i, i * 100 + 0.5))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_order_value_deciles")(spark, dir)
      .collect().map(r => (r.getAs[Int]("decile"),
        r.getAs[Long]("boundary_dollar"), r.getAs[Long]("n_orders")))
    assert(out === (1 to 9).map(d => (d, d * 100L, 10L)))
  }

  test("vec_ivf_balance_gini: all cells from the served index; gini in [0, 1000)") {
    val out = SparkEntry.queries("vec_ivf_balance_gini")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Long]("gini_milli")
      assert(g >= 0L && g < 1000L, s"gini_milli out of range: $g")
      assert(r.getAs[Long]("n_vecs") > 0L)
    }
    // hand-check the identity on one table's occupancy multiset
    val occ = out.map(r => (r.getAs[Long]("n_cells"), r.getAs[Long]("n_vecs"),
      r.getAs[Long]("gini_milli"))).head
    assert(occ._1 <= 64L, "cells bounded by 2^planes")
  }

  test("docs_epoch_shuffle_plan: deterministic across runs, epochs ordered differently") {
    val a = SparkEntry.queries("docs_epoch_shuffle_plan")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("docs_epoch_shuffle_plan")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(a === b, "the shuffle plan must replay identically")
    val byEpoch = SparkEntry.queries("docs_epoch_shuffle_plan")(spark, sfDir)
      .collect().groupBy(_.getAs[Int]("epoch"))
      .map { case (e, rows) =>
        e -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("doc_id")).toSeq }
    assert(byEpoch.size === 3)
    // different epochs shuffle into different head orders (the whole point)
    assert(byEpoch(0) != byEpoch(1) || byEpoch(1) != byEpoch(2),
      s"epochs must differ: $byEpoch")
  }

  test("vec_dedup_exact: planted re-delivered vector is the sole dup group") {
    val dir = TestSpark.tempDir("graft_r15_vde_")
    // 10 distinct unit-ish vectors; vec 7 will carry vec 6's embedding
    (0L until 10L).map(i => (i, Array.tabulate(4)(d => (i * 10 + d) / 100.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("vec_dedup_exact")(spark, dir).collect().head
    assert(r.getAs[Long]("n_vectors") === 10L)
    assert(r.getAs[Long]("n_distinct") === 9L)
    assert(r.getAs[Long]("n_dup_groups") === 1L)
    assert(r.getAs[Long]("max_group") === 2L)
    assert(r.getAs[Long]("n_redundant") === 1L)
  }

  test("profile_referential_integrity: planted orphans and childless rows counted exactly") {
    val dir = TestSpark.tempDir("graft_r15_ri_")
    import spark.implicits._
    // orders 1..4 (custkeys 10,10,20,99); order 4 has no lines; line for
    // order 77 is orphan; customers 10,20,30 (30 orderless; 99 missing)
    Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 99L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(1L, 1L, 2L, 3L, 77L).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(10L, 20L, 30L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("profile_referential_integrity")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_orders") === 4L)
    assert(r.getAs[Long]("n_line_orders") === 4L) // 1,2,3,77 distinct
    assert(r.getAs[Long]("n_childless_orders") === 1L) // order 4
    assert(r.getAs[Long]("n_orphan_line_orders") === 1L) // 77
    assert(r.getAs[Long]("n_cust_no_orders") === 1L) // cust 30
    assert(r.getAs[Long]("n_missing_custkeys") === 1L) // 99
  }

  test("docs_dedup_rate_by_source: rates reconcile with the corpus dup census") {
    val out = SparkEntry.queries("docs_dedup_rate_by_source")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, d, ppm) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"),
        r.getAs[Long]("dup_ppm"))
      assert(d <= n && ppm === d * 1000000L / n)
    }
  }

  test("docs_token_gini histogram rank-sum ≡ naive per-lang ranked window (sf0.001)") {
    import org.apache.spark.sql.expressions.Window
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .withColumn("i", row_number().over(
        Window.partitionBy("lang").orderBy(col("tok"), col("doc_id")))
        .cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"),
        sum(col("i") * col("tok")).as("siw"))
      .withColumn("gini_milli", call_function("div",
        (lit(2L) * col("siw") - (col("n_docs") + 1L) * col("sum_tokens"))
          * lit(1000L),
        col("n_docs") * col("sum_tokens")))
      .select("lang", "n_docs", "sum_tokens", "gini_milli")
      .orderBy("lang")
    assert(SparkEntry.queries("docs_token_gini")(spark, sfDir)
      .collect().map(_.toString).toSeq === naive.collect().map(_.toString).toSeq)
  }

  test("q_returns_impact: planted returns yield exact cents and ppm") {
    val dir = TestSpark.tempDir("graft_r15_ret_")
    Seq((1L, 100L), (2L, 200L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // cust 100 (nation 1): 100.00 gross of which 25.00 returned;
    // cust 200 (nation 2): 50.00 gross, nothing returned
    Seq((1L, "R", 25.0, 0.0), (1L, "N", 75.0, 0.0), (2L, "N", 50.0, 0.0))
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((100L, 1), (200L, 2)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "ALPHA"), (2, "BETA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = SparkEntry.queries("q_returns_impact")(spark, dir)
      .collect().map(r => (r.getAs[String]("n_name"),
        r.getAs[Long]("gross_cents"), r.getAs[Long]("returned_cents"),
        r.getAs[Long]("ret_ppm")))
    assert(out === Seq(("ALPHA", 10000L, 2500L, 250000L),
      ("BETA", 5000L, 0L, 0L)))
  }

  test("docs_dup_threshold_curve: planted replica pair survives every tau") {
    // bandDir from Round15bSpec's shape: rebuild locally — 20 distinct
    // texts, doc 7 planted as doc 6's replica → the (6,7) pair has J=1
    // and is the ONLY pair at every threshold
    val dir = TestSpark.tempDir("graft_r15_tc_")
    (0L until 20L).map(i =>
        (i, s"p$i q$i r$i s$i t$i u$i v$i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_dup_threshold_curve")(spark, dir)
      .collect().map(r => (r.getAs[Int]("tau"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs")))
    assert(out === (30 to 90 by 10).map(t => (t, 1L, 2L)))
  }

  test("scan_ignore_corrupt_files: resilient read equals the direct source aggregate") {
    val resilient = SparkEntry.queries("scan_ignore_corrupt_files")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val direct = spark.read.parquet(s"$sfDir/supplier.parquet")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("cnt"), Helpers.decSumOut(col("s_acctbal")).as("sum_bal"))
      .orderBy("s_nationkey")
      .collect().map(_.toString).toSeq
    assert(resilient === direct)
  }

  test("text_ngram_coverage_target: boundary-level arithmetic exact on a planted histogram") {
    val dir = TestSpark.tempDir("graft_r15_cov_")
    // lang z: 'a'×19 + 'b'×1 → total 20, target ceil(19) = 19 →
    // k95 = 1 of vocab 2 (ppm 500000); lang y: 4 words ×1 → target 4,
    // boundary level c=1 covers all → k95 = 4 of 4
    Seq(("z", ("a " * 19) + "b"), ("y", "w x y z"))
      .toDF("lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_ngram_coverage_target")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("vocab"), r.getAs[Long]("total_occ"),
          r.getAs[Long]("k95"), r.getAs[Long]("k95_ppm"))).toMap
    assert(out("z") === ((2L, 20L, 1L, 500000L)))
    assert(out("y") === ((4L, 4L, 4L, 1000000L)))
  }

  test("events_seasonal_decompose: planted weekly pattern recovered exactly") {
    val dir = TestSpark.tempDir("graft_r15_seas_")
    // 28 days, baseline 1 event/day, dow 0 (Mondays) get 8 events —
    // the spike must surface as a positive Monday factor. Build events:
    // one event per (day, i) pair.
    val rows = for {
      day <- 0L until 28L
      dow = (19723L + day + 3L) % 7L
      i <- 0L until (if (dow == 0L) 8L else 1L)
    } yield (day * 100 + i, ((19723L + day) * 86400000000L + i) * 1000L,
      i, "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_seasonal_decompose")(spark, dir)
      .collect().map(r => r.getAs[Long]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("sum_resid7"),
          r.getAs[Long]("seasonal7_milli"))).toMap
    // every full 7-day window contains exactly one Monday: trend7 = 14
    // (6·1 + 8); Monday resid7 = 8·7−14 = 42, others 1·7−14 = −7
    assert(out(0L)._3 === 42000L, s"Monday factor: ${out(0L)}")
    assert(out(1L)._3 === -7000L, s"weekday factor: ${out(1L)}")
    assert(out.values.forall(v => v._3 == 42000L || v._3 == -7000L))
  }
}
