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
