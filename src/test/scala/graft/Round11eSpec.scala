package graft

import org.apache.spark.sql.functions._

/** Hand-computed unit evidence for the round-11 batch-3 ops
  * (docs_cross_lang_dups, events_streaks, join_asof_nearest,
  * docs_signal_corr) — purpose-built fixtures hitting each op's defining
  * edge: the cross-vs-same-lang cells, the equal-length streak tie, the
  * equidistant-purchase tie and the no-purchase user, and an exactly
  * affine signal triple (corr must be 1.0 to the full r6 precision).
  */
class Round11eSpec extends GraftSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11e_doc_")
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** events fixture rows: (event_id, ts NANOS, user_id, event_type). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11e_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val us = 1000L // 1 micro in fixture nanos

  test("docs_cross_lang_dups: cross-lang pair flagged, same-lang pair not") {
    // d1(en)~d2(fr) share "alpha beta gamma" (jac 1/3); d3(en)~d4(en)
    // share "zeta eta theta"; no pair across the two groups.
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma epsilon", "fr"),
      (3L, "zeta eta theta iota", "en"),
      (4L, "zeta eta theta kappa", "en")))
    val rows = SparkEntry.queries("docs_cross_lang_dups")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b"),
        r.getAs[Long]("n_pairs"), r.getAs[Int]("is_cross")))
    assert(rows.toSeq === Seq(("en", "en", 1L, 0), ("en", "fr", 1L, 1)))
  }

  test("events_streaks: island arithmetic finds the max run; equal lengths tie to the earlier start") {
    val dir = writeEvents(Seq(
      // user 1: c c c p c c -> longest click-run 3, starting at 100us
      (1L, 100L * us, 1L, "click"), (2L, 200L * us, 1L, "click"),
      (3L, 300L * us, 1L, "click"), (4L, 400L * us, 1L, "purchase"),
      (5L, 500L * us, 1L, "click"), (6L, 600L * us, 1L, "click"),
      // user 2: a a b b -> two runs of 2; earlier start (view at 100us) wins
      (7L, 100L * us, 2L, "view"), (8L, 200L * us, 2L, "view"),
      (9L, 300L * us, 2L, "error"), (10L, 400L * us, 2L, "error")))
    val rows = SparkEntry.queries("events_streaks")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("streak_len"), r.getAs[Long]("start_us")))
    assert(rows.toSeq === Seq((1L, "click", 3L, 100L), (2L, "view", 2L, 100L)))
  }

  test("join_asof_nearest: picks the closer side, ties go backward, no-purchase user yields none") {
    val dir = writeEvents(Seq(
      // user 1: purchases at 90 and 105; click at 100 -> fwd (gap 5 < 10)
      (1L, 90L * us, 1L, "purchase"), (2L, 100L * us, 1L, "click"),
      (3L, 105L * us, 1L, "purchase"),
      // user 2: purchases at 90 and 110; click at 100 -> tie -> back
      (4L, 90L * us, 2L, "purchase"), (5L, 100L * us, 2L, "click"),
      (6L, 110L * us, 2L, "purchase"),
      // user 3: click with no purchase at all
      (7L, 100L * us, 3L, "click")))
    val rows = SparkEntry.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("nearest_purchase_ts")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong),
        r.getAs[String]("direction")))
    assert(rows.toSeq === Seq(
      (2L, Some(105L), Some(5L), "fwd"),
      (5L, Some(90L), Some(10L), "back"),
      (7L, None, None, "none")))
  }

  test("docs_signal_corr: exactly affine signals correlate to 1.0 at full precision") {
    // one-char words, all distinct: x = y = tokens, z = 2x - 1 chars —
    // every pairwise Pearson corr is exactly 1 (integer moment sums,
    // perfect-square discriminant, no float residue at r6).
    val dir = writeDocs(Seq(
      (1L, "a", "en"), (2L, "a b", "en"), (3L, "a b c", "en")))
    val rows = SparkEntry.queries("docs_signal_corr")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("corr_tok_distinct6") == 1.0)
    assert(r.getAs[Double]("corr_tok_chars6") == 1.0)
    assert(r.getAs[Double]("corr_distinct_chars6") == 1.0)
  }
}
