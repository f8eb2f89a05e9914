package graft

import org.apache.spark.sql.functions._

/** Hand-computed unit evidence for the three round-11 ops
  * (text_bpe_pair_stats, docs_token_budget_fill, events_anomaly_mad) —
  * tiny purpose-built fixtures where every output cell is derivable by
  * hand, including the edge the op exists for (word boundaries, the
  * histogram pre-cut with quality ties, odd/even-count medians).
  */
class Round11cSpec extends GraftSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11c_doc_")
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_bpe_pair_stats: pairs never cross a word boundary; shares are exact ppm of the lang total") {
    // words: "ab" x2, "cd" x1 -> pairs ab:2, cd:1 (the space between
    // "b a" must NOT produce a pair); single-char word "x" contributes none
    val dir = writeDocs(Seq((1L, "ab ab x", "en"), (2L, "cd", "en")))
    val rows = SparkEntry.queries("text_bpe_pair_stats")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Int]("rk"),
        r.getAs[String]("pair"), r.getAs[Long]("n"), r.getAs[Long]("share_ppm")))
    assert(rows.toSeq === Seq(
      ("en", 1, "ab", 2L, 666666L),
      ("en", 2, "cd", 1L, 333333L)))
  }

  test("docs_token_budget_fill: greedy prefix stops at the budget; quality ties fill by doc_id") {
    // 6 docs, all the same quality (identical text), 9000 tokens each:
    // the 20k budget fits exactly two — the two smallest doc_ids.
    // One higher-quality doc (longer text, fewer penalties) goes first.
    val big = Seq.fill(9000)("w").mkString(" ")
    val bigger = Seq.fill(1500)("w").mkString(" ") // q = 15000*10, tokens 1500
    val dir = writeDocs(
      (1L to 6L).map(i => (i, big, "en")) :+ (7L, bigger, "en"))
    // quality(big) = 9000*10 = 90000 > quality(bigger) = 15000.
    // Order: docs 1..6 (q 90000, by id), then 7. cum: 9000, 18000, 27000…
    val rows = SparkEntry.queries("docs_token_budget_fill")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
    assert(rows.toSeq === Seq((1L, 9000L), (2L, 18000L)),
      "exactly the first two by (quality desc, doc_id) fit the 20k budget")
  }

  test("docs_token_budget_fill: the histogram pre-cut is invisible — a low-quality doc still enters when budget remains") {
    // 3 docs at distinct qualities, 8000 tokens each: cum 8000/16000/24000
    // -> the third (lowest-quality) doc is cut by budget, not by the
    // pre-filter; a tiny 4000-token doc of even lower quality would NOT
    // fit either (cum would be 20000 only if it replaced doc 3 — greedy
    // prefix semantics, not knapsack).
    // all three have 8000 tokens; stopword substitutions lower the quality
    // without changing the token mass: q = 80000, 79975, 79950
    def doc(nStop: Int) =
      (Seq.fill(8000 - nStop)("w") ++ Seq.fill(nStop)("the")).mkString(" ")
    val dir = writeDocs(Seq(
      (1L, doc(0), "en"), (2L, doc(5), "en"), (3L, doc(10), "en")))
    val rows = SparkEntry.queries("docs_token_budget_fill")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
    assert(rows.toSeq === Seq((1L, 8000L), (2L, 16000L)))
  }

  test("events_anomaly_mad: hand-computed odd- and even-count medians and the 3-MAD cut") {
    val dir = TestSpark.tempDir("graft_r11c_ev_")
    val rows =
      // view: values 1,2,3,4,100 -> med 3.00, MAD 1.00, one 3-MAD outlier
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 100.0))
        .map { case (id, v) => (id, id * 1000000L, 1L, "view", v) } ++
      // click: values 1,3 (even count) -> med2=400, dev 200/200, mad4=400
      Seq((11L, 1.0), (12L, 3.0))
        .map { case (id, v) => (id, id * 1000000L, 2L, "click", v) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_anomaly_mad")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("med2x_centi"),
          r.getAs[Long]("mad4x_centi"), r.getAs[Long]("n_anomalies")))).toMap
    // view: v=100,200,300,400,10000; med2=600; dev=400,200,0,200,19400;
    // sorted dev 0,200,200,400,19400 -> mad4=400; cut 2*dev>1200 -> 19400 only
    assert(got("view") === ((5L, 600L, 400L, 1L)))
    // click: dev both 200 -> 2*200=400 !> 3*400 -> no anomalies
    assert(got("click") === ((2L, 400L, 400L, 0L)))
  }
}
