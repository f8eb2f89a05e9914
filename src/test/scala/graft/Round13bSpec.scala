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
}
