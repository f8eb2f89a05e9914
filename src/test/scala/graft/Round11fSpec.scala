package graft

import org.apache.spark.sql.functions._

/** Hand-computed unit evidence for the round-11 batch-4 ops
  * (vec_pca_deflate, events_cusum_drift). The PCA fixture is two exact
  * axis directions where every intermediate (dots, residuals, both
  * normalized directions) is derivable by hand and the deflated direction
  * is EXACTLY orthogonal to the first; the CUSUM fixtures pin the median
  * baseline, the peak position, and the earliest-ts tie rule.
  */
class Round11fSpec extends GraftSuite {
  import spark.implicits._

  /** events fixture rows: (event_id, ts NANOS, user_id, event_type, value). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestSpark.tempDir("graft_r11f_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val us = 1000L

  test("vec_pca_deflate: two axis directions -> v=[1000,500,...], u2=[-500,1000,...], exactly orthogonal") {
    // 10 copies of e1, 5 copies of e2. From the all-ones start:
    //   w1 = [10e15, 5e15, 0...]  -> v = [1000, 500, 0...]
    //   residuals: e1-rows r=[2.5e11, -5e11], e2-rows r=[-5e11, 1e12]
    //   w2 = [-1.875e24, 3.75e24, 0...] -> u2 = [-500, 1000, 0...]
    //   v . u2 = -500000 + 500000 = 0 (exact).
    val dim = 64
    val e1 = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(dim)(i => if (i == 1) 1.0f else 0.0f)
    val rows = (0 until 10).map(i => (i.toLong, e1.toSeq, 0)) ++
      (10 until 15).map(i => (i.toLong, e2.toSeq, 1))
    val dir = TestSpark.tempDir("graft_r11f_emb_")
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("vec_pca_deflate")(spark, dir)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Long]("v_comp"),
        r.getAs[Long]("u2_comp"))).sortBy(_._1)
    assert(out(0) == ((0, 1000L, -500L)))
    assert(out(1) == ((1, 500L, 1000L)))
    assert(out.drop(2).forall { case (_, v, u) => v == 0L && u == 0L })
    assert(out.map { case (_, v, u) => v * u }.sum == 0L)
  }

  test("vec_pca_deflate on the fixture: directions near-orthogonal after rounding") {
    val out = q("vec_pca_deflate").collect()
      .map(r => (r.getAs[Long]("v_comp"), r.getAs[Long]("u2_comp")))
    assert(out.length == 64)
    val dot = out.map { case (v, u) => (v * u).toDouble }.sum
    val nv = math.sqrt(out.map { case (v, _) => (v * v).toDouble }.sum)
    val nu = math.sqrt(out.map { case (_, u) => (u * u).toDouble }.sum)
    // exact-integer residuals are orthogonal identically; the +-0.5
    // per-component normalization rounding is the only residue
    assert(math.abs(dot) / (nv * nu) < 0.05,
      s"cos(v,u2) = ${dot / (nv * nu)}")
    // both directions carry signal: max-abs component is the 1000 anchor
    assert(out.map(_._1.abs).max == 1000L && out.map(_._2.abs).max == 1000L)
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11f_doc_")
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_js_divergence: identical mixes diverge exactly 0, disjoint vocabularies ln 2") {
    // en and fr share the identical text -> every word has p = q, the
    // integer lnq difference is identically 0. de and zh are disjoint ->
    // every term contributes lnq(2A) - lnq(A) ~ ln 2 micro-nats.
    val dir = writeDocs(Seq(
      (1L, "alpha beta beta gamma", "en"),
      (2L, "alpha beta beta gamma", "fr"),
      (3L, "delta delta epsilon", "de"),
      (4L, "zeta eta eta theta", "zh")))
    val rows = SparkEntry.queries("text_js_divergence")(spark, dir)
      .collect().map(r => ((r.getAs[String]("lang_a"), r.getAs[String]("lang_b")),
        (r.getAs[Long]("s_a"), r.getAs[Long]("s_b"), r.getAs[Double]("js6"))))
      .toMap
    assert(rows.size == 6) // 4 langs -> C(4,2) pairs
    val (sa, sb, js) = rows(("en", "fr"))
    assert(sa == 0L && sb == 0L && js == 0.0)
    val (_, _, jsDisjoint) = rows(("de", "zh"))
    assert(math.abs(jsDisjoint - math.log(2.0)) < 1e-5,
      s"disjoint JS $jsDisjoint != ln2")
    // JS is bounded by ln 2 everywhere
    rows.values.foreach { case (_, _, j) =>
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-5) }
  }

  test("fn_url: hosts partition the corpus by source; parse agrees with construction") {
    val rows = q("fn_url").collect()
    assert(rows.length == 20) // src0..src19 -> 20 hosts
    assert(rows.forall(_.getAs[String]("host").endsWith(".example.com")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L) // sf0.001 corpus
    assert(rows.forall { r =>
      val l = r.getAs[Long]("n_langs"); l >= 1 && l <= 5 })
    assert(rows.forall(_.getAs[String]("first_path").startsWith("/")))
  }

  test("events_cusum_drift: median baseline, peak position, and the earliest-ts tie rule") {
    val dir = writeEvents(Seq(
      // click: values 10,10,30 -> med2=2000 centi; devs 0,0,+4000;
      // cum peaks (4000) at the LAST event
      (1L, 100L * us, 1L, "click", 10.0),
      (2L, 200L * us, 1L, "click", 10.0),
      (3L, 300L * us, 1L, "click", 30.0),
      // view: values 10,20,20,20 -> med2=4000; devs -2000,0,0,0;
      // cum is -2000 EVERYWHERE -> tie resolves to the earliest ts
      (4L, 100L * us, 1L, "view", 10.0),
      (5L, 200L * us, 1L, "view", 20.0),
      (6L, 300L * us, 1L, "view", 20.0),
      (7L, 400L * us, 1L, "view", 20.0)))
    val rows = SparkEntry.queries("events_cusum_drift")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("med2x_centi"), r.getAs[Long]("max_abs_cusum"),
        r.getAs[Long]("peak_us")))
    assert(rows.toSeq === Seq(
      ("click", 3L, 2000L, 4000L, 300L),
      ("view", 4L, 4000L, 2000L, 100L)))
  }
}
