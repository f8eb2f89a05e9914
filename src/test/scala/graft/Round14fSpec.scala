package graft

import org.apache.spark.sql.functions._

/** Round-14 batch F: Kaplan-Meier survival, change-point detection, χ²
  * uniformity screen, weighted label propagation, token Gini, two-level
  * residual quantization. Fixtures plant the exact boundary each op's
  * math must honor.
  */
class Round14fSpec extends GraftSuite {
  import spark.implicits._

  private val nsPerDay = 86400000000000L
  private val nsPerMin = 60000000000L

  /** events rows: (event_id, ts NANOS, user_id, event_type, value). */
  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = TestSpark.tempDir("graft_r14f_ev_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r14f_docs_")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("events_survival_km: censoring leaves the risk set without dying") {
    // maxd = 9, censor threshold d1 >= 7. Lifetimes:
    //   u1,u2: 2 (deaths)   u3: 4 (death)   u5: 0 (death, d1=1)
    //   u4: 9 censored      u6: 0 censored (d1=9)
    // risk sets (suffix sums): t=0 -> 6, t=2 -> 4, t=4 -> 2
    // KM: 5/6 = .833333, *2/4 = .416667, *1/2 = .208333
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, 2 * nsPerDay, 1L, "view", 1.0),
      (3L, 0L, 2L, "view", 1.0), (4L, 2 * nsPerDay, 2L, "view", 1.0),
      (5L, 0L, 3L, "view", 1.0), (6L, 4 * nsPerDay, 3L, "view", 1.0),
      (7L, 0L, 4L, "view", 1.0), (8L, 9 * nsPerDay, 4L, "view", 1.0),
      (9L, 1 * nsPerDay, 5L, "view", 1.0),
      (10L, 9 * nsPerDay, 6L, "view", 1.0)))
    val out = SparkEntry.queries("events_survival_km")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("lifetime_days")).toSeq === Seq(0L, 2L, 4L))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq === Seq(6L, 4L, 2L))
    assert(out.map(_.getAs[Long]("n_deaths")).toSeq === Seq(1L, 2L, 1L))
    val s = out.map(_.getAs[Double]("survival6"))
    assert(math.abs(s(0) - 5.0 / 6) < 2e-6 && math.abs(s(1) - 5.0 / 12) < 2e-6
      && math.abs(s(2) - 5.0 / 24) < 2e-6)
  }

  test("events_survival_km: risk set exhausted => survival exactly 0") {
    // one user, one lifetime, uncensored: n = d = 1 at t=0 -> S(0) = 0
    val dir = writeEvents(Seq((1L, 0L, 1L, "view", 1.0),
      (2L, 1 * nsPerDay, 1L, "view", 1.0),
      // a second user pushes maxd out so u1 is NOT censored
      (3L, 8 * nsPerDay, 2L, "view", 1.0),
      (4L, 9 * nsPerDay, 2L, "view", 1.0)))
    // u1: lt=1 death; u2: lt=1 censored (d1=9). At t=1: n_risk=2, d=1
    // -> S=1/2. No exhaustion here; now drop censoring by ending early:
    val out = SparkEntry.queries("events_survival_km")(spark, dir).collect()
    assert(out.length === 1 && out(0).getAs[Long]("n_risk") === 2L)
    assert(math.abs(out(0).getAs[Double]("survival6") - 0.5) < 2e-6)
    // exhaustion: both users die at their lifetime, nobody censored
    val dir2 = writeEvents(Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, 1 * nsPerDay, 1L, "view", 1.0),
      (3L, 0L, 2L, "view", 1.0), (4L, 5 * nsPerDay, 2L, "view", 1.0),
      (5L, 9 * nsPerDay, 3L, "view", 1.0))) // u3 censored at lt=0
    // lifetimes: u1=1 death, u2=5 death, u3=0 censored
    // t=1: n=2,d=1 -> 1/2; t=5: n=1,d=1 -> exhausted -> 0.0
    val o2 = SparkEntry.queries("events_survival_km")(spark, dir2).collect()
    assert(o2.map(_.getAs[Double]("survival6")).toSeq === Seq(0.5, 0.0))
  }

  test("events_changepoint: finds the planted mean shift, min segment 3") {
    // days 0..5 counts 1,1,1,5,5,5 -> only candidate split i=3 (day 2)
    val rows = (0 to 2).map(d => Seq((d.toLong, d.toLong * nsPerDay))) ++
      (3 to 5).map(d => (1 to 5).map(i =>
        (d.toLong * 10 + i, d.toLong * nsPerDay + i * nsPerMin)))
    val dir = writeEvents(rows.flatten.zipWithIndex.map { case ((_, ts), i) =>
      (i.toLong, ts, 1L, "view", 1.0) })
    val r = SparkEntry.queries("events_changepoint")(spark, dir).collect()(0)
    assert((r.getAs[Long]("split_day"), r.getAs[Long]("n_left"),
      r.getAs[Long]("n_right")) === ((2L, 3L, 3L)))
    assert((r.getAs[Long]("mean_left_ppm"), r.getAs[Long]("mean_right_ppm"),
      r.getAs[Long]("contrast_ppm")) === ((1000000L, 5000000L, 4000000L)))
  }

  test("events_uniformity_chi2: flat minutes => 0; one hot minute => (B-1)·n") {
    // "flat": one event in each of the 60 minutes -> chi2 = 0, uniform
    // "bot": 60 events all in minute 0 -> chi2 = 60*3600/60 - 60 = 3540
    val flat = (0 until 60).map(m =>
      (m.toLong, m.toLong * nsPerMin, 1L, "flat", 1.0))
    val bot = (0 until 60).map(i =>
      (100L + i, i.toLong, 2L, "bot", 1.0))
    val out = SparkEntry.queries("events_uniformity_chi2")(
      spark, writeEvents(flat ++ bot)).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_minutes_hit"), r.getAs[Long]("chi2_milli"),
          r.getAs[Int]("is_uniform_95")))).toMap
    assert(out("flat") === ((60L, 0L, 1)))
    assert(out("bot") === ((1L, 3540000L, 0)))
  }

  test("lpaRounds kernel: weak bridge cannot merge two tight triangles") {
    // triangles {1,2,3} and {4,5,6} (w=10 inside), bridge 3-4 (w=1)
    val und = Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L), (3L, 4L, 1L))
      .toDF("a", "b", "w")
    val arcs = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val labels = operators.Profiling.lpaRounds(arcs, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(labels) === Seq(1L, 1L, 1L))
    assert(Seq(4L, 5L, 6L).map(labels) === Seq(4L, 4L, 4L))
  }

  test("docs_token_gini: uniform lang => 0; planted 1-vs-9 => 400 milli") {
    val dir = writeDocs(Seq(
      (1L, "t t t", "uni", "s0"), (2L, "t t t", "uni", "s0"),
      (3L, "a", "skew", "s0"),
      (4L, "a b c d e f g h i", "skew", "s0")))
    val out = SparkEntry.queries("docs_token_gini")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("gini_milli")).toMap
    assert(out("uni") === 0L)
    // sorted [1,9]: (2*(1*1+2*9) - 3*10)*1000 // (2*10) = 8000//20 = 400
    assert(out("skew") === 400L)
  }

  test("vec_residual_quantize: level 2 never hurts; cells partition corpus") {
    val n = q("vec_pq_codes").count()
    val out = q("vec_residual_quantize").collect()
    assert(out.length <= 16 && out.map(_.getAs[Long]("n_vecs")).sum === n)
    out.foreach { r =>
      val (m1, m2) = (r.getAs[Long]("mean_err1_k"), r.getAs[Long]("mean_err2_k"))
      assert(m2 <= m1, s"code1=${r.getAs[Int]("code1")}: err2 > err1")
      val imp = r.getAs[Long]("improvement_ppm")
      assert(imp >= 0L && imp <= 1000000L)
    }
  }
}
