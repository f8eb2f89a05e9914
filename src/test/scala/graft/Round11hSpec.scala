package graft

import org.apache.spark.sql.functions._

/** Hand-computed unit evidence for the round-11 batch-6 ops
  * (vec_rank_fusion, vec_centroid_drift, events_ab_test): exact RRF
  * scores on a rank-aligned fixture, a zero-drift and an
  * opposite-direction label, and a Welch z replayed from the closed
  * form.
  */
class Round11hSpec extends GraftSuite {
  import spark.implicits._

  private def writeEmb(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = TestSpark.tempDir("graft_r11h_emb_")
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("vec_rank_fusion: aligned rankings fuse to exact integer RRF scores") {
    // vecs 1..10 duplicate query 0; 11..25 are the opposite direction.
    // For vid k in 1..10: rf = rh = k, rrf = 2*(1000000 div (60+k)).
    val dim = 64
    val pos = Array.fill(dim)(0.125f).toSeq
    val neg = pos.map(x => -x)
    val dir = writeEmb((0 to 10).map(i => (i.toLong, pos, 0)) ++
      (11 to 25).map(i => (i.toLong, neg, 1)))
    val rows = SparkEntry.queries("vec_rank_fusion")(spark, dir)
      .filter(col("qid") === 0).collect()
      .map(r => (r.getAs[Int]("rn"), r.getAs[Long]("vid"), r.getAs[Long]("rf"),
        r.getAs[Long]("rh"), r.getAs[Long]("rrf")))
    assert(rows.toSeq === (1 to 5).map(k =>
      (k, k.toLong, k.toLong, k.toLong, 2L * (1000000L / (60L + k)))))
  }

  test("vec_centroid_drift: identical halves drift 0; opposite unit vectors drift 2") {
    val dim = 64
    val v = Array.fill(dim)(0.125f).toSeq
    val nv = v.map(x => -x)
    val dir = writeEmb(
      (0 to 3).map(i => (i.toLong, v, 0)) ++          // label 0: same both halves
      Seq((10L, v, 1), (12L, v, 1), (11L, nv, 1), (13L, nv, 1))) // label 1: +/-
    val rows = SparkEntry.queries("vec_centroid_drift")(spark, dir)
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("n1"),
        r.getAs[Long]("n2"), r.getAs[Double]("drift6"))).sortBy(_._1)
    assert(rows(0) == ((0, 2L, 2L, 0.0)))
    // ||c1 - c2|| = ||2v|| = 2 * ||v|| = 2 (unit vectors)
    assert(rows(1)._1 == 1 && math.abs(rows(1)._4 - 2.0) < 1e-5)
  }

  test("scan_schema_merge: union schema null-fills the old snapshot exactly") {
    val rows = q("scan_schema_merge").collect()
      .map(r => (r.getAs[Long]("region"), r.getAs[Long]("n_rows"))).toMap
    // snap1 (no n_regionkey) contributes all 25 nations to the -1 bucket;
    // snap2 contributes 5 nations per region
    assert(rows(-1L) == 25L)
    (0L to 4L).foreach(k => assert(rows(k) == 5L, s"region $k"))
    assert(rows.values.sum == 50L)
  }

  test("events_ab_test: Welch z matches the closed-form replay") {
    val us = 1000L
    val dir = TestSpark.tempDir("graft_r11h_ev_")
    Seq(
      (1L, 100L * us, 0L, "click", 10.0), (2L, 200L * us, 0L, "click", 12.0),
      (3L, 300L * us, 1L, "click", 20.0), (4L, 400L * us, 1L, "click", 24.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("events_ab_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_diff4") == -11.0)
    // v1 = 2e4, v2 = 8e4 (centi^2); z = -1100 / sqrt(1e4 + 4e4)
    val z = -1100.0 / math.sqrt(50000.0)
    assert(r.getAs[Double]("z6") == math.floor(z * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Int]("significant") == 1)
  }
}
