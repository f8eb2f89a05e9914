package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-5 evidence: hand-computed fixtures for the label
  * affinity matrix (orthogonal vs identical centroids), the market-basket
  * support/lift table, and the per-user entropy screen.
  */
class Round12cSpec extends GraftSuite {
  import spark.implicits._

  test("vec_label_affinity: orthogonal centroids score 0, identical score 1") {
    val dir = TestSpark.tempDir("graft_r12c_emb_")
    // label 0 and 2 both sit on e1; label 1 sits on e2 → cos(0,1)=0,
    // cos(0,2)=1, cos(1,2)=0. Two vectors in label 0 (the centroid SUM
    // path must not care about counts).
    Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // columns come out (lb, la, ...) after the two joins — read by name
    val byPair = SparkEntry.queries("vec_label_affinity")(spark, dir)
      .collect().map(r => ((r.getAs[Int]("la"), r.getAs[Int]("lb")),
        r.getAs[Double]("cos6"))).toMap
    assert(byPair === Map((0, 1) -> 0.0, (0, 2) -> 1.0, (1, 2) -> 0.0),
      s"got $byPair")
  }

  test("q_cross_sell_basket: support cut at 3; lift exact on a hand-built basket set") {
    val dir = TestSpark.tempDir("graft_r12c_li_")
    // orders 1..3 hold {p1,p2}; order 4 holds {p1,p3}: pair (1,2) has
    // support 3 (kept), (1,3) support 1 (cut). lift(1,2) = 3·4/(4·3) = 1.
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_cross_sell_basket")(spark, dir)
      .collect().map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
        r.getAs[Double]("lift6")))
    assert(rows.toSeq === Seq((1L, 2L, 3L, 4L, 3L, 1.0)), s"got ${rows.toSeq}")
  }

  test("events_user_entropy: single-type user scores 0; an even 2-type mix scores ln 2") {
    val dir = TestSpark.tempDir("graft_r12c_ev_")
    Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "view"), (3L, 3000L, 1L, "view"),
      (4L, 1000L, 2L, "view"), (5L, 2000L, 2L, "click"),
      (6L, 3000L, 2L, "view"), (7L, 4000L, 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("events_user_entropy")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_events"),
        r.getAs[Double]("entropy6"))).toSeq
    // user 2: counts (2,2), N=4 → H = ln4 − ln2 = ln2; quantization is
    // exact here (lnq(4) = 2·lnq(2) + 0 at these integers → 0.693147)
    assert(rows === Seq((1L, 3L, 0.0), (2L, 4L, 0.693147)), s"got $rows")
  }
}
