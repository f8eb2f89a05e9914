package graft

import org.apache.spark.sql.functions._

/** Round-14 batch H: Wilson-bound supplier risk, revenue volatility,
  * kNN label prediction, dup×quality contingency, VARIANT surface.
  */
class Round14hSpec extends GraftSuite {
  import spark.implicits._

  test("q_supplier_late_wilson: thin evidence ranks below strong evidence") {
    val dir = TestSpark.tempDir("graft_r14h_wil_")
    // supplier 1: 1/1 late (rate 100%); supplier 2: 90/100 late.
    // Wilson lower bound must rank supplier 2 FIRST.
    val orders = (1L to 101L).map(k => (k, s"1995-01-01"))
    orders.toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val li = Seq((1L, 1L, "1995-06-01")) ++            // s1: 1/1 late
      (2L to 91L).map(k => (k, 2L, "1995-06-01")) ++   // s2: 90 late
      (92L to 101L).map(k => (k, 2L, "1995-01-15"))    // s2: 10 on-time
    li.toDF("l_orderkey", "l_suppkey", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_supplier_late_wilson")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("suppkey")).toSeq === Seq(2L, 1L))
    assert(out.map(r => (r.getAs[Long]("n"), r.getAs[Long]("k"),
      r.getAs[Long]("late_ppm"))).toSeq
      === Seq((100L, 90L, 900000L), (1L, 1L, 1000000L)))
    val lb = out.map(_.getAs[Double]("wilson_lb6"))
    assert(lb(0) > lb(1) && lb(1) > 0.0 && lb(0) < 0.9)
  }

  test("q_nation_revenue_volatility: constant months => 0; 5-vs-15 => .707107") {
    val dir = TestSpark.tempDir("graft_r14h_cv_")
    Seq((1L, 1L, "1995-01-15", 5000.0), (2L, 1L, "1995-02-15", 5000.0),
      (3L, 2L, "1995-01-15", 5000.0), (4L, 2L, "1995-02-15", 15000.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 0), (2L, 1)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0, "STEADY"), (1, "SPIKY")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = SparkEntry.queries("q_nation_revenue_volatility")(spark, dir)
      .collect().map(r => r.getAs[String]("n_name") ->
        ((r.getAs[Long]("n_months"), r.getAs[Double]("cv6")))).toMap
    assert(out("STEADY") === ((2L, 0.0)))
    // m = 5, 15: sd_samp = sqrt((2*250-400)/2) = sqrt(50); cv = sqrt(50)/10
    assert(out("SPIKY")._1 === 2L)
    assert(math.abs(out("SPIKY")._2 - 0.707107) < 1e-6)
  }

  test("vec_knn_label_predict: majority cluster wins, minority bleeds") {
    val dir = TestSpark.tempDir("graft_r14h_knn_")
    // 4 vectors at (1,0) label 0; 2 at (0,1) label 7. 5-NN of a label-0
    // query = 3 same + 2 other => correct; of a label-7 query = 1 same +
    // 4 other => wrong. Dots tie inside/outside clusters; vid breaks.
    val rows = (0 until 4).map(i =>
      (i.toLong, Array(1.0f, 0.0f), 0)) ++
      (4 until 6).map(i => (i.toLong, Array(0.0f, 1.0f), 7))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("vec_knn_label_predict")(spark, dir)
      .collect().map(r => r.getAs[Long]("true_label") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("acc_ppm")))).toMap
    assert(out(0L) === ((4L, 4L, 1000000L)))
    assert(out(7L) === ((2L, 0L, 0L)))
  }

  test("docs_dup_quality_contingency: planted 2x2 cells and odds ratio") {
    val dir = TestSpark.tempDir("graft_r14h_ct_")
    val longA = "x" * 100; val shortB = "y" * 20
    val rows = Seq(
      (1L, longA, "en", "s"), (2L, longA + " tail", "en", "s"), // dup, hi
      (3L, shortB, "en", "s"), (4L, shortB, "en", "s"),         // dup, lo
      (5L, "z" * 100, "en", "s"),                               // uni, hi
      (6L, "w" * 20, "en", "s"))                                // uni, lo
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("docs_dup_quality_contingency")(spark, dir)
      .collect()(0)
    // lens 100,105,20,20,100,20 -> total 365, nd 6: above = 6*len >= 365
    assert((r.getAs[Long]("a_dup_hi"), r.getAs[Long]("b_dup_lo"),
      r.getAs[Long]("c_uni_hi"), r.getAs[Long]("d_uni_lo"),
      r.getAs[Long]("odds_milli")) === ((2L, 2L, 1L, 1L, 1000L)))
  }

  test("fn_variant: typed extraction agrees with the JSON-string path") {
    val v = q("fn_variant").select("event_id", "k_int", "miss",
      "is_null_variant")
    val j = q("fn_json").select(col("event_id"), col("k_get"))
    val joined = v.join(j, "event_id")
    assert(joined.filter(col("k_int") =!= col("k_get")).count() === 0L)
    assert(joined.filter(col("miss").isNotNull).count() === 0L)
    assert(joined.filter(col("is_null_variant") =!= 0).count() === 0L)
    assert(joined.count() > 0)
  }
}
