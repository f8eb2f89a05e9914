package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-7 evidence: hand-computed fixtures for the seasonal
  * index, the Flesch readability gate, and the SCD2 merge apply.
  */
class Round12eSpec extends GraftSuite {
  import spark.implicits._

  test("q_seasonal_index: Jan 300 vs Feb 100 gives indices 9.0 and 3.0") {
    val dir = TestSpark.tempDir("graft_r12e_si_")
    Seq((1L, "B1")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, "1996-01-10"), (2L, "1996-02-10"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 300.0, 0.0), (2L, 1L, 100.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_seasonal_index")(spark, dir)
      .collect().map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("mth"),
        r.getAs[Double]("revenue"), r.getAs[Long]("n_lines"),
        r.getAs[Double]("idx6"))).toSeq
    // 12 * 300/400 = 9, 12 * 100/400 = 3
    assert(rows === Seq(("B1", 1, 300.0, 1L, 9.0), ("B1", 2, 100.0, 1L, 3.0)),
      s"got $rows")
  }

  test("text_readability: punctuated and unpunctuated docs score the exact Flesch value") {
    val dir = TestSpark.tempDir("graft_r12e_rd_")
    Seq((1L, "the cat sat. it ran!"), (2L, "aa bb"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_readability")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_words"),
        r.getAs[Int]("n_sentences"), r.getAs[Int]("n_syllables"),
        r.getAs[Double]("flesch6"))).toSeq
    // doc 1: w=5 (ws tokens), s=2 ([.!?]+ runs), syl=5 vowel groups →
    //   206.835 − 1.015·2.5 − 84.6·1 = 119.6975
    // doc 2: w=2, s=max(0,1)=1, syl=1 ("aa" is ONE group) →
    //   206.835 − 2.03 − 42.3 = 162.505
    assert(rows === Seq((1L, 5, 2, 5, 119.6975), (2L, 2, 1, 1, 162.505)),
      s"got $rows")
  }

  test("merge_scd2_apply: changed balance closes + reopens, equal and orderless carry") {
    val dir = TestSpark.tempDir("graft_r12e_scd_")
    Seq((1L, "alice", 100.0), (2L, "bob", 50.0), (3L, "carol", 7.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c1: latest order (key 2, 1996-03-05) total 150 ≠ 100 → SCD2 split;
    // c2: latest total equals the balance → unchanged; c3: no orders.
    Seq((1L, 1L, 120.0, "1996-01-01"), (2L, 1L, 150.0, "1996-03-05"),
      (3L, 2L, 50.0, "1996-05-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("merge_scd2_apply")(spark, dir)
      .collect().map(r => (r.getAs[Long]("c_custkey"),
        r.getAs[Double]("bal"), r.getAs[java.sql.Date]("valid_from").toString,
        r.getAs[java.sql.Date]("valid_to").toString,
        r.getAs[Int]("is_current"))).toSeq
    assert(rows === Seq(
      (1L, 100.0, "1990-01-01", "1996-03-05", 0),
      (1L, 150.0, "1996-03-05", "2099-12-31", 1),
      (2L, 50.0, "1990-01-01", "2099-12-31", 1),
      (3L, 7.0, "1990-01-01", "2099-12-31", 1)), s"got $rows")
  }
}
