package graft

import org.apache.spark.sql.functions._

/** Round-14 batch A: argmax aggregates, bitwise aggregates, struct
  * ordering, printf formatting, running count-distinct, ALL-quantified
  * subquery. Each test pins the semantic corner the DuckDB twin can't
  * see failing on the NULL-free, tie-poor fixture.
  */
class Round14Spec extends GraftSuite {
  import spark.implicits._

  private def writeCustomers(rows: Seq[(Long, String, Int, Double, String)]): String = {
    val dir = TestSpark.tempDir("graft_r14_cust_")
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("agg_arg_extremes: balance ties break on the (cents, custkey) struct order") {
    // nation 7: custkeys 1,2,3 all at 500.00 — max_by must pick 3 (larger
    // struct), min_by must pick 1; nation 8 has a unique extreme pair.
    val dir = writeCustomers(Seq(
      (1L, "a", 7, 500.0, "BUILDING"), (2L, "b", 7, 500.0, "BUILDING"),
      (3L, "c", 7, 500.0, "BUILDING"),
      (10L, "d", 8, -10.0, "BUILDING"), (11L, "e", 8, 99.5, "BUILDING")))
    val out = SparkEntry.queries("agg_arg_extremes")(spark, dir)
      .collect().map(r => (r.getAs[Long]("nation"), r.getAs[Long]("rich_cust"),
        r.getAs[Long]("poor_cust"), r.getAs[Long]("rich_cents"),
        r.getAs[Long]("poor_cents"))).toSeq
    assert(out === Seq((7L, 3L, 1L, 50000L, 50000L),
                       (8L, 11L, 10L, 9950L, -1000L)))
  }

  test("agg_bit_ops: xor checksum cancels duplicated keys; and/or fold exactly") {
    // flag A: keys {6=110, 3=011} -> and=010=2, or=111=7, xor=101=5
    // flag B: key 9 twice -> xor cancels to 0, and=or=9
    val dir = TestSpark.tempDir("graft_r14_li_")
    Seq(("A", 6L), ("A", 3L), ("B", 9L), ("B", 9L))
      .toDF("l_returnflag", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("agg_bit_ops")(spark, dir)
      .collect().map(r => (r.getString(0), r.getAs[Long]("mask_and"),
        r.getAs[Long]("mask_or"), r.getAs[Long]("checksum_xor"))).toSeq
    assert(out === Seq(("A", 2L, 7L, 5L), ("B", 9L, 9L, 0L)))
  }

  test("fn_struct: struct min/max is lexicographic — size first, brand breaks ties") {
    val dir = TestSpark.tempDir("graft_r14_part_")
    Seq((1L, "n1", "Brand#9", "T", 5, 1.0), (2L, "n2", "Brand#1", "T", 5, 1.0),
        (3L, "n3", "Brand#5", "T", 2, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("fn_struct")(spark, dir).collect()(0)
    // min = (2, Brand#5); max = (5, Brand#9) — size dominates, then brand
    assert((r.getAs[Long]("min_size"), r.getAs[String]("min_brand")) === ((2L, "Brand#5")))
    assert((r.getAs[Long]("max_size"), r.getAs[String]("max_brand")) === ((5L, "Brand#9")))
  }

  test("fn_format: zero-pad width, pad-truncate, and repeat-count semantics") {
    val out = q("fn_format").limit(30).collect()
    out.foreach { r =>
      val k = r.getAs[Long]("s_suppkey")
      assert(r.getAs[String]("label").startsWith(f"SUP-$k%05d/SUPPLIER#"))
      assert(r.getAs[String]("padded").length === 8)
      assert(r.getAs[String]("ragged").length === 20, "rpad must pad AND truncate to width")
      assert(r.getAs[String]("bars") === "|" + ("*" * (k % 5).toInt) + "|")
    }
  }

  test("win_running_countd: repeat customers never re-count; curve is monotone") {
    val dir = TestSpark.tempDir("graft_r14_ord_")
    // priority P: cust 1 orders in Jan AND Mar (Mar must not re-count),
    // cust 2 first appears in Mar => curve 1 (Jan), 2 (Mar)
    Seq((1L, 1L, "P", "1995-01-05"), (2L, 1L, "P", "1995-03-10"),
        (3L, 2L, "P", "1995-03-20"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "d")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("win_running_countd")(spark, dir)
      .collect().map(r => (r.getAs[java.sql.Date]("month").toString,
        r.getAs[Long]("new_cust"), r.getAs[Long]("cum_cust"))).toSeq
    assert(out === Seq(("1995-01-01", 1L, 1L), ("1995-03-01", 1L, 2L)))
  }

  test("sql_all_subquery: strict inequality — tying the segment max is excluded") {
    // BUILDING max = 500.00; a MACHINERY customer AT 500.00 must not pass,
    // one cent above must.
    val dir = writeCustomers(Seq(
      (1L, "b1", 0, 500.0, "BUILDING"), (2L, "b2", 0, 100.0, "BUILDING"),
      (3L, "m_tie", 0, 500.0, "MACHINERY"), (4L, "m_win", 0, 500.01, "MACHINERY")))
    val out = SparkEntry.queries("sql_all_subquery")(spark, dir)
      .select("c_custkey").as[Long].collect().toSeq
    assert(out === Seq(4L))
  }
}
