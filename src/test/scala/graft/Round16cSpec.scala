package graft

import org.apache.spark.sql.functions._

/** Round-16 batch C (VERDICT r15 #5): the two newest globalByDesign /
  * bounded-frame allowlist entries lean on DECLARED value-domain bounds —
  * segmentRanked's "≤5 segments × ~1.1M cents cells" and
  * q_order_value_deciles' "≤~550k dollar cells". These tests compute the
  * ACTUAL domain widths at sf0.1 and assert the documented bound formula,
  * so a fixture change that silently breaks the bound fails a test instead
  * of un-bounding a window (the declared-bound discipline,
  * q_order_backlog_daily precedent).
  */
class Round16cSpec extends GraftSuite {

  private val sf01 = "/root/testdata/sf0.1"

  test("segmentRanked bound at sf0.1: ≤5 segments, cents domain ≤ 1.1M cells each") {
    val seg = spark.read.parquet(s"$sf01/customer.parquet")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("vc"))
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("vc")).as("cells"),
        (max(col("vc")) - min(col("vc")) + 1).as("width"))
      .collect()
    assert(seg.length <= 5, s"segment domain grew: ${seg.length}")
    seg.foreach { r =>
      val width = r.getAs[Long]("width")
      val cells = r.getAs[Long]("cells")
      // the declared bound is the VALUE DOMAIN (acctbal spans < $11,000 at
      // 2 decimals → ≤ 1.1M cents cells at ANY SF), and actual distinct
      // cells can never exceed the domain width
      assert(width <= 1100000L,
        s"${r.getString(0)}: cents domain $width exceeds the declared 1.1M bound")
      assert(cells <= width, s"${r.getString(0)}: $cells cells > width $width")
    }
  }

  test("q_order_value_deciles bound at sf0.1: dollar histogram ≤ 550k cells") {
    val r = spark.read.parquet(s"$sf01/orders.parquet")
      .select(floor(col("o_totalprice")).cast("long").as("v"))
      .agg(countDistinct(col("v")).as("cells"),
        (max(col("v")) - min(col("v")) + 1).as("width"))
      .head()
    val width = r.getAs[Long]("width")
    val cells = r.getAs[Long]("cells")
    // first run of this test measured 498,993 — the r15 prose said "~450k",
    // an under-estimate; the declared bound is now ≤~550k (still a bounded
    // frame by any margin) and this assertion keeps it honest
    assert(width <= 550000L,
      s"order-value dollar domain $width exceeds the declared 550k bound")
    assert(cells <= width, s"$cells cells > width $width")
  }
}
