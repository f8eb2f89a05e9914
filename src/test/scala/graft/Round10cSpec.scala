package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 3: burst detection, conversion lag, DAU/WAU, weighted
  * average, and percent-of-total — invariants plus direct recomputations.
  */
class Round10cSpec extends GraftSuite {
  import spark.implicits._

  private def events = Tables.load(spark, sfDir, "events")
  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("events_burst_detect: max burst via a direct per-user sliding scan") {
    val rows = q("events_burst_detect").collect()
    assert(rows.nonEmpty)
    val byUser = events
      .select($"user_id", Helpers.tsDivMicros($"ts").as("us"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val ts = byUser(r.getAs[Long]("user_id"))
      // O(n²) reference scan is fine at fixture scale
      val direct = ts.map(t => ts.count(u => u > t - 60000000L && u <= t)).max
      assert(r.getAs[Long]("max_burst_1m") == direct)
      assert(r.getAs[Long]("n_events") == ts.length)
      assert(r.getAs[Boolean]("is_bursty") == (direct >= 5))
    }
  }

  test("events_conversion_lag: lag arithmetic and flags are self-consistent") {
    val rows = q("events_conversion_lag").collect()
    assert(rows.nonEmpty)
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id").distinct().count()
    assert(rows.length == signups, "one row per signed-up user")
    rows.foreach { r =>
      if (r.isNullAt(r.fieldIndex("first_purchase_us"))) {
        assert(r.isNullAt(r.fieldIndex("lag_us")))
        assert(!r.getAs[Boolean]("converted_after"))
      } else {
        assert(r.getAs[Long]("lag_us") ==
          r.getAs[Long]("first_purchase_us") - r.getAs[Long]("signup_us"))
        assert(r.getAs[Boolean]("converted_after") == (r.getAs[Long]("lag_us") >= 0))
      }
    }
  }

  test("events_dau_wau: WAU bounds and exact 7-day membership") {
    val rows = q("events_dau_wau").collect()
    assert(rows.nonEmpty)
    val ud = events
      .select($"user_id", (Helpers.tsDivMicros($"ts") / lit(86400000000L)).cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val dau = ud.count(_._2 == d)
      val wau = ud.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length
      assert(r.getAs[Long]("dau") == dau)
      assert(r.getAs[Long]("wau") == wau)
      assert(wau >= dau)
    }
  }

  test("agg_weighted_avg: ratio equals weighted sum over quantity sum") {
    val rows = q("agg_weighted_avg").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = math.floor(
        r.getAs[Double]("weighted_sum") / r.getAs[Double]("qty_sum") * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("wavg_price") == expect)
      assert(r.getAs[Double]("wavg_price") > 0)
    }
    assert(rows.map(_.getAs[Long]("n_lines")).sum == lineitem.count())
  }

  test("q_nation_share_in_region: shares sum to ~1 per region") {
    val rows = q("q_nation_share_in_region").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Double]("region_share")).sum
      // each share is independently safe-rounded to 1e-6, so the region sum
      // can drift by at most ǀnationsǀ·5e-7
      assert(math.abs(total - 1.0) < 1e-4, s"region shares sum to $total")
      val revs = rs.map(_.getAs[Double]("revenue"))
      val shares = rs.map(_.getAs[Double]("region_share"))
      // monotone: bigger revenue never gets a smaller share within a region
      val z = revs.zip(shares).sortBy(_._1)
      assert(z.map(_._2).sameElements(z.map(_._2).sorted))
    }
  }
}
