package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 2: Q4/Q13/Q18/Q7 analogues, the two events-seasonality
  * ops, and the co-trade graph degree/PageRank ops — each checked against
  * a direct recomputation or a conservation invariant.
  */
class Round10bSpec extends GraftSuite {
  import spark.implicits._

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private def customer = spark.read.parquet(s"$sfDir/customer.parquet")
  private def events = Tables.load(spark, sfDir, "events")

  test("q_order_priority_late: counts sum to the directly-computed late-order set") {
    val rows = q("q_order_priority_late").collect()
    assert(rows.nonEmpty)
    val direct = orders
      .filter($"o_orderdate" >= "1996-07-01" && $"o_orderdate" < "1996-10-01")
      .join(lineitem,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .count()
    assert(rows.map(_.getAs[Long]("order_count")).sum == direct)
  }

  test("q_customer_distribution: histogram partitions customers and orders") {
    val rows = q("q_customer_distribution").collect()
    assert(rows.nonEmpty)
    // every customer lands in exactly one bucket
    assert(rows.map(_.getAs[Long]("custdist")).sum == customer.count())
    // weighted count reconciles to the orders actually attached to a customer
    val matchedOrders = orders.join(customer, $"o_custkey" === $"c_custkey", "left_semi").count()
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum == matchedOrders)
  }

  test("q_large_volume_customers: membership matches the direct >300 gate") {
    val rows = q("q_large_volume_customers").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Double]("total_qty") > 300.0))
    val directKeys = lineitem.groupBy($"l_orderkey")
      .agg(sum(Helpers.dec($"l_quantity")).as("q"))
      .filter($"q" > Helpers.dec(lit(300)))
      .select($"l_orderkey").as[Long].collect().toSet
    if (directKeys.size <= 100)
      assert(rows.map(_.getAs[Long]("o_orderkey")).toSet == directKeys)
  }

  test("q_nation_trade_flows: cross-nation only; revenue reconciles") {
    val rows = q("q_nation_trade_flows").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    val got = rows.map(_.getAs[Long]("line_cnt")).sum
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
    val direct = lineitem
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1998-01-01")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(supplier, $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .count()
    assert(got == direct)
  }

  test("events_hourly_profile: 24-hour buckets partition the event stream") {
    val rows = q("events_hourly_profile").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hour_of_day"); h >= 0 && h <= 23
    })
    assert(rows.map(_.getAs[Long]("n_events")).sum == events.count())
  }

  test("events_interarrival_hist: gap count equals events minus first-per-user") {
    val rows = q("events_interarrival_hist").collect()
    assert(rows.nonEmpty)
    val users = events.select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == events.count() - users)
    rows.foreach { r =>
      val d = r.getAs[Int]("gap_digits")
      assert(r.getAs[Long]("min_gap_us").toString.length == d)
      assert(r.getAs[Long]("max_gap_us").toString.length == d)
      assert(r.getAs[Long]("min_gap_us") <= r.getAs[Long]("max_gap_us"))
    }
  }

  private def directedEdges(): Array[(Long, Long)] = {
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
    val und = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(supplier, $"l_suppkey" === $"s_suppkey")
      .select(least($"c_nationkey", $"s_nationkey").cast("long").as("a"),
        greatest($"c_nationkey", $"s_nationkey").cast("long").as("b"))
      .filter($"a" < $"b").distinct()
      .as[(Long, Long)].collect()
    und ++ und.map { case (a, b) => (b, a) }
  }

  test("graph_degree_stats: degrees and neighbor sums match a direct recomputation") {
    val rows = q("graph_degree_stats").collect()
    assert(rows.nonEmpty)
    val edges = directedEdges()
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("node")
      assert(r.getAs[Long]("degree") == deg(n))
      val nbrSum = edges.filter(_._1 == n).map(e => deg(e._2)).sum
      assert(r.getAs[Long]("nbr_deg_sum") == nbrSum)
      assert(r.getAs[Double]("avg_nbr_deg") ==
        math.floor(nbrSum.toDouble / deg(n) * 1e4 + 0.5) / 1e4)
    }
  }

  test("graph_pagerank_iter: ranks match an exact integer-ppm replay") {
    val rows = q("graph_pagerank_iter").collect()
    assert(rows.nonEmpty)
    val edges = directedEdges()
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = deg.keys.map(n => n -> 1000000L).toMap
    for (_ <- 1 to 2) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map(e => rank(e._1) / deg(e._1)).sum).toMap
      rank = deg.keys.map(n => n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    assert(rows.length == rank.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_ppm") == rank(r.getAs[Long]("node")),
        s"node ${r.getAs[Long]("node")}")
    }
  }
}
