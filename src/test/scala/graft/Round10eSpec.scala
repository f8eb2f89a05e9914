package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 5: the remaining TPC-H query shapes (Q5/Q6/Q8/Q9/Q12/
  * Q17/Q19/Q21 adaptations) and the two new vector ops (per-dimension
  * calibration stats, mutual-kNN graph).
  */
class Round10eSpec extends GraftSuite {
  import spark.implicits._

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("q_forecast_revenue: matches a direct decimal replay of the Q6 filter") {
    val r = q("q_forecast_revenue").head
    val direct = lineitem
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01"
        && $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice" * $"l_discount").cast("decimal(38,6)")).cast("double"),
        count(lit(1))).head
    assert(r.getAs[Long]("line_cnt") == direct.getLong(1))
    assert(r.getAs[Long]("line_cnt") > 0, "Q6 envelope selects no rows — filter is vacuous")
    assert(r.getAs[Double]("revenue") == direct.getDouble(0))
  }

  test("q_market_share: share bounded, numerator <= denominator, years complete") {
    val rows = q("q_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("nation_rev") <= r.getAs[Double]("total_rev") + 1e-9)
    }
    // at least one year actually has NATION_3-supplied revenue
    assert(rows.exists(_.getAs[Double]("nation_rev") > 0.0),
      "market-share numerator is all-zero — supplier nation filter is vacuous")
  }

  test("q_waiting_suppliers: numwait equals a direct sole-blocker replay") {
    val per = lineitem.join(orders.filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAY"), 1)
        .otherwise(0)).as("late"))
    val soleBlockers = per.groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum($"late").as("nl"))
      .filter($"ns" > 1 && $"nl" === 1)
      .join(per.filter($"late" === 1), "l_orderkey")
      .count()
    val rows = q("q_waiting_suppliers").collect()
    assert(rows.map(_.getAs[Long]("numwait")).sum == soleBlockers)
    assert(rows.nonEmpty, "no waiting suppliers found — late threshold is vacuous")
    // ordered by numwait desc
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
  }

  test("q_priority_class_late + q_special_promo_revenue + q_small_qty_revenue: counters reconcile") {
    val pcl = q("q_priority_class_late").collect()
    assert(pcl.nonEmpty)
    val lateLines = lineitem
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAY")).count()
    assert(pcl.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
      == lateLines)

    val promo = q("q_special_promo_revenue").head
    assert(promo.getAs[Long]("line_cnt") > 0, "Q19 OR-envelope selects no rows")
    assert(promo.getAs[Double]("revenue") > 0.0)

    val small = q("q_small_qty_revenue").head
    assert(small.getAs[Long]("line_cnt") > 0, "Q17 micro-quantity gate selects no rows")
  }

  test("vec_dim_stats: 64 dims, every vector counted, dim-1 sum matches direct replay") {
    val rows = q("vec_dim_stats").collect()
    val nVec = embeddings.count()
    assert(rows.length == 64)
    assert(rows.forall(_.getAs[Long]("n") == nVec))
    rows.foreach { r =>
      assert(r.getAs[Long]("min_q") <= r.getAs[Long]("max_q"))
      val mean = r.getAs[Long]("sum_q").toDouble / nVec / 1e6
      assert(math.abs(r.getAs[Double]("mean6") - mean) < 1e-6)
    }
    val dim1Direct = embeddings.select($"embedding".getItem(0).cast("double").as("x"))
      .select(floor($"x" * 1e6 + 0.5).cast("long").as("q")).agg(sum($"q")).head.getLong(0)
    assert(rows.find(_.getAs[Int]("dim") == 1).get.getAs[Long]("sum_q") == dim1Direct)
  }

  test("vec_knn_graph: edges are mutual top-5 under brute force and deduped") {
    val rows = q("vec_knn_graph").collect()
    assert(rows.nonEmpty, "mutual-kNN graph is empty at fixture scale")
    val edges = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(edges.distinct.length == edges.length)
    assert(edges.forall { case (a, b) => a < b })
    // brute-force top-5 per node over the same bounded set, same quantization
    val vecs = embeddings.filter($"vec_id" < 60)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray }
      .toMap
    def top5(a: Long): Set[Long] = vecs.keys.filter(_ != a).toSeq
      .map(b => (b, vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum))
      .sortBy { case (b, d) => (-d, b) }.take(5).map(_._1).toSet
    val tops = vecs.keys.map(k => k -> top5(k)).toMap
    edges.foreach { case (a, b) =>
      assert(tops(a).contains(b) && tops(b).contains(a),
        s"edge ($a,$b) is not mutual under brute force")
    }
    // completeness: every mutual pair appears
    val expected = for {
      a <- vecs.keys.toSeq; b <- vecs.keys.toSeq
      if a < b && tops(a).contains(b) && tops(b).contains(a)
    } yield (a, b)
    assert(edges.toSet == expected.toSet)
  }
}
