package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 4: Pareto decile shares, the raw-text source roundtrip,
  * and the log-domain geometric mean.
  */
class Round10dSpec extends GraftSuite {
  import spark.implicits._

  private def events = Tables.load(spark, sfDir, "events")
  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")

  test("events_pareto_share: deciles partition users; shares sum to ~1e6 and decrease") {
    val rows = q("events_pareto_share").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("users")).sum ==
      events.select($"user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("events")).sum == events.count())
    // integer div floors each share, so the sum can undershoot by <= 10
    val total = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(total <= 1000000L && total > 1000000L - 10L, s"share sum $total")
    // decile 1 holds the most active users: shares are non-increasing
    val shares = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Long]("share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
  }

  test("source_text_raw: roundtrip totals equal the documents-table aggregates") {
    val r = q("source_text_raw").head
    val direct = documents.agg(
      count(lit(1)), sum(length($"text").cast("long")),
      sum(size(split($"text", " ")).cast("long"))).head
    assert(r.getAs[Long]("n_lines") == direct.getLong(0))
    assert(r.getAs[Long]("sum_chars") == direct.getLong(1))
    assert(r.getAs[Long]("sum_tokens") == direct.getLong(2))
  }

  test("agg_geometric_mean: matches a direct quantized replay; sits below the arithmetic mean") {
    val rows = q("agg_geometric_mean").collect()
    assert(rows.nonEmpty)
    val byPrio = orders.select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { r =>
      val prices = byPrio(r.getAs[String]("o_orderpriority")).map(_._2)
      val lnsum = prices.map(p => math.floor(math.log(p) * 1e6).toLong).sum
      val gm = math.exp(lnsum.toDouble / 1e6 / prices.length)
      assert(r.getAs[Double]("geo_mean") == math.floor(gm * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Long]("n_orders") == prices.length)
      // AM-GM: geometric mean never exceeds the arithmetic mean
      assert(gm <= prices.sum / prices.length + 1e-6)
    }
  }
}
