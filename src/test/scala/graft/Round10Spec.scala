package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: the four classic star-schema shapes (Q10/Q15/Q16/
  * Q22 analogues) checked against direct Scala recomputations, plus the
  * RFM segmentation, the Zipf regression, and bigram-novelty invariants.
  */
class Round10Spec extends GraftSuite {
  import spark.implicits._

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private def customer = spark.read.parquet(s"$sfDir/customer.parquet")
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")

  test("q_returned_by_customer: rows sorted, bounded, and revenue reconciles") {
    val rows = q("q_returned_by_customer").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("lost_revenue"))
    assert(revs.sameElements(revs.sortBy(-_)), "not sorted by revenue desc")
    // direct recomputation for the top row
    val top = rows.head
    val direct = lineitem.filter($"l_returnflag" === "R")
      .join(orders.filter($"o_orderdate" >= "1996-10-01" && $"o_orderdate" < "1997-01-01"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"o_custkey" === top.getAs[Long]("c_custkey"))
      .agg(sum(Helpers.dec($"l_extendedprice" * (lit(1.0) - $"l_discount"))).cast("double"))
      .head.getDouble(0)
    assert(direct == top.getAs[Double]("lost_revenue"))
  }

  test("q_top_supplier: emitted revenue equals the true per-supplier max") {
    val rows = q("q_top_supplier").collect()
    assert(rows.nonEmpty)
    val trueMax = lineitem
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(Helpers.dec($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("r"))
      .agg(max($"r").cast("double")).head.getDouble(0)
    rows.foreach(r => assert(r.getAs[Double]("total_rev") == trueMax))
  }

  test("q_supplier_part_breadth: Brand#1 excluded; counts bounded by supplier universe") {
    val rows = q("q_supplier_part_breadth").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("p_brand") != "Brand#1"))
    val nSupp = spark.read.parquet(s"$sfDir/supplier.parquet").count()
    assert(rows.forall(_.getAs[Long]("supplier_cnt") <= nSupp))
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.sameElements(cnts.sortBy(-_)), "not sorted by supplier_cnt desc")
  }

  test("q_idle_rich_customers: membership matches a direct recomputation") {
    val bal = customer.filter($"c_acctbal" > 0)
      .agg(sum(Helpers.dec($"c_acctbal")), count(lit(1))).head
    val (balSum, balN) = (bal.getDecimal(0), bal.getLong(1))
    val recent = orders.filter($"o_orderdate" >= "1999-01-01")
      .select("o_custkey").distinct().as[Long].collect().toSet
    val expect = customer.select($"c_custkey", $"c_acctbal").collect()
      .count { r =>
        val d = java.math.BigDecimal.valueOf(r.getAs[Double]("c_acctbal"))
          .setScale(6, java.math.RoundingMode.HALF_UP)
        d.multiply(java.math.BigDecimal.valueOf(balN)).compareTo(balSum) > 0 &&
          !recent.contains(r.getAs[Long]("c_custkey"))
      }
    val got = q("q_idle_rich_customers").agg(sum($"n_custs")).head.getLong(0)
    assert(got == expect, s"idle-rich membership: got $got expected $expect")
  }

  test("events_rfm_scores: quartile buckets balanced, labels consistent, totals reconcile") {
    val rows = q("events_rfm_scores").collect()
    assert(rows.nonEmpty)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val scores = rows.map(_.getAs[Int](c))
      assert(scores.forall(v => v >= 1 && v <= 4))
      val sizes = scores.groupBy(identity).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$c buckets unbalanced: $sizes")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("rfm") ==
        s"${r.getAs[Int]("r_score")}${r.getAs[Int]("f_score")}${r.getAs[Int]("m_score")}")
    }
    val purchases = Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_.getAs[Long]("frequency")).sum == purchases)
  }

  test("text_zipf_slope: single negative slope matching a direct regression") {
    val rows = q("text_zipf_slope").collect()
    assert(rows.length == 1)
    val slope = rows.head.getAs[Double]("slope6")
    assert(slope < 0.0, s"zipf slope must be negative, got $slope")
    // direct recomputation with the same quantization recipe
    val top = documents.select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").groupBy($"w").count()
      .orderBy($"count".desc, $"w").limit(100)
      .collect().map(_.getLong(1))
    val xs = top.indices.map(i => math.floor(math.log(i + 1.0) * 1e6).toLong)
    val ys = top.map(c => math.floor(math.log(c.toDouble) * 1e6).toLong)
    val n = top.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val direct = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.floor(direct * 1e6 + 0.5) / 1e6 == slope)
  }

  test("text_ngram_novelty: first doc fully novel; novel counts partition the bigram space") {
    val rows = q("text_ngram_novelty").collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_ppm") == 1000000L,
      "lowest doc_id must be 100% novel")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Long]("novelty_ppm") ==
        r.getAs[Long]("n_novel") * 1000000L / r.getAs[Long]("n_bigrams"))
    }
    // every distinct corpus bigram is novel in exactly one doc
    val distinctBigrams = documents
      .select($"doc_id", explode(expr(
        """transform(CASE WHEN size(split(text, ' ')) >= 2
                          THEN sequence(1, size(split(text, ' ')) - 1)
                          ELSE array() END,
             i -> concat(element_at(split(text, ' '), i), ' ',
                         element_at(split(text, ' '), i + 1)))""")).as("bg"))
      .select("bg").distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctBigrams)
  }
}
