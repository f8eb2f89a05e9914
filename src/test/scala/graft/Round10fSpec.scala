package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 batch 6: the last three TPC-H shapes (Q2/Q11/Q20 adaptations —
  * with these all 22 shapes have analogs) plus two event-sequence ops
  * (3-step path mining, audience-overlap Jaccard).
  */
class Round10fSpec extends GraftSuite {
  import spark.implicits._

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def part = spark.read.parquet(s"$sfDir/part.parquet")
  private def events = Tables.load(spark, sfDir, "events")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("q_min_cost_supplier: one winner per part; winner is the true min cost") {
    val rows = q("q_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("p_partkey"))
    assert(keys.distinct.length == keys.length, "one row per part")
    // replay the cheapest supplier for the first part directly
    val pk = keys.head
    val direct = lineitem.join(
        part.filter($"p_partkey" === pk && $"p_type" === "STANDARD" && $"p_size" < 10),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg((sum($"l_extendedprice".cast("decimal(38,6)")).cast("double") /
        sum($"l_quantity".cast("decimal(38,6)")).cast("double")).as("cost"))
      .orderBy($"cost", $"l_suppkey").head
    val winnerCost = rows.head.getAs[Double]("unit_cost")
    assert(math.abs(winnerCost - direct.getAs[Double]("cost")) < 1e-6)
  }

  test("q_important_parts: every survivor clears the 0.05% global threshold") {
    val rows = q("q_important_parts").collect()
    assert(rows.nonEmpty)
    val total = lineitem
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(38,6)")).cast("double")).head.getDouble(0)
    rows.foreach { r =>
      assert(r.getAs[Double]("stock_value") > total * 0.0005,
        s"part ${r.getAs[Long]("p_partkey")} below threshold")
    }
    // ordered by value desc
    val vals = rows.map(_.getAs[Double]("stock_value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("q_promo_part_suppliers: strong-part counts match a direct replay") {
    val rows = q("q_promo_part_suppliers").collect()
    val qty = lineitem
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .join(part.filter($"p_type" === "PROMO").select("p_partkey"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("decimal(38,6)")).as("q"))
    val strong = qty
      .withColumn("pq", sum($"q").over(Window.partitionBy("l_partkey")))
      .filter($"q".cast("double") > $"pq".cast("double") * 0.2)
      .groupBy($"l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("n_strong_parts")).sum == strong.values.sum)
    assert(rows.length == strong.size, "one row per strong supplier")
  }

  test("events_top_paths: counts ordered, paths complete, total reconciles") {
    val rows = q("events_top_paths").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[String]("path").split(">").length == 3))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // every user with k >= 3 events contributes exactly k-2 paths; if the
    // top-20 captured all distinct paths the sum must equal that total
    val perUser = events.groupBy($"user_id").count().collect().map(_.getLong(1))
    val totalPaths = perUser.filter(_ >= 3).map(_ - 2).sum
    assert(ns.sum <= totalPaths)
    if (rows.length < 20) assert(ns.sum == totalPaths, "top-20 not full => exhaustive")
  }

  test("events_user_overlap: jaccard bounded and one pair replays exactly") {
    val rows = q("events_user_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, i) = (r.getAs[Long]("users_a"), r.getAs[Long]("users_b"),
        r.getAs[Long]("n_both"))
      assert(i <= math.min(a, b))
      assert(r.getAs[Long]("jaccard_ppm") <= 1000000L)
      assert(r.getAs[Long]("jaccard_ppm") == i * 1000000L / (a + b - i))
    }
    val r0 = rows.head
    val (ta, tb) = (r0.getAs[String]("type_a"), r0.getAs[String]("type_b"))
    val ua = events.filter($"event_type" === ta).select("user_id").distinct()
    val ub = events.filter($"event_type" === tb).select("user_id").distinct()
    assert(r0.getAs[Long]("n_both") == ua.intersect(ub).count())
    assert(r0.getAs[Long]("users_a") == ua.count())
  }

  test("agg_percentiles_exact: boundary ranks replay against an in-memory sort") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val rows = q("agg_percentiles_exact").collect()
    assert(rows.length == orders.size)
    rows.foreach { r =>
      val vs = orders(r.getAs[String]("o_orderpriority"))
      val n = vs.length.toLong
      assert(r.getAs[Long]("n_rows") == n)
      def at(p: Int) = vs(((n * p + 99) / 100).toInt - 1)
      assert(r.getAs[Double]("p50") == at(50))
      assert(r.getAs[Double]("p90") == at(90))
      assert(r.getAs[Double]("p99") == at(99))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("join_asof_forward: per-click next purchase replays for one user") {
    val rows = q("join_asof_forward").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("next_purchase_ts")))
        assert(r.getAs[Long]("next_purchase_ts") >= r.getAs[Long]("ts_us"))
    }
    // direct replay for the user of the first row
    val uid = rows.head.getAs[Long]("user_id")
    val evs = events.filter($"user_id" === uid)
      .select($"event_id", Helpers.tsDivMicros($"ts").as("us"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._2, t._1))
    rows.filter(_.getAs[Long]("user_id") == uid).foreach { r =>
      val t0 = r.getAs[Long]("ts_us")
      val cid = r.getAs[Long]("event_id")
      // the op's ROWS frame orders by (ts_us, event_id) from currentRow,
      // so a same-micros purchase with a SMALLER event_id than the click
      // sits before the frame — replay with the same lexicographic bound
      // (ADVICE r10: the plain ts_us >= t0 form was a latent tie flake)
      val expect = evs.filter(e => e._3 == "purchase" &&
          (e._2 > t0 || (e._2 == t0 && e._1 >= cid)))
        .map(_._2).minOption
      val got = if (r.isNullAt(r.fieldIndex("next_purchase_ts"))) None
        else Some(r.getAs[Long]("next_purchase_ts"))
      assert(got == expect, s"user $uid click at $t0")
    }
  }

  test("events_attribution_first_touch: gaps bounded by the 24h lookback") {
    val rows = q("events_attribution_first_touch").collect()
    assert(rows.nonEmpty)
    val purchases = events.filter($"event_type" === "purchase").count()
    assert(rows.length == purchases, "one row per purchase")
    rows.foreach { r =>
      if (r.getAs[Int]("attributed") == 1) {
        val gap = r.getAs[Long]("gap_us")
        assert(gap >= 0 && gap <= 86400000000L, s"gap $gap outside lookback")
      } else assert(r.isNullAt(r.fieldIndex("first_click_ts")))
    }
  }

  test("docs_split_leakage: cells partition the jaccard pairs; leak flag exact") {
    val rows = q("docs_split_leakage").collect()
    assert(rows.length <= 6, "at most 3x3/2 canonical split cells")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(a <= b, "cells must be canonical (split_a <= split_b)")
      assert(r.getAs[Int]("is_leak") == (if (a != b) 1 else 0))
    }
    val totalPairs = q("jaccard_pairs").count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "every near-dup pair lands in exactly one split cell")
  }

  test("vec_matryoshka_recall: bounded overlap and a JVM replay of one query") {
    val rows = q("vec_matryoshka_recall").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val o = r.getAs[Long]("n_overlap")
      assert(o >= 0 && o <= 5)
      assert(Set(0, 1)(r.getAs[Int]("top1_same")))
    }
    // in-JVM replay of query 0: quantize, both dots, both top-5 sets
    val vecs = embeddings.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(x =>
          math.floor(x.toDouble * 1000000 + 0.5).toLong).toArray).toMap
    val qid = rows.head.getAs[Long]("qid")
    val qv = vecs(qid)
    def dots(pref: Int) = vecs.toSeq.filter(_._1 != qid).map { case (vid, ev) =>
      vid -> (0 until pref).map(i => qv(i) * ev(i)).sum
    }
    def top5(ds: Seq[(Long, Long)]) =
      ds.sortBy { case (vid, d) => (-d, vid) }.take(5).map(_._1).toSet
    val (full, prefix) = (top5(dots(qv.length)), top5(dots(16)))
    assert(rows.head.getAs[Long]("n_overlap") == (full intersect prefix).size)
  }

  test("multimodal_resample: stride-4 sizes and a JVM replay of one checksum") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("multimodal_resample").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_bytes")
      assert(r.getAs[Int]("n_sampled") == (n + 3) / 4)
    }
    // replay in CODEPOINTS — the op's kernel and its DuckDB twin both
    // stride characters, so the replay must too (ADVICE r10)
    val r0 = rows.head
    val cps = docs(r0.getAs[Long]("doc_id")).codePoints().toArray
    val sampled = Iterator.range(0, cps.length, 4).map(cps).toArray
    val expect = sampled.foldLeft(17L)((a, c) => (a * 31 + c) % 2147483648L)
    assert(r0.getAs[Int]("n_bytes") == cps.length)
    assert(r0.getAs[Long]("checksum31") == expect)
  }
}
