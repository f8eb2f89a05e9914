package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-4 operators: differential oracles in Scala (concurrency, EWMA,
  * triangles), structural invariants (gap-fill grid, SCD2 interval chain,
  * z-order locality), equivalence proofs (bloom prefilter == plain join),
  * and the cross-batch state test for the threshold detector.
  */
class Round4Spec extends GraftSuite {
  import spark.implicits._

  test("events_gapfill: grid is hole-free per user and counts reconcile") {
    val rows = q("events_gapfill").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val events = Tables.load(spark, sfDir, "events")
      .select($"user_id", Helpers.tsDivMicros($"ts").as("us"))
      .collect().groupBy(_.getLong(0))
    val hour = 3600000000L
    byUser.foreach { case (u, g) =>
      val hours = g.map(_.getAs[Long]("hour_us")).sorted
      assert(hours.head to hours.last by hour sameElements hours,
        s"user $u grid has holes")
      assert(g.map(_.getAs[Long]("cnt")).sum == events(u).length)
      // zero-filled rows carry exactly 0.0
      g.filter(_.getAs[Long]("cnt") == 0L)
        .foreach(r => assert(r.getAs[Double]("sum_value") == 0.0))
    }
  }

  test("events_markov_transitions: totals reconcile, ppm rows sum to ~1e6 per state") {
    val rows = q("events_markov_transitions").collect()
    val nUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val nEvents = Tables.load(spark, sfDir, "events").count()
    // every event except each user's first contributes exactly one transition
    assert(rows.map(_.getAs[Long]("n_trans")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, g) =>
      val nFrom = g.head.getAs[Long]("n_from")
      assert(g.map(_.getAs[Long]("n_trans")).sum == nFrom,
        s"state $p: transition counts don't sum to its total")
      val ppmSum = g.map(_.getAs[Long]("p_ppm")).sum
      // integer division truncates at most 1 ppm per destination row
      assert(ppmSum > 1000000L - g.length && ppmSum <= 1000000L,
        s"state $p: ppm sum $ppmSum out of range")
    }
  }

  test("events_attribution_last_touch: hand fixture — last click wins, stale/absent clicks don't attribute") {
    val us = 1000000L // 1s in micros; ts column is epoch NANOS
    def ns(sec: Long) = sec * us * 1000L
    val h = 3600L
    val events = Seq(
      // user 1: click, click, purchase 1h later -> latest click (id 11) wins
      (10L, ns(0), 1L, "click"),
      (11L, ns(10), 1L, "click"),
      (12L, ns(10 + h), 1L, "purchase"),
      // ...and a second purchase 25h after the last click -> stale, unattributed
      (13L, ns(10 + 25 * h), 1L, "purchase"),
      // user 2: purchase before its only click -> unattributed (no lookahead)
      (20L, ns(100), 2L, "purchase"),
      (21L, ns(200), 2L, "click"),
      // user 3: view/error noise never attributes
      (30L, ns(0), 3L, "view"),
      (31L, ns(5), 3L, "error"),
      (32L, ns(50), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val tmp = TestSpark.tempDir("graft_attr_")
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Timeseries.queries("events_attribution_last_touch")(spark, tmp)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(got.keySet == Set(12L, 13L, 20L, 32L), "one row per purchase")
    val a = got(12L)
    assert(a.getAs[Long]("click_event_id") == 11L, "latest click must win")
    assert(a.getAs[Long]("gap_us") == h * us)
    assert(a.getAs[Int]("attributed") == 1)
    Seq(13L, 20L, 32L).foreach { id =>
      assert(got(id).getAs[Int]("attributed") == 0, s"purchase $id must be unattributed")
      assert(got(id).isNullAt(got(id).fieldIndex("click_event_id")))
      assert(got(id).isNullAt(got(id).fieldIndex("gap_us")))
    }
  }

  test("events_concurrency matches a brute-force sweep in Scala") {
    val got = q("events_concurrency").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("max_concurrent")).toMap
    val evs = Tables.load(spark, sfDir, "events")
      .select($"user_id", Helpers.tsDivMicros($"ts").as("us"))
      .as[(Long, Long)].collect()
    val expected = evs.groupBy(_._1).map { case (u, g) =>
      val pts = g.flatMap(e => Seq((e._2, 1), (e._2 + 1800000000L, -1)))
        .sortBy(p => (p._1, p._2))
      var run = 0; var mx = 0
      pts.foreach { p => run += p._2; mx = math.max(mx, run) }
      u -> mx.toLong
    }
    assert(got == expected)
  }

  test("events_ewma matches a per-user Scala oracle (exact dyadic math)") {
    val got = q("events_ewma").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    val evs = Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_id", Helpers.tsDivMicros($"ts").as("us"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    evs.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.foreach { case (e, i) =>
        val hist = ordered.slice(math.max(0, i - 15), i + 1)
        var s = 0.0; var w = 1.0
        hist.reverse.foreach { h => s += w * math.floor(h._4 * 100 + 0.5); w *= 0.5 }
        val mass = 2.0 * (1.0 - math.pow(0.5, hist.length))
        val want = math.floor(s / (100.0 * mass) * 1e6 + 0.5) / 1e6
        assert(got(e._2) == want, s"event ${e._2}")
      }
    }
  }

  test("scd2_type_history: intervals chain, one current row per user, runs collapsed") {
    val rows = q("scd2_type_history").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, g) =>
      val sorted = g.sortBy(r => (r.getAs[Long]("valid_from_us"), r.getAs[Long]("event_id")))
      // interval chain: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"))
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u has an uncollapsed run")
        case _ =>
      }
      assert(sorted.count(_.getAs[Int]("is_current") == 1) == 1)
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")))
    }
  }

  test("graph_triangles matches brute-force count on the collected edge set") {
    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"), $"l_orderkey" === $"o_orderkey")
      .join(spark.read.parquet(s"$sfDir/customer.parquet"), $"o_custkey" === $"c_custkey")
      .join(spark.read.parquet(s"$sfDir/supplier.parquet"), $"l_suppkey" === $"s_suppkey")
      .select(least($"c_nationkey", $"s_nationkey").cast("long").as("a"),
        greatest($"c_nationkey", $"s_nationkey").cast("long").as("b"))
      .filter($"a" < $"b").distinct().as[(Long, Long)].collect().toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2))
    val want = (for {
      a <- nodes; b <- nodes if a < b && pairs((a, b))
      c <- nodes if b < c && pairs((b, c)) && pairs((a, c))
    } yield (a, b, c)).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = q("graph_triangles").collect()
      .map(r => r.getAs[Long]("a") -> r.getAs[Long]("n_triangles")).toMap
    assert(got == want)
  }

  test("layout_zorder: buckets cover all orders and bound both dim spans") {
    val rows = q("layout_zorder").collect()
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // zbucket fixes the top 3 bits of each 8-bit dim -> span <= 31 per dim
    rows.foreach { r =>
      assert(r.getAs[Long]("bx_max") - r.getAs[Long]("bx_min") <= 31)
      assert(r.getAs[Long]("by_max") - r.getAs[Long]("by_min") <= 31)
    }
  }

  test("join_bloom_prefilter result equals the plain inner-join aggregate") {
    val tt = (n: String) => spark.read.parquet(s"$sfDir/$n.parquet")
    val plain = tt("lineitem")
      .join(tt("orders").filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderdate")
      .agg(count(lit(1)).as("line_cnt"),
        Helpers.decSumOut($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy("o_orderdate").collect()
    assert(q("join_bloom_prefilter").collect() sameElements plain)
  }

  test("agg_listagg_ordered: sequence length equals order count") {
    q("agg_listagg_ordered").collect().foreach { r =>
      assert(r.getAs[String]("status_seq").length == r.getAs[Long]("n"))
    }
  }

  test("profile_table_stats: keys unique and non-null on the fixture") {
    val rows = q("profile_table_stats").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows("o_orderkey").getAs[Long]("ndv") == orders)
    rows.values.foreach(r => assert(r.getAs[Long]("n_nulls") == 0L))
  }

  test("dedup_incremental: survivors are batch docs with corpus-unseen fingerprints") {
    val out = q("dedup_incremental").collect()
    assert(out.forall(_.getAs[Long]("doc_id") % 10 == 7))
    val fps = out.map(_.getAs[String]("fp")).toSet
    val corpusFps = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" % 10 =!= 7)
      .select(md5(array_join(slice(split(
        lower(regexp_replace($"text", "\\s+", " ")), " "), 1, 5), " ").cast("binary")))
      .as[String].collect().toSet
    assert(fps.intersect(corpusFps).isEmpty)
  }

  test("stream_threshold_alerts: levels strictly increase and match the batch oracle") {
    val rows = q("stream_threshold_alerts").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, g) =>
      val levels = g.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        .map(_.getAs[Long]("level"))
      assert(levels.sameElements(levels.sorted) && levels.distinct.length == levels.length)
    }
    // batch differential: window running sum crossing detection
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_id", Helpers.tsDivMicros($"ts").as("ts_us"),
        floor($"value" * 100 + lit(0.5)).cast("long").as("v100"))
      .withColumn("cum", sum($"v100").over(w))
      .filter(call_function("div", $"cum", lit(100000L)) >
        call_function("div", $"cum" - $"v100", lit(100000L)))
      .select($"user_id", $"event_id", $"ts_us",
        call_function("div", $"cum", lit(100000L)).as("level"))
      .orderBy("user_id", "ts_us", "event_id").collect()
    assert(rows sameElements want)
  }

  test("threshold state carries across micro-batches (crossing at the boundary)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val alerts = ms.toDS().groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        streaming.Streaming.thresholdFn)
      .toDF("user_id", "event_id", "ts_us", "level")
    val qn = "thr_" + System.nanoTime()
    val query = alerts.writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData((1L, 10L, 100L, 60000L)) // $600 — below the line
      query.processAllAvailable()
      ms.addData((1L, 11L, 200L, 60000L)) // cumulative $1200 — crosses once
      query.processAllAvailable()
      val out = spark.table(qn).as[(Long, Long, Long, Long)].collect().sorted
      assert(out.sameElements(Seq((1L, 11L, 200L, 1L))),
        s"got ${out.mkString(",")}")
    } finally query.stop()
  }

  test("vec_jl_projection: projected dots track original dots (JL property)") {
    val rows = q("vec_jl_projection").collect()
      .map(r => (r.getAs[Long]("orig_dot").toDouble, r.getAs[Long]("proj_dot").toDouble / 16.0))
    assert(rows.nonEmpty)
    val (xs, ys) = rows.unzip
    val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val corr = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    // 16 Rademacher dims preserve similarity structure well above chance
    assert(corr > 0.5, s"JL correlation too low: $corr")
  }

  test("multimodal_chunks: chunks tile each payload exactly") {
    val rows = q("multimodal_chunks").collect()
    val lengths = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      assert(g.map(_.getAs[Int]("n_bytes").toLong).sum == lengths(id))
      assert(g.length == math.ceil(lengths(id) / 128.0).toInt)
      assert(g.map(_.getAs[Long]("chunk_id")).sorted.sameElements(0L until g.length))
    }
  }

  test("sketch_cms_topk: count-min never underestimates") {
    val rows = q("sketch_cms_topk").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
      assert(r.getAs[Long]("overcount") >= 0L)
    }
  }

  test("fn_hof scalars match a direct per-order computation") {
    val got = q("fn_hof").collect()
      .map(r => r.getAs[Long]("l_orderkey") -> r).toMap
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity").as[(Long, Double)]
      .collect().groupBy(_._1)
    lines.foreach { case (k, g) =>
      val qs = g.map(_._2)
      val r = got(k)
      assert(r.getAs[Int]("n_lines") == qs.length)
      assert(r.getAs[Double]("sumsq") == qs.map(x => x * x).sum)
      assert(r.getAs[Int]("n_big") == qs.count(_ > 25.0))
      assert(r.getAs[Int]("has_unit") == (if (qs.contains(1.0)) 1 else 0))
      assert(r.getAs[Double]("max_q") == qs.max)
    }
  }

  test("agg_approx_quantile honors the sketch rank-error contract") {
    val rows = q("agg_approx_quantile").collect()
    val exact = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val vals = exact(r.getAs[String]("o_orderpriority"))
      val n = r.getAs[Long]("n")
      assert(n == vals.length)
      for ((qcol, frac) <- Seq(("q25", 0.25), ("q50", 0.5), ("q75", 0.75))) {
        val v = r.getAs[Double](qcol)
        // rank of the returned value must sit within epsilon*n of target
        val rank = vals.count(_ <= v)
        val tol = math.max(2.0, n / 1000.0)
        assert(math.abs(rank - frac * n) <= tol,
          s"$qcol rank $rank vs target ${frac * n} (n=$n)")
      }
      assert(r.getAs[Double]("q25") <= r.getAs[Double]("q50"))
      assert(r.getAs[Double]("q50") <= r.getAs[Double]("q75"))
    }
  }

  test("transformWithState running max carries across micro-batches") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Long, Long, Long)]
      val alerts = ms.toDS().groupByKey(_._1)
        .transformWithState(new streaming.Streaming.RunningMaxProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_id", "ts_us", "max_cents")
      val qn = "tws_" + System.nanoTime()
      val query = alerts.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update()).start()
      try {
        ms.addData((1L, 10L, 100L, 500L), (1L, 11L, 200L, 300L)) // max=500 at t=100
        query.processAllAvailable()
        ms.addData((1L, 12L, 300L, 400L), (1L, 13L, 400L, 900L)) // only 900 beats state
        query.processAllAvailable()
        val out = spark.table(qn).as[(Long, Long, Long, Long)].collect().sorted
        assert(out.sameElements(Seq((1L, 10L, 100L, 500L), (1L, 13L, 400L, 900L))),
          s"got ${out.mkString(",")}")
      } finally query.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("merge_upsert: every customer present once; updates match latest order") {
    val rows = q("merge_upsert").collect()
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.length == nCust)
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length == nCust)
    // updated rows carry the latest order's total; untouched carry acctbal
    val latest = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_custkey", $"o_totalprice", $"o_orderdate", $"o_orderkey")
      .as[(Long, Double, java.time.LocalDateTime, Long)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(r => (r._3.toString, r._4))._2).toMap
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect().toMap
    rows.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      if (r.getAs[Int]("was_updated") == 1) assert(r.getAs[Double]("acctbal") == latest(k))
      else assert(r.getAs[Double]("acctbal") == base(k))
    }
  }

  test("stream_session_builtin sessions agree with the batch gaps-and-islands") {
    val builtin = q("stream_session_builtin").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us")) ->
        (r.getAs[Long]("sess_end_us"), r.getAs[Long]("cnt"))).toMap
    val batch = q("stream_session_30m").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us")) ->
        (r.getAs[Long]("sess_end_us") + 1800000000L, r.getAs[Long]("cnt"))).toMap
    // every emitted built-in session is a batch session (watermark gating
    // may withhold the tail sessions, never invent or split one)
    builtin.foreach { case (k, v) =>
      assert(batch(k) == v, s"session $k diverges: $v vs ${batch(k)}")
    }
    assert(builtin.nonEmpty)
  }
}
