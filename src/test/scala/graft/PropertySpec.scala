package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven property suite (SURVEY §5.4). Each property
  * materializes deterministic samples (fixed seeds — every Spark trial costs
  * a job, so trials are few but reproducible), writes them as the parquet
  * table the registry op reads, and checks an algebraic law of the operator
  * against a Scala-computed oracle.
  */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private val seeds = Seq(11L, 42L, 1234L)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def writeDir(tables: (String, DataFrame)*): String = {
    val tmp = TestSpark.tempDir("graft_prop_")
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$n.parquet")
    }
    tmp
  }

  // random orders-shaped rows: (o_orderkey, o_custkey, o_totalprice,
  // o_orderstatus, o_orderpriority, o_orderdate)
  private val ordersGen: Gen[List[(Long, Long, Double, String, String, String)]] =
    Gen.chooseNum(5, 60).flatMap { n =>
      Gen.listOfN(n, for {
        c  <- Gen.chooseNum(0L, 10L)
        p  <- Gen.chooseNum(100, 50000000).map(_ / 100.0)
        st <- Gen.oneOf("F", "O", "P")
        pr <- Gen.oneOf("1-URGENT", "3-MEDIUM")
        y  <- Gen.chooseNum(1992, 1998)
        m  <- Gen.chooseNum(1, 12)
        d  <- Gen.chooseNum(1, 28)
      } yield (c, p, st, pr, f"$y%04d-$m%02d-$d%02d"))
        .map(_.zipWithIndex.map { case ((c, p, st, pr, dt), i) =>
          (i.toLong, c, p, st, pr, dt) })
    }

  private def ordersDf(seed: Long): DataFrame =
    sample(ordersGen, seed)
      .toDF("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority", "o_orderdate")

  test("property: union_all count additivity; union_distinct bounded") {
    for (s <- seeds) {
      val o = ordersDf(s)
      val dir = writeDir("orders" -> o)
      val a = o.filter($"o_orderstatus" === "F").count()
      val b = o.filter($"o_orderpriority" === "1-URGENT").count()
      assert(SparkEntry.queries("set_union_all")(spark, dir).count() == a + b)
      val ud = SparkEntry.queries("set_union_distinct")(spark, dir).count()
      assert(ud <= a + b && ud >= math.max(a, b) - math.min(a, b))
    }
  }

  test("property: dedup_by_key emits one row per key, each from the input, minimal") {
    for (s <- seeds) {
      val o = ordersDf(s)
      val dir = writeDir("orders" -> o)
      val d = SparkEntry.queries("dedup_by_key")(spark, dir)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .as[(Long, Long, String)].collect()
      val input = o.select("o_custkey", "o_orderkey", "o_orderdate")
        .as[(Long, Long, String)].collect()
      // one row per distinct key
      assert(d.map(_._1).distinct.length == d.length)
      assert(d.map(_._1).toSet == input.map(_._1).toSet)
      // subset of input
      assert(d.toSet.subsetOf(input.toSet))
      // survivor is the (o_orderdate, o_orderkey)-minimal row of its key
      val expect = input.groupBy(_._1).view.mapValues(_.minBy(r => (r._3, r._2))).toMap
      d.foreach(r => assert(r == expect(r._1), s"non-minimal survivor $r"))
    }
  }

  test("property: inner join bounded by |A|x|B|; semi+anti partition the left") {
    for (s <- seeds) {
      val o = ordersDf(s)
      val cust = o.select($"o_custkey".as("c_custkey")).distinct()
        .withColumn("c_name", concat(lit("c#"), $"c_custkey"))
        .withColumn("c_mktsegment", lit("BUILDING"))
        .withColumn("c_acctbal", $"c_custkey" * 1.5)
      val dir = writeDir("orders" -> o, "customer" -> cust)
      val rows = o.select("o_custkey", "o_orderstatus").as[(Long, String)].collect()
      // semi filters status 'F', anti filters status 'P' (registry defs)
      val expectSemi = rows.filter(_._2 == "F").map(_._1).distinct.length
      val expectAnti = (rows.map(_._1).toSet -- rows.filter(_._2 == "P").map(_._1)).size
      assert(SparkEntry.queries("join_left_semi")(spark, dir).count() == expectSemi)
      assert(SparkEntry.queries("join_left_anti")(spark, dir).count() == expectAnti)
      val inner = SparkEntry.queries("join_inner_hash")(spark, dir).count()
      assert(inner == o.count(), "every generated order has a matching customer")
      assert(inner <= o.count() * cust.count())
    }
  }

  test("property: exceptAll/intersectAll obey the multiset count laws") {
    for (s <- seeds) {
      val o = ordersDf(s)
      // right side carries REAL multiplicity (odd keys duplicated) so the
      // min/max-of-counts laws actually bind — a distinct right degenerates
      // intersectAll's law to min(n, 1)
      val base = o.select($"o_custkey".as("c_custkey")).distinct()
        .withColumn("c_name", concat(lit("c#"), $"c_custkey"))
        .withColumn("c_mktsegment",
          when($"c_custkey" % 3 === 0, "MACHINERY").otherwise("AUTOMOBILE"))
        .withColumn("c_acctbal", $"c_custkey" * 1.5)
      val cust = base.union(base.filter($"c_custkey" % 2 === 1))
      val dir = writeDir("orders" -> o, "customer" -> cust)
      val left = o.select($"o_custkey").as[Long].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      def rightKeys(seg: String) = cust
        .filter($"c_mktsegment" === seg).select($"c_custkey").as[Long].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val rM = rightKeys("MACHINERY")
      val expectExcept = left.map { case (k, n) => math.max(0, n - rM.getOrElse(k, 0)) }.sum
      assert(SparkEntry.queries("set_except_all")(spark, dir).count() == expectExcept)
      val rA = rightKeys("AUTOMOBILE")
      val expectIntersect = left.map { case (k, n) => math.min(n, rA.getOrElse(k, 0)) }.sum
      assert(SparkEntry.queries("set_intersect_all")(spark, dir).count() == expectIntersect)
      // unpivot doubles the row count (two value columns)
      assert(SparkEntry.queries("agg_unpivot")(spark, dir).count() == 2 * o.count())
    }
  }

  // random documents: ~tokens words over a tiny vocabulary so overlap occurs
  private val docsGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(8, 30).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(5, 40).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(
          "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
          "eta", "theta", "iota", "kappa", "lambda", "mu"))
          .map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  private def shingleSet(text: String): Set[String] = {
    val t = text.split(" ")
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
  }

  /** The ops' skew caps (shingle df <= MaxShingleDf, band bucket <=
    * MaxBandBucket) are NOT modeled by the uncapped Scala oracles below;
    * they only agree when the generated corpus never trips either cap. This
    * guard makes that precondition explicit, so a future generator bump
    * fails HERE with a clear message instead of producing silent false
    * failures (ADVICE r2). Max shingle df and max band-bucket occupancy are
    * both bounded by the document count. */
  private def assertCapsInert(docs: Seq[(Long, String)]): Unit = {
    val bound = docs.size
    assert(bound <= graft.llm.TextOps.MaxShingleDf
        && bound <= graft.llm.DedupOps.MaxBandBucket,
      s"generator produced $bound docs — caps (df<=${graft.llm.TextOps.MaxShingleDf}, " +
        s"bucket<=${graft.llm.DedupOps.MaxBandBucket}) may fire; model them in the oracle first")
  }

  test("property: jaccard_pairs matches an exact Scala oracle (symmetric, in range)") {
    for (s <- seeds) {
      val docs = sample(docsGen, s)
      assertCapsInert(docs)
      val dir = writeDir("documents" -> docs.toDF("doc_id", "text"))
      val got = SparkEntry.queries("jaccard_pairs")(spark, dir)
        .select("id1", "id2", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val expect = (for {
        (i, a) <- sh; (j, b) <- sh
        if i < j && a.nonEmpty && b.nonEmpty
        inter = (a & b).size; uni = (a | b).size
        if inter.toDouble / uni > 0.1
      } yield (i, j, inter.toLong, uni.toLong)).toSet
      assert(got == expect, s"seed $s: op=${got.size} oracle=${expect.size}")
      // range law: 0 < jac <= 1 for every emitted pair
      got.foreach { case (_, _, inter, uni) =>
        assert(inter > 0 && inter <= uni)
      }
    }
  }

  test("property: agg_corr_covar matches a Scala moment-formula oracle") {
    for (s <- seeds) {
      // lineitem-shaped rows with only the columns the op reads; 2-decimal
      // values so the cent quantization is exact
      val rows = sample(Gen.listOfN(80, for {
        f <- Gen.oneOf("A", "N", "R")
        q <- Gen.chooseNum(100, 5000).map(_ / 100.0)
        p <- Gen.chooseNum(10000, 10000000).map(_ / 100.0)
      } yield (f, q, p)), s)
      val dir = writeDir("lineitem" ->
        rows.toDF("l_returnflag", "l_quantity", "l_extendedprice"))
      val got = SparkEntry.queries("agg_corr_covar")(spark, dir).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
          (r.getAs[Long]("n"), r.getAs[Double]("corr6"))).toMap
      rows.groupBy(_._1).foreach { case (flag, rs) =>
        val x = rs.map(t => math.floor(t._2 * 100 + 0.5).toLong)
        val y = rs.map(t => math.floor(t._3 * 100 + 0.5).toLong)
        val n = rs.size.toDouble
        val (sx, sy) = (x.sum.toDouble, y.sum.toDouble)
        val sxx = x.map(v => v * v).sum.toDouble
        val syy = y.map(v => v * v).sum.toDouble
        val sxy = x.zip(y).map { case (a, b) => a * b }.sum.toDouble
        val corr = (n * sxy - sx * sy) /
          math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        val (gn, gc) = got(flag)
        assert(gn == rs.size)
        assert(math.abs(gc - math.floor(corr * 1e6 + 0.5) / 1e6) < 1e-9,
          s"seed $s flag $flag: op $gc vs oracle $corr")
      }
    }
  }

  // random events: (event_id, user_id, ts_nanos) — micros-aligned nanos so
  // the op's `ts div 1000` is exact
  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.chooseNum(10, 80).flatMap { n =>
      Gen.listOfN(n, for {
        u <- Gen.chooseNum(0L, 4L)
        t <- Gen.chooseNum(0L, 6L * 3600L * 1000000L) // micros inside 6 h
      } yield (u, t * 1000L))
        .map(_.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) })
    }

  test("property: events_sessionize matches a Scala gap-split oracle") {
    for (s <- seeds) {
      val ev = sample(eventsGen, s)
      val dir = writeDir("events" -> ev.toDF("event_id", "user_id", "ts"))
      val got = SparkEntry.queries("events_sessionize")(spark, dir)
        .select("user_id", "session_id", "n_events", "start_us", "end_us", "first_event")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val expect = ev.groupBy(_._2).flatMap { case (u, rows) =>
        val sorted = rows.map { case (id, _, ts) => (ts / 1000, id) }.sorted
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
          case (cur :: rest, e) if e._1 - cur.head._1 <= 1800000000L =>
            (e :: cur) :: rest
          case (acc, e) => List(e) :: acc
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (ss, i) =>
          (u, i + 1L, ss.size.toLong,
            ss.map(_._1).min, ss.map(_._1).max, ss.map(_._2).min)
        }
      }.toSet
      assert(got == expect, s"seed $s: op=${got.size} oracle=${expect.size}")
    }
  }

  // enough docs that the 2000-token budget actually splits batches
  private val packGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(150, 250).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(5, 40).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta"))
          .map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  test("property: docs_pack_greedy matches a Scala prefix-sum oracle") {
    for (s <- seeds) {
      val docs = sample(packGen, s).map { case (id, t) => (id, t, "l" + (id % 3)) }
      val dir = writeDir("documents" -> docs.toDF("doc_id", "text", "lang"))
      val got = SparkEntry.queries("docs_pack_greedy")(spark, dir)
        .select("lang", "batch_id", "n_docs", "sum_tokens", "first_doc", "last_doc")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val expect = docs.groupBy(_._3).flatMap { case (lang, ds) =>
        var cum = 0L
        val tagged = ds.sortBy(_._1).map { case (id, t, _) =>
          val n = t.split(" ").length.toLong
          val b = cum / 2000L
          cum += n
          (b, id, n)
        }
        tagged.groupBy(_._1).map { case (b, rows) =>
          (lang, b, rows.size.toLong, rows.map(_._3).sum,
            rows.map(_._2).min, rows.map(_._2).max)
        }
      }.toSet
      assert(got == expect, s"seed $s: op=${got.size} oracle=${expect.size}")
    }
  }

  test("property: minhash-LSH candidates cover every Jaccard>=0.8 pair (planted dups)") {
    for (s <- seeds) {
      val base = sample(docsGen, s)
      // plant near-duplicates: copy of each doc with the last token changed
      val planted = base.flatMap { case (id, t) =>
        val toks = t.split(" ")
        val dup = (toks.dropRight(1) :+ "omega").mkString(" ")
        Seq((id * 2, t), (id * 2 + 1, dup))
      }
      assertCapsInert(planted)
      val dir = writeDir("documents" -> planted.toDF("doc_id", "text"))
      val cand = SparkEntry.queries("dedup_near_minhash")(spark, dir)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sh = planted.map { case (id, t) => id -> shingleSet(t) }.toMap
      val high = (for {
        (i, a) <- sh; (j, b) <- sh
        if i < j && a.nonEmpty && b.nonEmpty
        if (a & b).size.toDouble / (a | b).size >= 0.8
      } yield (i, j)).toSet
      val missed = high.diff(cand)
      assert(missed.isEmpty, s"seed $s: LSH missed ${missed.size} of ${high.size} high-Jaccard pairs")
    }
  }

  // r11 budget-fill docs: long enough that the 20k-token budget actually
  // binds per lang (~70 docs x ~300 tokens per lang), with stopwords in
  // the vocabulary so the quality score is not just a token count
  private val budgetGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(150, 250).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(200, 600).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(
          "alpha", "beta", "gamma", "delta", "the", "of", "data"))
          .map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  private val StopSet = Set("the", "of", "and", "a", "to", "in", "is", "data")

  test("property: docs_token_budget_fill matches a Scala greedy-prefix oracle") {
    for (s <- seeds) {
      val docs = sample(budgetGen, s).map { case (id, t) => (id, t, "l" + (id % 3)) }
      val dir = writeDir("documents" -> docs.toDF("doc_id", "text", "lang"))
      val got = SparkEntry.queries("docs_token_budget_fill")(spark, dir)
        .select("lang", "doc_id", "quality", "n_tokens", "cum_tokens")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val expect = docs.groupBy(_._3).flatMap { case (lang, ds) =>
        val scored = ds.map { case (id, t, _) =>
          val toks = t.split(" ")
          val q = toks.length.toLong * 10 - toks.count(StopSet).toLong * 5
          (id, q, toks.length.toLong)
        }.sortBy { case (id, q, _) => (-q, id) }
        var cum = 0L
        scored.flatMap { case (id, q, n) =>
          cum += n
          if (cum <= 20000L) Some((lang, id, q, n, cum)) else None
        }
      }.toSet
      assert(got == expect, s"seed $s: op=${got.size} oracle=${expect.size}")
      // the budget must actually bind for at least one lang, or the
      // property degenerates to "emit everything"
      assert(got.size < docs.size, s"seed $s: budget never bound")
    }
  }

  test("property: text_bpe_pair_stats matches a Scala pair-count oracle") {
    for (s <- seeds) {
      val docs = sample(docsGen, s).map { case (id, t) => (id, t, "l" + (id % 2)) }
      val dir = writeDir("documents" -> docs.toDF("doc_id", "text", "lang"))
      val got = SparkEntry.queries("text_bpe_pair_stats")(spark, dir)
        .select("lang", "rk", "pair", "n", "share_ppm")
        .as[(String, Int, String, Long, Long)].collect().toSet
      val expect = docs.groupBy(_._3).flatMap { case (lang, ds) =>
        val cnt = ds.flatMap(_._2.split(" ")).filter(_.length >= 2)
          .flatMap(w => w.sliding(2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val total = cnt.values.sum
        cnt.toSeq.sortBy { case (p, n) => (-n, p) }.take(10).zipWithIndex.map {
          case ((p, n), i) => (lang, i + 1, p, n, n * 1000000L / total)
        }
      }.toSet
      assert(got == expect, s"seed $s: op=${got.size} oracle=${expect.size}")
    }
  }

  private val madGen: Gen[List[(String, Double)]] =
    Gen.chooseNum(30, 80).flatMap { n =>
      Gen.listOfN(n, for {
        t <- Gen.oneOf("view", "click", "purchase")
        v <- Gen.chooseNum(0, 9999).map(_ / 100.0) // centi-precision doubles
      } yield (t, v))
    }

  test("property: events_anomaly_mad matches a Scala (lo+hi)-median oracle") {
    for (s <- seeds) {
      val evs = sample(madGen, s).zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, i.toLong * 1000000L, i.toLong % 7, t, v)
      }
      val dir = writeDir("events" -> evs
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}")))
      val got = SparkEntry.queries("events_anomaly_mad")(spark, dir)
        .select("event_type", "n_events", "med2x_centi", "mad4x_centi", "n_anomalies")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      def med2(xs: Seq[Long]): Long = {
        val v = xs.sorted; val n = v.size
        v((n + 1) / 2 - 1) + v(n / 2)
      }
      val expect = evs.groupBy(_._4).map { case (t, rows) =>
        val vs = rows.map(r => math.floor(r._5 * 100 + 0.5).toLong)
        val m2 = med2(vs)
        val devs = vs.map(v => math.abs(v * 2 - m2))
        val m4 = med2(devs)
        (t, vs.size.toLong, m2, m4, devs.count(d => d * 2 > m4 * 3).toLong)
      }.toSet
      assert(got == expect, s"seed $s: op=$got oracle=$expect")
    }
  }

  // random (type, tsMicros-spanning-days, value) events — ts crosses day
  // boundaries so the sharded-prefix-sum carry path is exercised
  private val cusumGen: Gen[List[(String, Long, Double)]] =
    Gen.chooseNum(5, 80).flatMap { n =>
      Gen.listOfN(n, for {
        t  <- Gen.oneOf("a", "b")
        ts <- Gen.chooseNum(0L, 5L * 86400000000L)
        v  <- Gen.chooseNum(0, 30000).map(_ / 100.0)
      } yield (t, ts, v))
    }

  test("property: events_cusum_drift matches a sequential Scala CUSUM oracle across day shards") {
    for (s <- seeds) {
      val evs = sample(cusumGen, s).zipWithIndex.map { case ((t, ts, v), i) =>
        (i.toLong, ts * 1000L, i.toLong % 5, t, v)
      }
      val dir = writeDir("events" -> evs
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}")))
      val got = SparkEntry.queries("events_cusum_drift")(spark, dir)
        .select("event_type", "n_events", "med2x_centi", "max_abs_cusum", "peak_us")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      def med2(xs: Seq[Long]): Long = {
        val v = xs.sorted; val n = v.size
        v((n + 1) / 2 - 1) + v(n / 2)
      }
      val expect = evs.groupBy(_._4).map { case (t, rows) =>
        val ordered = rows.sortBy(r => (r._2 / 1000L, r._1))
        val vs = ordered.map(r => math.floor(r._5 * 100 + 0.5).toLong)
        val m2 = med2(vs)
        var cum = 0L
        var best = (-1L, Long.MaxValue, Long.MaxValue) // (abs, ts, eid)
        ordered.zip(vs).foreach { case (r, v) =>
          cum += v * 2 - m2
          val cand = (math.abs(cum), r._2 / 1000L, r._1)
          if (cand._1 > best._1 ||
            (cand._1 == best._1 &&
              Ordering[(Long, Long)].lt((cand._2, cand._3), (best._2, best._3))))
            best = cand
        }
        (t, ordered.size.toLong, m2, best._1, best._2)
      }.toSet
      assert(got == expect, s"seed $s: op=$got oracle=$expect")
    }
  }

  test("property: events_streaks matches a Scala run-length oracle") {
    for (s <- seeds) {
      val evs = sample(cusumGen, s).zipWithIndex.map { case ((t, ts, _), i) =>
        (i.toLong, ts * 1000L, i.toLong % 4, t)
      }
      val dir = writeDir("events" -> evs
        .toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}")))
      val got = SparkEntry.queries("events_streaks")(spark, dir)
        .select("user_id", "event_type", "streak_len", "start_us")
        .as[(Long, String, Long, Long)].collect().toSet
      val expect = evs.groupBy(_._3).map { case (u, rows) =>
        val ordered = rows.sortBy(r => (r._2 / 1000L, r._1))
        // run-length encode consecutive same types, keep (len, start, type)
        val runs = scala.collection.mutable.ListBuffer[(Long, Long, String)]()
        ordered.foreach { r =>
          val ts = r._2 / 1000L
          if (runs.nonEmpty && runs.last._3 == r._4)
            runs(runs.size - 1) = (runs.last._1 + 1, runs.last._2, runs.last._3)
          else runs += ((1L, ts, r._4))
        }
        val best = runs.minBy(r => (-r._1, r._2, r._3))
        (u, best._3, best._1, best._2)
      }.toSet
      assert(got == expect, s"seed $s: op=$got oracle=$expect")
    }
  }

  test("property: join_asof_nearest matches a per-click Scala replay (ties backward)") {
    for (s <- seeds) {
      val evs = sample(cusumGen, s).zipWithIndex.map { case ((t, ts, _), i) =>
        (i.toLong, ts * 1000L, i.toLong % 3,
          if (t == "a") "click" else "purchase")
      }
      val dir = writeDir("events" -> evs
        .toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}")))
      val got = SparkEntry.queries("join_asof_nearest")(spark, dir)
        .select("event_id", "nearest_purchase_ts", "direction")
        .as[(Long, Option[Long], String)].collect().toSet
      val expect = evs.filter(_._4 == "click").map { c =>
        val ts = c._2 / 1000L
        // the op's windows are ROWS frames over (ts, event_id): a
        // same-ts purchase with smaller id is "preceding", larger id
        // "following"
        val sameUser = evs.filter(e => e._3 == c._3 && e._4 == "purchase")
        val ord = Ordering[(Long, Long)]
        val prev = sameUser.filter(p =>
          ord.lt((p._2 / 1000L, p._1), (ts, c._1))).map(_._2 / 1000L)
          .sorted.lastOption
        val next = sameUser.filter(p =>
          ord.gt((p._2 / 1000L, p._1), (ts, c._1))).map(_._2 / 1000L)
          .sorted.headOption
        val nearest = (prev, next) match {
          case (None, n) => n
          case (p, None) => p
          case (Some(p), Some(n)) => if (ts - p <= n - ts) Some(p) else Some(n)
        }
        val dirn = nearest match {
          case None => "none"
          case Some(x) => if (x <= ts) "back" else "fwd"
        }
        (c._1, nearest, dirn)
      }.toSet
      assert(got == expect, s"seed $s: op=$got oracle=$expect")
    }
  }
}
