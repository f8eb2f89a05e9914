package graft

import org.apache.spark.sql.functions._

/** Round-14 batch J: bounded-batch streaming backfill, inverted postings,
  * interval arithmetic, insert-if-absent merge, error-rate z-test.
  */
class Round14jSpec extends GraftSuite {
  import spark.implicits._

  private val nsPerDay = 86400000000000L

  test("stream_backfill_batches: >=4 micro-batches, parity with batch answer") {
    val out = q("stream_backfill_batches").collect()
    val batch = Tables.load(spark, sfDir, "events")
      .select(call_function("div", Helpers.tsDivMicros(col("ts")),
        lit(86400000000L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
      .orderBy("day").collect()
    assert(out.map(r => (r.getAs[Long]("day"), r.getAs[Long]("cnt"))).toSeq
      === batch.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val batches = streaming.Streaming.lastStateStats.map(_._3).getOrElse(0)
    assert(batches >= 4, s"expected >=4 micro-batches, got $batches")
  }

  test("text_inverted_postings: df/cf/top posting with doc-asc tie") {
    val dir = TestSpark.tempDir("graft_r14j_inv_")
    Seq((1L, "a a b", "en", "s"), (2L, "a c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_inverted_postings")(spark, dir)
      .collect().map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"),
          r.getAs[Long]("top_doc"), r.getAs[Long]("top_tf")))).toMap
    assert(out("a") === ((2L, 3L, 1L, 2L)))
    assert(out("b") === ((1L, 1L, 1L, 1L)))
    assert(out("c") === ((1L, 1L, 2L, 1L)))
  }

  test("fn_interval: end-of-month clamp and strictly-next Monday") {
    val dir = TestSpark.tempDir("graft_r14j_iv_")
    Seq((1L, "1995-01-31"), (2L, "1995-01-02")) // Tue; Mon
      .toDF("o_orderkey", "d0")
      .withColumn("o_orderdate", to_timestamp(col("d0"))).drop("d0")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("fn_interval")(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[java.sql.Date]("plus_3m").toString,
          r.getAs[java.sql.Date]("last_dom").toString,
          r.getAs[java.sql.Date]("next_mon").toString,
          r.getAs[Long]("epoch_day")))).toMap
    assert(out(1L) === (("1995-04-30", "1995-01-31", "1995-02-06", 9161L)))
    // a Monday's next Monday is +7, never itself
    assert(out(2L)._3 === "1995-01-09")
  }

  test("merge_insert_ignore: re-delivered rows drop; re-apply inserts zero") {
    val customer = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val batch = operators.Profiling.insertBatch(spark, sfDir)
    val once = operators.Profiling.insertIgnore(customer, batch)
      .localCheckpoint()
    assert(once.count() === customer.count() + 25)
    // poisoned re-delivered balances must NOT appear
    assert(once.filter(col("c_acctbal") === -999999.0).count() === 0L)
    val twice = operators.Profiling.insertIgnore(once, batch)
    assert(twice.count() === once.count())
  }

  test("events_error_rate_ztest: planted 10% vs 30% halves => z -3.535534") {
    // days 0..4: 100 events, 10 errors; days 5..9: 100 events, 30 errors
    def half(dayOff: Int, nErr: Int, idOff: Long) =
      (0 until 100).map { i =>
        val t = if (i < nErr) "error" else "view"
        (idOff + i, (dayOff + i % 5).toLong * nsPerDay + i, 1L, t, 1.0)
      }
    val rows = half(0, 10, 0L) ++ half(5, 30, 1000L)
    val dir = TestSpark.tempDir("graft_r14j_zt_")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("events_error_rate_ztest")(spark, dir)
      .collect()(0)
    assert((r.getAs[Long]("n1"), r.getAs[Long]("k1"), r.getAs[Long]("n2"),
      r.getAs[Long]("k2")) === ((100L, 10L, 100L, 30L)))
    assert((r.getAs[Long]("rate1_ppm"), r.getAs[Long]("rate2_ppm"))
      === ((100000L, 300000L)))
    assert(math.abs(r.getAs[Double]("z6") - (-3.535534)) < 1e-6)
    assert(r.getAs[Int]("significant") === 1)
  }
}
