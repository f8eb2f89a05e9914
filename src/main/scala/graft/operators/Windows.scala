package graft.operators

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.5 Window functions. Every ORDER BY inside a window ends with a
  * row-unique tiebreaker so rank/row_number/lead/lag are deterministic
  * (SURVEY D1). Ratio outputs (percent_rank, cume_dist) go through the
  * cross-engine-safe Helpers.r6 formula, never engine round().
  */
object Windows extends OpRegistry {

  /** The (c_acctbal DESC, c_custkey ASC) window order as ONE max-comparable
    * struct: the row that sorts FIRST has the LARGEST (bal, −ck) struct.
    * Shared by the r15 scale rewrites of the §2.5 customer window demos. */
  private def ordKey = struct(col("c_acctbal"), (-col("c_custkey")).as("nck"))

  /** Top-3 customers per segment WITHOUT a low-cardinality window (r15,
    * VERDICT r14 #1): the naive row_number()<=3 sorts the whole table
    * inside ≤5 segment partitions — the limit_topk_with_ties shape that
    * dies at 100 TB. k=3 is fixed, so the k=1 broadcast-max rewrite
    * unrolls into a 3-round tournament: each round is ONE partial+final
    * aggregate (map-side combined, 5-row result) + a broadcast equality
    * filter excluding prior winners. Zero sorts, zero fact shuffles; the
    * fact is scanned 4× column-pruned (3 rounds + the final winner pick) —
    * at any scale that is 4 cheap scans vs one full-table skewed sort.
    * Output (rn ∈ 1..3) is provably identical to the window form; the
    * oracle keeps ROW_NUMBER() ≤ 3, certifying the rewrite differentially
    * (the limit_topk_with_ties precedent, SURVEY §2.6). */
  private[graft] def customerTop3(customer: DataFrame): DataFrame = {
    val base = customer.select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal"), ordKey.as("k"))
    val s1 = base.groupBy("c_mktsegment").agg(max(col("k")).as("k1"))
    val s2 = base.join(broadcast(s1), "c_mktsegment")
      .filter(!(col("k") <=> col("k1")))
      .groupBy("c_mktsegment").agg(max(col("k")).as("k2"))
    val s3 = base.join(broadcast(s1.join(s2, "c_mktsegment")), "c_mktsegment")
      .filter(!(col("k") <=> col("k1")) && !(col("k") <=> col("k2")))
      .groupBy("c_mktsegment").agg(max(col("k")).as("k3"))
    val winners = s1.join(s2, Seq("c_mktsegment"), "left")
      .join(s3, Seq("c_mktsegment"), "left")
    base.join(broadcast(winners), "c_mktsegment")
      .filter(col("k") <=> col("k1") || col("k") <=> col("k2") ||
        col("k") <=> col("k3"))
      .withColumn("rn",
        when(col("k") <=> col("k1"), 1)
          .when(col("k") <=> col("k2"), 2).otherwise(3))
      .select("c_custkey", "c_mktsegment", "c_acctbal", "rn")
  }

  /** Distributed per-segment ranking via the VALUE-CELL two-pass (r15,
    * VERDICT r14 #1): rank every customer within its segment under
    * (c_acctbal DESC, c_custkey ASC) without sorting the table inside ≤5
    * segment partitions. acctbal is 2-decimal, so cents-quantization is an
    * injective order-preserving key (the vc discipline): (1) one fact agg
    * collapses to the (segment × cents) CELL table — bounded by the VALUE
    * DOMAIN (≤5×~1.1M cells at ANY corpus size), never by rows; (2)
    * cnt_above = suffix count over cells (a window partitioned by segment
    * — over the domain-bounded cell frame only, the q_order_backlog_daily
    * bounded-frame discipline); (3) each row's intra-cell tiebreak rank is
    * a window partitioned by (segment, vc) — HIGH-cardinality, cells are
    * tie-groups and stay tiny; (4) global rn = cnt_above + rcell, n from
    * the 5-row segment totals broadcast. The one data-sized exchange hashes
    * on (segment, vc) — balanced at any SF. Returns every row + rn + n. */
  private[graft] def segmentRanked(customer: DataFrame): DataFrame = {
    val rows = customer.select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("vc"))
    val cells = rows.groupBy("c_mktsegment", "vc").agg(count(lit(1)).as("c"))
    val wAbove = Window.partitionBy("c_mktsegment").orderBy(col("vc").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellsAbove = cells
      .withColumn("cnt_above", coalesce(sum(col("c")).over(wAbove), lit(0L)))
      .select("c_mktsegment", "vc", "cnt_above")
    val nSeg = cells.groupBy("c_mktsegment").agg(sum(col("c")).as("n"))
    val wCell = Window.partitionBy("c_mktsegment", "vc")
      .orderBy(col("c_custkey"))
    rows
      .withColumn("rcell", row_number().over(wCell).cast("long"))
      .join(cellsAbove, Seq("c_mktsegment", "vc"))
      .join(broadcast(nSeg), "c_mktsegment")
      .withColumn("rn", (col("cnt_above") + col("rcell")).cast("int"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rank_dense_row" -> ((s, dir) => {
      // r15 re-plan (VERDICT r14 #1): the 5-value-segment window became
      // the two-pass value-cell rank. Under the D1 determinism discipline
      // the window ORDER is unique (custkey tiebreak), so RANK =
      // DENSE_RANK = ROW_NUMBER is an identity — the oracle still
      // computes all three natively and the hash-match certifies it.
      segmentRanked(t(s, dir)("customer"))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("rn").as("rnk"), col("rn").as("drnk"), col("rn"))
        .orderBy("c_mktsegment", "rn")
    }),
    "win_topk_per_group" -> ((s, dir) => {
      // r15 re-plan (VERDICT r14 #1): 3-round broadcast-max tournament —
      // see customerTop3. Oracle unchanged (ROW_NUMBER() <= 3 form).
      customerTop3(t(s, dir)("customer"))
        .orderBy("c_mktsegment", "rn")
    }),
    "win_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir)("orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("run_sum"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "win_sliding_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
      t(s, dir)("orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("mov_sum3"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "win_range_frame" -> ((s, dir) => {
      // Value-range frame: all of the same customer's orders within 1000.0
      // below the current price. Frame membership depends only on values,
      // so ties are harmless. r15 re-key (VERDICT r14 #1): a RANGE frame
      // is inherently per-partition-sequential, so the demo's partition
      // key moved from the 5-value o_orderpriority (whole fact sorted in
      // ≤5 tasks — the scale-killer shape) to o_custkey — SF-proportional
      // cardinality, per-partition work stays bounded at any corpus size,
      // and the frame semantics exercised are IDENTICAL.
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
      t(s, dir)("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("range_sum"),
          count(lit(1)).over(w).as("range_cnt"))
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    }),
    "win_lead_lag" -> ((s, dir) => {
      // D4: epoch MICROS at the boundary — DuckDB reads TIMESTAMP(NANOS)
      // parquet at micro precision so raw nanos never hash-match
      // (VERDICT r1 #2); `ts div 1000` is exact on both sides.
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      t(s, dir)("events")
        .select(col("event_id"), col("user_id"), tsDivMicros(col("ts")).as("ts_us"))
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("next_ts", lead("ts_us", 1).over(w))
        .withColumn("gap_us", col("ts_us") - col("prev_ts"))
        .orderBy("event_id")
    }),
    "win_first_last_nth" -> ((s, dir) => {
      // r15 re-plan (VERDICT r14 #1): over the FULL-partition frame,
      // first/last/nth are per-segment CONSTANTS — k-bounded group stats,
      // not per-row window state. first = argmax of the order struct,
      // last = argmin (both ONE partial+final max_by/min_by aggregate),
      // third = rank-3 of the customerTop3 tournament; the 5-row stats
      // table broadcasts back onto every row. Zero sorts, no
      // low-cardinality window anywhere. Output identical to the window
      // form; oracle keeps FIRST_VALUE/LAST_VALUE/NTH_VALUE.
      val cust = t(s, dir)("customer")
      val fl = cust.groupBy("c_mktsegment").agg(
        max_by(col("c_custkey"), ordKey).as("first_k"),
        min_by(col("c_custkey"), ordKey).as("last_k"))
      val third = customerTop3(cust).filter(col("rn") === 3)
        .select(col("c_mktsegment"), col("c_custkey").as("third_k"))
      val stats = fl.join(third, Seq("c_mktsegment"), "left")
      cust.join(broadcast(stats), "c_mktsegment")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("first_k"), col("last_k"), col("third_k"))
        .orderBy("c_custkey")
    }),
    "events_sessionize" -> ((s, dir) => {
      // Batch sessionization — assign every event a session id (new session
      // when >30 min elapses since the user's previous event), then emit
      // per-session stats. The classic lag→flag→running-sum shape: both
      // windows and the final groupBy key on user_id, so it is ONE shuffle
      // (the sort/exchange is reused across all three), and at 100 TB each
      // user's timeline sorts locally in its partition. Times in exact
      // integer micros (D4b).
      val gapUs = 30L * 60L * 1000000L
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir)("events")
        .select(col("user_id"), col("event_id"), tsDivMicros(col("ts")).as("ts_us"))
        .withColumn("is_new",
          when(col("ts_us") - lag("ts_us", 1).over(wOrd) > gapUs, 1L)
            .when(lag("ts_us", 1).over(wOrd).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          min(col("event_id")).as("first_event"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")
    }),

    "events_session_conversion" -> ((s, dir) => {
      // In-session conversion (round 14): of sessions that saw a view,
      // how many converted — a purchase strictly AFTER the session's
      // first view — the product-analytics number a cross-session funnel
      // (events_funnel) overstates, because intent decays at the session
      // boundary. Same one-shuffle sessionize kernel (lag→flag→running
      // sum, all windows + the groupBy share the user_id exchange); the
      // conversion test is pure per-session aggregation: min(view ts) <
      // max(purchase ts). Output is ONE row of corpus-level counts +
      // exact-integer ppm.
      val gapUs = 30L * 60L * 1000000L
      val wOrd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t(s, dir)("events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          tsDivMicros(col("ts")).as("ts_us"))
        .withColumn("is_new",
          when(col("ts_us") - lag("ts_us", 1).over(wOrd) > gapUs, 1L)
            .when(lag("ts_us", 1).over(wOrd).isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(min(when(col("event_type") === "view", col("ts_us"))).as("v_us"),
          max(when(col("event_type") === "purchase", col("ts_us"))).as("p_us"))
      sess.agg(count(lit(1)).as("n_sessions"),
          sum(when(col("v_us").isNotNull, 1L).otherwise(0L)).as("n_with_view"),
          sum(when(col("v_us").isNotNull && col("p_us") > col("v_us"), 1L)
            .otherwise(0L)).as("n_converted"))
        .withColumn("cvr_ppm", when(col("n_with_view") > 0,
          call_function("div", col("n_converted") * lit(1000000L),
            col("n_with_view"))))
    }),
    "events_anomaly_zscore" -> ((s, dir) => {
      // Outlier detection on the event stream: per-type mean/stddev from
      // EXACT cent-quantized moment sums (the agg_corr_covar technique), z
      // computed per row against the broadcast 5-row stats table, events
      // with |z| > 3 flagged. Identical integer sums → identical IEEE
      // doubles → identical z in any engine. One aggregate + one broadcast
      // join — no second shuffle of the stream.
      import org.apache.spark.sql.types.DecimalType
      val d = DecimalType(38, 0)
      val e = t(s, dir)("events").select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
      val stats = e.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("n"),
          sum(col("vc").cast(d)).cast("double").as("sx"),
          sum((col("vc") * col("vc")).cast(d)).cast("double").as("sxx"))
        .withColumn("mean_c", col("sx") / col("n"))
        .withColumn("sd_c", sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          / (col("n") * (col("n") - lit(1)))))
      e.join(broadcast(stats), col("event_type") === col("et"))
        .withColumn("z", (col("vc") - col("mean_c")) / col("sd_c"))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("vc"), r4(col("z")).as("z4"))
        .orderBy("event_id")
    }),
    "events_retention_cohorts" -> ((s, dir) => {
      // Cohort retention: users grouped by first-active day, counted on
      // each later activity day as a day offset — the table behind every
      // retention curve. Two aggregations + one broadcast join, all keyed
      // on user_id / (cohort, offset); day arithmetic in exact integer
      // micros-per-day so both engines bucket identically.
      val usPerDay = 86400000000L
      val e = t(s, dir)("events")
        .select(col("user_id"),
          call_function("div", tsDivMicros(col("ts")), lit(usPerDay)).as("day"))
      val act = e.distinct()
      val cohort = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      // unhinted: cohort is USER-sized; AQE decides by measured size
      act.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),
    "events_funnel" -> ((s, dir) => {
      // Ordered conversion funnel view → click → purchase: each stage's
      // timestamp is the user's FIRST event of that type strictly after the
      // previous stage. Three (filter → join → min-agg) steps, all keyed on
      // user_id — the build side is the per-user stage table (USER-sized,
      // so unhinted: AQE broadcasts it while small and shuffle-joins at
      // scale); the event stream is scanned three times but never
      // reshuffled more than once per stage. Exact integer micros (D4b).
      val e = t(s, dir)("events")
        .select(col("user_id"), col("event_type"), tsDivMicros(col("ts")).as("ts_us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("v_us"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts_us") > col("v_us"))
        .groupBy("user_id").agg(min(col("ts_us")).as("c_us"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts_us") > col("c_us"))
        .groupBy("user_id").agg(min(col("ts_us")).as("p_us"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("v_us"), col("c_us"), col("p_us"),
          col("p_us").isNotNull.as("converted"))
        .orderBy("user_id")
    }),
    "win_ntile_pctrank" -> ((s, dir) => {
      // r15 re-plan (VERDICT r14 #1): the two-pass distributed rank
      // (segmentRanked) replaces the 5-value-partition window. Under the
      // D1 unique window order, every ranking function is a pure formula
      // of (rn, n): PERCENT_RANK = (rn−1)/(n−1) (0 when n=1), CUME_DIST =
      // rn/n, and NTILE(4) = the standard first-(n mod 4)-buckets-get-
      // ceil(n/4) fill computed with integer div — all map-side after the
      // rank. The oracle keeps the native NTILE/PERCENT_RANK/CUME_DIST
      // window functions, certifying the formulas differentially.
      val ranked = segmentRanked(t(s, dir)("customer"))
      val rnL = col("rn").cast("long")
      val qt = call_function("div", col("n"), lit(4L))
      val rm = pmod(col("n"), lit(4L))
      val tile = when(rnL <= rm * (qt + 1),
        call_function("div", rnL - 1, qt + 1) + 1)
        .otherwise(rm + call_function("div", rnL - rm * (qt + 1) - 1,
          greatest(qt, lit(1L))) + 1)
      ranked
        .select(col("c_custkey"), col("c_mktsegment"),
          tile.cast("int").as("tile"),
          when(col("n") > 1,
            r6((rnL - 1).cast("double") / (col("n") - 1).cast("double")))
            .otherwise(lit(0.0d)).as("pr"),
          r6(rnL.cast("double") / col("n").cast("double")).as("cd"))
        .orderBy("c_custkey")
    }),

    "win_running_countd" -> ((s, dir) => {
      // Running COUNT(DISTINCT) — round 14. Not a native window in either
      // engine, and the naive frame formulation re-scans its whole prefix
      // per row (O(n²) state). The scalable identity: a key is NEW only on
      // its first appearance, so running-distinct = cumulative sum of
      // first-seen counts. Shape here: the customer-acquisition curve per
      // order priority — distinct customers ever seen by each order month.
      // Plan: one hash agg to (priority, cust) → min month (map-side
      // combined, the only fact-sized pass), one agg to the
      // priority×month grid, then a cum-sum window over ≤ 5×84 rows.
      // At 100 TB the window input is still calendar-bounded.
      val monthly = t(s, dir)("orders")
        .select(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_custkey"))
        .groupBy("o_orderpriority", "o_custkey")
        .agg(min(col("month")).as("month"))
        .groupBy("o_orderpriority", "month")
        .agg(count(lit(1)).as("new_cust"))
      val w = Window.partitionBy("o_orderpriority").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("cum_cust", sum("new_cust").over(w).cast("long"))
        .orderBy("o_orderpriority", "month")
    }),

    "win_pattern_vshape" -> ((s, dir) => {
      // Row-pattern matching (MATCH_RECOGNIZE-lite, round 14): find
      // V-shapes in the daily order-revenue series — two strictly-down
      // days into a trough, then a rebound. Neither engine ships
      // MATCH_RECOGNIZE; the fixed-length pattern compiles exactly to
      // lag/lead offsets + a conjunctive filter, which is also how a
      // 100 TB engine should run it: one fact-sized hash agg collapses
      // orders to the CALENDAR-BOUNDED day grid (≤2400 rows at any SF —
      // the q_order_backlog_daily discipline), and the global window runs
      // on that bounded frame only. Pattern is defined over observed
      // (trading) days; revenue is exact integer cents.
      val daily = t(s, dir)("orders")
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("rev_c"))
      val w = Window.orderBy("day")
      daily
        .select(col("day"), col("rev_c"),
          lag("rev_c", 2).over(w).as("r2"), lag("rev_c", 1).over(w).as("r1"),
          lead("rev_c", 1).over(w).as("f1"))
        .filter(col("r2").isNotNull && col("f1").isNotNull &&
          col("r1") < col("r2") && col("rev_c") < col("r1") &&
          col("f1") > col("rev_c"))
        .select(col("day"), col("rev_c"),
          (col("r2") - col("rev_c")).as("depth_c"),
          (col("f1") - col("rev_c")).as("rebound_c"))
        .orderBy("day")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "events_anomaly_zscore" -> s"""
      WITH e AS (SELECT event_id, event_type,
                        CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
                 FROM events),
      stats AS (SELECT event_type AS et, COUNT(1) AS n,
                       CAST(SUM(vc) AS DOUBLE) AS sx,
                       CAST(SUM(vc * vc) AS DOUBLE) AS sxx
                FROM e GROUP BY event_type),
      st AS (SELECT et, sx / n AS mean_c,
                    sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS sd_c
             FROM stats)
      SELECT e.event_id, e.event_type, e.vc,
             ${r4Sql("(e.vc - st.mean_c) / st.sd_c")} AS z4
      FROM e JOIN st ON e.event_type = st.et
      WHERE abs((e.vc - st.mean_c) / st.sd_c) > 3.0
      ORDER BY e.event_id""",
    "events_retention_cohorts" -> """
      WITH act AS (SELECT DISTINCT user_id,
                          (epoch_ns(ts) // 1000) // 86400000000 AS day
                   FROM events),
      cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
      SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_users
      FROM act a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY c.cohort_day, a.day - c.cohort_day
      ORDER BY cohort_day, day_offset""",
    "events_funnel" -> """
      WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
      v AS (SELECT user_id, MIN(ts_us) AS v_us FROM e
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts_us) AS c_us
            FROM e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts_us > v.v_us GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts_us) AS p_us
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts_us > c.c_us GROUP BY e.user_id)
      SELECT v.user_id, v.v_us, c.c_us, p.p_us,
             (p.p_us IS NOT NULL) AS converted
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id""",
    "events_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
      flagged AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1
                    WHEN LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      sess AS (
        SELECT user_id, event_id, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(1) AS n_events,
             MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
             MIN(event_id) AS first_event,
             MAX(ts_us) - MIN(ts_us) AS dur_us
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",

    "events_session_conversion" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        epoch_ns(ts) // 1000 AS ts_us FROM events),
      flagged AS (
        SELECT user_id, event_id, event_type, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1
                    WHEN LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      sess AS (
        SELECT user_id, event_type, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM flagged),
      per AS (SELECT user_id, session_id,
                     MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS v_us,
                     MAX(CASE WHEN event_type = 'purchase' THEN ts_us END)
                       AS p_us
              FROM sess GROUP BY 1, 2)
      SELECT COUNT(1) AS n_sessions,
             CAST(SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_view,
             CAST(SUM(CASE WHEN v_us IS NOT NULL AND p_us > v_us
               THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
             CASE WHEN SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) > 0
               THEN CAST(SUM(CASE WHEN v_us IS NOT NULL AND p_us > v_us
                      THEN 1 ELSE 0 END) AS BIGINT) * 1000000
                    // CAST(SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT)
             END AS cvr_ppm
      FROM per""",
    "win_rank_dense_row" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(RANK() OVER w AS INT) AS rnk, CAST(DENSE_RANK() OVER w AS INT) AS drnk, CAST(ROW_NUMBER() OVER w AS INT) AS rn
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, rn""",
    "win_topk_per_group" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal, rn FROM (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        FROM customer)
      WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "win_running_sum" -> """
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
      FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_sliding_frame" -> """
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3
      FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_range_frame" -> """
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                     RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum,
             COUNT(1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                     RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS range_cnt
      FROM orders ORDER BY o_custkey, o_totalprice, o_orderkey""",
    "win_lead_lag" -> """
      SELECT event_id, user_id, ts_us,
             LAG(ts_us, 1) OVER w AS prev_ts, LEAD(ts_us, 1) OVER w AS next_ts,
             ts_us - LAG(ts_us, 1) OVER w AS gap_us
      FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ORDER BY event_id""",
    "win_first_last_nth" -> """
      SELECT c_custkey, c_mktsegment,
             FIRST_VALUE(c_custkey) OVER w AS first_k,
             LAST_VALUE(c_custkey) OVER w AS last_k,
             NTH_VALUE(c_custkey, 3) OVER w AS third_k
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_custkey""",
    "win_ntile_pctrank" -> s"""
      SELECT c_custkey, c_mktsegment,
             CAST(NTILE(4) OVER w AS INT) AS tile,
             ${graft.Helpers.r6Sql("PERCENT_RANK() OVER w")} AS pr,
             ${graft.Helpers.r6Sql("CUME_DIST() OVER w")} AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey""",

    // HUGEINT trap: the windowed SUM is CAST AS BIGINT (r12 convention)
    "win_running_countd" -> """
      WITH f AS (SELECT o_orderpriority, o_custkey,
                        MIN(CAST(date_trunc('month', o_orderdate) AS DATE))
                          AS month
                 FROM orders GROUP BY 1, 2),
      m AS (SELECT o_orderpriority, month, COUNT(1) AS new_cust
            FROM f GROUP BY 1, 2)
      SELECT o_orderpriority, month, new_cust,
             CAST(SUM(new_cust) OVER (PARTITION BY o_orderpriority
               ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cust
      FROM m ORDER BY o_orderpriority, month""",

    "win_pattern_vshape" -> """
      WITH daily AS (SELECT o_orderdate AS day,
                            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                              AS BIGINT)) AS BIGINT) AS rev_c
                     FROM orders GROUP BY 1),
      l AS (SELECT day, rev_c,
                   LAG(rev_c, 2) OVER (ORDER BY day) AS r2,
                   LAG(rev_c, 1) OVER (ORDER BY day) AS r1,
                   LEAD(rev_c, 1) OVER (ORDER BY day) AS f1
            FROM daily)
      SELECT day, rev_c, r2 - rev_c AS depth_c, f1 - rev_c AS rebound_c
      FROM l
      WHERE r2 IS NOT NULL AND f1 IS NOT NULL
        AND r1 < r2 AND rev_c < r1 AND f1 > rev_c
      ORDER BY day""",
  )
}
