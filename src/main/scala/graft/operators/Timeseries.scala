package graft.operators

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.13 Time-series primitives over the `events` stream table (round 4).
  *
  * The reference repo is empty (SURVEY §0); these are the standard
  * time-series shapes a production events pipeline needs on top of the
  * §2.10 windowing ops: resample+gap-fill, sweep-line concurrency, EWMA
  * smoothing, and changelog→SCD2 interval building.
  *
  * All time math is integer epoch-micros (D4: `ts div 1000`); every op
  * carries a total output order (D1).
  *
  * Scale notes: each op is one or two shuffles on `user_id` and stays
  * fully distributed — the per-user window work partitions by key, and the
  * gap-fill grid is generated from a per-key span aggregate (never a
  * driver-side loop). At 100 TB the same plans hold: the only caveat is a
  * single user with a years-long span × fine grid (bounded here by the
  * hour granularity), and heavily skewed keys would reuse the §2.3
  * salting pattern.
  */
object Timeseries extends OpRegistry {

  private val usPerHour = 3600000000L
  /** Synthetic session length for the concurrency sweep: 30 minutes. */
  private val sessionUs = 1800000000L

  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("events").withColumn("ts_us", tsDivMicros(col("ts")))

  private def hourFloor(c: Column): Column =
    call_function("div", c, lit(usPerHour)) * usPerHour

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_gapfill" -> ((s, dir) => {
      // Resample to an hourly grid per user, filling missing hours with
      // zeros over each user's [first_hour, last_hour] span. The grid is
      // born distributed: sequence() explodes from a per-user span row,
      // so no driver materialization and no cross-key blowup — grid size
      // is sum over users of span-hours.
      val e = eventsUs(s, dir)
      val hourly = e
        .groupBy(col("user_id"), hourFloor(col("ts_us")).as("hour_us"))
        .agg(count(lit(1)).as("cnt"), decSumOut(col("value")).as("sum_value"))
      val grid = e.groupBy("user_id")
        .agg(hourFloor(min("ts_us")).as("min_h"), hourFloor(max("ts_us")).as("max_h"))
        .select(col("user_id"),
          explode(sequence(col("min_h"), col("max_h"), lit(usPerHour))).as("hour_us"))
      grid.join(hourly, Seq("user_id", "hour_us"), "left")
        .select(col("user_id"), col("hour_us"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("user_id", "hour_us")
    }),

    "events_concurrency" -> ((s, dir) => {
      // Sweep-line max-overlap: each event opens a 30-minute session;
      // +1/-1 deltas, running sum in event-time order, max per user.
      // Ordering (t, delta) puts closes before opens at the same instant,
      // so touching sessions do not overlap. The window keeps Spark's
      // default RANGE frame deliberately: peers (ties on t,delta) share
      // one running value, which makes the intermediate deterministic.
      val e = eventsUs(s, dir)
      val pts = e.select(col("user_id"), col("ts_us").as("t"), lit(1L).as("delta"))
        .unionAll(e.select(col("user_id"), (col("ts_us") + sessionUs).as("t"),
          lit(-1L).as("delta")))
      val run = pts.withColumn("run",
        sum("delta").over(Window.partitionBy("user_id").orderBy("t", "delta")))
      run
        .withColumn("mx", max("run").over(Window.partitionBy("user_id")))
        .filter(col("run") === col("mx"))
        .groupBy("user_id")
        .agg(max("mx").as("max_concurrent"), min("t").as("first_peak_us"))
        .orderBy("user_id")
    }),

    "events_ewma" -> ((s, dir) => {
      // Truncated EWMA (alpha = 1/2, 16-step history), normalized by the
      // realized weight mass. All arithmetic is EXACT dyadic-rational
      // double math — value scaled by 100 is integer-valued, weights are
      // powers of two, partial sums need < 53 mantissa bits — so the
      // result is bit-identical under ANY summation order, which is what
      // lets a window-HOF engine and the oracle's self-join agg agree.
      // One shuffle on user_id; history is rowsBetween-bounded (state
      // O(16) per row, no unbounded frame).
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-15, 0)
      eventsUs(s, dir)
        .withColumn("hist",
          collect_list(floor(col("value") * 100 + lit(0.5))).over(w))
        .withColumn("s", aggregate(
          reverse(col("hist")),
          struct(lit(0.0).as("s"), lit(1.0).as("w")),
          (acc, x) => struct(
            (acc("s") + acc("w") * x).as("s"),
            (acc("w") * lit(0.5)).as("w")),
          acc => acc("s")))
        .withColumn("wmass", lit(2.0) * (lit(1.0) - pow(lit(0.5), size(col("hist")))))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          r6(col("s") / (lit(100.0) * col("wmass"))).as("ewma"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "events_markov_transitions" -> ((s, dir) => {
      // First-order Markov transition matrix over event types: lag() pairs
      // each event with its per-user predecessor in time order, transitions
      // aggregate globally, and each row normalizes by its source-state
      // total to an integer ppm probability (no double accumulation).
      // Scale: one shuffle on user_id for the lag window (per-user streams,
      // state O(1) per row), then a partially-aggregated groupBy that
      // collapses to |types|² rows and a broadcast of the |types|-row
      // totals — every stage after the window is vocabulary-sized. The
      // per-state total intentionally comes from a tiny re-agg of the
      // transition matrix (not a second pass over events).
      val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val tr = eventsUs(s, dir)
        .withColumn("prev_type", lag("event_type", 1).over(ord))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n_trans"))
      val tot = tr.groupBy("prev_type").agg(sum("n_trans").as("n_from"))
      tr.join(broadcast(tot), Seq("prev_type"))
        .select(col("prev_type"), col("event_type"), col("n_trans"), col("n_from"),
          call_function("div", col("n_trans") * lit(1000000L), col("n_from"))
            .as("p_ppm"))
        .orderBy("prev_type", "event_type")
    }),

    "events_attribution_last_touch" -> ((s, dir) => {
      // Last-touch attribution: each purchase is credited to the user's
      // most recent click no older than 24h. A single running window per
      // user carries the latest click (event_id, ts) forward via
      // last(ignoreNulls) over an explicit ROWS frame — no self-join, no
      // as-of shuffle beyond the one user_id exchange, and the running
      // last is O(1) state per row at any history length. The age guard
      // then nulls out stale credits. Orders by (ts, event_id) so a click
      // at the same instant with a smaller id attributes deterministically.
      val attrUs = 86400000000L // 24h lookback
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fresh = col("click_ts").isNotNull &&
        col("ts_us") - col("click_ts") <= attrUs
      eventsUs(s, dir)
        .withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts_us")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(fresh, col("click_id")).as("click_event_id"),
          when(fresh, col("ts_us") - col("click_ts")).as("gap_us"),
          fresh.cast("int").as("attributed"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "scd2_type_history" -> ((s, dir) => {
      // Changelog → SCD2: collapse consecutive same-type runs per user
      // (gaps-and-islands change capture), then build [valid_from,
      // valid_to) intervals with lead(); the open row is is_current.
      // This is the standard dimension-history build: two window passes
      // over ONE user_id exchange (same order key, so Catalyst reuses
      // the sort), no self-join.
      val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val e = eventsUs(s, dir)
        .withColumn("prev_type", lag("event_type", 1).over(ord))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us").as("valid_from_us"))
      val ord2 = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
      e.withColumn("valid_to_us", lead("valid_from_us", 1).over(ord2))
        .withColumn("is_current", col("valid_to_us").isNull.cast("int"))
        .orderBy("user_id", "valid_from_us", "event_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "events_gapfill" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS ts_us, value FROM events),
      hourly AS (
        SELECT user_id, (ts_us//3600000000)*3600000000 AS hour_us,
               COUNT(1) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM e GROUP BY 1, 2),
      spans AS (
        SELECT user_id, (MIN(ts_us)//3600000000)*3600000000 AS min_h,
               (MAX(ts_us)//3600000000)*3600000000 AS max_h
        FROM e GROUP BY 1),
      grid AS (
        SELECT user_id, unnest(generate_series(min_h, max_h, 3600000000)) AS hour_us
        FROM spans)
      SELECT g.user_id, g.hour_us,
             COALESCE(h.cnt, 0) AS cnt,
             COALESCE(h.sum_value, 0.0) AS sum_value
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.hour_us = h.hour_us
      ORDER BY g.user_id, g.hour_us""",

    "events_concurrency" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS ts_us FROM events),
      pts AS (
        SELECT user_id, ts_us AS t, CAST(1 AS BIGINT) AS delta FROM e
        UNION ALL
        SELECT user_id, ts_us + 1800000000 AS t, CAST(-1 AS BIGINT) AS delta FROM e),
      run AS (
        SELECT user_id, t, delta,
               SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta) AS run
        FROM pts),
      mx AS (
        SELECT user_id, t, run, MAX(run) OVER (PARTITION BY user_id) AS mx
        FROM run)
      SELECT user_id, CAST(MAX(mx) AS BIGINT) AS max_concurrent,
             MIN(t) AS first_peak_us
      FROM mx WHERE run = mx
      GROUP BY user_id ORDER BY user_id""",

    "events_ewma" -> """
      WITH e AS (
        SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
               floor(value * 100 + 0.5) AS v100,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts)//1000, event_id) AS rn
        FROM events)
      SELECT a.user_id, a.event_id, a.ts_us,
             floor((SUM(pow(0.5, a.rn - b.rn) * b.v100)
                    / (100.0 * 2.0 * (1.0 - pow(0.5, COUNT(1)))))
                   * 1000000 + 0.5) / 1000000 AS ewma
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn
      GROUP BY a.user_id, a.event_id, a.ts_us
      ORDER BY a.user_id, a.ts_us, a.event_id""",

    "events_markov_transitions" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts)//1000 AS ts_us FROM events),
      p AS (SELECT user_id, event_type,
              LAG(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS prev_type
            FROM e),
      tr AS (SELECT prev_type, event_type, COUNT(1) AS n_trans
             FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
              FROM tr GROUP BY 1)
      SELECT tr.prev_type, tr.event_type, tr.n_trans, tot.n_from,
             (tr.n_trans * 1000000) // tot.n_from AS p_ppm
      FROM tr JOIN tot ON tr.prev_type = tot.prev_type
      ORDER BY tr.prev_type, tr.event_type""",

    "events_attribution_last_touch" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts)//1000 AS ts_us FROM events),
      c AS (SELECT event_id, user_id, event_type, ts_us,
              LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS click_id,
              LAST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS click_ts
            FROM e)
      SELECT event_id, user_id, ts_us,
             CASE WHEN click_ts IS NOT NULL AND ts_us - click_ts <= 86400000000
                  THEN click_id END AS click_event_id,
             CASE WHEN click_ts IS NOT NULL AND ts_us - click_ts <= 86400000000
                  THEN ts_us - click_ts END AS gap_us,
             CAST(COALESCE(click_ts IS NOT NULL
                           AND ts_us - click_ts <= 86400000000, FALSE) AS INT)
               AS attributed
      FROM c WHERE event_type = 'purchase'
      ORDER BY user_id, ts_us, event_id""",

    "scd2_type_history" -> """
      WITH e AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS ts_us,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ns(ts)//1000, event_id) AS prev_type
        FROM events),
      c AS (
        SELECT user_id, event_id, event_type, ts_us AS valid_from_us
        FROM e WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, event_id, event_type, valid_from_us,
             LEAD(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY valid_from_us, event_id) AS valid_to_us,
             CAST(LEAD(valid_from_us) OVER (PARTITION BY user_id
                   ORDER BY valid_from_us, event_id) IS NULL AS INT) AS is_current
      FROM c ORDER BY user_id, valid_from_us, event_id""",
  )
}
