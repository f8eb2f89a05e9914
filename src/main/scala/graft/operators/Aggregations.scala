package graft.operators

import graft.{Helpers, OpRegistry, Tables}
import graft.Helpers._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}

/** §2.4 Aggregations. All money sums follow D2 (decimal(38,6)); output is
  * totally ordered (D1). Partial/final 2-phase aggregation, hash->sort
  * fallback and spill are Spark physical properties we rely on (§4).
  */
object Aggregations extends OpRegistry {

  /** Typed UDAF (§2.12): exact Σx² as decimal via java BigDecimal buffer.
    * BigDecimal.valueOf(double) uses the shortest decimal representation, so
    * 1-decimal quantities square to exact 2-decimal products. */
  class SumSqAgg extends Aggregator[java.lang.Double, java.math.BigDecimal, java.math.BigDecimal] {
    import java.math.BigDecimal
    def zero: BigDecimal = BigDecimal.ZERO
    def reduce(b: BigDecimal, a: java.lang.Double): BigDecimal =
      if (a == null) b
      else { val d = BigDecimal.valueOf(a.doubleValue); b.add(d.multiply(d)) }
    def merge(b1: BigDecimal, b2: BigDecimal): BigDecimal = b1.add(b2)
    def finish(r: BigDecimal): BigDecimal = r
    def bufferEncoder = org.apache.spark.sql.Encoders.DECIMAL
    def outputEncoder = org.apache.spark.sql.Encoders.DECIMAL
  }

  /** Exact order statistics by two-pass distributed selection (round 12;
    * the r11 probe measured the old per-group row_number window — 5
    * near-table-sized single-task sorts — at 22.6× wall on 100× orders).
    * The value histogram recipe (med2ByType) does not apply here: money
    * values are near-continuous, so the histogram IS the table. Instead:
    * pass 1 bins each group into ≤65536 equi-width cells over its exact
    * integer (centi-unit) image, cumulates the CELL counts (a
    * ≤65536-row-per-group window — bounded at any table size), and
    * locates, for each target rank, the unique cell with lo < rank ≤ cum;
    * pass 2 sorts ONLY the target cells' rows (n/65536 rows per cell in
    * expectation) to pick the exact in-cell rank. Every stage is
    * partitioned; the only windows run over cell counts or single-cell
    * row sets. Ties are safe: equal values share a cell and any in-cell
    * peer order selects the same value. Exactness needs cents↔value to be
    * 1:1 and monotone — true for 2-decimal money under
    * floor(v·100 + 0.5).
    *
    * @param df    (grp, v, c) — c = exact integer image of v
    * @param ranks (name, n → target rank), 1-based, 1 ≤ rank ≤ n
    * @return one row per (grp, name): grp, name, n, v-at-rank
    */
  private def valueAtRanks(df: DataFrame, grp: String,
                           ranks: Seq[(String, Column => Column)]): DataFrame = {
    val per = df.groupBy(grp).agg(count(lit(1)).as("n"),
      min("c").as("cmin"), max("c").as("cmax"))
      .withColumn("cw", greatest(lit(1L),
        call_function("div", col("cmax") - col("cmin") + 1, lit(65536L)) + 1))
    val binned = df.join(broadcast(per.select(col(grp), col("cmin"), col("cw"))), grp)
      .withColumn("cell", call_function("div", col("c") - col("cmin"), col("cw")))
    val wCum = Window.partitionBy(grp).orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = binned.groupBy(grp, "cell").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("lo", col("cum") - col("cnt"))
    val targets = per.select(Seq(col(grp), col("n")) ++ ranks.map {
      case (name, rk) => rk(col("n")).as(s"rk_$name") }: _*)
      .select(col(grp), col("n"), explode(map(ranks.flatMap {
        case (name, _) => Seq(lit(name), col(s"rk_$name")) }: _*))
        .as(Seq("name", "rk")))
    // locate: lo < rk <= cum picks exactly one cell per (grp, name)
    val located = targets.join(cells, Seq(grp))
      .filter(col("lo") < col("rk") && col("rk") <= col("cum"))
      .select(col(grp), col("name"), col("n"), col("cell"),
        (col("rk") - col("lo")).as("in_cell_rk"))
    val wCell = Window.partitionBy(grp, "name").orderBy("c")
    binned.join(broadcast(located), Seq(grp, "cell"))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") === col("in_cell_rk"))
      .select(col(grp), col("name"), col("n"), col("v"))
  }

  /** Orders keyed for the selection family: centi-unit image of
    * o_totalprice (exact for 2-decimal money). */
  private def pricedOrders(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice").as("v"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing_summary" -> ((s, dir) => {
      val l = t(s, dir)("lineitem")
      l.filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSumOut(col("l_quantity")).as("sum_qty"),
          decSumOut(col("l_extendedprice")).as("sum_base_price"),
          decSumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          decSumOut(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "agg_weighted_avg" -> ((s, dir) => {
      // Quantity-weighted average price per return flag: both moments
      // accumulate as exact DECIMAL(38,6) (order-independent), the ratio
      // is ONE double division at the output boundary under the safe
      // rounding formula (D3) — never avg(double) and never a per-row
      // division, so partial/final aggregation and any merge order give
      // the identical result.
      val l = t(s, dir)("lineitem")
      l.groupBy("l_returnflag")
        .agg(
          sum(dec(col("l_extendedprice") * col("l_quantity"))).as("wsum_dec"),
          sum(dec(col("l_quantity"))).as("qty_dec"),
          count(lit(1)).as("n_lines"))
        .select(col("l_returnflag"),
          col("wsum_dec").cast("double").as("weighted_sum"),
          col("qty_dec").cast("double").as("qty_sum"),
          r6(col("wsum_dec").cast("double") / col("qty_dec").cast("double"))
            .as("wavg_price"),
          col("n_lines"))
        .orderBy("l_returnflag")
    }),
    "agg_geometric_mean" -> ((s, dir) => {
      // Geometric mean of order totals per priority, in the project's
      // log-domain integer recipe: each ln(price) floor-quantizes to
      // integer micro-nats IMMEDIATELY (the D-rule the LM ops use), the
      // per-group accumulation is an exact long sum (order-independent
      // under partial/final merge), and ONE exp + safe round happens at
      // the output boundary. Residual: ln/exp are libm (not correctly
      // rounded) — same acknowledged 1-ULP-at-the-.5-boundary caveat as
      // docs_lm_quality_filter; r6 absorbs anything smaller.
      t(s, dir)("orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(floor(log(col("o_totalprice")) * lit(1e6)).cast("long")).as("lnsum_micro"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderpriority"), col("n_orders"),
          r6(exp(col("lnsum_micro").cast("double") / lit(1e6) / col("n_orders")))
            .as("geo_mean"))
        .orderBy("o_orderpriority")
    }),
    "agg_groupby_multi" -> ((s, dir) => {
      t(s, dir)("orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), decSumOut(col("o_totalprice")).as("sum_total"))
        .orderBy("o_orderpriority", "o_orderstatus")
    }),
    "agg_having" -> ((s, dir) => {
      t(s, dir)("orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), decSumOut(col("o_totalprice")).as("sum_total"))
        .filter(col("cnt") >= 12)
        .orderBy("o_custkey")
    }),
    "agg_distinct_count" -> ((s, dir) => {
      t(s, dir)("orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("distinct_cust"), count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),
    "agg_multi_distinct" -> ((s, dir) => {
      t(s, dir)("orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("d_cust"),
          countDistinct(col("o_orderdate")).as("d_dates"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    }),
    "agg_rollup" -> ((s, dir) => {
      // DataFrame .rollup after a multi-join trips Spark's ambiguous-self-join
      // detection on the Expand-duplicated grouping attrs; the SQL form
      // resolves cleanly and produces the identical plan.
      Seq("region", "nation", "customer")
        .foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT r_name, n_name, count(1) AS cnt,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal,
               CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n
        FROM region JOIN nation ON r_regionkey = n_regionkey
                    JOIN customer ON n_nationkey = c_nationkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    }),
    "agg_cube" -> ((s, dir) => {
      t(s, dir)("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), decSumOut(col("o_totalprice")).as("sum_total"),
          grouping(col("o_orderstatus")).cast("int").as("g_s"), grouping(col("o_orderpriority")).cast("int").as("g_p"))
        .orderBy(col("g_s"), col("g_p"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(1) AS cnt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total,
               CAST(grouping(o_orderstatus) AS INT) AS g_s, CAST(grouping(o_orderpriority) AS INT) AS g_p
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY g_s, g_p,
                 o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    }),
    "agg_minmax_stats" -> ((s, dir) => {
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),
    "agg_sorted_collect" -> ((s, dir) => {
      // Output serialized as CSV text: the driver's pandas comparator cannot
      // sort/hash raw list columns (VERDICT r1 #4) — int64 -> string is
      // dialect-free so the join of both sides stays exact.
      t(s, dir)("orders")
        .groupBy("o_custkey")
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("order_keys"))
        .orderBy("o_custkey")
    }),
    "agg_approx_distinct" -> ((s, dir) => {
      // No oracle (HLL implementations differ per engine); paired unit test
      // asserts within 5% of exact. Rows-only driver check.
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),
    "agg_hll_custom" -> ((s, dir) =>
      // Custom mergeable HLL sketch (graft.functions.HllDistinct, a
      // TypedImperativeAggregate): per-partition 4 KB register arrays merge
      // by element-wise max through Spark's partial/final path. No oracle
      // (sketch is built on Spark-private xxhash64); ExpressionSpec asserts
      // ±5% of exact and partitioning-invariance.
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(graft.functions.GraftExpressions.hllDistinct(s, col("l_partkey")).as("hll_parts"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),
    "agg_udaf_sumsq" -> ((s, dir) => {
      val sumsq = udaf(new SumSqAgg)
      t(s, dir)("lineitem")
        .agg(dec(sumsq(col("l_quantity"))).cast("double").as("sum_sq"), count(lit(1)).as("cnt"))
    }),
    "agg_pivot_status" -> ((s, dir) => {
      // Pivot with a PINNED value list (never inferred — inference is a
      // full distinct scan AND makes the schema data-dependent at 100 TB).
      // Missing combinations surface as 0 (coalesce) to match COUNT FILTER.
      t(s, dir)("orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    }),
    "agg_unpivot" -> ((s, dir) => {
      // Wide->long reshaping via Dataset.unpivot (melt); values unified to
      // DOUBLE (unpivot requires a common type).
      t(s, dir)("orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("price"),
          col("o_custkey").cast("double").as("cust"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("price"), col("cust")), "metric", "value")
        .orderBy("o_orderkey", "metric")
    }),
    "agg_corr_covar" -> ((s, dir) => {
      // Distributed two-variable statistics (Pearson corr, sample covar,
      // stddev) from EXACT integer moment sums. Built-in corr()/covar_samp()
      // fold doubles in partition order — non-deterministic across engines
      // and plans — so instead the five moments are accumulated as exact
      // cent-quantized sums (BIGINT products, DECIMAL(38,0) sums: y² ≈ 1e14
      // per row fits int64, but the 600k-row SUM would overflow it), and the
      // double arithmetic runs once per group on those exact scalars.
      // Scale shape: one partial+final hash aggregate, 6 buffers, no extra
      // shuffle — the moment-sum trick is exactly how distributed stats
      // engines keep reducers mergeable.
      import org.apache.spark.sql.types.DecimalType
      val d = DecimalType(38, 0)
      val g = t(s, dir)("lineitem")
        .select(col("l_returnflag"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(d)).cast("double").as("sx"),
          sum(col("y").cast(d)).cast("double").as("sy"),
          sum((col("x") * col("x")).cast(d)).cast("double").as("sxx"),
          sum((col("y") * col("y")).cast(d)).cast("double").as("syy"),
          sum((col("x") * col("y")).cast(d)).cast("double").as("sxy"))
      val nD = col("n").cast("double")
      g.select(col("l_returnflag"), col("n"),
          r6((nD * col("sxy") - col("sx") * col("sy")) /
            sqrt((nD * col("sxx") - col("sx") * col("sx"))
              * (nD * col("syy") - col("sy") * col("sy")))).as("corr6"),
          r6((col("sxy") - col("sx") * col("sy") / nD) / (nD - 1) / lit(1e4)).as("covar6"),
          r6(sqrt((nD * col("sxx") - col("sx") * col("sx")) / (nD * (nD - 1))) / lit(100.0))
            .as("stddev_qty6"))
        .orderBy("l_returnflag")
    }),
    "agg_skew_kurt" -> ((s, dir) => {
      // Higher-moment statistics (round 12): per-flag skewness and excess
      // kurtosis of l_quantity from EXACT integer power sums — the same
      // mergeable-moments discipline as agg_corr_covar, extended to S3/S4.
      // The central-moment NUMERATORS are fully integer (no float mean):
      //   m2n = n·S2 − S1²
      //   m3n = n²·S3 − 3n·S1·S2 + 2·S1³
      //   m4n = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴
      // so the exact columns are dialect-proof; skew6/kurt6 are display
      // ratios computed once per group from those exact scalars (r6).
      // Bound: with x ≤ 50 (raw quantity units, integral in TPC-H), the
      // dominant term 3·S1⁴ stays under DECIMAL(38,0)'s ~1e38 up to
      // S1 ≈ 1.3e9, i.e. ~2.6e7 rows per flag group — past that, rescale
      // the quantization (NOT centi units, which cap at ~2.6e5 rows).
      // One partial+final hash aggregate, 5 buffers, no extra shuffle.
      import org.apache.spark.sql.types.DecimalType
      val d = DecimalType(38, 0)
      val g = t(s, dir)("lineitem")
        .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("x"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(d)).as("s1"),
          sum((col("x") * col("x")).cast(d)).as("s2"),
          sum((col("x") * col("x") * col("x")).cast(d)).as("s3"),
          sum((col("x") * col("x") * col("x") * col("x")).cast(d)).as("s4"))
      val (n, s1, s2, s3, s4) =
        (col("n").cast(d), col("s1"), col("s2"), col("s3"), col("s4"))
      val m2n = (n * s2 - s1 * s1).cast(d)
      val m3n = (n * n * s3 - lit(3) * n * s1 * s2 + lit(2) * s1 * s1 * s1).cast(d)
      val m4n = (n * n * n * s4 - lit(4) * n * n * s1 * s3
        + lit(6) * n * s1 * s1 * s2 - lit(3) * s1 * s1 * s1 * s1).cast(d)
      g.select(col("l_returnflag"), col("n"),
          s1.cast("long").as("sum_qty"),
          m2n.cast("double").as("m2_num"),
          m3n.cast("double").as("m3_num"),
          m4n.cast("double").as("m4_num"),
          // the n powers inside the numerators cancel those of the m2
          // denominator exactly, so the dimensionless forms are
          // m3n/m2n^1.5 and m4n/m2n² − 3; m2^1.5 as m2·sqrt(m2) because
          // sqrt is IEEE-correctly-rounded in both engines, pow() is not
          // (same determinism reasoning as corr6)
          r6(m3n.cast("double")
            / (m2n.cast("double") * sqrt(m2n.cast("double")))).as("skew6"),
          r6(m4n.cast("double")
            / (m2n.cast("double") * m2n.cast("double")) - lit(3.0)).as("kurt6"))
        .orderBy("l_returnflag")
    }),

    "agg_histogram" -> ((s, dir) => {
      // Equi-width numeric histogram (round 11) — the profiling
      // primitive behind every "distribution at a glance" panel.
      // All-integer bucketing (engine round()/width_bucket boundary
      // semantics differ; integers cannot): centi-quantized price c,
      // bounds from ONE global agg (a 3-value broadcast frame),
      // bucket = ((c − lo)·20) div (hi − lo + 1) ∈ [0, 20). Two passes
      // over the fact (bounds, then bucket counts), both partial+final
      // aggregates — the shape that holds at any fact size.
      val e = t(s, dir)("lineitem")
        .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("c"))
      val bounds = e.agg(min("c").as("lo"), max("c").as("hi"),
        count(lit(1)).as("total"))
      e.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          call_function("div", (col("c") - col("lo")) * 20,
            col("hi") - col("lo") + 1))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), min("c").as("min_centi"),
          max("c").as("max_centi"), max("lo").as("lo"), max("hi").as("hi"),
          max("total").as("total"))
        .select(col("bucket"),
          (col("lo") + call_function("div",
            col("bucket") * (col("hi") - col("lo") + 1), lit(20L)))
            .as("bucket_lo_centi"),
          col("n_rows"), col("min_centi"), col("max_centi"),
          call_function("div", col("n_rows") * lit(1000000L), col("total"))
            .as("share_ppm"))
        .orderBy("bucket")
    }),

    "agg_mode" -> ((s, dir) => {
      // Deterministic mode (most frequent o_orderstatus per priority):
      // count + rank window with an explicit (cnt desc, status asc)
      // tie-break instead of engine mode() — whose tie choice is
      // implementation-defined and differs between engines.
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("cnt").desc, col("o_orderstatus"))
      t(s, dir)("orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"), col("cnt"))
        .orderBy("o_orderpriority")
    }),
    "agg_median" -> ((s, dir) => {
      // Exact median as the (lo, hi) middle-value pair — no interpolation
      // arithmetic, so no cross-engine float divergence (SURVEY §7.4.3).
      // Scale shape (round 12): two-pass distributed selection via
      // valueAtRanks — the old per-priority row_number window was 5
      // near-table-sized single-task sorts, 22.6× wall at the 100× probe.
      val stats = valueAtRanks(pricedOrders(s, dir), "o_orderpriority", Seq(
        "mid_lo" -> (n => call_function("div", n + 1, lit(2L))),
        "mid_hi" -> (n => call_function("div", n, lit(2L)) + 1)))
      stats.groupBy("o_orderpriority")
        .agg(max("n").as("cnt"),
          max(when(col("name") === "mid_lo", col("v"))).as("mid_lo"),
          max(when(col("name") === "mid_hi", col("v"))).as("mid_hi"))
        .orderBy("o_orderpriority")
    }),

    "agg_percentile_interp" -> ((s, dir) => {
      // percentile_cont semantics — the INTERPOLATED percentile family
      // (agg_median ships the lo/hi pair, agg_percentiles_exact the disc
      // boundary value; BI tools want cont): pos = 1 + p(n−1)/100, result
      // = lo + (hi − lo)·frac. Never an engine quantile_cont builtin —
      // their interpolation conventions differ at the edges — both
      // engines replay the SAME first-principles recipe: ranks and the
      // fractional numerator are ALL-INTEGER ((n−1)p div/mod 100 — a
      // double pos flips on rounding at e.g. n=15000, integers cannot),
      // and the one interpolation is a fixed left-assoc IEEE sequence
      // from exact inputs. Scale: the same two-pass distributed selection
      // as agg_median (valueAtRanks) — never a per-group row sort.
      def posLo(p: Int) = (n: Column) =>
        lit(1L) + call_function("div", (n - 1) * lit(p.toLong), lit(100L))
      def posHi(p: Int) = (n: Column) =>
        posLo(p)(n) +
          when(((n - 1) * lit(p.toLong)) % 100 > 0, lit(1L)).otherwise(lit(0L))
      val ps = Seq(50, 90, 99)
      val stats = valueAtRanks(pricedOrders(s, dir), "o_orderpriority",
        ps.flatMap(p => Seq(s"lo_$p" -> posLo(p), s"hi_$p" -> posHi(p))))
      val aggs = ps.flatMap(p => Seq(
        max(when(col("name") === s"lo_$p", col("v"))).as(s"lo_$p"),
        max(when(col("name") === s"hi_$p", col("v"))).as(s"hi_$p")))
      val piv = stats.groupBy("o_orderpriority")
        .agg(max("n").as("n_rows"), aggs: _*)
      def interp(p: Int): Column =
        col(s"lo_$p") + (col(s"hi_$p") - col(s"lo_$p")) *
          (((col("n_rows") - 1) * lit(p.toLong)) % 100).cast("double") / lit(100.0)
      piv.select(col("o_orderpriority"), col("n_rows"),
          interp(50).as("p50c"), interp(90).as("p90c"), interp(99).as("p99c"))
        .orderBy("o_orderpriority")
    }),

    "agg_percentiles_exact" -> ((s, dir) => {
      // Exact p50/p90/p99 per group by the rank recipe (percentile_disc
      // semantics): the value at row ceil(p·n/100) of the per-group sort.
      // The boundary rank is ALL-INTEGER — (n·p + 99) div 100 — because
      // ceil(n * 0.9) in doubles flips at e.g. n=15000 (13500.000…02 →
      // 13501) on a rounding difference; integer math cannot. Boundary-
      // peer ties are harmless: equal values at the boundary rank select
      // the same VALUE regardless of peer order. Scale shape (round 12):
      // two-pass distributed selection via valueAtRanks — see agg_median.
      def rk(p: Int) = (n: Column) =>
        call_function("div", n * lit(p.toLong) + lit(99L), lit(100L))
      val stats = valueAtRanks(pricedOrders(s, dir), "o_orderpriority",
        Seq("p50" -> rk(50), "p90" -> rk(90), "p99" -> rk(99)))
      stats.groupBy("o_orderpriority")
        .agg(max("n").as("n_rows"),
          max(when(col("name") === "p50", col("v"))).as("p50"),
          max(when(col("name") === "p90", col("v"))).as("p90"),
          max(when(col("name") === "p99", col("v"))).as("p99"))
        .orderBy("o_orderpriority")
    }),

    "agg_approx_quantile" -> ((s, dir) =>
      // Approximate quantiles (Greenwald-Khanna style sketch): the
      // mergeable, bounded-memory path for percentiles over 100 TB —
      // exact percentile_disc needs a full sort per group; this holds an
      // ε-approximate summary per partition and merges. Self-verified
      // (sketch internals are engine-specific; Round4Spec asserts the
      // rank-error contract against the exact quantiles).
      t(s, dir)("orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("o_totalprice"), lit(0.25), lit(10000)).as("q25"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("q50"),
          percentile_approx(col("o_totalprice"), lit(0.75), lit(10000)).as("q75"))
        .orderBy("o_orderpriority")),

    "agg_bool" -> ((s, dir) =>
      // Boolean aggregate surface (every/any): per status, do ALL orders
      // clear $1000, does ANY clear $400k, plus the witness count. Emitted
      // as INT (a bool column round-trips differently through the two
      // engines' pandas bridges).
      t(s, dir)("orders")
        .groupBy("o_orderstatus")
        .agg(bool_and(col("o_totalprice") > 1000.0).cast("int").as("all_over_1k"),
          bool_or(col("o_totalprice") > 400000.0).cast("int").as("any_over_400k"),
          sum(when(col("o_totalprice") > 400000.0, 1L).otherwise(0L)).as("n_over_400k"))
        .orderBy("o_orderstatus")),

    "agg_string_agg" -> ((s, dir) =>
      // Ordered set-valued aggregation emitted as ONE STRING (D7: the
      // comparator cannot hash arrays) — the listagg/string_agg surface.
      // array_sort(collect_set) pins the element order deterministically;
      // map-side partial collect_set keeps the shuffle small (distinct
      // priorities per status ≤ 5 regardless of SF).
      t(s, dir)("orders")
        .groupBy("o_orderstatus")
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority")))).as("priorities"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    "agg_listagg_ordered" -> ((s, dir) =>
      // Event-sequence compression: per customer, order statuses
      // concatenated in (date, orderkey) order — the funnel-mining /
      // session-path primitive. Sorting structs inside the aggregated
      // array (not relying on collect_list input order, which Spark does
      // NOT guarantee across shuffles) is what makes it deterministic on
      // a real cluster.
      t(s, dir)("orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          concat_ws("", transform(
            array_sort(collect_list(struct(col("o_orderdate"), col("o_orderkey"),
              col("o_orderstatus")))),
            x => x.getField("o_orderstatus"))).as("status_seq"))
        .orderBy("o_custkey")),

    "agg_weighted_median" -> ((s, dir) => {
      // Exact WEIGHTED median (round 13): the revenue-weighted median
      // order quantity per return flag — "at what order size does the
      // money sit?", the weighted order statistic plain medians can't
      // answer (a million $1 lines must not outvote one $1M line).
      // The (lo+hi)-at-2×-scale recipe generalized to weight ranks:
      // lo = min value whose CUMULATIVE WEIGHT reaches (W+1) div 2, hi
      // likewise at W div 2 + 1 — all-integer (weights are exact price
      // centi-units), no interpolation, no float rank. Scale shape: the
      // cumulating window runs over the (flag × quantity) VALUE HISTOGRAM
      // — quantity's 1..50 integer domain bounds it at 150 rows
      // regardless of corpus size (the med2ByType discipline; a weighted
      // median over an unbounded domain would need the valueAtRanks
      // two-pass selection instead). Long-bound: Σw ≈ 3e12 centi at
      // sf0.1, < 2^63 through 1e5× growth.
      val e = t(s, dir)("lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("w"))
      val hist = e.groupBy("l_returnflag", "q").agg(sum("w").as("cw"))
      val wv = Window.partitionBy("l_returnflag").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("l_returnflag")
      hist.withColumn("cum", sum("cw").over(wv))
        .withColumn("wtot", sum("cw").over(wn))
        .groupBy("l_returnflag")
        .agg(max("wtot").as("w_total"),
          (min(when(col("cum") >= call_function("div", col("wtot") + 1, lit(2L)),
            col("q"))) +
            min(when(col("cum") >= call_function("div", col("wtot"), lit(2L)) + 1,
              col("q")))).as("med2x"))
        .select(col("l_returnflag"), col("w_total"), col("med2x"),
          r6(col("med2x").cast("double") / lit(2.0)).as("wmedian6"))
        .orderBy("l_returnflag")
    }),

    "agg_regression" -> ((s, dir) => {
      // Per-group least-squares regression (round 13) — the ANSI regr_*
      // family (slope / intercept / R²) as one mergeable aggregate: per
      // event type, regress the centi-quantized value on the day index.
      // Built-in regr_slope folds doubles in partition order, so the five
      // moments accumulate as EXACT integers instead (the agg_corr_covar
      // discipline): x = day − min(day) (the 1-row min broadcasts; small
      // x keeps every product far from the decimal boundary), y = centi
      // value; Σx, Σy, Σxx, Σyy, Σxy in DECIMAL(38,0) (HUGEINT in the
      // DuckDB twin). The correlation numerators n·Σxy − ΣxΣy etc. are
      // exact 128-bit integers emitted as DOUBLE — NOT BIGINT: the
      // n-scaled variance numerator is n²σ², which overflowed int64 at
      // the 100× probe's 2M-rows-per-group (3.3e19), while the
      // decimal→double cast is correctly rounded (nearest-even) in BOTH
      // engines, so identical exact integers produce bit-identical
      // doubles at any magnitude. slope/intercept/R² are one fixed IEEE
      // sequence from those exact scalars with r6 at the boundary (and a
      // vx>0 zero-variance guard). Scale shape: one
      // partial+final hash aggregate over the scan, 6 buffers, no extra
      // shuffle — the mergeable-moment form every distributed stats
      // engine uses for regression at scale.
      import org.apache.spark.sql.types.DecimalType
      val dd = DecimalType(38, 0)
      val usPerDay = 86400000000L
      val ev = t(s, dir)("events").select(col("event_type"),
        call_function("div",
          call_function("div", col("ts"), lit(1000L)), lit(usPerDay)).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("y"))
      val day0 = ev.agg(min("day").as("day0"))
      val g = ev.crossJoin(broadcast(day0))
        .withColumn("x", col("day") - col("day0"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dd)).as("sx"),
          sum(col("y").cast(dd)).as("sy"),
          sum((col("x") * col("x")).cast(dd)).as("sxx"),
          sum((col("y") * col("y")).cast(dd)).as("syy"),
          sum((col("x") * col("y")).cast(dd)).as("sxy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      val covD = cov.cast("double"); val vxD = vx.cast("double")
      g.select(col("event_type"), col("n"),
          cov.cast("double").as("cov_num"),
          vx.cast("double").as("vx_num"),
          vy.cast("double").as("vy_num"),
          // slope in value-units/day: the centi y scale divides out once
          when(vx > 0, r6(covD / vxD / lit(100.0))).as("slope6"),
          when(vx > 0, r6((col("sy").cast("double") - covD / vxD
            * col("sx").cast("double")) / col("n").cast("double") / lit(100.0)))
            .as("intercept6"),
          when(vx > 0 && vy > 0,
            r6(covD * covD / (vxD * vy.cast("double")))).as("r2_6"))
        .orderBy("event_type")
    }),

    "agg_bitmap_distinct" -> ((s, dir) => {
      // Bitmap exact-distinct (round 12): monthly distinct customers via
      // Spark's two-level bitmap aggregation — the scale path for EXACT
      // count-distinct. COUNT(DISTINCT) makes the shuffle carry every
      // distinct (month, custkey) value; here each key hashes to a
      // (bucket, bit) and the shuffle carries at most one ≤4 KB bitmap
      // per (month, bucket) cell, built map-side by bitmap_construct_agg's
      // partial aggregation — cardinality-independent row width, exact
      // answer (contrast agg_approx_distinct, which trades exactness for
      // one fixed-size HLL sketch per group). The month total is the sum
      // of disjoint per-bucket popcounts, so no merge step is needed; on
      // ids denser than 32k/bucket the same plan holds (more cells, same
      // bound per cell).
      t(s, dir)("orders")
        .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_custkey"))
        .select(col("month"),
          expr("bitmap_bucket_number(o_custkey)").as("bkt"),
          expr("bitmap_bit_position(o_custkey)").as("pos"))
        .groupBy("month", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"), count(lit(1)).as("c"))
        .groupBy("month")
        .agg(sum(expr("bitmap_count(bm)")).as("n_cust"),
          sum(col("c")).as("n_orders"))
        .orderBy("month")
    }),

    "agg_arg_extremes" -> ((s, dir) => {
      // max_by / min_by (argmax aggregation, round 14): per nation, WHICH
      // customer holds the extreme account balance — the "top entity per
      // group" primitive without a window pass. Determinism on balance
      // ties comes from the ordering VALUE being a (cents, custkey)
      // struct: Spark compares structs lexicographically, so the order is
      // total and the winner unique. One partial+final hash aggregate with
      // a 2-field accumulator per direction — where the row_number
      // formulation (the oracle twin) shuffles AND sorts every customer
      // row, this shuffles one candidate per (partition, nation). At
      // 100 TB that asymmetry is the whole ballgame for "top per group".
      val c = t(s, dir)("customer")
        .select(col("c_nationkey").cast("long").as("nation"), col("c_custkey"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("cents"))
      c.groupBy("nation")
        .agg(count(lit(1)).as("n_cust"),
          max_by(col("c_custkey"), struct(col("cents"), col("c_custkey")))
            .as("rich_cust"),
          max(col("cents")).as("rich_cents"),
          min_by(col("c_custkey"), struct(col("cents"), col("c_custkey")))
            .as("poor_cust"),
          min(col("cents")).as("poor_cents"))
        .orderBy("nation")
    }),

    "agg_bit_ops" -> ((s, dir) => {
      // Bitwise aggregates (round 14): bit_and / bit_or / bit_xor folds of
      // the partkey set per return flag — the fixed-width reductions used
      // for permission masks, feature-flag unions, and XOR-checksum
      // reconciliation (the xor of a key multiset detects a single
      // missing/duplicated element across two copies of a table in one
      // scan each). All three are associative AND commutative, so Spark
      // runs them partial+final with 8-byte accumulators — shuffle traffic
      // is one long per (partition, group) regardless of input size.
      t(s, dir)("lineitem")
        .select(col("l_returnflag"), col("l_partkey").cast("long").as("pk"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("bit_and(pk)").as("mask_and"),
          expr("bit_or(pk)").as("mask_or"),
          expr("bit_xor(pk)").as("checksum_xor"))
        .orderBy("l_returnflag")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // DuckDB SUM(BIGINT) is HUGEINT, so the moment sums and correlation
    // numerators are exact 128-bit like the Spark side's DECIMAL(38,0);
    // the slope/intercept/R² IEEE sequences mirror the Spark expressions
    // operation-for-operation
    "agg_weighted_median" -> s"""
      WITH e AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                        CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS w
                 FROM lineitem),
      hist AS (SELECT l_returnflag, q, CAST(SUM(w) AS BIGINT) AS cw
               FROM e GROUP BY 1, 2),
      c AS (SELECT l_returnflag, q, cw,
                   CAST(SUM(cw) OVER (PARTITION BY l_returnflag ORDER BY q
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                   CAST(SUM(cw) OVER (PARTITION BY l_returnflag)
                     AS BIGINT) AS wtot
            FROM hist)
      SELECT l_returnflag, MAX(wtot) AS w_total,
             MIN(CASE WHEN cum >= (wtot + 1) // 2 THEN q END)
               + MIN(CASE WHEN cum >= wtot // 2 + 1 THEN q END) AS med2x,
             ${r6Sql("CAST(MIN(CASE WHEN cum >= (wtot + 1) // 2 THEN q END) " +
               "+ MIN(CASE WHEN cum >= wtot // 2 + 1 THEN q END) AS DOUBLE) / 2.0")}
               AS wmedian6
      FROM c GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_regression" -> s"""
      WITH e AS (SELECT event_type,
                        (epoch_ns(ts)//1000)//86400000000 AS day,
                        CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                 FROM events),
      d0 AS (SELECT MIN(day) AS day0 FROM e),
      g AS (SELECT event_type, COUNT(1) AS n,
                   SUM(day - day0) AS sx, SUM(y) AS sy,
                   SUM((day - day0) * (day - day0)) AS sxx,
                   SUM(y * y) AS syy, SUM((day - day0) * y) AS sxy
            FROM e CROSS JOIN d0 GROUP BY 1)
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov_num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS vx_num,
             CAST(n * syy - sy * sy AS DOUBLE) AS vy_num,
             CASE WHEN n * sxx - sx * sx > 0 THEN
               ${r6Sql("CAST(n * sxy - sx * sy AS DOUBLE) / " +
                 "CAST(n * sxx - sx * sx AS DOUBLE) / 100.0")}
             END AS slope6,
             CASE WHEN n * sxx - sx * sx > 0 THEN
               ${r6Sql("(CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)" +
                 " / CAST(n * sxx - sx * sx AS DOUBLE)" +
                 " * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0")}
             END AS intercept6,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
               ${r6Sql("CAST(n * sxy - sx * sy AS DOUBLE) * " +
                 "CAST(n * sxy - sx * sy AS DOUBLE) / " +
                 "(CAST(n * sxx - sx * sx AS DOUBLE) * " +
                 "CAST(n * syy - sy * sy AS DOUBLE))")}
             END AS r2_6
      FROM g ORDER BY event_type""",
    "agg_bool" -> """
      SELECT o_orderstatus,
             CAST(bool_and(o_totalprice > 1000.0) AS INT) AS all_over_1k,
             CAST(bool_or(o_totalprice > 400000.0) AS INT) AS any_over_400k,
             CAST(SUM(CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_400k
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_string_agg" -> """
      WITH d AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders),
      a AS (SELECT o_orderstatus,
                   string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
            FROM d GROUP BY o_orderstatus),
      n AS (SELECT o_orderstatus, COUNT(1) AS n FROM orders GROUP BY o_orderstatus)
      SELECT a.o_orderstatus, a.priorities, n.n
      FROM a JOIN n ON a.o_orderstatus = n.o_orderstatus
      ORDER BY a.o_orderstatus""",
    "agg_listagg_ordered" -> """
      SELECT o_custkey, COUNT(1) AS n,
             string_agg(o_orderstatus, '' ORDER BY o_orderdate, o_orderkey) AS status_seq
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "agg_mode" -> """
      SELECT o_orderpriority, o_orderstatus AS mode_status, cnt FROM (
        SELECT o_orderpriority, o_orderstatus, COUNT(1) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY COUNT(1) DESC, o_orderstatus) AS rn
        FROM orders GROUP BY o_orderpriority, o_orderstatus)
      WHERE rn = 1 ORDER BY o_orderpriority""",
    "agg_skew_kurt" -> s"""
      WITH q AS (SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS x
                 FROM lineitem),
      m AS (SELECT l_returnflag, COUNT(1) AS n,
              CAST(SUM(x) AS HUGEINT) AS s1,
              CAST(SUM(x * x) AS HUGEINT) AS s2,
              CAST(SUM(x * x * x) AS HUGEINT) AS s3,
              CAST(SUM(x * x * x * x) AS HUGEINT) AS s4
            FROM q GROUP BY 1),
      c AS (SELECT l_returnflag, n, s1,
              (n * s2 - s1 * s1) AS m2n,
              (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1) AS m3n,
              (n * n * n * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2
                - 3 * s1 * s1 * s1 * s1) AS m4n
            FROM m)
      SELECT l_returnflag, n, CAST(s1 AS BIGINT) AS sum_qty,
             CAST(m2n AS DOUBLE) AS m2_num,
             CAST(m3n AS DOUBLE) AS m3_num,
             CAST(m4n AS DOUBLE) AS m4_num,
             ${r6Sql("CAST(m3n AS DOUBLE) / " +
               "(CAST(m2n AS DOUBLE) * sqrt(CAST(m2n AS DOUBLE)))")} AS skew6,
             ${r6Sql("CAST(m4n AS DOUBLE) / " +
               "(CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)) - 3.0")} AS kurt6
      FROM c ORDER BY l_returnflag""",

    "agg_histogram" -> """
      WITH e AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
                 FROM lineitem),
      b AS (SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(1) AS total FROM e),
      x AS (SELECT c, ((c - lo) * 20) // (hi - lo + 1) AS bucket,
                   lo, hi, total
            FROM e CROSS JOIN b)
      SELECT bucket,
             MAX(lo) + (MAX(bucket) * (MAX(hi) - MAX(lo) + 1)) // 20
               AS bucket_lo_centi,
             COUNT(1) AS n_rows, MIN(c) AS min_centi, MAX(c) AS max_centi,
             CAST(COUNT(1) * 1000000 // MAX(total) AS BIGINT) AS share_ppm
      FROM x GROUP BY bucket ORDER BY bucket""",
    "agg_corr_covar" -> s"""
      WITH m AS (
        SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem),
      g AS (SELECT l_returnflag, COUNT(1) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
                   CAST(SUM(x*y) AS DOUBLE) AS sxy
            FROM m GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             ${r6Sql("(n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))")} AS corr6,
             ${r6Sql("(sxy - sx*sy/n) / (n-1) / 10000.0")} AS covar6,
             ${r6Sql("sqrt((n*sxx - sx*sx) / (n*(n-1))) / 100.0")} AS stddev_qty6
      FROM g ORDER BY l_returnflag""",
    "agg_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
             COUNT(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "agg_weighted_avg" -> s"""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS weighted_sum,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum,
             ${r6Sql("CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)")} AS wavg_price,
             COUNT(1) AS n_lines
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_geometric_mean" -> s"""
      WITH g AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(floor(ln(o_totalprice) * 1000000) AS BIGINT)) AS BIGINT) AS lnsum_micro,
               COUNT(1) AS n_orders
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, n_orders,
             ${r6Sql("exp(CAST(lnsum_micro AS DOUBLE) / 1000000 / n_orders)")} AS geo_mean
      FROM g ORDER BY o_orderpriority""",
    "agg_groupby_multi" -> """
      SELECT o_orderpriority, o_orderstatus, COUNT(1) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
      FROM orders GROUP BY o_orderpriority, o_orderstatus
      ORDER BY o_orderpriority, o_orderstatus""",
    "agg_having" -> """
      SELECT o_custkey, COUNT(1) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
      FROM orders GROUP BY o_custkey HAVING COUNT(1) >= 12
      ORDER BY o_custkey""",
    "agg_distinct_count" -> """
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS distinct_cust, COUNT(1) AS cnt
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_multi_distinct" -> """
      SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS d_cust,
             COUNT(DISTINCT o_orderdate) AS d_dates, COUNT(1) AS cnt
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_rollup" -> """
      SELECT r_name, n_name, COUNT(1) AS cnt,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal,
             CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
      FROM region JOIN nation ON r_regionkey = n_regionkey
                  JOIN customer ON n_nationkey = c_nationkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "agg_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(1) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total,
             CAST(GROUPING(o_orderstatus) AS INT) AS g_s, CAST(GROUPING(o_orderpriority) AS INT) AS g_p
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "agg_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(1) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total,
             CAST(GROUPING(o_orderstatus) AS INT) AS g_s, CAST(GROUPING(o_orderpriority) AS INT) AS g_p
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "agg_minmax_stats" -> """
      SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship, COUNT(1) AS cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_sorted_collect" -> """
      SELECT o_custkey,
             array_to_string(LIST(o_orderkey ORDER BY o_orderkey), ',') AS order_keys
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "agg_udaf_sumsq" -> """
      SELECT CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_sq,
             COUNT(1) AS cnt
      FROM lineitem""",
    "agg_pivot_status" -> """
      SELECT o_orderpriority,
             COUNT(1) FILTER (WHERE o_orderstatus = 'F') AS "F",
             COUNT(1) FILTER (WHERE o_orderstatus = 'O') AS "O",
             COUNT(1) FILTER (WHERE o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_unpivot" -> """
      SELECT o_orderkey, 'price' AS metric, CAST(o_totalprice AS DOUBLE) AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'cust' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
      ORDER BY o_orderkey, metric""",
    "agg_median" -> """
      WITH r AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
               COUNT(1) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority, MAX(n) AS cnt,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS mid_lo,
             MAX(CASE WHEN rn = n // 2 + 1 THEN o_totalprice END) AS mid_hi
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_percentile_interp" -> """
      WITH r AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
               COUNT(1) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders),
      pv AS (
        SELECT o_orderpriority, MAX(n) AS n_rows,
          MAX(CASE WHEN rn = 1 + ((n-1) * 50) // 100 THEN o_totalprice END) AS lo_50,
          MAX(CASE WHEN rn = 1 + ((n-1) * 50) // 100
            + CASE WHEN ((n-1) * 50) % 100 > 0 THEN 1 ELSE 0 END
            THEN o_totalprice END) AS hi_50,
          MAX(CASE WHEN rn = 1 + ((n-1) * 90) // 100 THEN o_totalprice END) AS lo_90,
          MAX(CASE WHEN rn = 1 + ((n-1) * 90) // 100
            + CASE WHEN ((n-1) * 90) % 100 > 0 THEN 1 ELSE 0 END
            THEN o_totalprice END) AS hi_90,
          MAX(CASE WHEN rn = 1 + ((n-1) * 99) // 100 THEN o_totalprice END) AS lo_99,
          MAX(CASE WHEN rn = 1 + ((n-1) * 99) // 100
            + CASE WHEN ((n-1) * 99) % 100 > 0 THEN 1 ELSE 0 END
            THEN o_totalprice END) AS hi_99
        FROM r GROUP BY o_orderpriority)
      SELECT o_orderpriority, n_rows,
             lo_50 + (hi_50 - lo_50) * CAST(((n_rows-1) * 50) % 100 AS DOUBLE) / 100.0 AS p50c,
             lo_90 + (hi_90 - lo_90) * CAST(((n_rows-1) * 90) % 100 AS DOUBLE) / 100.0 AS p90c,
             lo_99 + (hi_99 - lo_99) * CAST(((n_rows-1) * 99) % 100 AS DOUBLE) / 100.0 AS p99c
      FROM pv ORDER BY o_orderpriority""",

    "agg_percentiles_exact" -> """
      WITH r AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
               COUNT(1) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority, MAX(n) AS n_rows,
             MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN o_totalprice END) AS p50,
             MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN o_totalprice END) AS p90,
             MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN o_totalprice END) AS p99
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_bitmap_distinct" -> """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(DISTINCT o_custkey) AS n_cust, COUNT(1) AS n_orders
      FROM orders GROUP BY 1 ORDER BY month""",

    // arg-extremes twin spells out the struct total order as two
    // ROW_NUMBER directions: (cents, custkey) DESC-DESC picks Spark's
    // max_by struct winner, ASC-ASC the min_by one
    "agg_arg_extremes" -> """
      WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, c_custkey,
                        CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
                 FROM customer),
      r AS (SELECT nation, c_custkey, cents,
                   ROW_NUMBER() OVER (PARTITION BY nation
                     ORDER BY cents DESC, c_custkey DESC) AS rd,
                   ROW_NUMBER() OVER (PARTITION BY nation
                     ORDER BY cents ASC, c_custkey ASC) AS ra,
                   COUNT(1) OVER (PARTITION BY nation) AS n
            FROM c)
      SELECT nation, MAX(n) AS n_cust,
             MAX(CASE WHEN rd = 1 THEN c_custkey END) AS rich_cust,
             MAX(CASE WHEN rd = 1 THEN cents END) AS rich_cents,
             MAX(CASE WHEN ra = 1 THEN c_custkey END) AS poor_cust,
             MAX(CASE WHEN ra = 1 THEN cents END) AS poor_cents
      FROM r GROUP BY nation ORDER BY nation""",

    "agg_bit_ops" -> """
      SELECT l_returnflag, COUNT(1) AS n,
             bit_and(CAST(l_partkey AS BIGINT)) AS mask_and,
             bit_or(CAST(l_partkey AS BIGINT)) AS mask_or,
             bit_xor(CAST(l_partkey AS BIGINT)) AS checksum_xor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
