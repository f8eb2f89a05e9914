package graft.functions

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** §2.8 Scalar functions. Cross-engine dialect traps handled here
  * (SURVEY §7.4.3):
  *  - regexp_replace: Spark replaces all matches, DuckDB only the first —
  *    oracle passes the 'g' flag;
  *  - dayofweek: both 1..7 only after adding 1 to DuckDB's 0-based dow;
  *  - floor/len/date-part outputs: DuckDB BIGINT/DOUBLE vs Spark INT/LONG —
  *    both sides cast to a pinned type;
  *  - float arrays: promote to double before any arithmetic (float math
  *    promotion rules differ between engines; float->double is exact);
  *  - transcendentals (sqrt/ln/exp): identical IEEE results, then safe-r6;
  *  - timestamps: output timestamp_ntz only (TimestampType would become
  *    tz-aware parquet while DuckDB results are naive).
  */
object Scalars extends OpRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> ((s, dir) =>
      t(s, dir)("part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat_ws("|", col("p_name"), col("p_type")).as("joined"),
        length(col("p_name")).as("len"),
        size(split(col("p_name"), " ")).as("n_tokens"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        levenshtein(col("p_name"), lit("small widget")).as("lev"))
        .orderBy("p_partkey")),

    "fn_date" -> ((s, dir) =>
      t(s, dir)("orders")
        .withColumn("d", col("o_orderdate").cast("date"))
        .select(
          col("o_orderkey"), col("d"),
          year(col("d")).as("yr"), month(col("d")).as("mo"),
          dayofmonth(col("d")).as("dom"), quarter(col("d")).as("qtr"),
          trunc(col("d"), "month").as("month_start"),
          date_add(col("d"), 30).as("plus30"),
          datediff(col("d"), lit("1995-01-01").cast("date")).as("days_since"),
          last_day(col("d")).as("eom"),
          dayofweek(col("d")).as("dow1to7"),
          date_format(col("d"), "yyyy-MM-dd").as("d_str"),
          to_date(date_format(col("d"), "yyyy-MM-dd")).as("d_rt"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      t(s, dir)("lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_c"),
        floor(col("l_extendedprice")).as("floor_p"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        (col("l_orderkey") % 7).as("mod7"),
        r6(sqrt(col("l_quantity"))).as("sqrt_q"),
        r6(log(col("l_extendedprice"))).as("ln_p"),
        r6(exp(col("l_discount"))).as("exp_d"),
        r6(pow(col("l_quantity"), 2.0)).as("pow_q2"),
        signum(col("l_discount") - 0.05).cast(IntegerType).as("sgn"),
        greatest(col("l_quantity"), col("l_tax") * 100).as("gmax"),
        least(col("l_quantity"), col("l_tax") * 100).as("lmin"))
        .orderBy("l_orderkey", "l_linenumber")),

    "fn_array" -> ((s, dir) =>
      // head_sq is emitted as a CSV string of micro-unit-quantized squares:
      // the driver's pandas comparator cannot hash list columns (VERDICT r1
      // #4), and double->string formatting differs across engines, so the
      // elements are fixed-point integers before joining.
      t(s, dir)("embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_el"),
        array_join(transform(slice(col("embedding"), 1, 8),
          x => floor(x.cast("double") * x.cast("double") * lit(1e6) + lit(0.5)).cast("long")), ",").as("head_sq_q"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("pos_cnt"),
        r6(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("sumsq"),
        array_max(col("embedding")).cast("double").as("vmax"),
        array_min(col("embedding")).cast("double").as("vmin"),
        array_contains(slice(col("embedding"), 1, 8), element_at(col("embedding"), 1)).as("has_first"))
        .orderBy("vec_id")),

    "fn_map" -> ((s, dir) =>
      // Build a map from parsed props, emit exploded (key,value) rows —
      // avoids engine-specific MAP parquet encodings entirely.
      t(s, dir)("events")
        .select(col("event_id"),
          map(lit("k"), from_json(col("props"), lit("k INT")).getField("k")).as("m"))
        .select(col("event_id"), explode(col("m")))
        .withColumnRenamed("key", "map_key").withColumnRenamed("value", "map_value")
        .orderBy("event_id")),

    "fn_json" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      t(s, dir)("events").select(
        col("event_id"),
        k.as("k_get"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_struct"),
        (get_json_object(to_json(struct(k.as("k"))), "$.k").cast("int") <=> k).as("roundtrip_ok"))
        .orderBy("event_id")
    }),

    "fn_interval" -> ((s, dir) => {
      // Calendar-interval arithmetic (round 14) — the date-math surface
      // fn_date's extraction family doesn't cover: month arithmetic with
      // END-OF-MONTH CLAMPING (Jan 31 + 1 month = Feb 28 in BOTH engines
      // — the clamp is the cross-dialect contract worth pinning),
      // last-day-of-month, strictly-next-weekday, plain day offsets, and
      // the epoch-day number. All pure calendar functions — no timezone
      // in the path (dates, not instants).
      t(s, dir)("orders")
        .withColumn("d", col("o_orderdate").cast("date"))
        .select(col("o_orderkey"), col("d"),
          add_months(col("d"), 3).as("plus_3m"),
          last_day(col("d")).as("last_dom"),
          next_day(col("d"), "Mon").as("next_mon"),
          date_add(col("d"), 45).as("plus_45d"),
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")
            .as("epoch_day"))
        .orderBy("o_orderkey")
    }),

    "fn_collate" -> ((s, dir) => {
      // The Spark-4 COLLATION surface (round 14): case-insensitive
      // grouping via a UTF8_LCASE-collated key — collation-aware
      // comparison pushed into the engine's binary comparators instead of
      // lower()-normalizing every row (on a sorted/grouped 100 TB path
      // the collated comparison avoids materializing a second string per
      // row). The fixture is single-case, so the op PLANTS the case
      // variance: each part name unioned with its initcap form must
      // collapse back to ONE group of 2 under the collation. The collated
      // key itself never reaches the output (which variant survives as
      // the group key is engine-internal): the representative is min(raw)
      // — binary min, deterministic in both engines.
      val names = t(s, dir)("part").select(col("p_name").as("v"))
      val mixed = names.unionAll(names.select(initcap(col("v")).as("v")))
      mixed.groupBy(collate(col("v"), "UTF8_LCASE").as("ck"))
        .agg(min(col("v")).as("repr"), count(lit(1)).as("n_variants"))
        .select("repr", "n_variants")
        .orderBy("repr")
    }),

    "fn_variant" -> ((s, dir) => {
      // The Spark-4 VARIANT surface (round 14) — the open-schema
      // semi-structured type replacing stringly-JSON hot paths: parse
      // once into the binary variant encoding, then typed `variant_get`
      // extractions run WITHOUT re-parsing the JSON text per field (the
      // reason variant beats get_json_object when several fields are
      // read). parse_json → variant_get (typed path hit), try_variant_get
      // on a MISSING path (NULL, never an exception), is_variant_null.
      // Output is plain typed columns, so the DuckDB twin reads the same
      // fields with its own JSON operators — the contract is the values,
      // not the encoding.
      val v = parse_json(col("props"))
      t(s, dir)("events").select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k_int"),
        variant_get(v, "$.k", "string").as("k_str"),
        try_variant_get(v, "$.missing", "int").as("miss"),
        is_variant_null(v).cast("int").as("is_null_variant"))
        .orderBy("event_id")
    }),

    "fn_url" -> ((s, dir) => {
      // URL parsing surface (round 11) — the crawl-record primitive every
      // web-corpus pipeline runs before host-level filtering: synthesize a
      // deterministic URL per doc (source → host, lang/doc_id → path,
      // modulus → query param), parse it back with Spark's native
      // parse_url (codegen'd ParseUrl), and aggregate per host — doc
      // count, distinct langs, char mass — the "domain reputation table"
      // shape. DuckDB has no parse_url; the twin extracts the identical
      // parts with anchored regexes over the same synthesized strings, so
      // the comparison exercises real parser-vs-regex agreement on every
      // row.
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc-"), col("doc_id"),
        lit("?shard="), col("doc_id") % 7)
      tWide(s, dir)("documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), url.as("url"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("shard")).cast("long").as("shard"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("path")).as("first_path"),
          sum(col("shard")).as("shard_sum"))
        .orderBy("host")
    }),

    "fn_conditional" -> ((s, dir) =>
      t(s, dir)("orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("UNKNOWN")).as("status_c"),
        (col("o_totalprice") > 200000 && lit(null).cast("boolean")).as("and_null"),
        (col("o_totalprice") > 200000 || lit(null).cast("boolean")).as("or_null"))
        .orderBy("o_orderkey")),

    "fn_cast" -> ((s, dir) =>
      t(s, dir)("events").select(
        col("event_id"),
        col("user_id").cast("int").as("user_int"),
        dec(col("value")).cast("double").as("value_dec"),
        floor(col("value")).cast("int").as("value_floor_int"),
        tsDivMicros(col("ts")).as("ts_us"),
        tsMicros(col("ts")).cast("timestamp_ntz").as("ts_ts"),
        tsMicros(col("ts")).cast("timestamp_ntz").cast("date").as("ts_date"))
        .orderBy("event_id")),

    "fn_hash" -> ((s, dir) =>
      t(s, dir)("documents").select(
        col("doc_id"),
        sha2(col("text"), 256).as("sha"),
        md5(col("text")).as("md5h"))
        .orderBy("doc_id")),

    "fn_try_arith" -> ((s, dir) => {
      // ANSI-safe TRY arithmetic family: the error becomes NULL instead of
      // failing the job — the semantics a production pipeline needs when
      // one POISONED row must not kill a 100 TB run (ANSI mode without TRY
      // kills the stage; non-ANSI silently wraps, which is worse). The
      // poison is staged on the RARE rows (l_orderkey % 100000 == 0): TRY
      // is exception-catch under the hood, so an always-failing expression
      // turns the scan into an exception firehose — first bench of this op
      // measured 25 s/600k rows from exactly that; rare poison is both the
      // realistic distribution and the only shape that survives 100 TB.
      // try_divide hits a staged zero denominator, try_add a staged
      // Long.MaxValue overflow (key 0 does NOT overflow — the boundary
      // row), try_element_at a staged out-of-bounds index. Oracle replays
      // each with explicit CASE guards — DuckDB would raise where Spark
      // TRY nulls, so the guard IS the cross-engine contract.
      val poisoned = col("l_orderkey") % 100000 === 0
      t(s, dir)("lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"),
          when(poisoned, lit(0L)).otherwise(col("l_quantity").cast("long")))
          .as("cents_per_qty"),
        try_add(when(poisoned, lit(Long.MaxValue)).otherwise(lit(0L)),
          col("l_orderkey")).as("add_overflow"),
        try_multiply(col("l_orderkey"), lit(2L)).as("mul_ok"),
        try_element_at(split(col("l_returnflag"), ""),
          when(poisoned, lit(2)).otherwise(lit(1))).as("elem_probe"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "fn_bitwise" -> ((s, dir) =>
      // Bitwise scalar family over 64-bit keys: AND/OR/XOR, shifts, bit
      // count — the primitives behind bucket masks, bloom probes, and flag
      // words. All exact integer ops, identical in any engine.
      t(s, dir)("events").select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("band"),
        col("event_id").bitwiseOR(lit(4096L)).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        shiftleft(col("event_id"), 3).as("shl3"),
        shiftright(col("event_id"), 2).as("shr2"),
        bit_count(col("event_id")).as("nbits"))
        .orderBy("event_id")),

    "udf_scalar" -> ((s, dir) => {
      // Scala UDF registration surface (§2.12); Catalyst-Expression upgrade
      // path documented in SURVEY §4 (perf-only).
      val slugify = udf((name: String) =>
        if (name == null) null
        else name.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
      t(s, dir)("part").select(col("p_partkey"), slugify(col("p_name")).as("slug"))
        .orderBy("p_partkey")
    }),

    "udtf_generator" -> ((s, dir) =>
      // Generator/table-function surface via posexplode (0-based position).
      t(s, dir)("documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "tok_pos").withColumnRenamed("col", "token")
        .orderBy("doc_id", "tok_pos")),

    "fn_hof" -> ((s, dir) => {
      // Higher-order-function surface (round 4): transform / filter /
      // exists / aggregate over a per-order quantity array, emitted as
      // SCALARS (D7). The array is array_sort'ed before any
      // order-sensitive fold — collect_list order is shuffle-dependent on
      // a cluster. Quantities are 1..50 integral doubles, so the sum of
      // squares stays exact in double math.
      val arr = array_sort(collect_list(col("l_quantity")))
      t(s, dir)("lineitem")
        .groupBy("l_orderkey")
        .agg(arr.as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).as("n_lines"),
          aggregate(col("qs"), lit(0.0), (a, x) => a + x * x).as("sumsq"),
          size(filter(col("qs"), _ > 25.0)).as("n_big"),
          exists(col("qs"), _ === 1.0).cast("int").as("has_unit"),
          element_at(col("qs"), -1).as("max_q"))
        .orderBy("l_orderkey")
    }),

    "fn_struct" -> ((s, dir) => {
      // STRUCT construction, field access, and struct ORDERING (round 14):
      // per part type, the lexicographically smallest and largest
      // (size, brand) pair. Spark's min/max compare structs field-by-field
      // left-to-right — the same total order the DuckDB twin spells out as
      // two ROW_NUMBER directions. The struct never reaches the output
      // schema (row-type bridges differ per engine; D-convention): fields
      // are re-projected with dot access. Aggregating the struct beats a
      // window: partial+final with a 2-field accumulator, no per-group sort.
      t(s, dir)("part")
        .select(col("p_type"),
          struct(col("p_size").cast("long").as("sz"), col("p_brand").as("br"))
            .as("sb"))
        .groupBy("p_type")
        .agg(min(col("sb")).as("mn"), max(col("sb")).as("mx"),
          count(lit(1)).as("n_parts"))
        .select(col("p_type"),
          col("mn.sz").as("min_size"), col("mn.br").as("min_brand"),
          col("mx.sz").as("max_size"), col("mx.br").as("max_brand"),
          col("n_parts"))
        .orderBy("p_type")
    }),

    "fn_format" -> ((s, dir) => {
      // C-style formatting + padding (round 14). format_string is Spark's
      // printf (java.util.Formatter), DuckDB's printf is C printf — for
      // the pinned subset (%s, zero-padded %0Nd on integers) the two
      // agree byte-for-byte; lpad/rpad (pad AND truncate-to-width
      // semantics) and repeat agree directly. All codegen'd string
      // builders — one narrow projection, no shuffle.
      t(s, dir)("supplier")
        .select(col("s_suppkey"),
          format_string("SUP-%05d/%s", col("s_suppkey"), upper(col("s_name")))
            .as("label"),
          lpad(col("s_suppkey").cast("string"), 8, "0").as("padded"),
          rpad(col("s_name"), 20, ".").as("ragged"),
          concat(lit("|"), repeat(lit("*"), (col("s_suppkey") % 5).cast("int")),
            lit("|")).as("bars"))
        .orderBy("s_suppkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "fn_hof" -> """
      WITH g AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
                 FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey,
             CAST(len(qs) AS INT) AS n_lines,
             list_aggregate(list_transform(qs, x -> x * x), 'sum') AS sumsq,
             CAST(len(list_filter(qs, x -> x > 25.0)) AS INT) AS n_big,
             CAST(list_contains(qs, 1.0) AS INT) AS has_unit,
             qs[-1] AS max_q
      FROM g ORDER BY l_orderkey""",
    "fn_string" -> """
      SELECT p_partkey,
             upper(p_name) AS up, lower(p_brand) AS lo,
             trim('  pad  ') AS trimmed, lpad(p_brand, 12, '*') AS padded,
             substring(p_name, 1, 5) AS sub5,
             concat_ws('|', p_name, p_type) AS joined,
             CAST(length(p_name) AS INT) AS len,
             CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
             CAST(levenshtein(p_name, 'small widget') AS INT) AS lev
      FROM part ORDER BY p_partkey""",
    "fn_date" -> """
      SELECT o_orderkey, d,
             CAST(year(d) AS INT) AS yr, CAST(month(d) AS INT) AS mo,
             CAST(day(d) AS INT) AS dom, CAST(quarter(d) AS INT) AS qtr,
             CAST(date_trunc('month', d) AS DATE) AS month_start,
             d + 30 AS plus30,
             CAST(datediff('day', DATE '1995-01-01', d) AS INT) AS days_since,
             last_day(d) AS eom,
             CAST(dayofweek(d) + 1 AS INT) AS dow1to7,
             strftime(d, '%Y-%m-%d') AS d_str,
             CAST(strftime(d, '%Y-%m-%d') AS DATE) AS d_rt
      FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY o_orderkey""",
    "fn_math" -> s"""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS abs_c,
             CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
             l_orderkey % 7 AS mod7,
             ${r6Sql("sqrt(l_quantity)")} AS sqrt_q,
             ${r6Sql("ln(l_extendedprice)")} AS ln_p,
             ${r6Sql("exp(l_discount)")} AS exp_d,
             ${r6Sql("pow(l_quantity, 2.0)")} AS pow_q2,
             CAST(sign(l_discount - 0.05) AS INT) AS sgn,
             greatest(l_quantity, l_tax * 100) AS gmax,
             least(l_quantity, l_tax * 100) AS lmin
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "fn_array" -> s"""
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_el,
             array_to_string(list_transform(list_slice(embedding, 1, 8),
               x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)), ',') AS head_sq_q,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS pos_cnt,
             ${r6Sql("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")} AS sumsq,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
             CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
             list_contains(list_slice(embedding, 1, 8), embedding[1]) AS has_first
      FROM embeddings ORDER BY vec_id""",
    "fn_map" -> """
      SELECT event_id, 'k' AS map_key, CAST(props->>'$.k' AS INT) AS map_value
      FROM events ORDER BY event_id""",
    "fn_json" -> """
      SELECT event_id,
             CAST(props->>'$.k' AS INT) AS k_get,
             CAST(props->>'$.k' AS INT) AS k_struct,
             (CAST(to_json({'k': CAST(props->>'$.k' AS INT)})->>'$.k' AS INT)
               IS NOT DISTINCT FROM CAST(props->>'$.k' AS INT)) AS roundtrip_ok
      FROM events ORDER BY event_id""",
    "fn_interval" -> """
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3m,
             last_day(CAST(o_orderdate AS DATE)) AS last_dom,
             CAST(o_orderdate AS DATE)
               + CAST((CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7
                            = 0 THEN 7
                       ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7
                       END) AS INT) AS next_mon,
             CAST(o_orderdate AS DATE) + 45 AS plus_45d,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS epoch_day
      FROM orders ORDER BY o_orderkey""",

    "fn_collate" -> """
      WITH mixed AS (
        SELECT p_name AS v FROM part
        UNION ALL
        -- initcap twin: DuckDB has no initcap; title-case each word
        SELECT array_to_string(list_transform(string_split(p_name, ' '),
                 w -> upper(w[1]) || w[2:]), ' ') AS v
        FROM part)
      SELECT MIN(v) AS repr, COUNT(1) AS n_variants
      FROM mixed GROUP BY lower(v) ORDER BY repr""",

    "fn_variant" -> """
      SELECT event_id,
             CAST(props->>'$.k' AS INT) AS k_int,
             CAST(props->>'$.k' AS VARCHAR) AS k_str,
             CAST(NULL AS INT) AS miss,
             CAST(0 AS INT) AS is_null_variant
      FROM events ORDER BY event_id""",

    "fn_url" -> """
      WITH u AS (SELECT doc_id, lang, n_chars,
                   'https://' || source || '.example.com/' || lang ||
                   '/doc-' || doc_id || '?shard=' || (doc_id % 7) AS url
                 FROM documents),
      p AS (SELECT doc_id, lang, n_chars,
                   regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                   regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                   CAST(regexp_extract(url, 'shard=([0-9]+)', 1) AS BIGINT)
                     AS shard
            FROM u)
      SELECT host, COUNT(1) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MIN(path) AS first_path,
             CAST(SUM(shard) AS BIGINT) AS shard_sum
      FROM p GROUP BY host ORDER BY host""",
    "fn_conditional" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'high'
                  WHEN o_totalprice > 150000 THEN 'mid'
                  ELSE 'low' END AS bucket,
             coalesce(NULLIF(o_orderstatus, 'P'), 'UNKNOWN') AS status_c,
             (o_totalprice > 200000 AND NULL) AS and_null,
             (o_totalprice > 200000 OR NULL) AS or_null
      FROM orders ORDER BY o_orderkey""",
    "fn_cast" -> """
      SELECT event_id,
             CAST(user_id AS INT) AS user_int,
             CAST(CAST(value AS DECIMAL(38,6)) AS DOUBLE) AS value_dec,
             CAST(floor(value) AS INT) AS value_floor_int,
             epoch_ns(ts) // 1000 AS ts_us,
             CAST(ts AS TIMESTAMP) AS ts_ts,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ts_date
      FROM events ORDER BY event_id""",
    "fn_hash" -> """
      SELECT doc_id, sha256(text) AS sha, md5(text) AS md5h
      FROM documents ORDER BY doc_id""",
    "fn_try_arith" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 100000 <> 0 THEN
               CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS DOUBLE)
                 / CAST(l_quantity AS BIGINT) END AS cents_per_qty,
             CASE WHEN l_orderkey = 0 THEN 9223372036854775807
                  WHEN l_orderkey % 100000 = 0 THEN NULL
                  ELSE l_orderkey END AS add_overflow,
             l_orderkey * 2 AS mul_ok,
             CASE WHEN l_orderkey % 100000 <> 0 THEN substring(l_returnflag, 1, 1)
               END AS elem_probe
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "fn_bitwise" -> """
      SELECT event_id,
             event_id & 255 AS band,
             event_id | 4096 AS bor,
             xor(event_id, user_id) AS bxor,
             event_id << 3 AS shl3,
             event_id >> 2 AS shr2,
             CAST(bit_count(event_id) AS INT) AS nbits
      FROM events ORDER BY event_id""",
    "udf_scalar" -> """
      SELECT p_partkey, regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g') AS slug
      FROM part ORDER BY p_partkey""",
    "udtf_generator" -> """
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS tok_pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 50
      ORDER BY doc_id, tok_pos""",

    "fn_struct" -> """
      WITH r AS (SELECT p_type, CAST(p_size AS BIGINT) AS sz, p_brand AS br,
                        ROW_NUMBER() OVER (PARTITION BY p_type
                          ORDER BY p_size ASC, p_brand ASC) AS ra,
                        ROW_NUMBER() OVER (PARTITION BY p_type
                          ORDER BY p_size DESC, p_brand DESC) AS rd,
                        COUNT(1) OVER (PARTITION BY p_type) AS n
                 FROM part)
      SELECT p_type,
             MAX(CASE WHEN ra = 1 THEN sz END) AS min_size,
             MAX(CASE WHEN ra = 1 THEN br END) AS min_brand,
             MAX(CASE WHEN rd = 1 THEN sz END) AS max_size,
             MAX(CASE WHEN rd = 1 THEN br END) AS max_brand,
             MAX(n) AS n_parts
      FROM r GROUP BY p_type ORDER BY p_type""",

    "fn_format" -> """
      SELECT s_suppkey,
             printf('SUP-%05d/%s', s_suppkey, upper(s_name)) AS label,
             lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded,
             rpad(s_name, 20, '.') AS ragged,
             '|' || repeat('*', CAST(s_suppkey % 5 AS INT)) || '|' AS bars
      FROM supplier ORDER BY s_suppkey""",
  )
}
