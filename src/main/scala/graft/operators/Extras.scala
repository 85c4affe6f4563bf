package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-out operators: distribution window functions, algebraic moment
  * statistics, exact percentiles, deterministic hash sampling, extended
  * string/bitwise families, bag-semantics set ops.
  *
  * Notable determinism decisions:
  *  - variance/stddev are computed FROM EXACT DECIMAL SUMS (Σx, Σx²) with
  *    one shared double formula — the built-in Welford-style aggregates
  *    are merge-order-dependent and can differ in the last ulp between
  *    engines, so they are not oracle-safe.
  *  - sampling is a hash-filter (md5 mod) — the only reproducible sample
  *    across engines AND across cluster sizes; TABLESAMPLE is neither.
  */
object Extras {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Distribution window functions (percent_rank/cume_dist — exact
    // rational arithmetic on identical inputs in both engines).
    "q_win_distribution" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
    }),

    // Algebraic moments from exact sums: mean, variance, stddev.
    "q_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sx"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).cast("double").as("sxx"))
        .select(col("l_returnflag"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_qty"),
          round((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1), 6).as("var_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)), 6).as("std_qty"))
        .orderBy("l_returnflag")),

    // Exact interpolated percentiles on integer-valued quantities.
    "q_agg_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag")),

    // Deterministic 10% sample: hash-filter on the unique key — the
    // reproducible-at-any-cluster-size replacement for TABLESAMPLE.
    "q_scan_sample_hash" -> ((s, d) =>
      Tables.orders(s, d)
        .where(md5long(col("o_orderkey").cast("string")) % 100 < 10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")),

    // Extended date family: month arithmetic with end-of-month clamping,
    // calendar parts, locale names.
    "q_fn_date2" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          last_day(to_date(col("o_orderdate"))).cast("string").as("eom"),
          quarter(col("o_orderdate")).cast("int").as("qtr"),
          weekofyear(col("o_orderdate")).cast("int").as("woy"),
          add_months(to_date(col("o_orderdate")), 1).cast("string").as("next_m"),
          date_format(col("o_orderdate"), "MMMM").as("month_name"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"))
        .orderBy("o_orderkey")),

    // Extended string family.
    "q_fn_string2" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          reverse(col("lang")).as("lang_rev"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
          instr(col("text"), "scan").as("scan_pos"),
          repeat(col("lang"), 3).as("lang3"),
          substring(col("text"), 1, 5).as("l5"),
          col("text").contains("merge").as("has_merge"),
          col("text").startsWith("the").as("starts_the"),
          col("lang").endsWith("n").as("ends_n"))
        .orderBy("doc_id")),

    // Bitwise family on integer keys.
    "q_fn_bit" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          col("event_id").bitwiseAND(255).as("land"),
          col("event_id").bitwiseOR(16).as("lor"),
          col("event_id").bitwiseXOR(col("user_id")).as("lxor"),
          expr("shiftleft(user_id, 3)").as("shl"),
          expr("shiftright(event_id, 2)").as("shr"),
          bit_count(col("event_id")).as("bits"))
        .orderBy("event_id")),

    // Histogram: fixed-width integer bucketing (portable arithmetic).
    "q_agg_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        // floor, not a raw cast: DuckDB's double→BIGINT cast ROUNDS while
        // Spark's truncates — floor is the one shared semantics.
        .groupBy(floor(col("o_totalprice") / 50000.0).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket")),

    // NULL semantics end-to-end: generated nulls through aggregation,
    // conditional logic and null-ordered sort. The testdata itself is
    // null-free, so this query manufactures them with nullif.
    "q_fn_null" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("maybe", nullif(col("o_orderstatus"), lit("O")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("maybe")).as("n_nonnull"),
          sum(when(col("maybe").isNull, 1).otherwise(0)).as("n_null"),
          coalesce(min(col("maybe")), lit("ALL_OPEN")).as("min_status"))
        .orderBy(col("o_orderpriority").asc_nulls_last)),

    // Generator / table-function surface: posexplode with ordinality.
    "q_fn_generator" -> ((s, d) =>
      Tables.embeddings(s, d)
        .where(col("vec_id") < 20)
        .select(col("vec_id"),
          posexplode(slice(transform(col("embedding"), x => x.cast("double")),
            1, 4)))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          round(col("col"), 6).as("v"))
        .orderBy("vec_id", "pos")),

    // regexp_extract_all → sorted joined string (scalar output).
    "q_fn_regexp_all" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",",
            array_sort(array_distinct(
              regexp_extract_all(col("text"), lit("s[a-z]+"), lit(0)))))
            .as("s_words"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
            .cast("int").as("n_matches"))
        .orderBy("doc_id")),

    // Bag-semantics set ops (ALL variants keep duplicates).
    "q_set_except_all" -> ((s, d) => {
      def uids(t: String) = Tables.events(s, d)
        .where(col("event_type") === t).select(col("user_id"))
      uids("view").exceptAll(uids("error")).orderBy("user_id")
    }),

    "q_set_intersect_all" -> ((s, d) => {
      def uids(t: String) = Tables.events(s, d)
        .where(col("event_type") === t).select(col("user_id"))
      uids("click").intersectAll(uids("purchase")).orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_distribution" ->
      """SELECT c_custkey, c_mktsegment,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "q_agg_stats" ->
      """WITH t AS (SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                round(sx / n, 6) AS mean_qty,
                round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
                round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty
         FROM t ORDER BY l_returnflag""",
    "q_agg_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS med_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_scan_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15)) AS BIGINT)
               % 100 < 10
         ORDER BY o_orderkey""",
    "q_fn_date2" ->
      """SELECT o_orderkey,
                CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                CAST(weekofyear(o_orderdate) AS INT) AS woy,
                CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
                     AS VARCHAR) AS next_m,
                monthname(o_orderdate) AS month_name,
                dayname(o_orderdate) AS day_name
         FROM orders ORDER BY o_orderkey""",
    "q_fn_string2" ->
      """SELECT doc_id,
                reverse(lang) AS lang_rev,
                translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
                CAST(strpos(text, 'scan') AS INT) AS scan_pos,
                repeat(lang, 3) AS lang3,
                substr(text, 1, 5) AS l5,
                contains(text, 'merge') AS has_merge,
                starts_with(text, 'the') AS starts_the,
                ends_with(lang, 'n') AS ends_n
         FROM documents ORDER BY doc_id""",
    "q_fn_bit" ->
      """SELECT event_id,
                event_id & 255 AS land,
                event_id | 16 AS lor,
                xor(event_id, user_id) AS lxor,
                user_id << 3 AS shl,
                event_id >> 2 AS shr,
                CAST(bit_count(event_id) AS INT) AS bits
         FROM events ORDER BY event_id""",
    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
                COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "q_fn_null" ->
      """SELECT o_orderpriority,
                COUNT(*) AS n_rows,
                COUNT(nullif(o_orderstatus, 'O')) AS n_nonnull,
                CAST(SUM(CASE WHEN nullif(o_orderstatus, 'O') IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                coalesce(MIN(nullif(o_orderstatus, 'O')), 'ALL_OPEN') AS min_status
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS LAST""",
    "q_fn_generator" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings WHERE vec_id < 20),
            u AS (SELECT vec_id, v, unnest(generate_series(1, 4)) AS pos FROM e)
         SELECT vec_id, CAST(pos AS INT) AS pos, round(v[pos], 6) AS v
         FROM u ORDER BY vec_id, pos""",
    "q_fn_regexp_all" ->
      """SELECT doc_id,
                coalesce(array_to_string(list_sort(list_distinct(
                  regexp_extract_all(text, 's[a-z]+'))), ','), '') AS s_words,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_matches
         FROM documents ORDER BY doc_id""",
    "q_set_except_all" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
         EXCEPT ALL
         SELECT user_id FROM events WHERE event_type = 'error'
         ORDER BY user_id""",
    "q_set_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT ALL
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id"""
  )
}
