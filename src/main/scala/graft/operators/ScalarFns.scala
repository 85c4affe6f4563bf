package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Det, Tables}

/** §2.8 scalar function families — one declared query per family, each
  * exercising several functions; the oracle hash checks them all at once.
  *
  * Cross-engine notes baked into the oracles:
  *  - DuckDB dayofweek() is Sunday=0; Spark's is Sunday=1 → oracle adds 1.
  *  - libm-backed fns (ln/exp/pow) round(…,6) per §2.13 rule 2.
  *  - round-on-double is avoided where a tie is conceivable: the rounding
  *    demo runs in exact DECIMAL space (both engines round half-up there).
  */
object ScalarFns {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  val queries: Map[String, Q] = Map(
    // String family.
    "q_fn_string" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          upper(substring(col("text"), 1, 20)).as("head_u"),
          lower(col("lang")).as("lang_l"),
          length(col("text")).as("len"),
          trim(col("text")).substr(lit(1), lit(10)).as("head_trim"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          regexp_replace(col("text"), " ", "_").substr(lit(1), lit(15)).as("snake"),
          lpad(col("lang"), 5, "*").as("lang_pad"),
          split(col("text"), " ").getItem(0).as("first_word"))
        .orderBy("doc_id")),

    // Date/time family.
    "q_fn_date" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("dom"),
          dayofweek(col("ts")).as("dow"),
          date_trunc("day", col("ts")).cast("date").cast("string").as("day_s"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("days_in"),
          expr("unix_micros(ts) div 1000000").as("epoch_s"))
        .orderBy("event_id")),

    // Math family (libm outputs rounded; rounding demo in decimal space).
    "q_fn_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(dec(col("l_extendedprice")) * lit(BigDecimal("0.1")).cast(DecimalType(2, 1)), 2)
            .cast("double").as("tenth"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          abs(col("l_discount") - 0.05).as("adisc"),
          r6(pow(col("l_quantity"), 2)).as("q2"),
          r6(sqrt(col("l_quantity"))).as("qs"),
          r6(log(col("l_quantity"))).as("qln"),
          r6(exp(col("l_discount"))).as("edisc"),
          signum(col("l_discount") - 0.04).cast("int").as("sgn"),
          pmod(col("l_orderkey") - 3, lit(7)).as("pm"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Array family incl. higher-order fns, on exact float ops only.
    "q_fn_array" -> ((s, d) => {
      val e = col("embedding")
      val dbl = transform(e, x => x.cast("double"))
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(e).as("dim"),
          r6(element_at(dbl, 1)).as("first_v"),
          size(filter(dbl, x => x > 0d)).as("n_pos"),
          r6(array_max(dbl)).as("maxv"),
          r6(array_min(dbl)).as("minv"),
          r6(array_max(transform(dbl, x => x * 2d))).as("max2"),
          size(filter(slice(dbl, 1, 32), x => x > 0d)).as("n_pos_half"),
          r6(element_at(dbl, 1) * element_at(reverse(dbl), 1)
            + element_at(dbl, 2) * element_at(reverse(dbl), 2)).as("dotrev2"))
        .orderBy("vec_id")
    }),

    // Map family (props JSON → MapType).
    "q_fn_map" -> ((s, d) => {
      val m = from_json(col("props"), MapType(StringType, LongType))
      Tables.events(s, d)
        .select(col("event_id"),
          concat_ws(",", array_sort(map_keys(m))).as("keys"),
          element_at(m, "k").as("k_val"),
          size(m).as("n_keys"))
        .orderBy("event_id")
    }),

    // JSON family.
    "q_fn_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_long"),
          from_json(col("props"), propsSchema).getField("k").as("k_typed"),
          get_json_object(col("props"), "$.missing").as("k_missing"))
        .orderBy("event_id")),

    // Conditional family.
    "q_fn_cond" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 250000.0, "high")
            .when(col("o_totalprice") > 100000.0, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
          greatest(col("o_totalprice"), lit(50000.0)).as("gx"),
          least(col("o_custkey"), col("o_orderkey")).as("lk"),
          nvl(col("o_orderpriority"), lit("NONE")).as("pri"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT doc_id,
         upper(substr(text, 1, 20)) AS head_u,
         lower(lang) AS lang_l,
         CAST(length(text) AS INT) AS len,
         substr(trim(text), 1, 10) AS head_trim,
         concat_ws('|', lang, source) AS tag,
         substr(replace(text, ' ', '_'), 1, 15) AS snake,
         lpad(lang, 5, '*') AS lang_pad,
         string_split(text, ' ')[1] AS first_word
         FROM documents ORDER BY doc_id""",
    "q_fn_date" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts FROM events)
         SELECT event_id,
         CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
         CAST(dayofmonth(ts) AS INT) AS dom,
         CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day_s,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_in,
         epoch_us(ts) // 1000000 AS epoch_s
         FROM e ORDER BY event_id""",
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS tenth,
         CAST(floor(l_extendedprice) AS BIGINT) AS fl,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
         abs(l_discount - 0.05) AS adisc,
         round(pow(l_quantity, 2), 6) AS q2,
         round(sqrt(l_quantity), 6) AS qs,
         round(ln(l_quantity), 6) AS qln,
         round(exp(l_discount), 6) AS edisc,
         CAST(CASE WHEN l_discount - 0.04 > 0 THEN 1
                   WHEN l_discount - 0.04 < 0 THEN -1 ELSE 0 END AS INT) AS sgn,
         ((l_orderkey - 3) % 7 + 7) % 7 AS pm
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_fn_array" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings)
         SELECT vec_id,
         CAST(len(v) AS INT) AS dim,
         round(v[1], 6) AS first_v,
         CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
         round(list_max(v), 6) AS maxv,
         round(list_min(v), 6) AS minv,
         round(list_max(list_transform(v, x -> x * 2)), 6) AS max2,
         CAST(len(list_filter(v[1:32], x -> x > 0)) AS INT) AS n_pos_half,
         round(v[1] * list_reverse(v)[1] + v[2] * list_reverse(v)[2], 6) AS dotrev2
         FROM e ORDER BY vec_id""",
    "q_fn_map" ->
      """SELECT event_id,
         array_to_string(list_sort(json_keys(props)), ',') AS keys,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         CAST(len(json_keys(props)) AS INT) AS n_keys
         FROM events ORDER BY event_id""",
    "q_fn_json" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS k_str,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
         json_extract_string(props, '$.missing') AS k_missing
         FROM events ORDER BY event_id""",
    "q_fn_cond" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 250000.0 THEN 'high'
              WHEN o_totalprice > 100000.0 THEN 'mid'
              ELSE 'low' END AS bucket,
         coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
         greatest(o_totalprice, 50000.0) AS gx,
         least(o_custkey, o_orderkey) AS lk,
         coalesce(o_orderpriority, 'NONE') AS pri
         FROM orders ORDER BY o_orderkey"""
  )
}
