package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-12 additions, part 8: a fourth string-function parity slab
  * (translate/reverse/repeat/left/right/ascii/position), the ANSI
  * UNPIVOT statement through the SQL parser (the DSL unpivot is
  * q_unpivot; this is the parser surface), a cross-table temporal
  * sanity constraint (ship-before-order violations — the referential
  * sibling of q_dq_referential), and the new-vs-returning revenue
  * split (the first business question every monthly report answers).
  *
  * Scale shape: string4 is one codegen'd projection + bounded agg;
  * unpivot is one pass; temporal_order is the orders⋈lineitem equi
  * join with an integer date predicate; new_vs_returning is one
  * customer-grain first-order window + a month fold.
  *
  * Determinism contract (SURVEY §2.13): string functions are pure
  * and identical across engines on ASCII inputs (stated: p_name /
  * o_orderpriority are ASCII); counts and cents are exact integers;
  * the only doubles are r6 shares.
  */
object Extras144 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STRING PARITY IV — translate/reverse/repeat/left/right/ascii/
    // position over p_name, folded to checksums so the output stays
    // bounded while covering every row.
    "q_fn_string4" -> ((s, d) => {
      val t = Tables.part(s, d).select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        reverse(col("p_name")).as("rv"),
        expr("repeat(left(p_name, 2), 3)").as("rp"),
        expr("right(p_name, 4)").as("rt"),
        ascii(col("p_name")).cast("long").as("ac"),
        expr("position('a' IN p_name)").cast("long").as("ps"))
      t.agg(count(lit(1)).as("n"),
        sum(length(col("tr")).cast("long")).as("tr_len"),
        sum(pmod(md5long(col("rv")), lit(1000000007L))).as("rv_sig"),
        sum(length(col("rp")).cast("long")).as("rp_len"),
        sum(pmod(md5long(col("rt")), lit(1000000007L))).as("rt_sig"),
        sum(col("ac")).as("ascii_sum"),
        sum(col("ps")).as("pos_sum"))
    }),

    // ANSI UNPIVOT — the SQL statement form over a per-status pivot
    // of order counts (melt three hand-pivoted columns back to rows).
    "q_sql_unpivot" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT prio, status, n
        FROM (SELECT o_orderpriority AS prio,
                     SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                       AS f_cnt,
                     SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                       AS o_cnt,
                     SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                       AS p_cnt
              FROM v_orders GROUP BY o_orderpriority)
        UNPIVOT (n FOR status IN (f_cnt, o_cnt, p_cnt))
        ORDER BY prio, status""")
    }),

    // TEMPORAL-ORDER CONSTRAINT — lineitems shipped before their
    // order was placed (a pipeline-corruption tripwire); per-status
    // violation counts and rates.
    "q_dq_temporal_order" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          to_date(col("o_orderdate")).as("od"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("sd") < col("od"), 1L).otherwise(0L))
            .as("n_violations"))
        .withColumn("violation_rate",
          r6(col("n_violations").cast("double")
            / col("n_lines").cast("double")))
        .orderBy("status")
    }),

    // NEW VS RETURNING — monthly revenue split by whether the order
    // is the customer's first-ever (by date, orderkey) or a repeat.
    "q_evt_new_vs_returning" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt"), col("o_orderkey"))
      val base = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("dt"),
          (dec(col("o_totalprice")) * 100).cast("long").as("c"))
        .withColumn("is_new", (row_number().over(w) === 1).cast("int"))
      base.groupBy(trunc(col("dt"), "month").as("ym"))
        .agg(sum(when(col("is_new") === 1, col("c")).otherwise(0L))
            .as("new_cents"),
          sum(when(col("is_new") === 0, col("c")).otherwise(0L))
            .as("ret_cents"),
          sum(col("is_new").cast("long")).as("n_new"),
          count(lit(1)).as("n_orders"))
        .withColumn("new_share", r6(col("new_cents").cast("double")
          / (col("new_cents") + col("ret_cents")).cast("double")))
        .orderBy("ym")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_fn_string4" ->
      """WITH t AS (SELECT p_partkey,
                    translate(p_name, 'aeiou', 'AEIOU') AS tr,
                    reverse(p_name) AS rv,
                    repeat(left(p_name, 2), 3) AS rp,
                    right(p_name, 4) AS rt,
                    CAST(ascii(p_name) AS BIGINT) AS ac,
                    CAST(position('a' IN p_name) AS BIGINT) AS ps
                 FROM part)
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(length(tr)) AS BIGINT) AS tr_len,
                CAST(SUM(CAST(('0x' || substr(md5(rv), 1, 15)) AS BIGINT)
                  % 1000000007) AS BIGINT) AS rv_sig,
                CAST(SUM(length(rp)) AS BIGINT) AS rp_len,
                CAST(SUM(CAST(('0x' || substr(md5(rt), 1, 15)) AS BIGINT)
                  % 1000000007) AS BIGINT) AS rt_sig,
                CAST(SUM(ac) AS BIGINT) AS ascii_sum,
                CAST(SUM(ps) AS BIGINT) AS pos_sum
         FROM t""",

    "q_sql_unpivot" ->
      """SELECT prio, status, CAST(n AS BIGINT) AS n
         FROM (SELECT o_orderpriority AS prio,
                      SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                        AS f_cnt,
                      SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                        AS o_cnt,
                      SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                        AS p_cnt
               FROM orders GROUP BY o_orderpriority)
         UNPIVOT (n FOR status IN (f_cnt, o_cnt, p_cnt))
         ORDER BY prio, status""",

    "q_dq_temporal_order" ->
      """SELECT o_orderstatus AS status,
                CAST(COUNT(*) AS BIGINT) AS n_lines,
                CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE)
                        < CAST(o_orderdate AS DATE) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations,
                round(CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE)
                        < CAST(o_orderdate AS DATE) THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                  AS violation_rate
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY status""",

    "q_evt_new_vs_returning" ->
      """WITH base AS (SELECT o_custkey, o_orderkey,
                    CAST(o_orderdate AS DATE) AS dt,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS c,
                    CASE WHEN row_number() OVER (PARTITION BY o_custkey
                        ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                      = 1 THEN 1 ELSE 0 END AS is_new
                 FROM orders)
         SELECT date_trunc('month', dt) AS ym,
                CAST(SUM(CASE WHEN is_new = 1 THEN c ELSE 0 END)
                  AS BIGINT) AS new_cents,
                CAST(SUM(CASE WHEN is_new = 0 THEN c ELSE 0 END)
                  AS BIGINT) AS ret_cents,
                CAST(SUM(is_new) AS BIGINT) AS n_new,
                CAST(COUNT(*) AS BIGINT) AS n_orders,
                round(CAST(SUM(CASE WHEN is_new = 1 THEN c ELSE 0 END)
                    AS DOUBLE)
                  / CAST(SUM(CASE WHEN is_new = 1 THEN c ELSE 0 END)
                      + SUM(CASE WHEN is_new = 0 THEN c ELSE 0 END)
                    AS DOUBLE), 6) AS new_share
         FROM base GROUP BY 1 ORDER BY ym"""
  )
}
