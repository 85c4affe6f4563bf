package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 additions, part 5: ORDER BY ALL parser surface,
  * seasonal-naive forecast errors, running-record analysis, and a
  * cart-abandonment funnel readout.
  *
  * Determinism contract (SURVEY §2.13): the series keys ride the
  * exact whole-dollar daily spine; all errors/gaps are exact BIGINT
  * differences; abandonment windows compare exact epoch microseconds
  * (tsUs — the session-thresholds lesson); the single rate column is
  * one shared IEEE division.
  */
object Extras151 {
  import graft.Det._

  private def dailyUsd(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .as("vc"))
      .select(col("dt"), expr("vc div 100").as("v"))

  private val DailySql =
    """daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) // 100 AS BIGINT) AS v
       FROM orders GROUP BY 1)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ORDER BY ALL — the positional-free ANSI-ish sort-everything
    // surface (GROUP BY ALL is q_sql_groupby_all; this grades the
    // ORDER side, both engines support it natively).
    "q_sql_order_by_all" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders_oba")
      s.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM v_orders_oba
        GROUP BY ALL
        ORDER BY ALL""")
    }),

    // SEASONAL-NAIVE FORECAST ERRORS: v̂_t = v_{t−7} over the last 28
    // days of the daily series — per-day exact integer errors (the
    // building block under MASE, which q_ts_mase grades as a scalar).
    "q_ts_snaive" -> ((s, d) => {
      val ow = Window.orderBy(col("dt"))
      val w = dailyUsd(s, d)
        .withColumn("pos", row_number().over(ow).cast("long"))
        .withColumn("f", lag(col("v"), 7).over(ow))
      val mx = w.agg(max(col("pos")).as("mp"))
      w.crossJoin(broadcast(mx))
        .where(col("pos") > col("mp") - 28)
        .select(col("dt"), col("v"), col("f"),
          (col("v") - col("f")).as("err"))
        .orderBy(col("dt"))
    }),

    // RUNNING RECORDS: days that set a new all-time daily-revenue
    // high, numbered, with the day gap since the previous record —
    // the record-progression readout (strictly-greater rule; the
    // first day is record #1 with a NULL gap).
    "q_ts_records" -> ((s, d) => {
      val ow = Window.orderBy(col("dt"))
      val recs = dailyUsd(s, d)
        .withColumn("prevmax",
          max(col("v")).over(ow.rowsBetween(
            Window.unboundedPreceding, -1)))
        .where(col("prevmax").isNull || col("v") > col("prevmax"))
      recs
        .withColumn("record_no",
          row_number().over(Window.orderBy(col("dt"))).cast("long"))
        .withColumn("gap_days",
          datediff(col("dt"), lag(col("dt"), 1)
            .over(Window.orderBy(col("dt")))).cast("long"))
        .select(col("record_no"), col("dt"), col("v"), col("gap_days"))
        .orderBy(col("record_no"))
    }),

    // CART ABANDONMENT: per click-date, the user-days with ≥1 click
    // where NO purchase by the same user lands within 1h of the
    // FIRST click — exact-µs window compare (the session-thresholds
    // rule), one IEEE division for the rate.
    "q_evt_cart_abandonment" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val carts = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), to_date(col("ts")).as("dt"))
        .agg(min(tsUs(col("ts"))).as("c_us"),
          count(lit(1)).as("n_clicks"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), tsUs(col("ts")).as("p_us"))
      val joined = carts.join(purch, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("dt"), col("c_us"),
          col("n_clicks"))
        .agg(max(when(col("p_us").between(col("c_us"),
          col("c_us") + lit(3600000000L)), 1L).otherwise(0L))
          .as("bought"))
      joined.groupBy(col("dt"))
        .agg(count(lit(1)).as("carts"),
          sum(lit(1L) - col("bought")).as("abandoned"))
        .select(col("dt"), col("carts"), col("abandoned"),
          r6(col("abandoned").cast("double")
            / col("carts").cast("double")).as("abandon_rate"))
        .orderBy(col("dt"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_sql_order_by_all" ->
      """SELECT o_orderpriority, o_orderstatus,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY ALL ORDER BY ALL""",

    "q_ts_snaive" ->
      s"""WITH $DailySql,
            w AS (SELECT dt, v,
                    row_number() OVER (ORDER BY dt) AS pos,
                    lag(v, 7) OVER (ORDER BY dt) AS f
                  FROM daily),
            mx AS (SELECT MAX(pos) AS mp FROM w)
         SELECT dt, v, f, CAST(v - f AS BIGINT) AS err
         FROM w, mx WHERE pos > mp - 28 ORDER BY dt""",

    "q_ts_records" ->
      s"""WITH $DailySql,
            r AS (SELECT dt, v,
                    MAX(v) OVER (ORDER BY dt
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prevmax
                  FROM daily),
            recs AS (SELECT dt, v FROM r
                     WHERE prevmax IS NULL OR v > prevmax)
         SELECT CAST(row_number() OVER (ORDER BY dt) AS BIGINT)
                  AS record_no,
                dt, v,
                CAST(dt - lag(dt, 1) OVER (ORDER BY dt) AS BIGINT)
                  AS gap_days
         FROM recs ORDER BY record_no""",

    "q_evt_cart_abandonment" ->
      """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts
                    FROM events),
            carts AS (SELECT user_id, CAST(ts AS DATE) AS dt,
                CAST(MIN(epoch_us(ts)) AS BIGINT) AS c_us,
                CAST(COUNT(*) AS BIGINT) AS n_clicks
              FROM e WHERE event_type = 'click'
              GROUP BY 1, 2),
            purch AS (SELECT user_id,
                CAST(epoch_us(ts) AS BIGINT) AS p_us
              FROM e WHERE event_type = 'purchase'),
            ud AS (SELECT c.user_id, c.dt, c.c_us, c.n_clicks,
                MAX(CASE WHEN p.p_us BETWEEN c.c_us
                  AND c.c_us + 3600000000 THEN 1 ELSE 0 END)
                  AS bought
              FROM carts c LEFT JOIN purch p USING (user_id)
              GROUP BY 1, 2, 3, 4)
         SELECT dt, CAST(COUNT(*) AS BIGINT) AS carts,
                CAST(SUM(1 - COALESCE(bought, 0)) AS BIGINT)
                  AS abandoned,
                round(CAST(SUM(1 - COALESCE(bought, 0)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS abandon_rate
         FROM ud GROUP BY dt ORDER BY dt"""
  )
}
