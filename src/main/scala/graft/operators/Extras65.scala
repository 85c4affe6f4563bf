package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-10 additions, part 3: discrete-time hazard (Nelson-Aalen),
  * temporal distribution drift via a two-half KS test, and the
  * time-to-Nth-purchase distribution.
  *
  * Determinism contract (SURVEY §2.13): hazards are exact integer ppm
  * divisions (never an IEEE value in a cumulative sum); the KS supremum
  * is found on exact DECIMAL cross-products; order statistics are exact
  * discrete positions, never interpolated midpoints.
  */
object Extras65 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DISCRETE-TIME HAZARD + NELSON-AALEN — weekly repeat-purchase
    // hazard: h(w) = events(w)/at-risk(w) with single-order customers
    // right-censored at the window end (the q_evt_survival
    // construction at week grain). The at-risk count is an exclusive
    // cumulative sum over the WEEK spine (bounded relation); h is an
    // exact ppm integer division and the Nelson-Aalen cumulative
    // hazard is a running sum of those exact integers — no IEEE value
    // enters any cumulative stage.
    "q_evt_hazard" -> ((s, d) => {
      val byCust = Tables.orders(s, d)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("dt"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("dt"), col("o_orderkey"))))
      val firstTwo = byCust.where(col("rn") <= 2)
        .groupBy(col("o_custkey"))
        .agg(min(col("dt")).as("d1"),
          max(when(col("rn") === 2, col("dt"))).as("d2"))
      val maxDate = Tables.orders(s, d)
        .agg(max(to_date(col("o_orderdate"))).as("dmax"))
      val durations = firstTwo.crossJoin(broadcast(maxDate))
        .select(
          (when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
            .otherwise(datediff(col("dmax"), col("d1")))
            .cast("long") / lit(7L)).cast("long").as("wk"),
          col("d2").isNotNull.as("is_event"))
      val byWk = durations.groupBy(col("wk"))
        .agg(sum(when(col("is_event"), 1L).otherwise(0L)).as("d_events"),
          sum(when(col("is_event"), 0L).otherwise(1L)).as("d_cens"))
      val n = durations.agg(count(lit(1)).as("n_subjects"))
      val before = Window.orderBy(col("wk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val upto = Window.orderBy(col("wk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byWk.crossJoin(broadcast(n))
        .withColumn("removed_before",
          coalesce(sum(col("d_events") + col("d_cens")).over(before),
            lit(0L)))
        .withColumn("n_risk", col("n_subjects") - col("removed_before"))
        .withColumn("h_ppm", expr("d_events * 1000000 div n_risk"))
        .withColumn("cum_h_ppm", sum(col("h_ppm")).over(upto))
        .where(col("d_events") > 0)
        .select(col("wk"), col("d_events"), col("d_cens"), col("n_risk"),
          col("h_ppm"), col("cum_h_ppm"))
        .orderBy("wk")
    }),

    // DISTRIBUTION DRIFT (two-half KS) — D = sup|F1−F2| between order
    // values of the FIRST and SECOND calendar half of the data (the
    // "did this quarter's traffic change shape" monitor; the
    // continuous-distribution companion of the binned q_dq_psi). The
    // split date is a broadcast 1-row min/max midpoint; the supremum
    // walks the distinct-cents grid on exact DECIMAL cross-products
    // (the q_agg_ks_test kernel); D and its normal-scaled z are the
    // shared IEEE tail.
    "q_dq_drift_ks" -> ((s, d) => {
      val span = Tables.orders(s, d)
        .agg(min(to_date(col("o_orderdate"))).as("dmin"),
          max(to_date(col("o_orderdate"))).as("dmax"))
      val grid = Tables.orders(s, d)
        .crossJoin(broadcast(span))
        .select((dec(col("o_totalprice")) * 100).cast("long").as("v"),
          (datediff(to_date(col("o_orderdate")), col("dmin")) * 2
            <= datediff(col("dmax"), col("dmin"))).as("g1"))
        .groupBy(col("v"))
        .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("c2"))
      val cum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      grid
        .withColumn("cum1", sum(col("c1")).over(cum).cast("decimal(38,0)"))
        .withColumn("cum2", sum(col("c2")).over(cum).cast("decimal(38,0)"))
        .withColumn("n1", sum(col("c1")).over(all))
        .withColumn("n2", sum(col("c2")).over(all))
        .withColumn("num",
          abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
            .cast("decimal(38,0)"))
        .orderBy(col("num").desc, col("v"))
        .limit(1)
        .select(col("n1"), col("n2"), col("v").as("at_cents"),
          (col("num").cast("double")
            / (col("n1").cast("double") * col("n2").cast("double")))
            .as("d_stat"),
          r6((col("num").cast("double")
            / (col("n1").cast("double") * col("n2").cast("double")))
            * sqrt(col("n1").cast("double") * col("n2").cast("double")
              / (col("n1") + col("n2")).cast("double"))).as("ks_z"))
    }),

    // TIME TO NTH PURCHASE — days from a user's 1st to 3rd purchase
    // event, summarized as exact discrete order statistics (min, lower
    // median, discrete p90, max) over the qualifying users. Purchase
    // ranks are min-by over unique (ts, event_id) — engine-exact; the
    // gap relation is user-grain (one shuffle); the order statistics
    // ride one sorted window over it.
    "q_evt_time_to_nth" -> ((s, d) => {
      val p = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      val gaps = p.where(col("rn").isin(1, 3))
        .groupBy(col("user_id"))
        .agg(min(when(col("rn") === 1, tsUs(col("ts")))).as("t1"),
          max(when(col("rn") === 3, tsUs(col("ts")))).as("t3"))
        .where(col("t3").isNotNull)
        .select(expr("(t3 - t1) div 86400000000").as("gap_days"))
      val w = Window.orderBy(col("gap_days"))
      val wAll = Window.partitionBy(lit(1))
      gaps
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .agg(max(col("n")).as("n_users"),
          min(col("gap_days")).as("min_days"),
          max(when(col("rn") === expr("(n + 1) div 2"),
            col("gap_days"))).as("p50_days"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"),
            col("gap_days"))).as("p90_days"),
          max(col("gap_days")).as("max_days"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_hazard" ->
      """WITH r AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
                 FROM orders),
            ft AS (SELECT o_custkey, MIN(dt) AS d1,
                     MAX(CASE WHEN rn = 2 THEN dt END) AS d2
                   FROM r WHERE rn <= 2 GROUP BY o_custkey),
            mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax
                   FROM orders),
            dur AS (SELECT CAST(CASE WHEN d2 IS NOT NULL
                      THEN date_diff('day', d1, d2)
                      ELSE date_diff('day', d1, dmax) END AS BIGINT)
                      // 7 AS wk,
                      (d2 IS NOT NULL) AS is_event
                    FROM ft, mx),
            bw AS (SELECT wk,
                     CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END)
                       AS BIGINT) AS d_events,
                     CAST(SUM(CASE WHEN is_event THEN 0 ELSE 1 END)
                       AS BIGINT) AS d_cens
                   FROM dur GROUP BY wk),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects FROM dur),
            c AS (SELECT wk, d_events, d_cens,
                    n_subjects - COALESCE(SUM(d_events + d_cens)
                      OVER (ORDER BY wk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS n_risk
                  FROM bw, nn),
            h AS (SELECT wk, d_events, d_cens, n_risk,
                    d_events * 1000000 // n_risk AS h_ppm
                  FROM c)
         SELECT wk, d_events, d_cens, CAST(n_risk AS BIGINT) AS n_risk,
                CAST(h_ppm AS BIGINT) AS h_ppm,
                CAST(SUM(h_ppm) OVER (ORDER BY wk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_h_ppm
         FROM h WHERE d_events > 0
         ORDER BY wk""",

    "q_dq_drift_ks" ->
      """WITH span AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS dmin,
                      MAX(CAST(o_orderdate AS DATE)) AS dmax
                    FROM orders),
            grid AS (SELECT v,
                     CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS c1,
                     CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT)
                       AS c2
                   FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) AS v,
                           date_diff('day', dmin,
                             CAST(o_orderdate AS DATE)) * 2
                             <= date_diff('day', dmin, dmax) AS g1
                         FROM orders, span)
                   GROUP BY v),
            c AS (SELECT v, c1, c2,
                    CAST(SUM(c1) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,0)) AS cum1,
                    CAST(SUM(c2) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,0)) AS cum2,
                    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                    CAST(SUM(c2) OVER () AS BIGINT) AS n2
                  FROM grid),
            top AS (SELECT n1, n2, v,
                    CAST(abs(cum1 * n2 - cum2 * n1) AS DECIMAL(38,0))
                      AS num
                  FROM c ORDER BY num DESC, v LIMIT 1)
         SELECT n1, n2, v AS at_cents,
                CAST(num AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
                round(CAST(num AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                  * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    / CAST(n1 + n2 AS DOUBLE)), 6) AS ks_z
         FROM top""",

    "q_evt_time_to_nth" ->
      """WITH p AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY ts::TIMESTAMP, event_id) AS rn
                 FROM events WHERE event_type = 'purchase'),
            g AS (SELECT CAST((MAX(CASE WHEN rn = 3
                        THEN epoch_us(ts) END)
                      - MIN(CASE WHEN rn = 1 THEN epoch_us(ts) END))
                      // 86400000000 AS BIGINT) AS gap_days
                  FROM p WHERE rn IN (1, 3)
                  GROUP BY user_id
                  HAVING MAX(CASE WHEN rn = 3 THEN epoch_us(ts) END)
                    IS NOT NULL),
            r AS (SELECT gap_days,
                    row_number() OVER (ORDER BY gap_days) AS rn,
                    COUNT(*) OVER () AS n
                  FROM g)
         SELECT CAST(MAX(n) AS BIGINT) AS n_users,
                MIN(gap_days) AS min_days,
                MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_days END)
                  AS p50_days,
                MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_days END)
                  AS p90_days,
                MAX(gap_days) AS max_days
         FROM r"""
  )
}
