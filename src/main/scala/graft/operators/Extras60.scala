package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 23: the time-constrained ordered funnel,
  * period-over-period share shift, and per-state dwell time.
  *
  * Determinism contract (SURVEY §2.13): funnel steps are min-over-
  * filtered-timestamp chains with integer time-window predicates;
  * shares are exact integer micro-units; dwell moments fold exact
  * seconds.
  */
object Extras60 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME-CONSTRAINED FUNNEL — view → click → purchase where each
    // step lands within 72 h of the previous (the conversion-window
    // funnel; the unconstrained adjacency funnel is q_evt_funnel).
    // Each user's step time is the MIN qualifying timestamp — a chain
    // of conditional aggregates over one user shuffle, no self-join;
    // window predicates are integer microsecond compares.
    "q_evt_funnel_windowed" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val win = 72L * 3600 * 1000000
      val steps = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("us"))).as("t1"))
        .join(ev.groupBy(col("user_id"))
          .agg(collect_list(when(col("event_type") === "click",
            col("us"))).as("clicks"),
            collect_list(when(col("event_type") === "purchase",
              col("us"))).as("buys")), "user_id")
        .withColumn("t2", expr(
          s"array_min(filter(clicks, x -> x >= t1 AND x <= t1 + $win))"))
        .withColumn("t3", expr(
          s"array_min(filter(buys, x -> x >= t2 AND x <= t2 + $win))"))
      steps.agg(count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("step1_view"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("step2_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L))
          .as("step3_purchase"))
        .select(col("n_users"), col("step1_view"), col("step2_click"),
          col("step3_purchase"),
          r6(col("step3_purchase").cast("double")
            / col("step1_view").cast("double")).as("conversion"))
    }),

    // SHARE SHIFT — each priority's revenue share in the first half of
    // the calendar span vs the second (the period-over-period mix
    // report): the half boundary is the integer midpoint date of the
    // span (broadcast 1-row), shares are EXACT integer micro-units, and
    // the emitted shift is an exact micro difference.
    "q_agg_share_shift" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("dt"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val span = o.agg(min(col("dt")).as("dmin"), max(col("dt")).as("dmax"))
        .select(expr("date_add(dmin, CAST(datediff(dmax, dmin) div 2 AS INT))")
          .as("mid"))
      val halves = o.crossJoin(broadcast(span))
        .withColumn("h2", col("dt") > col("mid"))
      val byPrio = halves.groupBy(col("prio"))
        .agg(sum(when(!col("h2"), col("cents")).otherwise(0L)).as("c1"),
          sum(when(col("h2"), col("cents")).otherwise(0L)).as("c2"))
      val tot = byPrio.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      byPrio.crossJoin(broadcast(tot))
        .select(col("prio"), col("c1"), col("c2"),
          expr("c1 * 1000000 div t1").as("share1_micro"),
          expr("c2 * 1000000 div t2").as("share2_micro"),
          (expr("c2 * 1000000 div t2") - expr("c1 * 1000000 div t1"))
            .as("shift_micro"))
        .orderBy("prio")
    }),

    // DWELL TIME — how long a user stays "in" each event type before
    // the next event (the state-machine dwell report; the duration
    // companion of the q_evt_funnel transition counts). Gaps are exact
    // integer seconds attributed to the CURRENT state; per-state mean
    // is the one IEEE division.
    "q_evt_dwell_time" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("dwell_s",
          expr("(lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) - us) div 1000000"))
        .where(col("dwell_s").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("dwell_s")).as("sum_s"),
          max(col("dwell_s")).as("max_s"))
        .select(col("event_type"), col("n"), col("sum_s"), col("max_s"),
          r6(col("sum_s").cast("double") / col("n").cast("double"))
            .as("mean_dwell_s"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type,
                           epoch_us(ts::TIMESTAMP) AS us
                 FROM events),
            s1 AS (SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN us END) AS t1
                   FROM ev GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.us) AS t2
                   FROM ev e JOIN s1 ON s1.user_id = e.user_id
                   WHERE e.event_type = 'click' AND e.us >= s1.t1
                     AND e.us <= s1.t1 + 259200000000
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.us) AS t3
                   FROM ev e JOIN s2 ON s2.user_id = e.user_id
                   WHERE e.event_type = 'purchase' AND e.us >= s2.t2
                     AND e.us <= s2.t2 + 259200000000
                   GROUP BY e.user_id)
         SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM ev) AS BIGINT)
                  AS n_users,
                CAST((SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL)
                  AS BIGINT) AS step1_view,
                CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS step2_click,
                CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
                  AS step3_purchase,
                round(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL)
                         AS DOUBLE), 6) AS conversion""",

    "q_agg_share_shift" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                    CAST(o_orderdate AS DATE) AS dt,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
                 FROM orders),
            sp AS (SELECT MIN(dt)
                     + CAST((MAX(dt) - MIN(dt)) // 2 AS INT) AS mid
                   FROM o),
            bp AS (SELECT prio,
                     CAST(SUM(CASE WHEN dt <= mid THEN cents ELSE 0 END)
                       AS BIGINT) AS c1,
                     CAST(SUM(CASE WHEN dt > mid THEN cents ELSE 0 END)
                       AS BIGINT) AS c2
                   FROM o, sp GROUP BY prio),
            tt AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1,
                          CAST(SUM(c2) AS BIGINT) AS t2 FROM bp)
         SELECT prio, c1, c2,
                CAST(c1 * 1000000 // t1 AS BIGINT) AS share1_micro,
                CAST(c2 * 1000000 // t2 AS BIGINT) AS share2_micro,
                CAST(c2 * 1000000 // t2 - c1 * 1000000 // t1 AS BIGINT)
                  AS shift_micro
         FROM bp, tt ORDER BY prio""",

    "q_evt_dwell_time" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts::TIMESTAMP) AS us
                 FROM events),
            g AS (SELECT event_type,
                    (lead(us, 1) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) - us) // 1000000 AS dwell_s
                  FROM e)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(dwell_s) AS BIGINT) AS sum_s,
                MAX(dwell_s) AS max_s,
                round(CAST(SUM(dwell_s) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS mean_dwell_s
         FROM g WHERE dwell_s IS NOT NULL
         GROUP BY event_type ORDER BY event_type"""
  )
}
