package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 24: the point-in-time (PIT) dimension join
  * and the weekly revenue-concentration trend.
  *
  * Determinism contract (SURVEY §2.13): PIT membership is an integer
  * microsecond interval compare with a unique latest-version pick;
  * concentration terms are truncating integer micro-share products.
  */
object Extras61 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // POINT-IN-TIME JOIN — the feature-store correctness primitive:
    // each purchase event joins the SCD2 behavioral version (the
    // q_scd2 island relation) the user was in STRICTLY BEFORE the
    // purchase instant — never a concurrent or later one (no feature
    // leakage; the purchase's own island starts AT the purchase, so a
    // non-strict compare would trivially self-match). Versions per user are bounded
    // by that user's type islands, so the per-user candidate join is
    // alphabet-bounded; the latest-valid pick is a row_number over
    // (from_us desc) with unique tie-breaks. Emit: purchases per
    // state-at-purchase with exact value cents.
    "q_join_pit" -> ((s, d) => {
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val versions = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wTyp))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(unix_micros(col("ts"))).as("from_us"))
        .select(col("user_id").as("vu"), col("event_type").as("state"),
          col("from_us"))
      val purchases = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("p_us"),
          (dec(col("value")) * 100).cast("long").as("cents"))
      val pit = purchases.join(versions,
          col("user_id") === col("vu") && col("from_us") < col("p_us"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"), col("event_id"))
            .orderBy(col("from_us").desc, col("state"))))
        .where(col("rk") === 1)
      pit.groupBy(col("state"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
        .select(col("state"), col("n_purchases"), col("cents"),
          r6(col("cents").cast("double") / col("n_purchases").cast("double")
            / 100.0).as("avg_value"))
        .orderBy("state")
    }),

    // HHI TREND — weekly revenue concentration across priorities (is
    // the mix concentrating or diversifying?): shares in EXACT integer
    // micro-units per (week, priority), HHI as the truncating integer
    // Σ share²/1e6 — both engines fold identical integers. The
    // (week × priority) relation is calendar×alphabet-bounded.
    "q_ts_hhi_trend" -> ((s, d) => {
      val wp = Tables.orders(s, d)
        .select(expr("datediff(to_date(o_orderdate), DATE'1970-01-05') div 7")
          .as("week"), col("o_orderpriority").as("prio"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .groupBy(col("week"), col("prio"))
        .agg(sum(col("cents")).as("c"))
      val wt = Window.partitionBy(col("week"))
      wp.withColumn("tot", sum(col("c")).over(wt))
        .withColumn("share_micro", expr("c * 1000000 div tot"))
        .groupBy(col("week"))
        .agg(count(lit(1)).as("n_groups"), max(col("tot")).as("week_cents"),
          sum(expr("share_micro * share_micro div 1000000"))
            .as("hhi_micro"))
        .select(col("week"), col("n_groups"), col("week_cents"),
          col("hhi_micro"),
          (col("hhi_micro").cast("double") / 1e6).as("hhi"))
        .orderBy("week")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_join_pit" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts::TIMESTAMP) AS us, value
                 FROM events),
            r AS (SELECT user_id, event_id, event_type, us,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS ra,
                    row_number() OVER (PARTITION BY user_id, event_type
                      ORDER BY us, event_id) AS rt
                  FROM e),
            v AS (SELECT user_id AS vu, event_type AS state,
                    CAST(MIN(us) AS BIGINT) AS from_us
                  FROM r GROUP BY user_id, event_type, ra - rt),
            p AS (SELECT user_id, event_id, us AS p_us,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                  FROM e WHERE event_type = 'purchase'),
            j AS (SELECT p.user_id, p.event_id, p.cents, v.state,
                    row_number() OVER (PARTITION BY p.user_id, p.event_id
                      ORDER BY v.from_us DESC, v.state) AS rk
                  FROM p JOIN v ON v.vu = p.user_id
                    AND v.from_us < p.p_us)
         SELECT state, CAST(COUNT(*) AS BIGINT) AS n_purchases,
                CAST(SUM(cents) AS BIGINT) AS cents,
                round(CAST(SUM(cents) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS avg_value
         FROM j WHERE rk = 1 GROUP BY state ORDER BY state""",

    "q_ts_hhi_trend" ->
      """WITH wp AS (SELECT (CAST(o_orderdate AS DATE)
                             - DATE '1970-01-05') // 7 AS week,
                    o_orderpriority AS prio,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS c
                 FROM orders GROUP BY 1, 2),
            t AS (SELECT week, prio, c,
                    SUM(c) OVER (PARTITION BY week) AS tot
                  FROM wp),
            sm AS (SELECT week, CAST(tot AS BIGINT) AS tot,
                     c * 1000000 // tot AS share_micro
                   FROM t)
         SELECT week, CAST(COUNT(*) AS BIGINT) AS n_groups,
                MAX(tot) AS week_cents,
                CAST(SUM(share_micro * share_micro // 1000000) AS BIGINT)
                  AS hhi_micro,
                CAST(SUM(share_micro * share_micro // 1000000) AS DOUBLE)
                  / 1e6 AS hhi
         FROM sm GROUP BY week ORDER BY week"""
  )
}
