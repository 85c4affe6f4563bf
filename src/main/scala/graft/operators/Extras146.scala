package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-12 additions, part 10: time-decay attribution (the fifth
  * member of the attribution family — weight halves per day of
  * distance from the purchase, exact powers of two), a categorical
  * domain-whitelist check (the dq tripwire for enum drift), the
  * trimean (Tukey's (Q1+2·Q2+Q3)/4 on exact discrete picks), and a
  * third array-function parity slab (slice/sequence/reverse/
  * element_at(-1)/contains).
  *
  * Scale shape: attribution_decay is one user-shuffle window pass +
  * a type fold; domain is two fact passes into enum-bounded grids;
  * trimean is three percentile_disc picks over one sorted spine;
  * array3 is a codegen'd projection + bounded agg.
  *
  * Determinism contract (SURVEY §2.13): decay weights are
  * micro-units div 2^days (exact halving, truncating division — no
  * IEEE until the final share division); trimean picks discrete
  * order statistics by row_number (never interpolated); domain and
  * array3 are exact integers end to end.
  */
object Extras146 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME-DECAY ATTRIBUTION — each purchase credits its user's
    // preceding 14 days of non-purchase touches with weight
    // 1e6 div 2^(days-before); per-type credit shares.
    "q_evt_attribution_decay" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          tsUs(col("ts")).as("us"), col("event_id"))
      val buys = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"),
          col("event_id").as("p_id"))
      val touches = e.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("t"),
          col("us").as("t_us"))
      val cred = buys.join(touches, Seq("user_id"))
        .where(col("t_us") <= col("p_us")
          && col("t_us") > col("p_us") - lit(14L * 86400000000L))
        .withColumn("days_before",
          expr("(p_us - t_us) div 86400000000"))
        .withColumn("w_micro",
          expr("1000000 div shiftleft(CAST(1 AS BIGINT), CAST(days_before AS INT))"))
      val byType = cred.groupBy(col("t").as("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("w_micro")).as("credit_micro"))
      byType
        .withColumn("share", r6(col("credit_micro").cast("double")
          / sum(col("credit_micro")).over(
            Window.partitionBy(lit(1))).cast("double")))
        .orderBy("touch_type")
    }),

    // DOMAIN WHITELIST — enum-drift tripwire: rows outside the stated
    // domains of event_type and o_orderstatus.
    "q_dq_domain" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type").isin(
            "view", "click", "purchase", "signup", "error"), 0L)
            .otherwise(1L)).as("bad"))
        .select(lit("events.event_type").as("field"), col("n"), col("bad"))
      val os = Tables.orders(s, d)
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus").isin("F", "O", "P"), 0L)
            .otherwise(1L)).as("bad"))
        .select(lit("orders.o_orderstatus").as("field"), col("n"),
          col("bad"))
      ev.unionByName(os)
        .withColumn("ok", col("bad") === 0)
        .orderBy("field")
    }),

    // TRIMEAN — Tukey's (Q1 + 2·Q2 + Q3) / 4 of order cents, each
    // quartile the exact LOWER discrete order statistic.
    "q_agg_trimean" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select((dec(col("o_totalprice")) * 100).cast("long").as("c"))
      val ranked = base
        .withColumn("rn", row_number().over(Window.orderBy(col("c")))
          .cast("long"))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nn"))))
      val picks = ranked
        .where(col("rn") === expr("(nn + 3) div 4")
          || col("rn") === expr("(nn + 1) div 2")
          || col("rn") === expr("(3 * nn + 1) div 4"))
        .withColumn("which",
          when(col("rn") === expr("(nn + 3) div 4"), "q1")
            .when(col("rn") === expr("(nn + 1) div 2"), "q2")
            .otherwise("q3"))
      picks.groupBy(col("nn").as("n"))
        .agg(min(when(col("which") === "q1", col("c"))).as("q1"),
          min(when(col("which") === "q2", col("c"))).as("q2"),
          min(when(col("which") === "q3", col("c"))).as("q3"))
        .select(col("n"), col("q1"), col("q2"), col("q3"),
          r6((col("q1") + col("q2") * 2 + col("q3")).cast("double")
            / 4.0 / 100.0).as("trimean_usd"))
    }),

    // ARRAY PARITY III — slice / sequence / reverse / last element /
    // contains, folded to exact checksums.
    "q_fn_array3" -> ((s, d) => {
      val a = expr("sequence(1L, 1 + user_id % 5)")
      val t = Tables.events(s, d).select(
        col("event_id"),
        size(a).cast("long").as("seq_n"),
        aggregate(slice(a, 1, 3), lit(0L), (acc, x) => acc + x)
          .as("slice_sum"),
        element_at(reverse(a), 1).as("rev_head"),
        element_at(a, -1).as("last_el"),
        array_contains(a, col("user_id") % 5 + 1).cast("long")
          .as("has_top"))
      t.agg(count(lit(1)).as("n"), sum(col("seq_n")).as("seq_total"),
        sum(col("slice_sum")).as("slice_total"),
        sum(col("rev_head")).as("rev_total"),
        sum(col("last_el")).as("last_total"),
        sum(col("has_top")).as("contains_total"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_attribution_decay" ->
      """WITH e AS (SELECT user_id, event_type,
                    epoch_us(ts::TIMESTAMP) AS us, event_id
                 FROM events),
            buys AS (SELECT user_id, us AS p_us FROM e
                     WHERE event_type = 'purchase'),
            touches AS (SELECT user_id, event_type AS t, us AS t_us
                        FROM e WHERE event_type <> 'purchase'),
            cred AS (SELECT touches.t,
                    1000000 // (CAST(1 AS BIGINT)
                      << CAST((p_us - t_us) // 86400000000 AS INT))
                      AS w_micro
                  FROM buys JOIN touches USING (user_id)
                  WHERE t_us <= p_us
                    AND t_us > p_us - 14 * 86400000000),
            byt AS (SELECT t AS touch_type,
                    CAST(COUNT(*) AS BIGINT) AS n_touches,
                    CAST(SUM(w_micro) AS BIGINT) AS credit_micro
                  FROM cred GROUP BY 1)
         SELECT touch_type, n_touches, credit_micro,
                round(CAST(credit_micro AS DOUBLE)
                  / CAST(SUM(credit_micro) OVER () AS DOUBLE), 6)
                  AS share
         FROM byt ORDER BY touch_type""",

    "q_dq_domain" ->
      """WITH ev AS (SELECT 'events.event_type' AS field,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN event_type IN ('view', 'click',
                        'purchase', 'signup', 'error') THEN 0 ELSE 1 END)
                      AS BIGINT) AS bad
                 FROM events),
            os AS (SELECT 'orders.o_orderstatus' AS field,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                        THEN 0 ELSE 1 END) AS BIGINT) AS bad
                 FROM orders)
         SELECT field, n, bad, bad = 0 AS ok FROM ev
         UNION ALL
         SELECT field, n, bad, bad = 0 AS ok FROM os
         ORDER BY field""",

    "q_agg_trimean" ->
      """WITH base AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * 100 AS BIGINT) AS c
                 FROM orders),
            ranked AS (SELECT c,
                    CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS rn
                  FROM base),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
            picks AS (SELECT rn, c,
                    CASE WHEN rn = (nn + 3) // 4 THEN 'q1'
                         WHEN rn = (nn + 1) // 2 THEN 'q2'
                         ELSE 'q3' END AS which, nn
                  FROM ranked, nn
                  WHERE rn = (nn + 3) // 4 OR rn = (nn + 1) // 2
                     OR rn = (3 * nn + 1) // 4)
         SELECT nn AS n,
                MIN(CASE WHEN which = 'q1' THEN c END) AS q1,
                MIN(CASE WHEN which = 'q2' THEN c END) AS q2,
                MIN(CASE WHEN which = 'q3' THEN c END) AS q3,
                round(CAST(MIN(CASE WHEN which = 'q1' THEN c END)
                    + 2 * MIN(CASE WHEN which = 'q2' THEN c END)
                    + MIN(CASE WHEN which = 'q3' THEN c END) AS DOUBLE)
                  / 4.0 / 100.0, 6) AS trimean_usd
         FROM picks GROUP BY nn""",

    "q_fn_array3" ->
      """WITH t AS (SELECT event_id, user_id,
                    range(1, 2 + user_id % 5) AS a
                 FROM events),
            x AS (SELECT event_id, CAST(len(a) AS BIGINT) AS seq_n,
                    CAST(list_sum(a[1:3]) AS BIGINT) AS slice_sum,
                    CAST(list_reverse(a)[1] AS BIGINT) AS rev_head,
                    CAST(a[-1] AS BIGINT) AS last_el,
                    CAST(list_contains(a, CAST(user_id % 5 + 1
                      AS BIGINT)) AS BIGINT) AS has_top
                  FROM t)
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(seq_n) AS BIGINT) AS seq_total,
                CAST(SUM(slice_sum) AS BIGINT) AS slice_total,
                CAST(SUM(rev_head) AS BIGINT) AS rev_total,
                CAST(SUM(last_el) AS BIGINT) AS last_total,
                CAST(SUM(has_top) AS BIGINT) AS contains_total
         FROM x"""
  )
}
