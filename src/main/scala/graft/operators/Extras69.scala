package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-10 additions, part 7: two-level binary-segmentation
  * changepoint detection, experiment sample-ratio-mismatch audit, and
  * the seasonal (Hirsch-Slack) Mann-Kendall test.
  *
  * Determinism contract (SURVEY §2.13): segment SSEs fold exact
  * DECIMAL(38,0) prefix sums (one IEEE expression tree per candidate,
  * argmin tie-broken by date); SRM counts are exact distinct-user
  * integers; seasonal-MK S and its exact per-season tie-corrected
  * variance are pure integers with one IEEE z tail.
  */
object Extras69 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BINARY-SEGMENTATION CHANGEPOINT — the q_ts_changepoint split,
    // then the best split WITHIN each resulting half (binary
    // segmentation level 2 — the standard multiple-changepoint
    // recursion, unrolled twice). Segment-relative prefix sums derive
    // from the global exclusive prefixes and the broadcast level-1
    // boundary, so the spine is scanned ONCE; each level's argmin is
    // (sse, dt)-ordered — a total order.
    "q_ts_changepoint_binseg" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
      val all = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val seq = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("s1l", coalesce(sum(col("y")).over(pre),
          lit(0L)).cast("decimal(38,0)"))
        .withColumn("s2l", coalesce(sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(pre),
          lit(0L)).cast("decimal(38,0)"))
        .withColumn("s1t", sum(col("y")).over(all).cast("decimal(38,0)"))
        .withColumn("s2t", sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(all).cast("decimal(38,0)"))
      def sse(nl: Column, s1a: Column, s2a: Column,
              nr: Column, s1b: Column, s2b: Column): Column =
        (s2a.cast("double") - s1a.cast("double") * s1a.cast("double")
          / nl.cast("double")) +
        (s2b.cast("double") - s1b.cast("double") * s1b.cast("double")
          / nr.cast("double"))
      val lvl1 = seq.where(col("t") > 1)
        .withColumn("sse", sse(
          col("t") - 1, col("s1l"), col("s2l"),
          col("n") - col("t") + 1, col("s1t") - col("s1l"),
          col("s2t") - col("s2l")))
        .orderBy(col("sse"), col("dt"))
        .limit(1)
        .select(col("t").as("t1"), col("dt").as("dt1"),
          col("s1l").as("b1"), col("s2l").as("b2"), col("sse"))
      val withB = seq.crossJoin(broadcast(lvl1.select(
        col("t1"), col("b1"), col("b2"))))
      val left = withB.where(col("t") > 1 && col("t") < col("t1"))
        .withColumn("sse", sse(
          col("t") - 1, col("s1l"), col("s2l"),
          col("t1") - col("t"), col("b1") - col("s1l"),
          col("b2") - col("s2l")))
        .orderBy(col("sse"), col("dt")).limit(1)
        .select(lit(2L).as("level"), lit("left").as("seg"),
          col("dt").as("break_dt"), col("sse"))
      val right = withB.where(col("t") > col("t1"))
        .withColumn("sse", sse(
          col("t") - col("t1"), col("s1l") - col("b1"),
          col("s2l") - col("b2"),
          col("n") - col("t") + 1, col("s1t") - col("s1l"),
          col("s2t") - col("s2l")))
        .orderBy(col("sse"), col("dt")).limit(1)
        .select(lit(2L).as("level"), lit("right").as("seg"),
          col("dt").as("break_dt"), col("sse"))
      lvl1.select(lit(1L).as("level"), lit("all").as("seg"),
          col("dt1").as("break_dt"), col("sse"))
        .unionByName(left).unionByName(right)
        .orderBy("level", "seg")
    }),

    // SAMPLE-RATIO MISMATCH — the experimentation-platform health
    // check: users assigned by id parity should split 50/50; a skewed
    // split invalidates the experiment before any metric is read.
    // Distinct-user counts per (event_type × variant) plus the overall
    // row; χ² = (na−nb)²/n and z = (na−nb)/√n are the shared IEEE
    // tail over exact integers.
    "q_evt_srm" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          pmod(col("user_id"), lit(2L)).as("v"))
      val byType = base.groupBy(col("event_type"))
        .agg(countDistinct(when(col("v") === 0, col("user_id"))).as("na"),
          countDistinct(when(col("v") === 1, col("user_id"))).as("nb"))
      val overall = base.groupBy()
        .agg(countDistinct(when(col("v") === 0, col("user_id"))).as("na"),
          countDistinct(when(col("v") === 1, col("user_id"))).as("nb"))
        .select(lit("ALL").as("event_type"), col("na"), col("nb"))
      val dd = (col("na") - col("nb")).cast("double")
      val nn = (col("na") + col("nb")).cast("double")
      byType.select(col("event_type"), col("na"), col("nb"))
        .unionByName(overall)
        .select(col("event_type").as("scope"), col("na"), col("nb"),
          r6(dd * dd / nn).as("chi2"),
          r6(dd / sqrt(nn)).as("z_srm"))
        .orderBy("scope")
    }),

    // SEASONAL MANN-KENDALL (Hirsch-Slack) — the trend test that
    // compares only SAME-CALENDAR-MONTH observations across years, so
    // seasonality cannot masquerade as trend: S = Σ_m S_m over the
    // monthly-total spine, Var = Σ_m per-month tie-corrected variance
    // (both exact integers; the monthly spine is calendar-bounded and
    // the pair stage is a BROADCAST month-equality join).
    "q_ts_mann_kendall_seasonal" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(year(to_date(col("o_orderdate"))).as("yr"),
          month(to_date(col("o_orderdate"))).as("m"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val pairs = monthly.as("a").join(broadcast(monthly.as("b")),
          col("a.m") === col("b.m") && col("a.yr") < col("b.yr"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(signum(col("b.y") - col("a.y")).cast("long")).as("s"),
          sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L))
            .as("n_tie_pairs"))
      val varM = monthly
        .groupBy(col("m"), col("y")).agg(count(lit(1)).as("tt"))
        .groupBy(col("m"))
        .agg(sum(col("tt")).as("nm"),
          sum(expr("tt * (tt - 1) * (2 * tt + 5)")).as("tie18"))
        .agg(count(lit(1)).as("n_months"),
          sum(expr("nm * (nm - 1) * (2 * nm + 5) - tie18")).as("var18"))
      pairs.crossJoin(broadcast(varM))
        .select(col("n_months"), col("n_pairs"), col("s"),
          col("n_tie_pairs"),
          r6((col("s").cast("double")
            - signum(col("s").cast("double")))
            / sqrt(col("var18").cast("double") / 18.0)).as("z_smk"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_changepoint_binseg" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            seq AS (SELECT dt,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
                    CAST(COUNT(*) OVER () AS BIGINT) AS n,
                    CAST(COALESCE(SUM(y) OVER (ORDER BY dt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS DECIMAL(38,0)) AS s1l,
                    CAST(COALESCE(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) OVER (ORDER BY dt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS DECIMAL(38,0)) AS s2l,
                    CAST(SUM(y) OVER () AS DECIMAL(38,0)) AS s1t,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) OVER ()
                      AS DECIMAL(38,0)) AS s2t
                  FROM daily),
            lvl1 AS (SELECT t AS t1, dt AS dt1, s1l AS b1, s2l AS b2,
                    (CAST(s2l AS DOUBLE)
                      - CAST(s1l AS DOUBLE) * CAST(s1l AS DOUBLE)
                        / CAST(t - 1 AS DOUBLE))
                    + (CAST(s2t - s2l AS DOUBLE)
                      - CAST(s1t - s1l AS DOUBLE)
                        * CAST(s1t - s1l AS DOUBLE)
                        / CAST(n - t + 1 AS DOUBLE)) AS sse
                  FROM seq WHERE t > 1
                  ORDER BY sse, dt LIMIT 1),
            lft AS (SELECT CAST(2 AS BIGINT) AS level, 'left' AS seg,
                    dt AS break_dt,
                    (CAST(s2l AS DOUBLE)
                      - CAST(s1l AS DOUBLE) * CAST(s1l AS DOUBLE)
                        / CAST(t - 1 AS DOUBLE))
                    + (CAST(b2 - s2l AS DOUBLE)
                      - CAST(b1 - s1l AS DOUBLE) * CAST(b1 - s1l AS DOUBLE)
                        / CAST(t1 - t AS DOUBLE)) AS sse
                  FROM seq, lvl1 WHERE t > 1 AND t < t1
                  ORDER BY sse, dt LIMIT 1),
            rgt AS (SELECT CAST(2 AS BIGINT) AS level, 'right' AS seg,
                    dt AS break_dt,
                    (CAST(s2l - b2 AS DOUBLE)
                      - CAST(s1l - b1 AS DOUBLE) * CAST(s1l - b1 AS DOUBLE)
                        / CAST(t - t1 AS DOUBLE))
                    + (CAST(s2t - s2l AS DOUBLE)
                      - CAST(s1t - s1l AS DOUBLE)
                        * CAST(s1t - s1l AS DOUBLE)
                        / CAST(n - t + 1 AS DOUBLE)) AS sse
                  FROM seq, lvl1 WHERE t > t1
                  ORDER BY sse, dt LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS level, 'all' AS seg,
                dt1 AS break_dt, sse FROM lvl1
         UNION ALL SELECT * FROM lft
         UNION ALL SELECT * FROM rgt
         ORDER BY level, seg""",

    "q_evt_srm" ->
      """WITH base AS (SELECT event_type, user_id, user_id % 2 AS v
                 FROM events),
            bt AS (SELECT event_type AS scope,
                    CAST(COUNT(DISTINCT CASE WHEN v = 0 THEN user_id END)
                      AS BIGINT) AS na,
                    CAST(COUNT(DISTINCT CASE WHEN v = 1 THEN user_id END)
                      AS BIGINT) AS nb
                  FROM base GROUP BY event_type
                  UNION ALL
                  SELECT 'ALL',
                    CAST(COUNT(DISTINCT CASE WHEN v = 0 THEN user_id END)
                      AS BIGINT),
                    CAST(COUNT(DISTINCT CASE WHEN v = 1 THEN user_id END)
                      AS BIGINT)
                  FROM base)
         SELECT scope, na, nb,
                round(CAST(na - nb AS DOUBLE) * CAST(na - nb AS DOUBLE)
                  / CAST(na + nb AS DOUBLE), 6) AS chi2,
                round(CAST(na - nb AS DOUBLE)
                  / sqrt(CAST(na + nb AS DOUBLE)), 6) AS z_srm
         FROM bt ORDER BY scope""",

    "q_ts_mann_kendall_seasonal" ->
      """WITH monthly AS (SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE))
                      AS yr,
                    EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS m,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1, 2),
            p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(CASE WHEN b.y > a.y THEN 1
                              WHEN b.y < a.y THEN -1 ELSE 0 END)
                      AS BIGINT) AS s,
                    CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tie_pairs
                  FROM monthly a JOIN monthly b
                    ON a.m = b.m AND a.yr < b.yr),
            vm AS (SELECT m, CAST(SUM(tt) AS BIGINT) AS nm,
                     CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT)
                       AS tie18
                   FROM (SELECT m, y, CAST(COUNT(*) AS BIGINT) AS tt
                         FROM monthly GROUP BY m, y)
                   GROUP BY m),
            v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
                    CAST(SUM(nm * (nm - 1) * (2 * nm + 5) - tie18)
                      AS BIGINT) AS var18
                  FROM vm)
         SELECT n_months, n_pairs, s, n_tie_pairs,
                round((CAST(s AS DOUBLE)
                  - CASE WHEN s > 0 THEN 1.0
                         WHEN s < 0 THEN -1.0 ELSE 0.0 END)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) AS z_smk
         FROM p, v"""
  )
}
