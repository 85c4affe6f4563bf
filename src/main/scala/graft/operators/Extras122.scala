package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 48: Engle-Granger cointegration (OLS
  * cross-series fit + ADF t on the residual — composes the
  * q_ts_dickey_fuller kernel), per-user inter-event gap trend (the
  * engagement-fatigue slope), and the Hampel outlier filter (rolling
  * median ± 3·1.4826·rolling-MAD on the 25-day window — the robust
  * sibling of q_ts_outlier_iqr).
  *
  * Scale shape: cointegration folds two exact moment sets over the
  * calendar-bounded daily relation; gap_trend is one per-user lag
  * pass + exact per-user OLS sums; hampel rides the same ±12-day
  * collect window as q_win_median_rolling (25-element arrays on the
  * calendar spine).
  *
  * Determinism contract (SURVEY §2.13): the cointegrating fit (a, b)
  * is one shared IEEE chain from exact moments; residuals are
  * quantized to whole cents before the ADF sums (which then ride the
  * exact q_ts_dickey_fuller DECIMAL(38,0) fold). gap_trend slopes are
  * exact-integer ratios, one IEEE division, nano-quantized before the
  * population fold. hampel's flag gate is cross-multiplied exact:
  * |v−med|·10000 > mad·44478 (3·1.4826 scaled) — no float ever
  * decides a flag.
  */
object Extras122 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ENGLE-GRANGER — daily revenue (y) on daily order count (x):
    // OLS fit, then the ADF t-statistic on the cents-quantized
    // residual. A strongly negative t_eg = the spread mean-reverts =
    // cointegrated.
    "q_ts_cointegration" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(count(lit(1)).as("x"),
          sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val fit = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
          sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"))
        .select(col("n"),
          ((col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")
              / col("n").cast("double")) /
            (col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")
                / col("n").cast("double"))).as("b"))
      // a folded into the residual mean: e centered by construction
      // below (the ADF drift-free form), so only b matters — the
      // intercept cancels in Δe and enters e1 as a constant that the
      // demeaned sxx/sxy absorb.
      val res = daily.crossJoin(broadcast(fit))
        .select(col("dt"),
          round(col("y").cast("double")
            - col("b") * col("x").cast("double")).cast("long")
            .as("e"))
      val w = Window.orderBy(col("dt"))
      val sp = res
        .withColumn("e1", lag(col("e"), 1).over(w))
        .where(col("e1").isNotNull)
        .select((col("e") - col("e1")).as("de"), col("e1"))
      val ded = col("de").cast(Big)
      val e1d = col("e1").cast(Big)
      val a2 = sp.agg(count(lit(1)).as("n2"),
        sum(ded).cast("double").as("sdy"),
        sum(e1d).cast("double").as("s1"),
        sum(ded * ded).cast("double").as("sdd"),
        sum(e1d * e1d).cast("double").as("s11"),
        sum(ded * e1d).cast("double").as("sd1"))
      val nD = col("n2").cast("double")
      val sxx2 = col("s11") - col("s1") * col("s1") / nD
      val sxy2 = col("sd1") - col("sdy") * col("s1") / nD
      val syy2 = col("sdd") - col("sdy") * col("sdy") / nD
      val rho = sxy2 / sxx2
      val ssr = syy2 - rho * sxy2
      a2.crossJoin(broadcast(fit.select(col("n"), r6(col("b")).as("beta"))))
        .select(col("n").as("n_days"), col("beta"),
          r6(rho).as("rho"),
          r6(rho / sqrt((ssr / (nD - lit(2.0))) / sxx2)).as("t_eg"))
    }),

    // GAP TREND — per-user OLS slope of inter-event gap (seconds) on
    // the gap index: positive slope = events spacing out = fatigue.
    // Population summary: user counts by slope sign + mean slope.
    "q_evt_gap_trend" -> ((s, d) => {
      val w = Window.partitionBy(col("u")).orderBy(col("t"))
      val gaps = Tables.events(s, d)
        .select(col("user_id").as("u"), tsUs(col("ts")).as("t"))
        .withColumn("g",
          expr("(t - lag(t, 1) OVER (PARTITION BY u ORDER BY t))"
            + " div 1000000"))
        .where(col("g").isNotNull)
        .withColumn("k",
          (row_number().over(w) - 1).cast("long"))
      val per = gaps.groupBy(col("u"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(col("g")).as("sg"), sum(col("k") * col("g")).as("skg"),
          sum(col("k") * col("k")).as("skk"))
        .where(col("n") >= 2)
      val nD = col("n").cast("double")
      val slope = (nD * col("skg").cast("double")
        - col("sk").cast("double") * col("sg").cast("double")) /
        (nD * col("skk").cast("double")
          - col("sk").cast("double") * col("sk").cast("double"))
      per
        .withColumn("sl_nano", round(slope * lit(1e9)).cast("long"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("sl_nano") > 0, 1L).otherwise(0L))
            .as("n_fatiguing"),
          sum(when(col("sl_nano") < 0, 1L).otherwise(0L))
            .as("n_accelerating"),
          sum(col("sl_nano")).as("sum_nano"))
        .select(col("n_users"), col("n_fatiguing"),
          col("n_accelerating"),
          r6(col("n_fatiguing").cast("double")
            / col("n_users").cast("double")).as("share_fatiguing"),
          r6(col("sum_nano").cast("double") / lit(1e9)
            / col("n_users").cast("double"))
            .as("avg_slope_sec_per_step"))
    }),

    // HAMPEL FILTER — days where |v − rollmed25| > 3·1.4826·MAD25,
    // gated by the exact integer cross-multiplication
    // |v−med|·10000 > mad·44478.
    "q_win_hampel" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("v"))
      val w = Window.orderBy(col("dt")).rowsBetween(-12, 12)
      val win = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("ws", collect_list(col("v")).over(w))
        .where(col("n") === 25)
        .withColumn("med", element_at(array_sort(col("ws")), 13))
        .withColumn("mad", element_at(array_sort(
          transform(col("ws"), x => abs(x - col("med")))), 13))
      win.where(abs(col("v") - col("med")) * 10000 >
          col("mad") * 44478)
        .select(col("dt"), col("v").as("v_cents"),
          col("med").as("med_cents"), col("mad").as("mad_cents"))
        .orderBy(col("dt"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_cointegration" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(COUNT(*) AS BIGINT) AS x,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    (CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                        AS DOUBLE)
                      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE))
                    / (CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                        AS DOUBLE)
                      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS b
                  FROM daily),
            res AS (SELECT dt,
                    CAST(round(CAST(y AS DOUBLE)
                      - b * CAST(x AS DOUBLE)) AS BIGINT) AS e
                  FROM daily, fit),
            sp AS (SELECT e - lag(e) OVER (ORDER BY dt) AS de,
                    lag(e) OVER (ORDER BY dt) AS e1
                  FROM res),
            a2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2,
                    CAST(SUM(CAST(de AS HUGEINT)) AS DOUBLE) AS sdy,
                    CAST(SUM(CAST(e1 AS HUGEINT)) AS DOUBLE) AS s1,
                    CAST(SUM(CAST(de AS HUGEINT) * CAST(de AS HUGEINT))
                      AS DOUBLE) AS sdd,
                    CAST(SUM(CAST(e1 AS HUGEINT) * CAST(e1 AS HUGEINT))
                      AS DOUBLE) AS s11,
                    CAST(SUM(CAST(de AS HUGEINT) * CAST(e1 AS HUGEINT))
                      AS DOUBLE) AS sd1
                  FROM sp WHERE e1 IS NOT NULL),
            f AS (SELECT n2, sdy, s1, sdd, s11, sd1,
                    CAST(n2 AS DOUBLE) AS nD FROM a2),
            g AS (SELECT n2, nD,
                    s11 - s1 * s1 / nD AS sxx2,
                    sd1 - sdy * s1 / nD AS sxy2,
                    sdd - sdy * sdy / nD AS syy2
                  FROM f)
         SELECT fit.n AS n_days, round(fit.b, 6) AS beta,
                round(sxy2 / sxx2, 6) AS rho,
                round((sxy2 / sxx2)
                  / sqrt(((syy2 - (sxy2 / sxx2) * sxy2) / (nD - 2.0))
                       / sxx2), 6) AS t_eg
         FROM g, fit""",

    "q_evt_gap_trend" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts::TIMESTAMP) AS t
                 FROM events),
            gaps AS (SELECT u, t,
                    (t - lag(t) OVER (PARTITION BY u ORDER BY t))
                      // 1000000 AS g
                  FROM ev),
            idx AS (SELECT u, g,
                    CAST(row_number() OVER (PARTITION BY u ORDER BY t)
                      - 1 AS BIGINT) AS k
                  FROM gaps WHERE g IS NOT NULL),
            per AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(k) AS BIGINT) AS sk,
                    CAST(SUM(g) AS BIGINT) AS sg,
                    CAST(SUM(k * g) AS BIGINT) AS skg,
                    CAST(SUM(k * k) AS BIGINT) AS skk
                  FROM idx GROUP BY 1 HAVING COUNT(*) >= 2),
            q AS (SELECT
                    CAST(round((CAST(n AS DOUBLE) * CAST(skg AS DOUBLE)
                        - CAST(sk AS DOUBLE) * CAST(sg AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                        - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                      * 1e9) AS BIGINT) AS sl_nano
                  FROM per)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(CASE WHEN sl_nano > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_fatiguing,
                CAST(SUM(CASE WHEN sl_nano < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_accelerating,
                round(CAST(SUM(CASE WHEN sl_nano > 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                  AS share_fatiguing,
                round(CAST(SUM(sl_nano) AS DOUBLE) / 1e9
                  / CAST(COUNT(*) AS DOUBLE), 6)
                  AS avg_slope_sec_per_step
         FROM q""",

    "q_win_hampel" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS v
                 FROM orders GROUP BY 1),
            win AS (SELECT dt, v,
                    COUNT(*) OVER w AS n,
                    list(v) OVER w AS ws
                  FROM daily
                  WINDOW w AS (ORDER BY dt
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
            md AS (SELECT dt, v, ws,
                    list_sort(ws)[13] AS med
                  FROM win WHERE n = 25),
            mf AS (SELECT dt, v, med,
                    list_sort(list_transform(ws,
                      x -> abs(x - med)))[13] AS mad
                  FROM md)
         SELECT dt, v AS v_cents, med AS med_cents, mad AS mad_cents
         FROM mf
         WHERE abs(v - med) * 10000 > mad * 44478
         ORDER BY dt"""
  )
}
