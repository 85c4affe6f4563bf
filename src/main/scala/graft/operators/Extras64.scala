package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 2: rank correlation and volatility over the
  * daily spine — Kendall tau-b (the estimator companion of
  * q_ts_mann_kendall), the Lo-MacKinlay variance ratio, and the
  * Parkinson high-low volatility estimator.
  *
  * Determinism contract (SURVEY §2.13): the pair stage is the BROADCAST
  * calendar² spine (never a shuffled theta join — the mann_kendall
  * lesson); per-day IEEE terms are micro-quantized BEFORE any sum; each
  * emitted statistic is one shared IEEE tail over exact integers.
  */
object Extras64 {
  import Det._

  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(count(lit(1)).as("x"),
        sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KENDALL TAU-B — rank correlation between daily order count and
    // daily revenue with full tie correction: τ_b = S/√((n0−n1)(n0−n2)),
    // S = Σ_{i<j} sign(Δx)·sign(Δy), n1/n2 the tied-pair counts (counted
    // directly on the pair relation — identically Σ t(t−1)/2). The pair
    // relation is the broadcast calendar² spine.
    "q_ts_kendall_tau" -> ((s, d) => {
      val sp = daily(s, d)
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
      val pairs = sp.as("a").join(broadcast(sp.as("b")),
          col("a.rn") < col("b.rn"))
        .agg(count(lit(1)).as("n0"),
          sum((signum(col("b.x") - col("a.x"))
            * signum(col("b.y") - col("a.y"))).cast("long")).as("s_tau"),
          sum(when(col("a.x") === col("b.x"), 1L).otherwise(0L)).as("nx_tie"),
          sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L)).as("ny_tie"))
      val n = daily(s, d).agg(count(lit(1)).as("n_days"))
      pairs.crossJoin(broadcast(n))
        .select(col("n_days"), col("n0"), col("s_tau"),
          col("nx_tie"), col("ny_tie"),
          r6(col("s_tau").cast("double")
            / sqrt((col("n0") - col("nx_tie")).cast("double")
              * (col("n0") - col("ny_tie")).cast("double"))).as("tau_b"))
    }),

    // VARIANCE RATIO — Lo-MacKinlay VR(5) on daily log revenue returns:
    // Var of overlapping 5-day return sums over 5× the 1-day variance
    // (≈1 for a random walk; <1 mean-reverting, >1 trending). Each
    // 1-day log return is micro-quantized, so the 5-day sums and both
    // variance folds are EXACT integer arithmetic; population variances,
    // one IEEE tail. The spine is calendar-bounded; the windows are
    // single linear passes over it.
    "q_ts_variance_ratio" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val sp = daily(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("lr", round(log(col("y").cast("double")
          / lag(col("y"), 1).over(w).cast("double")) * 1e6).cast("long"))
        .withColumn("s5", when(col("rn") >= 6,
          sum(col("lr")).over(w.rowsBetween(-4, 0))))
      val big = DecimalType(38, 0)
      sp.agg(
          count(col("lr")).as("n1"),
          sum(col("lr")).as("t1"),
          sum((col("lr") * col("lr")).cast(big)).as("q1"),
          count(col("s5")).as("n5"),
          sum(col("s5")).as("t5"),
          sum((col("s5") * col("s5")).cast(big)).as("q5"))
        .select(col("n1"), col("n5"),
          r6(((col("q5").cast("double") / col("n5")
            - (col("t5").cast("double") / col("n5"))
              * (col("t5").cast("double") / col("n5"))) / lit(5.0))
            / (col("q1").cast("double") / col("n1")
              - (col("t1").cast("double") / col("n1"))
                * (col("t1").cast("double") / col("n1")))).as("vr5"))
    }),

    // PARKINSON VOLATILITY — the high-low range estimator over daily
    // order values: σ_P = √(Σ ln(H/L)² / (4·ln2·n)). Each day's
    // ln(H/L)² is micro-quantized before the exact sum; H/L are exact
    // integer cents extremes from one distributed agg. ln2 is a shared
    // literal (not an engine call) so no library constant enters parity.
    "q_ts_parkinson" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(max((dec(col("o_totalprice")) * 100).cast("long")).as("hi"),
          min((dec(col("o_totalprice")) * 100).cast("long")).as("lo"))
        .select(round(pow(log(col("hi").cast("double")
          / col("lo").cast("double")), 2) * 1e6).cast("long").as("t_micro"))
        .agg(count(lit(1)).as("n_days"), sum(col("t_micro")).as("sum_micro"))
        .select(col("n_days"), col("sum_micro"),
          r6(sqrt(col("sum_micro").cast("double") / 1e6
            / (lit(4.0) * lit(0.6931471805599453)
              * col("n_days").cast("double")))).as("park_vol"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_kendall_tau" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(COUNT(*) AS BIGINT) AS x,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT x, y, row_number() OVER (ORDER BY dt) AS rn
                  FROM daily),
            p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                    CAST(SUM(CAST((CASE WHEN b2.x > b1.x THEN 1
                               WHEN b2.x < b1.x THEN -1 ELSE 0 END)
                             * (CASE WHEN b2.y > b1.y THEN 1
                               WHEN b2.y < b1.y THEN -1 ELSE 0 END)
                          AS BIGINT)) AS BIGINT) AS s_tau,
                    CAST(SUM(CASE WHEN b1.x = b2.x THEN 1 ELSE 0 END)
                      AS BIGINT) AS nx_tie,
                    CAST(SUM(CASE WHEN b1.y = b2.y THEN 1 ELSE 0 END)
                      AS BIGINT) AS ny_tie
                  FROM b b1 JOIN b b2 ON b1.rn < b2.rn),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
         SELECT n_days, n0, s_tau, nx_tie, ny_tie,
                round(CAST(s_tau AS DOUBLE)
                  / sqrt(CAST(n0 - nx_tie AS DOUBLE)
                    * CAST(n0 - ny_tie AS DOUBLE)), 6) AS tau_b
         FROM p, nn""",

    "q_ts_variance_ratio" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            r AS (SELECT row_number() OVER (ORDER BY dt) AS rn,
                    CAST(round(ln(CAST(y AS DOUBLE)
                      / CAST(lag(y, 1) OVER (ORDER BY dt) AS DOUBLE))
                      * 1000000) AS BIGINT) AS lr
                  FROM daily),
            r5 AS (SELECT rn, lr,
                     CASE WHEN rn >= 6 THEN
                       SUM(lr) OVER (ORDER BY rn
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                     END AS s5
                   FROM r),
            a AS (SELECT CAST(COUNT(lr) AS BIGINT) AS n1,
                    CAST(SUM(lr) AS BIGINT) AS t1,
                    CAST(SUM(CAST(lr*lr AS DECIMAL(38,0))) AS DOUBLE) AS q1,
                    CAST(COUNT(s5) AS BIGINT) AS n5,
                    CAST(SUM(s5) AS BIGINT) AS t5,
                    CAST(SUM(CAST(s5*s5 AS DECIMAL(38,0))) AS DOUBLE) AS q5
                  FROM r5)
         SELECT n1, n5,
                round(((q5 / n5
                  - (CAST(t5 AS DOUBLE) / n5) * (CAST(t5 AS DOUBLE) / n5))
                  / 5.0)
                  / (q1 / n1
                    - (CAST(t1 AS DOUBLE) / n1)
                      * (CAST(t1 AS DOUBLE) / n1)), 6) AS vr5
         FROM a""",

    "q_ts_parkinson" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS hi,
                    MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS lo
                 FROM orders GROUP BY 1),
            t AS (SELECT CAST(round(
                    pow(ln(CAST(hi AS DOUBLE) / CAST(lo AS DOUBLE)), 2)
                    * 1000000) AS BIGINT) AS t_micro
                  FROM daily)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                CAST(SUM(t_micro) AS BIGINT) AS sum_micro,
                round(sqrt(CAST(SUM(t_micro) AS DOUBLE) / 1000000.0
                  / (4.0 * 0.6931471805599453 * COUNT(*))), 6) AS park_vol
         FROM t"""
  )
}
