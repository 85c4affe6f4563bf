package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 22: the excess-kurtosis z-test (completing
  * the moment-test family with q_agg_skew_test) and the AR(1)
  * mean-reversion half-life.
  *
  * Determinism contract (SURVEY §2.13): raw moments through Σx⁴ fold
  * exact kilodollar BIGINTs; every emitted float is one shared IEEE
  * chain over those integers.
  */
object Extras59 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KURTOSIS Z-TEST — are the tails heavier than Gaussian? Excess
    // kurtosis g2 = μ4/μ2² − 3 per priority from exact raw moments
    // Σx..Σx⁴ (kilodollar units keep x⁴ ≈ 6e10/row — BIGINT-safe to
    // ~1e8 rows); z ≈ g2·√(n/24), the large-sample normal test.
    "q_agg_kurtosis_test" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000")
            .as("x"))
      val m = o.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      val nD = col("n").cast("double")
      val mean = col("s1").cast("double") / nD
      val m2 = col("s2").cast("double") / nD - mean * mean
      val m3r = col("s3").cast("double") / nD
      val m4r = col("s4").cast("double") / nD
      // μ4 = E[x⁴] − 4μE[x³] + 6μ²E[x²] − 3μ⁴
      val mu4 = m4r - mean * (lit(4.0) * m3r
        - mean * (lit(6.0) * (col("s2").cast("double") / nD)
          - lit(3.0) * mean * mean))
      val g2 = mu4 / (m2 * m2) - lit(3.0)
      m.select(col("prio"), col("n"),
        r6(g2).as("excess_kurtosis"),
        r6(g2 * sqrt(nD / 24.0)).as("z_kurt"))
        .orderBy("prio")
    }),

    // MEAN REVERSION — the AR(1) view of daily revenue: ρ is the lag-1
    // autoregression slope from exact kilodollar moments, and the
    // half-life of a shock is −ln2/ln(ρ) (emitted only when
    // 0 < ρ < 1 — an explosive or anti-persistent series has none).
    // Calendar-bounded spine; one shared IEEE chain.
    "q_ts_mean_reversion" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val m = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("y1", lag(col("y"), 1).over(ord))
        .where(col("y1").isNotNull)
        .agg(count(lit(1)).as("n"), sum(col("y1")).as("sx"),
          sum(col("y")).as("sy"), sum(col("y1") * col("y")).as("sxy"),
          sum(col("y1") * col("y1")).as("sxx"))
      val rho = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      m.select(col("n").as("n_pairs"), r6(rho).as("rho"),
        when(rho > 0 && rho < 1,
          r6(lit(-math.log(2.0)) / log(rho))).as("half_life_days"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_kurtosis_test" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) // 100000 AS x
                 FROM orders),
            m AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS s1,
                    CAST(SUM(x * x) AS BIGINT) AS s2,
                    CAST(SUM(x * x * x) AS BIGINT) AS s3,
                    CAST(SUM(x * x * x * x) AS BIGINT) AS s4
                  FROM o GROUP BY 1),
            t AS (SELECT prio, n,
                    (CAST(s4 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (4.0 * (CAST(s3 AS DOUBLE) / n)
                          - (CAST(s1 AS DOUBLE) / n)
                            * (6.0 * (CAST(s2 AS DOUBLE) / n)
                               - 3.0 * (CAST(s1 AS DOUBLE) / n)
                                 * (CAST(s1 AS DOUBLE) / n))))
                    / ((CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n))
                       * (CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n))) - 3.0 AS g2
                  FROM m)
         SELECT prio, n, round(g2, 6) AS excess_kurtosis,
                round(g2 * sqrt(CAST(n AS DOUBLE) / 24.0), 6) AS z_kurt
         FROM t ORDER BY prio""",

    "q_ts_mean_reversion" ->
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            lg AS (SELECT y, lag(y, 1) OVER (ORDER BY dt) AS y1
                   FROM daily),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y1) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(y1 * y) AS BIGINT) AS sxy,
                    CAST(SUM(y1 * y1) AS BIGINT) AS sxx
                  FROM lg WHERE y1 IS NOT NULL),
            t AS (SELECT n,
                    CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) AS rho
                  FROM m)
         SELECT n AS n_pairs, round(rho, 6) AS rho,
                CASE WHEN rho > 0 AND rho < 1
                  THEN round(${-math.log(2.0)} / ln(rho), 6) END
                  AS half_life_days
         FROM t"""
  )
}
