package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-13 additions, part 13: ARMA(1,1) estimation via the
  * Hannan-Rissanen two-stage regression — the closed-form route to
  * mixed AR+MA fitting that needs no iterative MLE, striking the
  * "ARIMA-class model fitting" row off the declared-unreachable list
  * (the remaining gap is differencing/seasonal orders, which are
  * mechanical once ARMA works; true MLE stays out of scope).
  *
  * Method: stage 1 fits AR(2) by Yule-Walker (the q_ts_ar2_yw closed
  * form) on the truncated-mean-demeaned daily series; its one-step
  * residuals are quantized to whole dollars; stage 2 regresses z_t on
  * (z_{t−1}, ê_{t−1}) — the 2×2 closed-form OLS whose coefficients
  * are the ARMA φ and θ.
  *
  * Scale shape: one orders fold onto the calendar spine, two lag
  * windows over ≤2.4k days, three bounded aggregates.
  *
  * Determinism contract (SURVEY §2.13): the series and its demeaning
  * are exact integers; φ₁/φ₂ are one shared IEEE tree off exact
  * integer autocovariance ratios; residuals re-enter exact arithmetic
  * through round() (whole dollars); stage-2 moments ride
  * DECIMAL(38,0)/HUGEINT (internal only); φ/θ are one shared 2×2
  * solve at the end.
  */
object Extras159 {
  import graft.Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_ts_arma11_hr" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("vc"))
        .select(col("dt"), expr("vc div 100").as("v"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val z0 = daily.crossJoin(broadcast(tot))
        .select(col("dt"), (col("v") - expr("sv div n")).as("z"))
        .duckCkpt() // YW sums AND both lag passes
      // stage 1: Yule-Walker AR(2) off exact lag-covariance ratios
      val zl = z0.withColumn("z1", lag(col("z"), 1).over(w))
        .withColumn("z2", lag(col("z"), 2).over(w))
        .duckCkpt() // YW sums AND the residual pass
      val yw = zl.agg(count(lit(1)).as("n_days"),
        sum(col("z").cast(Big) * col("z").cast(Big)).as("den"),
        sum(when(col("z1").isNotNull,
          col("z").cast(Big) * col("z1").cast(Big))).as("num1"),
        sum(when(col("z2").isNotNull,
          col("z").cast(Big) * col("z2").cast(Big))).as("num2"))
      val r1 = col("num1").cast("double") / col("den").cast("double")
      val r2 = col("num2").cast("double") / col("den").cast("double")
      val coef = yw.select(col("n_days"),
        (r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1)).as("p1"),
        ((r2 - r1 * r1) / (lit(1.0) - r1 * r1)).as("p2"))
      // stage-1 residuals, quantized to whole dollars
      val e = zl.crossJoin(broadcast(coef))
        .where(col("z1").isNotNull && col("z2").isNotNull)
        .select(col("dt"), col("z"),
          round(col("z").cast("double")
            - col("p1") * col("z1").cast("double")
            - col("p2") * col("z2").cast("double")).cast("long").as("eq"))
      // stage 2: z_t on (z_{t−1}, ê_{t−1}) — closed-form 2×2 OLS
      val reg = e
        .withColumn("x", lag(col("z"), 1).over(w))
        .withColumn("ep", lag(col("eq"), 1).over(w))
        .where(col("x").isNotNull && col("ep").isNotNull)
      val mo = reg.agg(count(lit(1)).as("n_reg"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("ep").cast(Big) * col("ep").cast(Big)).as("see"),
        sum(col("x").cast(Big) * col("ep").cast(Big)).as("sxe"),
        sum(col("x").cast(Big) * col("z").cast(Big)).as("sxy"),
        sum(col("ep").cast(Big) * col("z").cast(Big)).as("sey"))
      val sxx = col("sxx").cast("double")
      val see = col("see").cast("double")
      val sxe = col("sxe").cast("double")
      val sxy = col("sxy").cast("double")
      val sey = col("sey").cast("double")
      val det = sxx * see - sxe * sxe
      coef.crossJoin(broadcast(mo))
        .select(col("n_days"), r6(col("p1")).as("ar2_phi1"),
          r6(col("p2")).as("ar2_phi2"),
          r6((see * sxy - sxe * sey) / det).as("phi"),
          r6((sxx * sey - sxe * sxy) / det).as("theta"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_arma11_hr" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) // 100 AS BIGINT) AS v
                  FROM orders GROUP BY 1),
            tot AS (SELECT COUNT(*) AS n, SUM(v) AS sv FROM daily),
            z0 AS (SELECT dt, CAST(v - (sv // n) AS BIGINT) AS z
                   FROM daily, tot),
            zl AS MATERIALIZED (
              SELECT dt, z,
                lag(z, 1) OVER (ORDER BY dt) AS z1,
                lag(z, 2) OVER (ORDER BY dt) AS z2
              FROM z0),
            yw AS (SELECT COUNT(*) AS n_days,
                     SUM(CAST(z AS HUGEINT) * z) AS den,
                     SUM(CASE WHEN z1 IS NOT NULL
                       THEN CAST(z AS HUGEINT) * z1 END) AS num1,
                     SUM(CASE WHEN z2 IS NOT NULL
                       THEN CAST(z AS HUGEINT) * z2 END) AS num2
                   FROM zl),
            coef AS (SELECT n_days,
                     (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                       * (1.0 - CAST(num2 AS DOUBLE)
                          / CAST(den AS DOUBLE))
                       / (1.0 - (CAST(num1 AS DOUBLE)
                           / CAST(den AS DOUBLE))
                         * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE)))
                       AS p1,
                     ((CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE))
                       - (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                         * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE)))
                       / (1.0 - (CAST(num1 AS DOUBLE)
                           / CAST(den AS DOUBLE))
                         * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE)))
                       AS p2
                   FROM yw),
            e AS MATERIALIZED (
              SELECT dt, z,
                CAST(round(CAST(z AS DOUBLE)
                  - p1 * CAST(z1 AS DOUBLE)
                  - p2 * CAST(z2 AS DOUBLE)) AS BIGINT) AS eq
              FROM zl, coef
              WHERE z1 IS NOT NULL AND z2 IS NOT NULL),
            reg AS (SELECT z,
                     lag(z, 1) OVER (ORDER BY dt) AS x,
                     lag(eq, 1) OVER (ORDER BY dt) AS ep
                   FROM e),
            mo AS (SELECT
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(ep AS HUGEINT) * ep) AS see,
                     SUM(CAST(x AS HUGEINT) * ep) AS sxe,
                     SUM(CAST(x AS HUGEINT) * z) AS sxy,
                     SUM(CAST(ep AS HUGEINT) * z) AS sey
                   FROM reg
                   WHERE x IS NOT NULL AND ep IS NOT NULL)
         SELECT CAST(n_days AS BIGINT) AS n_days,
                round(p1, 6) AS ar2_phi1, round(p2, 6) AS ar2_phi2,
                round((CAST(see AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sxe AS DOUBLE) * CAST(sey AS DOUBLE))
                  / (CAST(sxx AS DOUBLE) * CAST(see AS DOUBLE)
                    - CAST(sxe AS DOUBLE) * CAST(sxe AS DOUBLE)), 6)
                  AS phi,
                round((CAST(sxx AS DOUBLE) * CAST(sey AS DOUBLE)
                    - CAST(sxe AS DOUBLE) * CAST(sxy AS DOUBLE))
                  / (CAST(sxx AS DOUBLE) * CAST(see AS DOUBLE)
                    - CAST(sxe AS DOUBLE) * CAST(sxe AS DOUBLE)), 6)
                  AS theta
         FROM coef, mo"""
  )
}
