package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 13: the stationarity / homogeneity battery
  * over the daily order-revenue series — KPSS level-stationarity
  * (Bartlett-window long-run variance), SNHT and Buishand-range
  * change-of-level tests, the von Neumann ratio and its rank (Bartels)
  * variant, and the turning-points randomness test.
  *
  * All six ride the calendar-bounded daily spine (the documented
  * unpartitioned-window argument: ~2.4k rows regardless of fact
  * volume). Determinism contract (SURVEY §2.13): deviations are
  * N-SCALED (e' = n·y − Σy) so partial sums stay exact integers;
  * rank ties ride doubled ranks; every statistic is one fixed-shape
  * IEEE chain over named exact scalars; squares take the
  * DECIMAL(38,0)/HUGEINT route before multiplying.
  */
object Extras87 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Daily revenue spine: dt, y = Σ order cents that day (exact). */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KPSS — level-stationarity: partial sums C_t of the n-scaled
    // deviations e' = n·y − S are exact integers; the Bartlett
    // long-run variance at lag 4 folds the exact lag products G_j.
    // With weights 2(1−j/5) cleared of denominators,
    // KPSS = 5·ΣC² / (n·(5G0 + 8G1 + 6G2 + 4G3 + 2G4)) — one division
    // of two exact DECIMAL(38,0) scalars.
    "q_ts_kpss" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val glob = daily(s, d).agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val sp = daily(s, d).crossJoin(broadcast(glob))
        .withColumn("e", (col("n") * col("y") - col("sy")).cast(Big))
        .withColumn("c", sum(col("e")).over(wc))
      val a = sp.select(col("dt"), col("e"), col("c"), col("n"))
        .withColumn("g1p", col("e") * lag(col("e"), 1).over(w))
        .withColumn("g2p", col("e") * lag(col("e"), 2).over(w))
        .withColumn("g3p", col("e") * lag(col("e"), 3).over(w))
        .withColumn("g4p", col("e") * lag(col("e"), 4).over(w))
        .agg(max(col("n")).as("n"),
          sum(col("c") * col("c")).as("cc"),
          sum(col("e") * col("e")).as("g0"),
          sum(col("g1p")).as("g1"), sum(col("g2p")).as("g2"),
          sum(col("g3p")).as("g3"), sum(col("g4p")).as("g4"))
      a.select(col("n").as("n_days"),
        r6((lit(5).cast(Big) * col("cc")).cast("double") /
          (col("n").cast(Big) * (lit(5).cast(Big) * col("g0")
            + lit(8).cast(Big) * col("g1") + lit(6).cast(Big) * col("g2")
            + lit(4).cast(Big) * col("g3") + lit(2).cast(Big) * col("g4")))
            .cast("double")).as("kpss_stat"))
    }),

    // SNHT — standard normal homogeneity: T_k = k·z1² + (n−k)·z2²
    // over the exact prefix sums S_k; population σ² = (nΣy²−S²)/n².
    // Each T_k is a fixed-shape chain over exact scalars; the argmax
    // row is picked by (T desc, dt asc) — identical doubles on both
    // engines, so identical ordering.
    "q_ts_snht" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val glob = daily(s, d).agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val nD = col("n").cast("double")
      val sig2 = (col("n").cast(Big) * col("syy")
        - col("sy").cast(Big) * col("sy").cast(Big)).cast("double") /
        (nD * nD)
      val mu = col("sy").cast("double") / nD
      val kD = col("k").cast("double")
      val z1 = (col("sk").cast("double") / kD - mu) / sqrt(sig2)
      val z2 = ((col("sy") - col("sk")).cast("double") / (nD - kD) - mu) /
        sqrt(sig2)
      val t = kD * z1 * z1 + (nD - kD) * z2 * z2
      daily(s, d)
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("sk", sum(col("y")).over(wc))
        .crossJoin(broadcast(glob))
        .where(col("k") < col("n"))
        .withColumn("t", t)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("t").desc, col("dt"))))
        .where(col("rn") === 1)
        .select(col("n").as("n_days"), col("dt").as("break_dt"),
          col("k").as("break_k"), r6(col("t")).as("snht_t"))
    }),

    // BUISHAND RANGE — R/(σ√n) with R the range (including 0) of the
    // partial deviation sums; with the n-scaled integers the n factors
    // cancel to R'/(√(nΣy²−S²)·√n) — one division of exact scalars.
    "q_ts_buishand_range" -> ((s, d) => {
      val wc = Window.orderBy(col("dt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val glob = daily(s, d).agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val a = daily(s, d).crossJoin(broadcast(glob))
        .withColumn("e", (col("n") * col("y") - col("sy")).cast(Big))
        .withColumn("c", sum(col("e")).over(wc))
        .agg(max(col("n")).as("n"), max(col("sy")).as("sy"),
          max(col("syy")).as("syy"),
          greatest(max(col("c")), lit(0).cast(Big)).as("cmax"),
          least(min(col("c")), lit(0).cast(Big)).as("cmin"))
      val nD = col("n").cast("double")
      a.select(col("n").as("n_days"),
        r6((col("cmax") - col("cmin")).cast("double")
          / (sqrt((col("n").cast(Big) * col("syy")
            - col("sy").cast(Big) * col("sy").cast(Big)).cast("double"))
            * sqrt(nD))).as("buishand_rb"))
    }),

    // VON NEUMANN RATIO — η = Σ(Δy)²·n / (nΣy²−S²), with the
    // asymptotic z = (η−2)/√(4(n−2)/(n²−1)). Numerator and
    // denominator are exact integers; η is one division.
    "q_ts_von_neumann" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val a = daily(s, d)
        .withColumn("dy", col("y") - lag(col("y"), 1).over(w))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"),
          sum(col("dy").cast(Big) * col("dy").cast(Big)).as("sdd"))
      val nD = col("n").cast("double")
      val vn = (col("n").cast(Big) * col("sdd")).cast("double") /
        (col("n").cast(Big) * col("syy")
          - col("sy").cast(Big) * col("sy").cast(Big)).cast("double")
      a.select(col("n").as("n_days"), r6(vn).as("vn_ratio"),
        r6((vn - lit(2.0)) /
          sqrt(lit(4.0) * (nD - 2) / (nD * nD - 1))).as("z_stat"))
    }),

    // BARTELS RANK TEST — the rank von Neumann ratio: doubled average
    // ranks r2 (2·below + t + 1) keep tie-averaged ranks integral;
    // RVN = n·Σ(Δr2)² / (nΣr2²−(Σr2)²) (the 4s cancel), with the
    // exact-moment z using Var = 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).
    "q_ts_bartels_rank" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val vals = daily(s, d).groupBy(col("y")).agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col("y"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = vals
        .withColumn("cum", sum(col("t")).over(wv))
        .withColumn("r2",
          lit(2L) * (col("cum") - col("t")) + col("t") + 1L)
        .select(col("y"), col("r2"))
      val a = daily(s, d).join(ranked, Seq("y"))
        .withColumn("dr", col("r2") - lag(col("r2"), 1).over(w))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("sr"),
          sum(col("r2").cast(Big) * col("r2").cast(Big)).as("srr"),
          sum(col("dr").cast(Big) * col("dr").cast(Big)).as("sdd"))
      val nD = col("n").cast("double")
      val rvn = (col("n").cast(Big) * col("sdd")).cast("double") /
        (col("n").cast(Big) * col("srr")
          - col("sr").cast(Big) * col("sr").cast(Big)).cast("double")
      val varr = lit(4.0) * (nD - 2) * (lit(5.0) * nD * nD - nD * 2 - 9) /
        (lit(5.0) * nD * (nD + 1) * (nD - 1) * (nD - 1))
      a.select(col("n").as("n_days"), r6(rvn).as("rvn_ratio"),
        r6((rvn - lit(2.0)) / sqrt(varr)).as("z_stat"))
    }),

    // TURNING POINTS — count of strict local extrema; under
    // randomness E[T] = 2(n−2)/3, Var = (16n−29)/90. The count is an
    // exact integer over lag/lead comparisons.
    "q_ts_turning_points" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val a = daily(s, d)
        .withColumn("p", lag(col("y"), 1).over(w))
        .withColumn("f", lead(col("y"), 1).over(w))
        .where(col("p").isNotNull && col("f").isNotNull)
        .agg(count(lit(1)).as("inner_n"),
          sum(((col("p") < col("y") && col("y") > col("f")) ||
            (col("p") > col("y") && col("y") < col("f")))
            .cast("long")).as("t"))
      val nD = (col("inner_n") + 2).cast("double")
      a.select((col("inner_n") + 2).as("n_days"), col("t").as("n_turns"),
        r6((col("t").cast("double") - lit(2.0) * (nD - 2) / 3) /
          sqrt((lit(16.0) * nD - 29) / 90)).as("z_stat"))
    })
  )

  private val DailySql =
    """daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1)"""

  val oracle: Map[String, String] = Map(

    "q_ts_kpss" ->
      s"""WITH $DailySql,
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy FROM daily),
            sp AS (SELECT dt, CAST(n * y - sy AS HUGEINT) AS e, n
                   FROM daily, g),
            cs AS (SELECT dt, e, n,
                     SUM(e) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS c,
                     lag(e, 1) OVER (ORDER BY dt) AS e1,
                     lag(e, 2) OVER (ORDER BY dt) AS e2,
                     lag(e, 3) OVER (ORDER BY dt) AS e3,
                     lag(e, 4) OVER (ORDER BY dt) AS e4
                   FROM sp),
            a AS (SELECT MAX(n) AS n, SUM(c * c) AS cc,
                    SUM(e * e) AS g0, SUM(e * e1) AS g1,
                    SUM(e * e2) AS g2, SUM(e * e3) AS g3,
                    SUM(e * e4) AS g4
                  FROM cs)
         SELECT n AS n_days,
                round(CAST(5 * cc AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * (5 * g0 + 8 * g1 + 6 * g2
                      + 4 * g3 + 2 * g4) AS DOUBLE), 6) AS kpss_stat
         FROM a""",

    "q_ts_snht" ->
      s"""WITH $DailySql,
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
                  FROM daily),
            pre AS (SELECT dt,
                      CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS k,
                      CAST(SUM(y) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS sk
                    FROM daily),
            z AS (SELECT dt, k, n,
                    (CAST(sk AS DOUBLE) / CAST(k AS DOUBLE)
                      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt(CAST(CAST(n AS HUGEINT) * syy
                          - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                          AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z1,
                    (CAST(sy - sk AS DOUBLE)
                      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt(CAST(CAST(n AS HUGEINT) * syy
                          - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                          AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z2
                  FROM pre, g WHERE k < n),
            t AS (SELECT dt, k, n,
                    CAST(k AS DOUBLE) * z1 * z1
                    + (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * z2 * z2
                    AS t
                  FROM z)
         SELECT n AS n_days, dt AS break_dt, k AS break_k,
                round(t, 6) AS snht_t
         FROM (SELECT *, row_number() OVER (ORDER BY t DESC, dt) AS rn
               FROM t) WHERE rn = 1""",

    "q_ts_buishand_range" ->
      s"""WITH $DailySql,
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
                  FROM daily),
            cs AS (SELECT n, sy, syy,
                     SUM(CAST(n * y - sy AS HUGEINT)) OVER (ORDER BY dt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS c
                   FROM daily, g),
            a AS (SELECT MAX(n) AS n, MAX(sy) AS sy, MAX(syy) AS syy,
                    greatest(MAX(c), 0) AS cmax, least(MIN(c), 0) AS cmin
                  FROM cs)
         SELECT n AS n_days,
                round(CAST(cmax - cmin AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * syy
                      - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                      AS DOUBLE)) * sqrt(CAST(n AS DOUBLE))), 6)
                  AS buishand_rb
         FROM a""",

    "q_ts_von_neumann" ->
      s"""WITH $DailySql,
            sp AS (SELECT y, y - lag(y, 1) OVER (ORDER BY dt) AS dy
                   FROM daily),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
                    SUM(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS sdd
                  FROM sp)
         SELECT n AS n_days,
                round(CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                    AS DOUBLE), 6) AS vn_ratio,
                round((CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * syy
                      - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                      AS DOUBLE) - 2.0)
                  / sqrt(4.0 * (CAST(n AS DOUBLE) - 2)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1)), 6)
                  AS z_stat
         FROM a""",

    "q_ts_bartels_rank" ->
      s"""WITH $DailySql,
            vals AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS t
                     FROM daily GROUP BY 1),
            ranked AS (SELECT y,
                         2 * (SUM(t) OVER (ORDER BY y ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) - t)
                           + t + 1 AS r2
                       FROM vals),
            sp AS (SELECT r2, r2 - lag(r2, 1) OVER (ORDER BY dt) AS dr
                   FROM daily JOIN ranked USING (y)),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(r2) AS BIGINT) AS sr,
                    SUM(CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT)) AS srr,
                    SUM(CAST(dr AS HUGEINT) * CAST(dr AS HUGEINT)) AS sdd
                  FROM sp)
         SELECT n AS n_days,
                round(CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * srr
                    - CAST(sr AS HUGEINT) * CAST(sr AS HUGEINT)
                    AS DOUBLE), 6) AS rvn_ratio,
                round((CAST(CAST(n AS HUGEINT) * sdd AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * srr
                      - CAST(sr AS HUGEINT) * CAST(sr AS HUGEINT)
                      AS DOUBLE) - 2.0)
                  / sqrt(4.0 * (CAST(n AS DOUBLE) - 2)
                    * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      - 2 * CAST(n AS DOUBLE) - 9)
                    / (5.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                      * (CAST(n AS DOUBLE) - 1)
                      * (CAST(n AS DOUBLE) - 1))), 6) AS z_stat
         FROM a""",

    "q_ts_turning_points" ->
      s"""WITH $DailySql,
            sp AS (SELECT y, lag(y, 1) OVER (ORDER BY dt) AS p,
                     lead(y, 1) OVER (ORDER BY dt) AS f
                   FROM daily),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS inner_n,
                    CAST(SUM(CASE WHEN (p < y AND y > f)
                          OR (p > y AND y < f) THEN 1 ELSE 0 END)
                      AS BIGINT) AS t
                  FROM sp WHERE p IS NOT NULL AND f IS NOT NULL)
         SELECT inner_n + 2 AS n_days, t AS n_turns,
                round((CAST(t AS DOUBLE)
                    - 2.0 * (CAST(inner_n + 2 AS DOUBLE) - 2) / 3)
                  / sqrt((16.0 * CAST(inner_n + 2 AS DOUBLE) - 29) / 90),
                  6) AS z_stat
         FROM a"""
  )
}
