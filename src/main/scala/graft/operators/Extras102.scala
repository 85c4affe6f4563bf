package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 28: demand-forecasting + agreement
  * round-out — Croston's method for intermittent per-part demand (the
  * third sequential-recurrence kernel after Holt-Winters/DTW), Fleiss'
  * kappa over each user's first five event types, Theil's U2 accuracy
  * of the seasonal-naive forecast, and a Bass diffusion-curve fit to
  * the user-adoption series.
  *
  * Scale shape: Croston's only fact-sized stage is the (part, day)
  * demand aggregation — the recurrence runs per sampled part over its
  * compressed nonzero-demand list; Fleiss windows partition by
  * user_id (high-cardinality, no global sort); Theil/Bass ride the
  * bounded day spine, and the Bass normal equations use a 0..1000
  * integer-quantized regressor so every power sum stays in
  * DECIMAL(38,0) at any corpus size.
  *
  * Determinism contract (SURVEY §2.13): Croston state is exact BIGINT
  * micro-units with truncating division (the Extras75 discipline);
  * Fleiss/Theil fold exact integer counts; the Bass 3×3 system is
  * solved by Cramer's rule with every determinant an EXACT integer —
  * only the final divisions are IEEE.
  */
object Extras102 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Compressed nonzero daily-demand series for the sampled parts:
    * (part, sorted list of (1-based day index, demand)). */
  private def demandSeries(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).where(col("l_partkey") % 97 === 0)
    val span = Tables.lineitem(s, d)
      .agg(min(to_date(col("l_shipdate"))).as("dmin"))
    li.groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("dt"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .crossJoin(broadcast(span))
      .select(col("l_partkey"),
        (datediff(col("dt"), col("dmin")) + 1).cast("long").as("t"),
        col("q"))
      .select(col("l_partkey"), struct(col("t"), col("q")).as("p"))
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(col("l_partkey"),
        expr("transform(ps, x -> x.t)").as("ts"),
        expr("transform(ps, x -> x.q)").as("qs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CROSTON'S METHOD (α=1/5) — separate exponential smoothing of
    // demand size z and inter-demand interval p over the nonzero
    // demands only: z' = (d·10⁶ + 4z) div 5, p' = (g·10⁶ + 4p) div 5,
    // initialized at the first demand (z=d₁·10⁶, p=t₁·10⁶); the
    // stocking rate is z/p.
    "q_ts_croston" -> ((s, d) => {
      import s.implicits._
      demandSeries(s, d).as[(Long, Seq[Long], Seq[Long])]
        .map { case (part, ts, qs) =>
          var z = qs.head * 1000000L
          var p = ts.head * 1000000L
          var prevT = ts.head
          var k = 1
          while (k < ts.length) {
            z = (qs(k) * 1000000L + 4 * z) / 5
            p = ((ts(k) - prevT) * 1000000L + 4 * p) / 5
            prevT = ts(k)
            k += 1
          }
          (part, ts.length.toLong, z, p)
        }
        .toDF("l_partkey", "n_demands", "z_micro", "p_micro")
        .select(col("l_partkey"), col("n_demands"), col("z_micro"),
          col("p_micro"),
          r6(col("z_micro").cast("double") / col("p_micro").cast("double"))
            .as("croston_rate"))
        .orderBy(col("l_partkey"))
    }),

    // FLEISS' KAPPA — inter-"rater" agreement treating each user's
    // first five events (by ts, event_id) as five ratings into the
    // event-type categories: κ = (P̄ − P̄e)/(1 − P̄e) with
    // P̄ = (Σᵢⱼnᵢⱼ² − 5N)/(20N) and P̄e = Σⱼ Tⱼ²/(5N)².
    "q_agg_fleiss_kappa" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val first5 = Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
      val eligible = first5.groupBy(col("user_id"))
        .agg(count(lit(1)).as("k")).where(col("k") === 5)
        .select(col("user_id"))
      val cells = first5.join(eligible, "user_id")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("nij"))
      val rowStats = cells.agg(
        countDistinct(col("user_id")).as("ns"),
        sum(col("nij").cast(Big) * col("nij").cast(Big)).as("ssq"))
      val colStats = cells.groupBy(col("event_type"))
        .agg(sum(col("nij")).as("tj"))
        .agg(sum(col("tj").cast(Big) * col("tj").cast(Big)).as("st2"))
      val m = rowStats.crossJoin(broadcast(colStats))
      val nsD = col("ns").cast("double")
      val pbar = (col("ssq").cast("double") - nsD * 5) / (nsD * 20)
      val pe = col("st2").cast("double") / (nsD * 5) / (nsD * 5)
      m.select(col("ns").as("n_subjects"), r6(pbar).as("p_bar"),
        r6(pe).as("p_e"),
        r6((pbar - pe) / (lit(1.0) - pe)).as("fleiss_kappa"))
    }),

    // THEIL'S U2 — seasonal-naive (lag-7) forecast accuracy relative
    // to the random-walk naive on daily revenue:
    // U2 = √(Σ(y_{t−7}−y_t)² / Σ(y_{t−1}−y_t)²), exact integer
    // difference squares.
    "q_ts_theil_u2" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val sp = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y7", lag(col("y"), 7).over(w))
        .where(col("y7").isNotNull)
      sp.agg(count(lit(1)).as("n_used"),
        sum(((col("y7") - col("y")).cast(Big) *
          (col("y7") - col("y")).cast(Big))).as("sf"),
        sum(((col("y1") - col("y")).cast(Big) *
          (col("y1") - col("y")).cast(Big))).as("sn"))
        .select(col("n_used"),
          r6(sqrt(col("sf").cast("double") / col("sn").cast("double")))
            .as("theil_u2"))
    }),

    // BASS DIFFUSION — fit n_t = a + b·x + c·x² (x = cumulative
    // customer adopters before day t, integer-quantized to 0..1000 of
    // the final count) by Cramer's rule on exact integer normal
    // equations; m̂ solves c·m² + b·m + a = 0 (unscaled back through
    // u = N_total/1000), p̂ = a/m̂, q̂ = −c_u·m̂. Adoption = a
    // customer's first order date (the events table saturates in two
    // days — degenerate for a 3-parameter fit).
    "q_evt_bass_diffusion" -> ((s, d) => {
      val firstDay = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(to_date(min(col("o_orderdate"))).as("fd"))
      val byday = firstDay.groupBy(col("fd")).agg(count(lit(1)).as("nt"))
      val w = Window.orderBy(col("fd"))
      val tot = byday.agg(sum(col("nt")).as("ntot"))
      val sp = byday
        .withColumn("nprev", sum(col("nt")).over(w) - col("nt"))
        .crossJoin(broadcast(tot))
        .select(col("nt").as("yv"),
          expr("nprev * 1000 div ntot").as("x"), col("ntot"))
      val m = sp.groupBy(col("ntot")).agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sx2"),
        sum(col("x").cast(Big) * col("x").cast(Big)
          * col("x").cast(Big)).as("sx3"),
        sum(col("x").cast(Big) * col("x").cast(Big)
          * col("x").cast(Big) * col("x").cast(Big)).as("sx4"),
        sum(col("yv")).as("sy"),
        sum(col("x").cast(Big) * col("yv").cast(Big)).as("sxy"),
        sum(col("x").cast(Big) * col("x").cast(Big)
          * col("yv").cast(Big)).as("sx2y"))
      val nB = col("n").cast(Big)
      val sxB = col("sx").cast(Big)
      val syB = col("sy").cast(Big)
      val det = (nB * (col("sx2") * col("sx4") - col("sx3") * col("sx3"))
        - sxB * (sxB * col("sx4") - col("sx3") * col("sx2"))
        + col("sx2") * (sxB * col("sx3") - col("sx2") * col("sx2")))
        .cast("double")
      val det1 = (syB * (col("sx2") * col("sx4") - col("sx3") * col("sx3"))
        - sxB * (col("sxy") * col("sx4") - col("sx3") * col("sx2y"))
        + col("sx2") * (col("sxy") * col("sx3") - col("sx2") * col("sx2y")))
        .cast("double")
      val det2 = (nB * (col("sxy") * col("sx4") - col("sx3") * col("sx2y"))
        - syB * (sxB * col("sx4") - col("sx3") * col("sx2"))
        + col("sx2") * (sxB * col("sx2y") - col("sxy") * col("sx2")))
        .cast("double")
      val det3 = (nB * (col("sx2") * col("sx2y") - col("sxy") * col("sx3"))
        - sxB * (sxB * col("sx2y") - col("sxy") * col("sx2"))
        + syB * (sxB * col("sx3") - col("sx2") * col("sx2")))
        .cast("double")
      val aC = det1 / det
      val bS = det2 / det
      val cS = det3 / det
      val u = col("ntot").cast("double") / 1000
      val bU = bS / u
      val cU = cS / (u * u)
      val mHat = (-bU - sqrt(bU * bU - aC * cU * 4)) / (cU * 2)
      m.select(col("n").as("n_days"), r6(aC).as("a_coef"),
        r6(bU).as("b_coef"), r6(cU).as("c_coef"),
        r6(mHat).as("m_hat"), r6(aC / mHat).as("p_hat"),
        r6(-cU * mHat).as("q_hat"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_croston" ->
      """WITH RECURSIVE base AS (
              SELECT l_partkey,
                     CAST(date_diff('day',
                       (SELECT MIN(CAST(l_shipdate AS DATE)) FROM lineitem),
                       CAST(l_shipdate AS DATE)) + 1 AS BIGINT) AS t,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
              FROM lineitem WHERE l_partkey % 97 = 0
              GROUP BY 1, CAST(l_shipdate AS DATE)),
            arr AS (SELECT l_partkey,
                      list(t ORDER BY t) AS ts,
                      list(q ORDER BY t) AS qs,
                      CAST(COUNT(*) AS BIGINT) AS n
                    FROM base GROUP BY 1),
            r AS (
              SELECT l_partkey, ts, qs, n, CAST(1 AS BIGINT) AS k,
                     qs[1] * 1000000 AS z, ts[1] * 1000000 AS p,
                     ts[1] AS prevt
              FROM arr
              UNION ALL
              SELECT l_partkey, ts, qs, n, k + 1,
                     (qs[CAST(k + 1 AS INT)] * 1000000 + 4 * z) // 5,
                     ((ts[CAST(k + 1 AS INT)] - prevt) * 1000000 + 4 * p)
                       // 5,
                     ts[CAST(k + 1 AS INT)]
              FROM r WHERE k < n)
         SELECT l_partkey, n AS n_demands, z AS z_micro, p AS p_micro,
                round(CAST(z AS DOUBLE) / CAST(p AS DOUBLE), 6)
                  AS croston_rate
         FROM r WHERE k = n ORDER BY l_partkey""",

    "q_agg_fleiss_kappa" ->
      """WITH rk AS (SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS rn
                 FROM events),
            f5 AS (SELECT user_id, event_type FROM rk WHERE rn <= 5),
            elig AS (SELECT user_id FROM f5 GROUP BY 1
                     HAVING COUNT(*) = 5),
            cells AS (SELECT f5.user_id, f5.event_type,
                        CAST(COUNT(*) AS BIGINT) AS nij
                      FROM f5 JOIN elig USING (user_id)
                      GROUP BY 1, 2),
            rs AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ns,
                     SUM(CAST(nij AS HUGEINT) * CAST(nij AS HUGEINT))
                       AS ssq
                   FROM cells),
            cs AS (SELECT SUM(CAST(tj AS HUGEINT) * CAST(tj AS HUGEINT))
                       AS st2
                   FROM (SELECT event_type, CAST(SUM(nij) AS BIGINT) AS tj
                         FROM cells GROUP BY 1)),
            e AS (SELECT ns,
                    (CAST(ssq AS DOUBLE) - CAST(ns AS DOUBLE) * 5)
                      / (CAST(ns AS DOUBLE) * 20) AS pbar,
                    CAST(st2 AS DOUBLE) / (CAST(ns AS DOUBLE) * 5)
                      / (CAST(ns AS DOUBLE) * 5) AS pe
                  FROM rs, cs)
         SELECT ns AS n_subjects, round(pbar, 6) AS p_bar,
                round(pe, 6) AS p_e,
                round((pbar - pe) / (1.0 - pe), 6) AS fleiss_kappa
         FROM e""",

    "q_ts_theil_u2" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            sp AS (SELECT y,
                     lag(y, 1) OVER (ORDER BY dt) AS y1,
                     lag(y, 7) OVER (ORDER BY dt) AS y7
                   FROM byday),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
                    SUM(CAST(y7 - y AS HUGEINT) * CAST(y7 - y AS HUGEINT))
                      AS sf,
                    SUM(CAST(y1 - y AS HUGEINT) * CAST(y1 - y AS HUGEINT))
                      AS sn
                  FROM sp WHERE y7 IS NOT NULL)
         SELECT n_used,
                round(sqrt(CAST(sf AS DOUBLE) / CAST(sn AS DOUBLE)), 6)
                  AS theil_u2
         FROM m""",

    "q_evt_bass_diffusion" ->
      """WITH fd AS (SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS fd
                 FROM orders GROUP BY 1),
            byday AS (SELECT fd, CAST(COUNT(*) AS BIGINT) AS nt
                      FROM fd GROUP BY 1),
            t AS (SELECT CAST(SUM(nt) AS BIGINT) AS ntot FROM byday),
            sp AS (SELECT nt AS yv,
                     CAST((SUM(nt) OVER (ORDER BY fd
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - nt) AS BIGINT) * 1000 // ntot AS x,
                     ntot
                   FROM byday, t),
            m AS (SELECT ntot, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sx2,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
                      * CAST(x AS HUGEINT)) AS sx3,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
                      * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sx4,
                    CAST(SUM(yv) AS BIGINT) AS sy,
                    SUM(CAST(x AS HUGEINT) * CAST(yv AS HUGEINT)) AS sxy,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
                      * CAST(yv AS HUGEINT)) AS sx2y
                  FROM sp GROUP BY 1),
            dts AS (SELECT ntot, n,
                    CAST(CAST(n AS HUGEINT) * (sx2 * sx4 - sx3 * sx3)
                      - CAST(sx AS HUGEINT) * (CAST(sx AS HUGEINT) * sx4
                        - sx3 * sx2)
                      + sx2 * (CAST(sx AS HUGEINT) * sx3 - sx2 * sx2)
                      AS DOUBLE) AS det,
                    CAST(CAST(sy AS HUGEINT) * (sx2 * sx4 - sx3 * sx3)
                      - CAST(sx AS HUGEINT) * (sxy * sx4 - sx3 * sx2y)
                      + sx2 * (sxy * sx3 - sx2 * sx2y) AS DOUBLE) AS det1,
                    CAST(CAST(n AS HUGEINT) * (sxy * sx4 - sx3 * sx2y)
                      - CAST(sy AS HUGEINT) * (CAST(sx AS HUGEINT) * sx4
                        - sx3 * sx2)
                      + sx2 * (CAST(sx AS HUGEINT) * sx2y - sxy * sx2)
                      AS DOUBLE) AS det2,
                    CAST(CAST(n AS HUGEINT) * (sx2 * sx2y - sxy * sx3)
                      - CAST(sx AS HUGEINT) * (CAST(sx AS HUGEINT) * sx2y
                        - sxy * sx2)
                      + CAST(sy AS HUGEINT) * (CAST(sx AS HUGEINT) * sx3
                        - sx2 * sx2) AS DOUBLE) AS det3
                  FROM m),
            co AS (SELECT n, det1 / det AS ac,
                    (det2 / det) / (CAST(ntot AS DOUBLE) / 1000) AS bu,
                    (det3 / det) / ((CAST(ntot AS DOUBLE) / 1000)
                      * (CAST(ntot AS DOUBLE) / 1000)) AS cu
                  FROM dts),
            fin AS (SELECT n, ac, bu, cu,
                    (-bu - sqrt(bu * bu - ac * cu * 4)) / (cu * 2) AS mh
                  FROM co)
         SELECT n AS n_days, round(ac, 6) AS a_coef,
                round(bu, 6) AS b_coef, round(cu, 6) AS c_coef,
                round(mh, 6) AS m_hat, round(ac / mh, 6) AS p_hat,
                round(-cu * mh, 6) AS q_hat
         FROM fin"""
  )
}
