package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 36: seasonal/extreme/peak round-out —
  * Hyndman-style seasonal strength of daily revenue (MA(7) detrend,
  * DOW seasonal), a Gumbel extreme-value fit with the 100-period
  * return level on monthly block maxima, rolling z-score peak-day
  * detection, and quantile treatment effects (returned vs kept
  * quantity) at the deciles.
  *
  * Scale shape: everything after the one fact-sized daily/spine
  * aggregation rides calendar- or value-bounded spines; the QTE
  * decile search is a 9-row broadcast gate over the ≤50-value
  * quantity spine, never a global sort.
  *
  * Determinism contract (SURVEY §2.13): the detrended series is
  * carried as the EXACT integer y·7 − Σ₇ (full windows only) and the
  * DOW seasonal is micro-quantized before the remainder fold; block
  * maxima moments are exact; peak gates compare one shared
  * window-moment chain; QTE deciles use the exact integer gate
  * 10·cum ≥ d·n.
  */
object Extras110 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SEASONAL STRENGTH — F_seas = max(0, 1 − Var(R)/Var(S+R)) where
    // S+R is the MA(7)-detrended daily revenue (exact 7y−Σ₇ integers)
    // and S the micro-quantized DOW mean.
    "q_ts_detrended_seasonal_strength" -> ((s, d) => {
      val w7 = Window.orderBy(col("dt")).rowsBetween(-3, 3)
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val det = byday
        .withColumn("s7", sum(col("y")).over(w7))
        .withColumn("c7", count(lit(1)).over(w7))
        .where(col("c7") === 7)
        .select(col("dt"), dayofweek(col("dt")).as("dow"),
          (col("y") * 7 - col("s7")).as("dsc"))
        .duckCkpt()
      val seas = det.groupBy(col("dow"))
        .agg(sum(col("dsc")).as("sd"), count(lit(1)).as("cd"))
        .select(col("dow"), expr("sd * 1000000 div cd").as("s_micro"))
      val r = det.join(broadcast(seas), "dow")
        .select((col("dsc").cast(Big) * 1000000 - col("s_micro").cast(Big))
          .as("r_micro"),
          (col("dsc").cast(Big) * 1000000).as("sr_micro"))
      val m = r.agg(count(lit(1)).as("n"),
        sum(col("r_micro")).as("sr"), sum(col("sr_micro")).as("ss"),
        sum(col("r_micro") * col("r_micro")).as("srr"),
        sum(col("sr_micro") * col("sr_micro")).as("sss"))
      val nD = col("n").cast("double")
      def vr(sq: String, s1: String) = (col(sq).cast("double") -
        col(s1).cast("double") * col(s1).cast("double") / nD) / nD
      m.select(col("n").as("n_days_used"),
        r6(vr("srr", "sr") / vr("sss", "ss")).as("var_ratio"),
        r6(greatest(lit(1.0) - vr("srr", "sr") / vr("sss", "ss"),
          lit(0.0))).as("f_seasonal"))
    }),

    // GUMBEL FIT + RETURN LEVEL — method-of-moments on monthly block
    // maxima of daily revenue: β = σ√6/π, μ = m̄ − γβ; the
    // 100-period return level μ − β·ln(−ln(0.99)).
    "q_ts_gumbel_return" -> ((s, d) => {
      val blocks = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .groupBy(year(col("dt")).as("yr"), month(col("dt")).as("mo"))
        .agg(max(col("y")).as("bm"))
      val m = blocks.agg(count(lit(1)).as("n"), sum(col("bm")).as("sb"),
        sum(col("bm").cast(Big) * col("bm").cast(Big)).as("sbb"))
      val nD = col("n").cast("double")
      val mean = col("sb").cast("double") / nD
      val sd = sqrt((col("sbb").cast("double") -
        col("sb").cast("double") * col("sb").cast("double") / nD) /
        (nD - 1))
      val beta = sd * sqrt(lit(6.0)) / lit(3.141592653589793)
      val mu = mean - lit(0.5772156649015329) * beta
      m.select(col("n").as("n_blocks"),
        r6(mu / 100).as("gumbel_mu_dollars"),
        r6(beta / 100).as("gumbel_beta_dollars"),
        r6((mu - beta * log(-log(lit(0.99)))) / 100)
          .as("return_level_100_dollars"))
    }),

    // PEAK DAYS — days whose revenue exceeds the trailing-15-day mean
    // by more than 2 trailing σ (≥10 prior observations): the
    // rolling-z peak detector.
    "q_ts_peak_days" -> ((s, d) => {
      val wT = Window.orderBy(col("dt")).rowsBetween(-15, -1)
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val st = byday
        .withColumn("c", count(lit(1)).over(wT))
        .withColumn("s1", sum(col("y")).over(wT))
        .withColumn("s2", sum(col("y").cast(Big) * col("y").cast(Big))
          .over(wT))
        .where(col("c") >= 10)
      val cD = col("c").cast("double")
      val mu = col("s1").cast("double") / cD
      val sd = sqrt((col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / cD) / cD)
      st.where(col("y").cast("double") > mu + sd * 2)
        .select(col("dt"),
          r6((col("y").cast("double") - mu) / sd).as("z_excess"))
        .orderBy(col("dt"))
    }),

    // QTE AT DECILES — exact type-1 decile quantiles of returned vs
    // kept quantities off the value spine (gate 10·cum ≥ d·n) and
    // their difference: the quantile-treatment-effect curve.
    "q_agg_qte_deciles" -> ((s, d) => {
      def qs(flag: String, qname: String): DataFrame = {
        val per = Tables.lineitem(s, d)
          .where(col("l_returnflag") === flag)
          .groupBy(col("l_quantity").cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = per.agg(sum(col("c")).as("n"))
        val dec9 = s.range(1, 10).toDF("d")
        per.withColumn("cum", sum(col("c")).over(w))
          .crossJoin(broadcast(tot))
          .join(broadcast(dec9), col("cum") * 10 >= col("d") * col("n"))
          .groupBy(col("d")).agg(min(col("v")).as(qname))
      }
      qs("R", "q_returned").join(qs("N", "q_kept"), "d")
        .select(col("d").as("decile"), col("q_returned"), col("q_kept"),
          (col("q_returned") - col("q_kept")).as("qte"))
        .orderBy(col("decile"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_detrended_seasonal_strength" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            det AS (SELECT dt, dayofweek(dt) + 1 AS dow,
                      y * 7 - s7 AS dsc
                    FROM (SELECT dt, y,
                            COUNT(*) OVER w AS c7,
                            CAST(SUM(y) OVER w AS BIGINT) AS s7
                          FROM byday
                          WINDOW w AS (ORDER BY dt
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
                      q0
                    WHERE c7 = 7),
            seas AS (SELECT dow,
                       CAST(CAST(SUM(dsc) AS BIGINT) * 1000000
                         // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS s_micro
                     FROM det GROUP BY 1),
            r AS (SELECT CAST(d.dsc AS HUGEINT) * 1000000 - s.s_micro
                      AS r_micro,
                    CAST(d.dsc AS HUGEINT) * 1000000 AS sr_micro
                  FROM det d JOIN seas s USING (dow)),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    SUM(r_micro) AS sr, SUM(sr_micro) AS ss,
                    SUM(r_micro * r_micro) AS srr,
                    SUM(sr_micro * sr_micro) AS sss
                  FROM r),
            e AS (SELECT n,
                    (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
                      * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE) AS vr,
                    (CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE)
                      * CAST(ss AS DOUBLE) / CAST(n AS DOUBLE))
                      / CAST(n AS DOUBLE) AS vs
                  FROM m)
         SELECT n AS n_days_used, round(vr / vs, 6) AS var_ratio,
                round(greatest(1.0 - vr / vs, 0.0), 6) AS f_seasonal
         FROM e""",

    "q_ts_gumbel_return" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            blocks AS (SELECT EXTRACT(year FROM dt) AS yr,
                    EXTRACT(month FROM dt) AS mo,
                    CAST(MAX(y) AS BIGINT) AS bm
                  FROM byday GROUP BY 1, 2),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(bm) AS BIGINT) AS sb,
                    SUM(CAST(bm AS HUGEINT) * CAST(bm AS HUGEINT)) AS sbb
                  FROM blocks),
            e AS (SELECT n,
                    CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                    sqrt((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE)
                        * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1)) * sqrt(6.0)
                      / 3.141592653589793 AS beta
                  FROM m),
            f AS (SELECT n, beta,
                    mean - 0.5772156649015329 * beta AS mu
                  FROM e)
         SELECT n AS n_blocks, round(mu / 100, 6) AS gumbel_mu_dollars,
                round(beta / 100, 6) AS gumbel_beta_dollars,
                round((mu - beta * ln(-ln(0.99))) / 100, 6)
                  AS return_level_100_dollars
         FROM f""",

    "q_ts_peak_days" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            st AS (SELECT dt, y,
                     COUNT(*) OVER w AS c,
                     CAST(SUM(y) OVER w AS BIGINT) AS s1,
                     SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) OVER w
                       AS s2
                   FROM byday
                   WINDOW w AS (ORDER BY dt
                     ROWS BETWEEN 15 PRECEDING AND 1 PRECEDING)),
            e AS (SELECT dt, y, c,
                    CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE) AS mu,
                    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                        * CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
                      / CAST(c AS DOUBLE)) AS sd
                  FROM st WHERE c >= 10)
         SELECT dt, round((CAST(y AS DOUBLE) - mu) / sd, 6) AS z_excess
         FROM e WHERE CAST(y AS DOUBLE) > mu + sd * 2
         ORDER BY dt""",

    "q_agg_qte_deciles" ->
      """WITH spr AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT CAST(l_quantity AS BIGINT) AS v
                       FROM lineitem WHERE l_returnflag = 'R')
                 GROUP BY 1),
            spn AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
                    FROM (SELECT CAST(l_quantity AS BIGINT) AS v
                          FROM lineitem WHERE l_returnflag = 'N')
                    GROUP BY 1),
            cr AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                     (SELECT CAST(SUM(c) AS BIGINT) FROM spr) AS n
                   FROM spr),
            cn AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum,
                     (SELECT CAST(SUM(c) AS BIGINT) FROM spn) AS n
                   FROM spn),
            qr AS (SELECT d, CAST(MIN(v) AS BIGINT) AS q_returned
                   FROM cr, range(1, 10) t(d)
                   WHERE cum * 10 >= d * n GROUP BY 1),
            qn AS (SELECT d, CAST(MIN(v) AS BIGINT) AS q_kept
                   FROM cn, range(1, 10) t(d)
                   WHERE cum * 10 >= d * n GROUP BY 1)
         SELECT d AS decile, q_returned, q_kept,
                q_returned - q_kept AS qte
         FROM qr JOIN qn USING (d) ORDER BY decile"""
  )
}
