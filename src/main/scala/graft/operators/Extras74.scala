package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 12: the Hodges-Lehmann robust location
  * estimator (the estimator sibling of q_agg_wilcoxon), log-log price
  * elasticity of demand, and the CUSUM-of-squares variance-changepoint
  * statistic (the variance sibling of q_ts_cusum).
  *
  * Determinism contract (SURVEY §2.13): Walsh averages stay DOUBLED
  * exact integers (never an interpolated IEEE midpoint); the
  * elasticity regression folds exact micro-quantized logs; the CUSUM
  * supremum compares exact DECIMAL cross-products with a (dev, k)
  * total-order argmax.
  */
object Extras74 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HODGES-LEHMANN — median of all pairwise Walsh averages
    // (y_i+y_j)/2, i ≤ j, of daily revenue: the robust location
    // estimate wilcoxon inverts. Walsh sums stay DOUBLED exact
    // integers; the median is the exact lower-median element of the
    // calendar²-bounded pair relation (BROADCAST build side — the
    // mann_kendall fence discipline); one sorted window over ~3M
    // bounded rows picks it.
    "q_ts_hodges_lehmann" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
      val walsh = daily.as("a").join(broadcast(daily.as("b")),
          col("a.rn") <= col("b.rn"))
        .select((col("a.y") + col("b.y")).as("w2"))
      val ww = Window.orderBy(col("w2"))
      val all = Window.partitionBy(lit(1))
      walsh
        .withColumn("rk", row_number().over(ww))
        .withColumn("n", count(lit(1)).over(all))
        .agg(max(col("n")).as("n_pairs"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("w2")))
            .as("hl2_cents"))
        .select(col("n_pairs"), col("hl2_cents"),
          r6(col("hl2_cents").cast("double") / lit(2.0) / lit(100.0))
            .as("hl_usd"))
    }),

    // PRICE ELASTICITY — log-log demand regression over the weekly
    // (brand-agnostic) lineitem aggregate: ln(qty) on ln(avg price);
    // the slope IS the elasticity. Weekly logs are micro-quantized
    // exact integers, the OLS folds exact sums, and the slope/R² are
    // the one IEEE tail.
    "q_evt_price_elasticity" -> ((s, d) => {
      val big = DecimalType(38, 0)
      val weekly = Tables.lineitem(s, d)
        .groupBy(weekofyear(to_date(col("l_shipdate"))).as("wk"),
          year(to_date(col("l_shipdate"))).as("yr"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("q100"),
          sum((dec(col("l_extendedprice")) * 100).cast("long")).as("rev"),
          count(lit(1)).as("nl"))
        .select(
          round(log(col("q100").cast("double") / 100.0) * 1e6)
            .cast("long").as("lq"),
          round(log(col("rev").cast("double")
            / col("q100").cast("double")) * 1e6).cast("long").as("lp"))
      val a = weekly.agg(count(lit(1)).as("n"),
        sum(col("lq")).as("sq"),
        sum(col("lp")).as("sp"),
        sum(col("lq").cast(big) * col("lp").cast(big)).as("sqp"),
        sum(col("lp").cast(big) * col("lp").cast(big)).as("spp"),
        sum(col("lq").cast(big) * col("lq").cast(big)).as("sqq"))
      val nD = col("n").cast("double")
      // operators END each continued line — a leading '-' after a
      // complete expression silently starts a NEW statement (this very
      // query shipped its first draft with cxx = spp; selfcheck caught
      // the uncentered ratio)
      val cxx = col("spp").cast("double") -
        col("sp").cast("double") * col("sp").cast("double") / nD
      val cyy = col("sqq").cast("double") -
        col("sq").cast("double") * col("sq").cast("double") / nD
      val cxy = col("sqp").cast("double") -
        col("sp").cast("double") * col("sq").cast("double") / nD
      a.select(col("n").as("n_weeks"),
        r6(cxy / cxx).as("elasticity"),
        r6(cxy * cxy / (cxx * cyy)).as("r2"))
    }),

    // CUSUM OF SQUARES — variance-changepoint statistic (the variance
    // sibling of q_ts_cusum's mean test): sup_k |T·C_k − k·C_T| over
    // the daily spine, where C_k is the cumulative sum of squared
    // deviations... of squared VALUES (the Brown-Durbin-Evans form on
    // raw squares). The supremum compares exact DECIMAL(38,0)
    // cross-products — no division enters the argmax; the normalized
    // statistic is the one IEEE tail.
    "q_ts_cusum_squares" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val upto = ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val all = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("k", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("ck", sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(upto)
          .cast("decimal(38,0)"))
        .withColumn("ct", sum(col("y").cast("decimal(38,0)")
          * col("y").cast("decimal(38,0)")).over(all)
          .cast("decimal(38,0)"))
        .withColumn("dev",
          abs(col("ck") * col("n") - col("ct") * col("k"))
            .cast("decimal(38,0)"))
        .orderBy(col("dev").desc, col("k"))
        .limit(1)
        .select(col("n").as("n_days"), col("k").as("break_k"),
          col("dt").as("break_dt"),
          r6(col("dev").cast("double")
            / (col("ct").cast("double") * col("n").cast("double")))
            .as("sup_stat"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_hodges_lehmann" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT y, row_number() OVER (ORDER BY dt) AS rn
                  FROM daily),
            w AS (SELECT b1.y + b2.y AS w2
                  FROM b b1 JOIN b b2 ON b1.rn <= b2.rn),
            r AS (SELECT w2, row_number() OVER (ORDER BY w2) AS rk,
                    COUNT(*) OVER () AS n
                  FROM w)
         SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
                MAX(CASE WHEN rk = (n + 1) // 2 THEN w2 END)
                  AS hl2_cents,
                round(CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN w2 END)
                  AS DOUBLE) / 2.0 / 100.0, 6) AS hl_usd
         FROM r""",

    "q_evt_price_elasticity" ->
      """WITH weekly AS (SELECT
                    CAST(round(ln(CAST(q100 AS DOUBLE) / 100.0)
                      * 1000000) AS BIGINT) AS lq,
                    CAST(round(ln(CAST(rev AS DOUBLE)
                      / CAST(q100 AS DOUBLE)) * 1000000) AS BIGINT) AS lp
                 FROM (SELECT
                         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT))
                           AS BIGINT) AS q100,
                         CAST(SUM(CAST(CAST(l_extendedprice
                           AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                           AS rev
                       FROM lineitem
                       GROUP BY EXTRACT(week FROM CAST(l_shipdate AS DATE)),
                         EXTRACT(year FROM CAST(l_shipdate AS DATE)))),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(lq) AS BIGINT) AS sq,
                    CAST(SUM(lp) AS BIGINT) AS sp,
                    CAST(SUM(CAST(lq AS DECIMAL(38,0))
                      * CAST(lp AS DECIMAL(38,0))) AS DOUBLE) AS sqp,
                    CAST(SUM(CAST(lp AS DECIMAL(38,0))
                      * CAST(lp AS DECIMAL(38,0))) AS DOUBLE) AS spp,
                    CAST(SUM(CAST(lq AS DECIMAL(38,0))
                      * CAST(lq AS DECIMAL(38,0))) AS DOUBLE) AS sqq
                  FROM weekly)
         SELECT n AS n_weeks,
                round((sqp - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE)
                    / CAST(n AS DOUBLE))
                  / (spp - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                    / CAST(n AS DOUBLE)), 6) AS elasticity,
                round((sqp - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE)
                    / CAST(n AS DOUBLE))
                  * (sqp - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE)
                    / CAST(n AS DOUBLE))
                  / ((spp - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                    / CAST(n AS DOUBLE))
                    * (sqq - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                      / CAST(n AS DOUBLE))), 6) AS r2
         FROM a""",

    "q_ts_cusum_squares" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            seq AS (SELECT dt,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS k,
                    CAST(COUNT(*) OVER () AS BIGINT) AS n,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) OVER (ORDER BY dt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,0)) AS ck,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                        * CAST(y AS DECIMAL(38,0))) OVER ()
                      AS DECIMAL(38,0)) AS ct
                  FROM daily),
            top AS (SELECT n, k, dt,
                    CAST(abs(ck * n - ct * k) AS DECIMAL(38,0)) AS dev,
                    ct
                  FROM seq ORDER BY dev DESC, k LIMIT 1)
         SELECT n AS n_days, k AS break_k, dt AS break_dt,
                round(CAST(dev AS DOUBLE)
                  / (CAST(ct AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                  AS sup_stat
         FROM top"""
  )
}
