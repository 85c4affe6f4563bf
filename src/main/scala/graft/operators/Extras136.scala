package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 62: quarter-end revenue uplift (the
  * fiscal-calendar effect screen — do quarter-closing months book
  * more revenue per day?), Cohen's h effect size for the
  * urgent-vs-low conversion-style rates (the arcsine-stabilized
  * proportion effect beside q_agg_cohens_d's mean effect), and MASE
  * (mean absolute scaled error of the seasonal-naive forecast over
  * the final 28 days — the scale-free forecast metric
  * q_ts_forecast_err's MAE/MAPE family lacks).
  *
  * Scale shape: all three are calendar-bounded folds after one
  * fact-linear aggregate.
  *
  * Determinism contract (SURVEY §2.13): uplift folds exact per-group
  * moments (Welch t chain); Cohen's h is one shared asin chain over
  * exact counts; MASE sums exact integer |errors| (seasonal-naive
  * and in-sample naive scaling) with one final division.
  */
object Extras136 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // QUARTER-END EFFECT — daily revenue in quarter-closing months
    // (3, 6, 9, 12) vs other months: Welch t on the daily means.
    "q_ts_quarter_end_effect" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("g",
          when(month(col("dt")).isin(3, 6, 9, 12), "qend")
            .otherwise("mid"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"), sum(col("y")).as("sj"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("ssj"))
      val a = per.where(col("g") === "qend")
        .select(col("nj").as("n1"), col("sj").as("s1"),
          col("ssj").as("ss1"))
      val b = per.where(col("g") === "mid")
        .select(col("nj").as("n2"), col("sj").as("s2"),
          col("ssj").as("ss2"))
      def v(n: org.apache.spark.sql.Column,
            sm: org.apache.spark.sql.Column,
            ss: org.apache.spark.sql.Column) =
        (n.cast("double") * ss.cast("double")
          - sm.cast("double") * sm.cast("double")) /
          (n.cast("double") * (n.cast("double") - 1))
      val j = a.crossJoin(broadcast(b))
      val m1 = col("s1").cast("double") / col("n1").cast("double")
      val m2 = col("s2").cast("double") / col("n2").cast("double")
      val se = sqrt(
        v(col("n1"), col("s1"), col("ss1")) / col("n1").cast("double")
          + v(col("n2"), col("s2"), col("ss2"))
            / col("n2").cast("double"))
      j.select(col("n1").as("n_qend_days"), col("n2").as("n_mid_days"),
        r6((m1 - m2) / lit(100.0)).as("uplift_dollars_per_day"),
        r6((m1 - m2) / m2).as("uplift_rel"),
        r6((m1 - m2) / se).as("t_welch"))
    }),

    // COHEN'S H — arcsine effect size between the urgent and low
    // priorities' high-value-order rates (order > $200k).
    "q_agg_cohens_h" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .where(substring(col("o_orderpriority"), 1, 1).isin("1", "5"))
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          ((dec(col("o_totalprice")) * 100).cast("long") >
            20000000L).cast("long").as("hi"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("hi")).as("k"))
      val a = per.where(col("g") === "1")
        .select(col("n").as("n1"), col("k").as("k1"))
      val b = per.where(col("g") === "5")
        .select(col("n").as("n2"), col("k").as("k2"))
      val p1 = col("k1").cast("double") / col("n1").cast("double")
      val p2 = col("k2").cast("double") / col("n2").cast("double")
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("n2"),
          r6(p1).as("rate_urgent"), r6(p2).as("rate_low"),
          r6(lit(2.0) * asin(sqrt(p1))
            - lit(2.0) * asin(sqrt(p2))).as("cohens_h"))
    }),

    // MASE — seasonal-naive (lag-7) forecast of the last 28 days,
    // scaled by the in-sample naive (lag-1) MAE of the training span.
    "q_ts_mase" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("i", row_number().over(ord).cast("long"))
        .withColumn("e7", abs(col("y") - lag(col("y"), 7).over(ord)))
        .withColumn("e1", abs(col("y") - lag(col("y"), 1).over(ord)))
      val nT = daily.agg(max(col("i")).as("nn"))
      val sp = daily.crossJoin(broadcast(nT))
      val test = sp.where(col("i") > col("nn") - 28)
        .agg(count(lit(1)).as("n_test"), sum(col("e7")).as("sum_e7"))
      val train = sp.where(col("i") <= col("nn") - 28
          && col("e1").isNotNull)
        .agg(count(lit(1)).as("n_train"), sum(col("e1")).as("sum_e1"))
      test.crossJoin(broadcast(train))
        .select(col("n_test"), col("n_train"),
          r6(col("sum_e7").cast("double") / col("n_test").cast("double")
            / lit(100.0)).as("mae_seasonal_dollars"),
          r6(col("sum_e1").cast("double")
            / col("n_train").cast("double") / lit(100.0))
            .as("naive_mae_dollars"),
          r6((col("sum_e7").cast("double") / col("n_test").cast("double"))
            / (col("sum_e1").cast("double")
              / col("n_train").cast("double"))).as("mase"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_quarter_end_effect" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            per AS (SELECT CASE WHEN month(dt) IN (3, 6, 9, 12)
                         THEN 'qend' ELSE 'mid' END AS g,
                    CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(y) AS BIGINT) AS sj,
                    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                      AS HUGEINT) AS ssj
                  FROM daily GROUP BY 1),
            a AS (SELECT nj AS n1, sj AS s1, ssj AS ss1 FROM per
                  WHERE g = 'qend'),
            b AS (SELECT nj AS n2, sj AS s2, ssj AS ss2 FROM per
                  WHERE g = 'mid'),
            f AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                    sqrt(
                      ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1)))
                        / CAST(n1 AS DOUBLE)
                      + ((CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
                        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                        / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1)))
                        / CAST(n2 AS DOUBLE)) AS se
                  FROM a, b)
         SELECT n1 AS n_qend_days, n2 AS n_mid_days,
                round((m1 - m2) / 100.0, 6) AS uplift_dollars_per_day,
                round((m1 - m2) / m2, 6) AS uplift_rel,
                round((m1 - m2) / se, 6) AS t_welch
         FROM f""",

    "q_agg_cohens_h" ->
      """WITH per AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN CAST(CAST(o_totalprice
                        AS DECIMAL(18,2)) * 100 AS BIGINT) > 20000000
                      THEN 1 ELSE 0 END) AS BIGINT) AS k
                 FROM orders
                 WHERE substr(o_orderpriority, 1, 1) IN ('1', '5')
                 GROUP BY 1),
            a AS (SELECT n AS n1, k AS k1 FROM per WHERE g = '1'),
            b AS (SELECT n AS n2, k AS k2 FROM per WHERE g = '5'),
            f AS (SELECT n1, n2,
                    CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                    CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
                  FROM a, b)
         SELECT n1, n2, round(p1, 6) AS rate_urgent,
                round(p2, 6) AS rate_low,
                round(2.0 * asin(sqrt(p1)) - 2.0 * asin(sqrt(p2)), 6)
                  AS cohens_h
         FROM f""",

    "q_ts_mase" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT dt, y,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS i,
                    abs(y - lag(y, 7) OVER (ORDER BY dt)) AS e7,
                    abs(y - lag(y, 1) OVER (ORDER BY dt)) AS e1
                  FROM daily),
            nt AS (SELECT MAX(i) AS nn FROM idx),
            test AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                    CAST(SUM(e7) AS BIGINT) AS sum_e7
                  FROM idx, nt WHERE i > nn - 28),
            train AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
                    CAST(SUM(e1) AS BIGINT) AS sum_e1
                  FROM idx, nt WHERE i <= nn - 28 AND e1 IS NOT NULL)
         SELECT n_test, n_train,
                round(CAST(sum_e7 AS DOUBLE) / CAST(n_test AS DOUBLE)
                  / 100.0, 6) AS mae_seasonal_dollars,
                round(CAST(sum_e1 AS DOUBLE) / CAST(n_train AS DOUBLE)
                  / 100.0, 6) AS naive_mae_dollars,
                round((CAST(sum_e7 AS DOUBLE) / CAST(n_test AS DOUBLE))
                  / (CAST(sum_e1 AS DOUBLE) / CAST(n_train AS DOUBLE)),
                  6) AS mase
         FROM test, train"""
  )
}
