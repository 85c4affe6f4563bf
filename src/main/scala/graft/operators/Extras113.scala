package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 39: causal/segmentation round-out —
  * stratified average treatment effect of the discount on line
  * revenue, top-3 changepoints by one binary-segmentation round on
  * the daily series, Matthews correlation + balanced accuracy for
  * the Extras108 stump classifier, and the cumulative gain/lift
  * curve on the quantity score.
  *
  * Scale shape: ATE folds per-(stratum, arm) exact moments (≤10
  * rows); binary segmentation is two argmax passes over the
  * calendar-bounded day spine (segment statistics all exact
  * integers, the second pass partitioned by the 2-segment key);
  * MCC is one 4-cell fold; the gain curve walks the ≤50-value
  * quantity spine.
  *
  * Determinism contract (SURVEY §2.13): every argmax orders by an
  * EXACT integer statistic with the date as tiebreak; per-stratum
  * effects are micro-quantized before the weighted fold; MCC's
  * 4-way product rides DECIMAL(38,0).
  */
object Extras113 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STRATIFIED ATE — treatment = discount ≥ 5%, outcome = line
    // revenue, strata = quantity decades: ATE = Σ_s w_s(ȳ₁ₛ − ȳ₀ₛ).
    "q_agg_stratified_ate" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .select(expr("(cast(l_quantity as bigint) - 1) div 10").as("st"),
          (dec(col("l_discount")) >= 0.05).cast("long").as("tr"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("y"))
        .groupBy(col("st"))
        .agg(sum(col("tr")).as("n1"), sum(col("tr") * col("y")).as("s1"),
          sum(lit(1) - col("tr")).as("n0"),
          sum((lit(1) - col("tr")) * col("y")).as("s0"))
      val tot = per.agg(sum(col("n1") + col("n0")).as("nn"))
      val eff = col("s1").cast("double") / col("n1").cast("double") -
        col("s0").cast("double") / col("n0").cast("double")
      val q = per.crossJoin(broadcast(tot))
        .select(col("st"),
          round(eff * (col("n1") + col("n0")).cast("double") /
            col("nn").cast("double") * 1e6).cast("long").as("t_micro"))
      q.agg(count(lit(1)).as("n_strata"), sum(col("t_micro")).as("sm"))
        .select(col("n_strata"),
          r6(col("sm").cast("double") / 1e6 / 100).as("ate_dollars"))
    }),

    // BINARY SEGMENTATION — changepoint 1 maximizes the exact
    // integer |n·P_t − t·S| CUSUM; round 2 repeats inside each half.
    // Emitted: (round, segment, cp day, scaled statistic).
    "q_ts_binary_segmentation" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("p", sum(col("y")).over(w))
        .duckCkpt()
      val tot = byday.agg(max(col("t")).as("n"), sum(col("y")).as("ss"))
      val g1 = byday.crossJoin(broadcast(tot))
        .withColumn("stat", abs(col("n").cast(Big) * col("p").cast(Big)
          - col("t").cast(Big) * col("ss").cast(Big)))
        .where(col("t") < col("n"))
      val cp1 = g1.orderBy(col("stat").desc, col("dt")).limit(1)
        .select(col("t").as("t1"), col("p").as("p1v"), col("dt").as("d1"),
          col("stat").as("st1"), col("n"), col("ss"))
        .duckCkpt()
      val g2 = byday.crossJoin(broadcast(cp1))
        .withColumn("seg", (col("t") > col("t1")).cast("int"))
        .withColumn("a", when(col("seg") === 1, col("t1")).otherwise(0L))
        .withColumn("pa", when(col("seg") === 1, col("p1v")).otherwise(0L))
        .withColumn("ln", when(col("seg") === 1, col("n") - col("t1"))
          .otherwise(col("t1")))
        .withColumn("ts2", when(col("seg") === 1, col("ss") - col("p1v"))
          .otherwise(col("p1v")))
        .where(col("t") < col("n"))
        .where(col("t") =!= col("t1"))
        .withColumn("stat", abs(col("ln").cast(Big)
          * (col("p") - col("pa")).cast(Big)
          - (col("t") - col("a")).cast(Big) * col("ts2").cast(Big)))
      val wS = Window.partitionBy(col("seg"))
        .orderBy(col("stat").desc, col("dt"))
      val cp2 = g2.withColumn("rn", row_number().over(wS))
        .where(col("rn") === 1)
        .select(lit(2L).as("round"), col("seg").cast("long").as("segment"),
          col("dt").as("cp_day"), col("stat").cast("double").as("stat"))
      cp1.select(lit(1L).as("round"), lit(0L).as("segment"),
          col("d1").as("cp_day"), col("st1").cast("double").as("stat"))
        .unionByName(cp2)
        .select(col("round"), col("segment"), col("cp_day"),
          r6(col("stat") / 1e12).as("stat_tera"))
        .orderBy(col("round"), col("segment"))
    }),

    // MCC + BALANCED ACCURACY — the discount≥6bp stump's Matthews
    // correlation and balanced accuracy from exact confusion cells.
    "q_ml_mcc" -> ((s, d) => {
      val m = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select(((dec(col("l_discount")) * 100).cast("long") >= 6)
          .cast("long").as("yh"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        .agg(sum(col("yh") * col("y")).as("tp"),
          sum(col("yh") * (lit(1) - col("y"))).as("fp"),
          sum((lit(1) - col("yh")) * col("y")).as("fn"),
          sum((lit(1) - col("yh")) * (lit(1) - col("y"))).as("tn"))
      val num = (col("tp").cast(Big) * col("tn").cast(Big)
        - col("fp").cast(Big) * col("fn").cast(Big)).cast("double")
      val den = sqrt(((col("tp") + col("fp")).cast(Big)
        * (col("tp") + col("fn")).cast(Big)).cast("double")) *
        sqrt(((col("tn") + col("fp")).cast(Big)
          * (col("tn") + col("fn")).cast(Big)).cast("double"))
      val tpr = col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double")
      val tnr = col("tn").cast("double") /
        (col("tn") + col("fp")).cast("double")
      m.select(col("tp"), col("tn"), r6(num / den).as("mcc"),
        r6((tpr + tnr) / 2).as("balanced_accuracy"))
    }),

    // GAIN / LIFT CURVE — descending-score (quantity) cumulative
    // capture of returns: per spine value the exact row/positive
    // fractions and the lift ratio.
    "q_ml_gain_curve" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .groupBy(col("l_quantity").cast("long").as("v"))
        .agg(count(lit(1)).as("c"),
          sum((col("l_returnflag") === "R").cast("long")).as("c1"))
      val w = Window.orderBy(col("v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = per.agg(sum(col("c")).as("n"), sum(col("c1")).as("p"))
      per.withColumn("cum", sum(col("c")).over(w))
        .withColumn("cum1", sum(col("c1")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("v").as("score_at_least"),
          r6(col("cum").cast("double") / col("n").cast("double"))
            .as("frac_rows"),
          r6(col("cum1").cast("double") / col("p").cast("double"))
            .as("capture_rate"),
          r6((col("cum1").cast(Big) * col("n").cast(Big)).cast("double") /
            (col("cum").cast(Big) * col("p").cast(Big)).cast("double"))
            .as("lift"))
        .orderBy(col("score_at_least").desc)
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_stratified_ate" ->
      """WITH per AS (SELECT (CAST(l_quantity AS BIGINT) - 1) // 10 AS st,
                    CAST(SUM(tr) AS BIGINT) AS n1,
                    CAST(SUM(tr * y) AS BIGINT) AS s1,
                    CAST(SUM(1 - tr) AS BIGINT) AS n0,
                    CAST(SUM((1 - tr) * y) AS BIGINT) AS s0
                 FROM (SELECT l_quantity,
                         CASE WHEN CAST(l_discount AS DECIMAL(18,2))
                           >= 0.05 THEN 1 ELSE 0 END AS tr,
                         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS y
                       FROM lineitem)
                 GROUP BY 1),
            t AS (SELECT CAST(SUM(n1 + n0) AS BIGINT) AS nn FROM per),
            q AS (SELECT
                    CAST(round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                      * CAST(n1 + n0 AS DOUBLE) / CAST(nn AS DOUBLE)
                      * 1e6) AS BIGINT) AS t_micro
                  FROM per, t)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                round(CAST(SUM(t_micro) AS DOUBLE) / 1e6 / 100, 6)
                  AS ate_dollars
         FROM q""",

    "q_ts_binary_segmentation" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            sp AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
                     CAST(SUM(y) OVER (ORDER BY dt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS p
                   FROM byday),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS ss FROM byday),
            g1 AS (SELECT dt, t, p, n, ss,
                     abs(CAST(n AS HUGEINT) * CAST(p AS HUGEINT)
                       - CAST(t AS HUGEINT) * CAST(ss AS HUGEINT))
                       AS stat
                   FROM sp, tot WHERE t < n),
            cp1 AS (SELECT t AS t1, p AS p1v, dt AS d1, stat AS st1,
                      n, ss
                    FROM g1 ORDER BY stat DESC, dt LIMIT 1),
            g2 AS (SELECT sp.dt, sp.t, sp.p, c.t1, c.d1,
                     CASE WHEN sp.t > c.t1 THEN 1 ELSE 0 END AS seg,
                     CASE WHEN sp.t > c.t1 THEN c.t1 ELSE 0 END AS a,
                     CASE WHEN sp.t > c.t1 THEN c.p1v ELSE 0 END AS pa,
                     CASE WHEN sp.t > c.t1 THEN c.n - c.t1 ELSE c.t1 END
                       AS ln,
                     CASE WHEN sp.t > c.t1 THEN c.ss - c.p1v ELSE c.p1v
                       END AS ts2,
                     c.n
                   FROM sp, cp1 c
                   WHERE sp.t < c.n AND sp.t <> c.t1),
            g2s AS (SELECT dt, seg,
                      abs(CAST(ln AS HUGEINT) * CAST(p - pa AS HUGEINT)
                        - CAST(t - a AS HUGEINT) * CAST(ts2 AS HUGEINT))
                        AS stat
                    FROM g2),
            cp2 AS (SELECT CAST(2 AS BIGINT) AS round,
                      CAST(seg AS BIGINT) AS segment, dt AS cp_day,
                      CAST(stat AS DOUBLE) AS stat
                    FROM (SELECT dt, seg, stat,
                            row_number() OVER (PARTITION BY seg
                              ORDER BY stat DESC, dt) AS rn
                          FROM g2s) q WHERE rn = 1),
            r1 AS (SELECT CAST(1 AS BIGINT) AS round,
                     CAST(0 AS BIGINT) AS segment, d1 AS cp_day,
                     CAST(st1 AS DOUBLE) AS stat
                   FROM cp1)
         SELECT round, segment, cp_day,
                round(stat / 1e12, 6) AS stat_tera
         FROM (SELECT * FROM r1 UNION ALL SELECT * FROM cp2)
         ORDER BY round, segment""",

    "q_ml_mcc" ->
      """WITH m AS (SELECT
                    CAST(SUM(yh * y) AS BIGINT) AS tp,
                    CAST(SUM(yh * (1 - y)) AS BIGINT) AS fp,
                    CAST(SUM((1 - yh) * y) AS BIGINT) AS fn,
                    CAST(SUM((1 - yh) * (1 - y)) AS BIGINT) AS tn
                  FROM (SELECT CASE WHEN CAST(CAST(l_discount
                            AS DECIMAL(18,2)) * 100 AS BIGINT) >= 6
                          THEN 1 ELSE 0 END AS yh,
                          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                            AS y
                        FROM lineitem WHERE l_returnflag IN ('R', 'N')))
         SELECT tp, tn,
                round(CAST(CAST(tp AS HUGEINT) * CAST(tn AS HUGEINT)
                    - CAST(fp AS HUGEINT) * CAST(fn AS HUGEINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(tp + fp AS HUGEINT)
                      * CAST(tp + fn AS HUGEINT) AS DOUBLE))
                    * sqrt(CAST(CAST(tn + fp AS HUGEINT)
                      * CAST(tn + fn AS HUGEINT) AS DOUBLE))), 6) AS mcc,
                round((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                  + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)) / 2, 6)
                  AS balanced_accuracy
         FROM m""",

    "q_ml_gain_curve" ->
      """WITH per AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                    CAST(COUNT(*) AS BIGINT) AS c,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                      END) AS BIGINT) AS c1
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')
                 GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                    CAST(SUM(c1) AS BIGINT) AS p FROM per),
            sp AS (SELECT v,
                     CAST(SUM(c) OVER wd AS BIGINT) AS cum,
                     CAST(SUM(c1) OVER wd AS BIGINT) AS cum1
                   FROM per
                   WINDOW wd AS (ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT v AS score_at_least,
                round(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS frac_rows,
                round(CAST(cum1 AS DOUBLE) / CAST(p AS DOUBLE), 6)
                  AS capture_rate,
                round(CAST(CAST(cum1 AS HUGEINT) * CAST(n AS HUGEINT)
                    AS DOUBLE)
                  / CAST(CAST(cum AS HUGEINT) * CAST(p AS HUGEINT)
                    AS DOUBLE), 6) AS lift
         FROM sp, t ORDER BY score_at_least DESC"""
  )
}
