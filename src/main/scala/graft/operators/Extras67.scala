package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 5: Granger-causality F-test, the Wilcoxon
  * signed-rank test (completing the rank-test family beside
  * Mann-Whitney/KS/runs), and the Theil within/between decomposition
  * (round-9 advice item: the decomposable-inequality extension of
  * q_agg_theil).
  *
  * Determinism contract (SURVEY §2.13): regressions fold exact
  * DECIMAL(38,0) cross-products and solve closed-form normal equations
  * in ONE shared IEEE tree; signed-rank statistics are exact integers
  * off the value grid (doubled ranks for half-integer ties); Theil
  * terms micro-quantize before every sum.
  */
object Extras67 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GRANGER CAUSALITY (1 lag) — does yesterday's ORDER COUNT improve
    // the prediction of today's REVENUE beyond yesterday's revenue?
    // Restricted OLS y_t ~ y_{t-1} vs unrestricted y_t ~ y_{t-1} +
    // x_{t-1}, both solved closed-form from exact DECIMAL(38,0) sums
    // over the calendar spine; F = ΔSSR/(SSR_u/(n−3)) is the single
    // IEEE expression tree.
    "q_ts_granger" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val big = DecimalType(38, 0)
      val sp = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(count(lit(1)).as("x"),
          sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("x1", lag(col("x"), 1).over(w))
        .where(col("y1").isNotNull)
      val yd = col("y").cast(big)
      val y1d = col("y1").cast(big)
      val x1d = col("x1").cast(big)
      val a = sp.agg(count(lit(1)).as("n"),
        sum(yd).cast("double").as("sy"),
        sum(y1d).cast("double").as("s1"),
        sum(x1d).cast("double").as("s2"),
        sum(yd * yd).cast("double").as("syy"),
        sum(y1d * y1d).cast("double").as("s11"),
        sum(x1d * x1d).cast("double").as("s22"),
        sum(yd * y1d).cast("double").as("s1y"),
        sum(yd * x1d).cast("double").as("s2y"),
        sum(y1d * x1d).cast("double").as("s12"))
      val nD = col("n").cast("double")
      val cyy = col("syy") - col("sy") * col("sy") / nD
      val c11 = col("s11") - col("s1") * col("s1") / nD
      val c22 = col("s22") - col("s2") * col("s2") / nD
      val c12 = col("s12") - col("s1") * col("s2") / nD
      val c1y = col("s1y") - col("sy") * col("s1") / nD
      val c2y = col("s2y") - col("sy") * col("s2") / nD
      val ssrR = cyy - (c1y / c11) * c1y
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val ssrU = cyy - b1 * c1y - b2 * c2y
      a.select(col("n").as("n_days"),
        r6(b1).as("b_y_lag"), r6(b2).as("b_x_lag"),
        r6((ssrR - ssrU) / (ssrU / (nD - lit(3.0)))).as("f_granger"))
    }),

    // WILCOXON SIGNED-RANK — is this week's daily revenue shifted vs
    // the SAME WEEKDAY last week? Paired differences d_t = y_t −
    // y_{t−7} (zeros dropped, the standard discard rule), average tied
    // ranks kept as EXACT doubled integers off the |d| value grid
    // (2·rank = 2·C_prev + t + 1 — the q_agg_mannwhitney discipline),
    // tie-corrected normal z as the one IEEE tail.
    "q_agg_wilcoxon" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val diffs = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("d", col("y") - lag(col("y"), 7).over(w))
        .where(col("d").isNotNull && col("d") =!= 0)
      val grid = diffs
        .groupBy(abs(col("d")).as("v"))
        .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("cp"),
          sum(when(col("d") < 0, 1L).otherwise(0L)).as("cn"))
      val cum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = col("cp") + col("cn")
      val a = grid
        .withColumn("cumt", sum(col("cp") + col("cn")).over(cum))
        .agg(sum(t).as("n"),
          sum(col("cp") * (lit(2) * (col("cumt") - t) + t + 1))
            .as("two_wplus"),
          sum(t * t * t - t).as("ties"))
      val nD = col("n").cast("double")
      val mu = nD * (nD + lit(1.0)) / lit(4.0)
      val vr = nD * (nD + lit(1.0)) * (lit(2.0) * nD + lit(1.0)) /
        lit(24.0) - col("ties").cast("double") / lit(48.0)
      a.select(col("n").as("n_pairs"), col("two_wplus"), col("ties"),
        r6((col("two_wplus").cast("double") / lit(2.0) - mu) / sqrt(vr))
          .as("z_w"))
    }),

    // THEIL DECOMPOSITION — T_total = T_within + T_between over the
    // five priority classes (the property that makes Theil the
    // auditable inequality index — Gini does not decompose). One fact
    // pass computes BOTH per-row term families (within-group ratio and
    // global ratio), each micro-quantized before its sum; the 5-row
    // group relation folds shares and the between term in exact
    // integers; the quantization residual T_total−T_w−T_b is EMITTED
    // so the approximation error is graded, not argued.
    "q_agg_theil_decomp" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val g = o.groupBy(col("prio"))
        .agg(count(lit(1)).as("ng"), sum(col("cents")).as("sxg"))
      val tot = o.agg(count(lit(1)).as("nt"), sum(col("cents")).as("st"))
      val ratioG = (col("cents") * col("ng")).cast("double") /
        col("sxg").cast("double")
      val ratioT = (col("cents") * col("nt")).cast("double") /
        col("st").cast("double")
      val byG = o.join(broadcast(g), "prio").crossJoin(broadcast(tot))
        .withColumn("tg_micro",
          round(ratioG * log(ratioG) * 1e6).cast("long"))
        .withColumn("tt_micro",
          round(ratioT * log(ratioT) * 1e6).cast("long"))
        .groupBy(col("prio"))
        .agg(max(col("ng")).as("ng"), max(col("sxg")).as("sxg"),
          max(col("nt")).as("nt"), max(col("st")).as("st"),
          sum(col("tg_micro")).as("sg_micro"),
          sum(col("tt_micro")).as("st_micro"))
      val wg = col("sxg").cast("double") / col("st").cast("double")
      val pg = col("ng").cast("double") / col("nt").cast("double")
      val tgVal = col("sg_micro").cast("double") / 1e6 /
        col("ng").cast("double")
      val folded = byG
        .withColumn("within_micro", round(wg * tgVal * lit(1e6)).cast("long"))
        .withColumn("between_micro",
          round(wg * log(wg / pg) * lit(1e6)).cast("long"))
        .agg(max(col("nt")).as("nt"),
          sum(col("st_micro")).as("total_micro"),
          sum(col("within_micro")).as("w_micro"),
          sum(col("between_micro")).as("b_micro"))
      val tTot = col("total_micro").cast("double") / lit(1e6) /
        col("nt").cast("double")
      val tW = col("w_micro").cast("double") / lit(1e6)
      val tB = col("b_micro").cast("double") / lit(1e6)
      folded.select(
        r6(tTot).as("t_total"), r6(tW).as("t_within"), r6(tB).as("t_between"),
        r6(tTot - tW - tB).as("resid"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_granger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(COUNT(*) AS BIGINT) AS x,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            sp AS (SELECT y,
                     lag(y, 1) OVER (ORDER BY dt) AS y1,
                     lag(x, 1) OVER (ORDER BY dt) AS x1
                   FROM daily),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                    CAST(SUM(CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
                    CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                      * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
                    CAST(SUM(CAST(y1 AS DECIMAL(38,0))
                      * CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
                    CAST(SUM(CAST(x1 AS DECIMAL(38,0))
                      * CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s22,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                      * CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s1y,
                    CAST(SUM(CAST(y AS DECIMAL(38,0))
                      * CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s2y,
                    CAST(SUM(CAST(y1 AS DECIMAL(38,0))
                      * CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s12
                  FROM sp WHERE y1 IS NOT NULL),
            c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                    syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
                    s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
                    s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
                    s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
                    s1y - sy * s1 / CAST(n AS DOUBLE) AS c1y,
                    s2y - sy * s2 / CAST(n AS DOUBLE) AS c2y
                  FROM a),
            f AS (SELECT n, nd, cyy, c1y, c2y,
                    cyy - (c1y / c11) * c1y AS ssr_r,
                    (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)
                      AS b1,
                    (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)
                      AS b2
                  FROM c)
         SELECT n AS n_days, round(b1, 6) AS b_y_lag,
                round(b2, 6) AS b_x_lag,
                round((ssr_r - (cyy - b1 * c1y - b2 * c2y))
                  / ((cyy - b1 * c1y - b2 * c2y) / (nd - 3.0)), 6)
                  AS f_granger
         FROM f""",

    "q_agg_wilcoxon" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            df AS (SELECT y - lag(y, 7) OVER (ORDER BY dt) AS d
                   FROM daily),
            grid AS (SELECT abs(d) AS v,
                     CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS cp,
                     CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS cn
                   FROM df WHERE d IS NOT NULL AND d <> 0
                   GROUP BY abs(d)),
            c AS (SELECT cp, cn, cp + cn AS t,
                    SUM(cp + cn) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cumt
                  FROM grid),
            a AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                    CAST(SUM(cp * (2 * (cumt - t) + t + 1)) AS BIGINT)
                      AS two_wplus,
                    CAST(SUM(t * t * t - t) AS BIGINT) AS ties
                  FROM c)
         SELECT n AS n_pairs, two_wplus, ties,
                round((CAST(two_wplus AS DOUBLE) / 2.0
                  - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
                  / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                    * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                    - CAST(ties AS DOUBLE) / 48.0), 6) AS z_w
         FROM a""",

    "q_agg_theil_decomp" ->
      """WITH o AS (SELECT o_orderpriority AS prio,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM orders),
            g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS ng,
                    CAST(SUM(cents) AS BIGINT) AS sxg
                  FROM o GROUP BY prio),
            tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                     CAST(SUM(cents) AS BIGINT) AS st
                   FROM o),
            terms AS (SELECT o.prio, g.ng, g.sxg, tt.nt, tt.st,
                    CAST(round(
                      (CAST(o.cents * g.ng AS DOUBLE) / CAST(g.sxg AS DOUBLE))
                      * ln(CAST(o.cents * g.ng AS DOUBLE)
                           / CAST(g.sxg AS DOUBLE)) * 1000000)
                      AS BIGINT) AS tg_micro,
                    CAST(round(
                      (CAST(o.cents * tt.nt AS DOUBLE) / CAST(tt.st AS DOUBLE))
                      * ln(CAST(o.cents * tt.nt AS DOUBLE)
                           / CAST(tt.st AS DOUBLE)) * 1000000)
                      AS BIGINT) AS tt_micro
                  FROM o JOIN g ON o.prio = g.prio, tt),
            byg AS (SELECT prio, MAX(ng) AS ng, MAX(sxg) AS sxg,
                    MAX(nt) AS nt, MAX(st) AS st,
                    CAST(SUM(tg_micro) AS BIGINT) AS sg_micro,
                    CAST(SUM(tt_micro) AS BIGINT) AS st_micro
                  FROM terms GROUP BY prio),
            folded AS (SELECT MAX(nt) AS nt,
                    CAST(SUM(st_micro) AS BIGINT) AS total_micro,
                    CAST(SUM(CAST(round(
                      (CAST(sxg AS DOUBLE) / CAST(st AS DOUBLE))
                      * (CAST(sg_micro AS DOUBLE) / 1000000.0
                         / CAST(ng AS DOUBLE)) * 1000000.0)
                      AS BIGINT)) AS BIGINT) AS w_micro,
                    CAST(SUM(CAST(round(
                      (CAST(sxg AS DOUBLE) / CAST(st AS DOUBLE))
                      * ln((CAST(sxg AS DOUBLE) / CAST(st AS DOUBLE))
                           / (CAST(ng AS DOUBLE) / CAST(nt AS DOUBLE)))
                      * 1000000.0) AS BIGINT)) AS BIGINT) AS b_micro
                  FROM byg)
         SELECT round(CAST(total_micro AS DOUBLE) / 1000000.0
                  / CAST(nt AS DOUBLE), 6) AS t_total,
                round(CAST(w_micro AS DOUBLE) / 1000000.0, 6) AS t_within,
                round(CAST(b_micro AS DOUBLE) / 1000000.0, 6) AS t_between,
                round(CAST(total_micro AS DOUBLE) / 1000000.0
                    / CAST(nt AS DOUBLE)
                  - CAST(w_micro AS DOUBLE) / 1000000.0
                  - CAST(b_micro AS DOUBLE) / 1000000.0, 6) AS resid
         FROM folded"""
  )
}
