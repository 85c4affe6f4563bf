package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 38: signal/decision round-out — Haar
  * wavelet detail energies of the daily revenue series by level, the
  * best Gini decision stump predicting returns from quantity, the
  * Wilson score interval for the user conversion rate, and the
  * relative risk with its log-scale confidence interval.
  *
  * Scale shape: the Haar fold joins the bounded day spine against an
  * 8-row broadcast level table (8 linear passes over a calendar-
  * bounded relation); the stump scan walks the ≤50-value quantity
  * spine; Wilson/risk-ratio are single exact-count folds.
  *
  * Determinism contract (SURVEY §2.13): Haar details are EXACT
  * integer half-block differences (energy summed in DECIMAL(38,0),
  * EMITTED as the exact dollars² BIGINT e div 10000 — a >2^53
  * integer must never cross to double, playbook rule);
  * the stump argmin orders by the one shared impurity chain with the
  * threshold as tiebreak; Wilson and the risk CI are single IEEE
  * chains over exact integers.
  */
object Extras112 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HAAR DETAIL ENERGY BY LEVEL — block size 2ᵏ, detail
    // dᵦ = Σleft − Σright over full blocks; E_k = Σ dᵦ² (dollars²).
    "q_ts_haar_energy" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", (row_number().over(w) - 1).cast("long"))
      val levels = s.range(1, 9).toDF("k")
        .withColumn("bs", expr("cast(pow(2, k) as bigint)"))
      val blocks = byday.crossJoin(broadcast(levels))
        .withColumn("blk", expr("t div bs"))
        .withColumn("lft", expr("t % bs < bs div 2").cast("long"))
        .groupBy(col("k"), col("bs"), col("blk"))
        .agg(count(lit(1)).as("c"),
          sum(col("y") * (col("lft") * 2 - 1)).as("det"))
        .where(col("c") === col("bs"))
      // Emission rule (round-12 sf0.1 knife-edge): e ≈ 1.3e20 cents²
      // at sf0.1 exceeds 2^53, and DuckDB's HUGEINT→DOUBLE cast is
      // NOT correctly rounded there (two 64-bit-half roundings)
      // while Spark's Decimal→double is — last-ulp divergence. So
      // never cast the exact integer to double: emit the EXACT
      // dollars² integer e div 10000 (≈1.3e16 at sf0.1, BIGINT
      // until ~sf1 daily-revenue magnitudes), no IEEE anywhere.
      blocks.groupBy(col("k"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("det").cast(Big) * col("det").cast(Big)).as("e"))
        .select(col("k").as("level"), col("n_blocks"),
          expr("cast(e div 10000 as bigint)").as("energy_dollars2"))
        .orderBy(col("level"))
    }),

    // GINI DECISION STUMP — best split quantity ≤ v for predicting
    // returns: weighted impurity
    // (n_L·g_L + n_R·g_R)/N, g = 1 − p₁² − p₀²; argmin with the
    // threshold as tiebreak.
    "q_agg_gini_stump" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .groupBy(col("l_quantity").cast("long").as("v"))
        .agg(sum((col("l_returnflag") === "R").cast("long")).as("c1"),
          sum((col("l_returnflag") === "N").cast("long")).as("c0"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = per.agg(sum(col("c1")).as("p1"), sum(col("c0")).as("p0"))
      val sp = per
        .withColumn("l1", sum(col("c1")).over(w))
        .withColumn("l0", sum(col("c0")).over(w))
        .crossJoin(broadcast(tot))
        .where(col("l1") + col("l0") < col("p1") + col("p0"))
      def gini(a: Column, b: Column): Column = {
        val n = (a + b).cast("double")
        lit(1.0) - (a.cast("double") / n) * (a.cast("double") / n) -
          (b.cast("double") / n) * (b.cast("double") / n)
      }
      val nL = (col("l1") + col("l0")).cast("double")
      val nR = (col("p1") - col("l1") + col("p0") - col("l0"))
        .cast("double")
      val bigN = (col("p1") + col("p0")).cast("double")
      val imp = (nL * gini(col("l1"), col("l0")) +
        nR * gini(col("p1") - col("l1"), col("p0") - col("l0"))) / bigN
      val root = gini(col("p1"), col("p0"))
      sp.select(col("v").as("split_at"), r6(imp).as("impurity"),
          r6(root - imp).as("gain"))
        .orderBy(col("impurity"), col("split_at"))
        .limit(1)
    }),

    // WILSON SCORE INTERVAL — 95% CI for the user purchase-conversion
    // rate: (p̂ + z²/2n ± z√(p̂(1−p̂)/n + z²/4n²))/(1 + z²/n).
    "q_agg_wilson_ci" -> ((s, d) => {
      val m = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("c"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("k"))
      val nD = col("n").cast("double")
      val p = col("k").cast("double") / nD
      val z2 = lit(1.96 * 1.96)
      val ctr = (p + z2 / (nD * 2)) / (lit(1.0) + z2 / nD)
      val hw = lit(1.96) * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (nD * nD * 4)) / (lit(1.0) + z2 / nD)
      m.select(col("n").as("n_users"), col("k").as("n_converted"),
        r6(p).as("p_hat"), r6(ctr - hw).as("wilson_lo"),
        r6(ctr + hw).as("wilson_hi"))
    }),

    // RELATIVE RISK — discount exposure vs return outcome:
    // RR = (a/(a+b))/(c/(c+d)); 95% CI on the log scale via
    // ln RR ± 1.96·√(1/a − 1/(a+b) + 1/c − 1/(c+d)).
    "q_agg_risk_ratio" -> ((s, d) => {
      val e = (dec(col("l_discount")) >= 0.05).cast("long")
      val o = (col("l_returnflag") === "R").cast("long")
      val m = Tables.lineitem(s, d)
        .select(e.as("e"), o.as("o"))
        .agg(sum(col("e") * col("o")).as("a"),
          sum(col("e") * (lit(1) - col("o"))).as("b"),
          sum((lit(1) - col("e")) * col("o")).as("c"),
          sum((lit(1) - col("e")) * (lit(1) - col("o"))).as("dd"))
      val rr = (col("a").cast("double") /
        (col("a") + col("b")).cast("double")) /
        (col("c").cast("double") / (col("c") + col("dd")).cast("double"))
      val se = sqrt(lit(1.0) / col("a").cast("double") -
        lit(1.0) / (col("a") + col("b")).cast("double") +
        lit(1.0) / col("c").cast("double") -
        lit(1.0) / (col("c") + col("dd")).cast("double"))
      m.select(col("a").as("exposed_returns"),
        col("c").as("unexposed_returns"), r6(rr).as("risk_ratio"),
        r6(exp(log(rr) - lit(1.96) * se)).as("rr_lo"),
        r6(exp(log(rr) + lit(1.96) * se)).as("rr_hi"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_haar_energy" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                      CAST(row_number() OVER (ORDER BY dt) - 1 AS BIGINT)
                        AS t
                    FROM byday),
            lv AS (SELECT k, CAST(pow(2, k) AS BIGINT) AS bs
                   FROM range(1, 9) r(k)),
            blocks AS (SELECT k, bs, t // bs AS blk,
                    CAST(COUNT(*) AS BIGINT) AS c,
                    CAST(SUM(y * (CASE WHEN t % bs < bs // 2 THEN 1
                      ELSE -1 END)) AS BIGINT) AS det
                  FROM idx, lv GROUP BY 1, 2, 3),
            e AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                    SUM(CAST(det AS HUGEINT) * CAST(det AS HUGEINT)) AS e
                  FROM blocks WHERE c = bs GROUP BY 1)
         SELECT CAST(k AS BIGINT) AS level, n_blocks,
                CAST(e // 10000 AS BIGINT) AS energy_dollars2
         FROM e ORDER BY level""",

    "q_agg_gini_stump" ->
      """WITH per AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                      END) AS BIGINT) AS c1,
                    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0
                      END) AS BIGINT) AS c0
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')
                 GROUP BY 1),
            t AS (SELECT CAST(SUM(c1) AS BIGINT) AS p1,
                    CAST(SUM(c0) AS BIGINT) AS p0 FROM per),
            sp AS (SELECT v,
                     CAST(SUM(c1) OVER wc AS BIGINT) AS l1,
                     CAST(SUM(c0) OVER wc AS BIGINT) AS l0
                   FROM per
                   WINDOW wc AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            f AS (SELECT v, l1, l0, p1, p0
                  FROM sp, t WHERE l1 + l0 < p1 + p0),
            g AS (SELECT v,
                    (CAST(l1 + l0 AS DOUBLE)
                       * (1.0 - (CAST(l1 AS DOUBLE)
                           / CAST(l1 + l0 AS DOUBLE))
                         * (CAST(l1 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                         - (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE))
                         * (CAST(l0 AS DOUBLE) / CAST(l1 + l0 AS DOUBLE)))
                     + CAST(p1 - l1 + p0 - l0 AS DOUBLE)
                       * (1.0 - (CAST(p1 - l1 AS DOUBLE)
                           / CAST(p1 - l1 + p0 - l0 AS DOUBLE))
                         * (CAST(p1 - l1 AS DOUBLE)
                           / CAST(p1 - l1 + p0 - l0 AS DOUBLE))
                         - (CAST(p0 - l0 AS DOUBLE)
                           / CAST(p1 - l1 + p0 - l0 AS DOUBLE))
                         * (CAST(p0 - l0 AS DOUBLE)
                           / CAST(p1 - l1 + p0 - l0 AS DOUBLE))))
                      / CAST(p1 + p0 AS DOUBLE) AS imp,
                    1.0 - (CAST(p1 AS DOUBLE) / CAST(p1 + p0 AS DOUBLE))
                      * (CAST(p1 AS DOUBLE) / CAST(p1 + p0 AS DOUBLE))
                      - (CAST(p0 AS DOUBLE) / CAST(p1 + p0 AS DOUBLE))
                      * (CAST(p0 AS DOUBLE) / CAST(p1 + p0 AS DOUBLE))
                      AS root
                  FROM f)
         SELECT v AS split_at, round(imp, 6) AS impurity,
                round(root - imp, 6) AS gain
         FROM g ORDER BY impurity, split_at LIMIT 1""",

    "q_agg_wilson_ci" ->
      """WITH per AS (SELECT user_id,
                    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS c
                 FROM events GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(c) AS BIGINT) AS k FROM per),
            e AS (SELECT n, k,
                    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                        + (1.96 * 1.96) / (CAST(n AS DOUBLE) * 2))
                      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS ctr,
                    1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                      + (1.96 * 1.96)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4))
                      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS hw
                  FROM m)
         SELECT n AS n_users, k AS n_converted, round(p, 6) AS p_hat,
                round(ctr - hw, 6) AS wilson_lo,
                round(ctr + hw, 6) AS wilson_hi
         FROM e""",

    "q_agg_risk_ratio" ->
      """WITH m AS (SELECT
                    CAST(SUM(e * o) AS BIGINT) AS a,
                    CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
                    CAST(SUM((1 - e) * o) AS BIGINT) AS c,
                    CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS dd
                  FROM (SELECT CASE WHEN CAST(l_discount AS DECIMAL(18,2))
                          >= 0.05 THEN 1 ELSE 0 END AS e,
                          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                            AS o
                        FROM lineitem)),
            ev AS (SELECT a, c,
                    (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                      / (CAST(c AS DOUBLE) / CAST(c + dd AS DOUBLE)) AS rr,
                    sqrt(1.0 / CAST(a AS DOUBLE)
                      - 1.0 / CAST(a + b AS DOUBLE)
                      + 1.0 / CAST(c AS DOUBLE)
                      - 1.0 / CAST(c + dd AS DOUBLE)) AS se
                  FROM m)
         SELECT a AS exposed_returns, c AS unexposed_returns,
                round(rr, 6) AS risk_ratio,
                round(exp(ln(rr) - 1.96 * se), 6) AS rr_lo,
                round(exp(ln(rr) + 1.96 * se), 6) AS rr_hi
         FROM ev"""
  )
}
