package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 50: parametric moment fits (gamma and
  * log-normal on order totals — the continuous siblings of
  * q_agg_negbin_fit's count fit), lag-1 average mutual information of
  * the daily revenue series (the nonlinear dependence screen beside
  * the linear q_ts_acf), and the lang×source independence χ² over
  * documents (is the corpus language mix uniform across sources?).
  *
  * Scale shape: both fits are single exact-moment folds; AMI bins by
  * RANK position (4·(r−1) div n — no threshold values needed) on the
  * calendar-bounded daily relation, then folds the 16-cell transition
  * grid; lang_source_chi2 is one corpus pass into the langs×sources
  * grid (completed with zero cells).
  *
  * Determinism contract (SURVEY §2.13): fits are exact moments + one
  * IEEE chain (log-normal's per-row ln is micro-quantized to integer
  * units before the sum — the q_agg_geomean discipline). AMI cell
  * terms c·log2(c·N/(r·s)) are micro-quantized from exact integers.
  * χ² per-cell terms are nano-quantized; Cramér's V is the one IEEE
  * tail.
  */
object Extras124 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GAMMA METHOD-OF-MOMENTS — shape k = m²/v, scale θ = v/m of
    // order totals (dollars).
    "q_agg_gamma_mom" -> ((s, d) => {
      val a = Tables.orders(s, d)
        .select((dec(col("o_totalprice")) * 100).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val nD = col("n").cast("double")
      val m = col("sy").cast("double") / nD / lit(100.0)
      val v = (nD * col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double")) /
        (nD * (nD - 1)) / lit(10000.0)
      a.select(col("n"), r6(m).as("mean_dollars"),
        r6(v).as("var_dollars2"),
        r6(m * m / v).as("gamma_shape"),
        r6(v / m).as("gamma_scale"))
    }),

    // LOG-NORMAL FIT — μ, σ² of ln(order total in cents): per-row ln
    // micro-quantized, exact integer sums, one IEEE tail; emits the
    // implied median and mean.
    "q_agg_lognormal_fit" -> ((s, d) => {
      val a = Tables.orders(s, d)
        .select(round(log((dec(col("o_totalprice")) * 100).cast("long")
          .cast("double")) * lit(1e6)).cast("long").as("l_micro"))
        .agg(count(lit(1)).as("n"), sum(col("l_micro")).as("sl"),
          sum(col("l_micro").cast(Big) * col("l_micro").cast(Big))
            .as("sll"))
      val nD = col("n").cast("double")
      val mu = col("sl").cast("double") / lit(1e6) / nD
      val s2 = (nD * col("sll").cast("double")
        - col("sl").cast("double") * col("sl").cast("double")) /
        (nD * (nD - 1)) / lit(1e12)
      a.select(col("n"), r6(mu).as("mu_ln_cents"),
        r6(s2).as("sigma2_ln"),
        r6(exp(mu) / lit(100.0)).as("median_dollars"),
        r6(exp(mu + s2 / lit(2.0)) / lit(100.0)).as("mean_dollars"))
    }),

    // LAG-1 AVERAGE MUTUAL INFORMATION — quartile-bin the daily
    // revenue by rank position, then MI of (bin_t, bin_{t+1}):
    // catches nonlinear day-to-day dependence the ACF can't see.
    "q_ts_ami_lag1" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val n1 = daily.agg(count(lit(1)).as("nn"))
      val binned = daily
        .withColumn("r", row_number().over(
          Window.orderBy(col("y"), col("dt"))).cast("long"))
        .crossJoin(broadcast(n1))
        .withColumn("bin", expr("(4 * (r - 1)) div nn"))
      val ord = Window.orderBy(col("dt"))
      val pairs = binned
        .withColumn("b1", lag(col("bin"), 1).over(ord))
        .where(col("b1").isNotNull)
        .groupBy(col("b1"), col("bin")).agg(count(lit(1)).as("c"))
      val sp = pairs
        .withColumn("rm", sum(col("c")).over(
          Window.partitionBy(col("b1"))))
        .withColumn("cm", sum(col("c")).over(
          Window.partitionBy(col("bin"))))
        .withColumn("np", sum(col("c")).over(
          Window.partitionBy(lit(1))))
      sp.withColumn("t_micro",
          round(col("c").cast("double")
            * log2(col("c").cast("double") * col("np").cast("double")
              / (col("rm").cast("double") * col("cm").cast("double")))
            * lit(1e6)).cast("long"))
        .agg(max(col("np")).as("n_pairs"),
          count(lit(1)).as("n_cells"),
          sum(col("t_micro")).as("sum_micro"))
        .select(col("n_pairs"), col("n_cells"),
          r6(col("sum_micro").cast("double") / lit(1e6)
            / col("n_pairs").cast("double")).as("ami_bits"))
    }),

    // LANG × SOURCE χ² — independence of document language and
    // source: the corpus-mix audit behind mixture reweighting.
    "q_llm_lang_source_chi2" -> ((s, d) => {
      val cell = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val grid = cell.select(col("lang")).distinct()
        .crossJoin(broadcast(cell.select(col("source")).distinct()))
        .join(cell, Seq("lang", "source"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .withColumn("rm", sum(col("o")).over(
          Window.partitionBy(col("lang"))))
        .withColumn("cm", sum(col("o")).over(
          Window.partitionBy(col("source"))))
        .withColumn("nn", sum(col("o")).over(
          Window.partitionBy(lit(1))))
      val e = col("rm").cast("double") * col("cm").cast("double") /
        col("nn").cast("double")
      val term = (col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e
      grid
        .withColumn("term_nano", round(term * lit(1e9)).cast("long"))
        .agg(countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          max(col("nn")).as("n_docs"),
          sum(col("term_nano")).as("sum_nano"))
        .select(col("n_langs"), col("n_sources"), col("n_docs"),
          r6(col("sum_nano").cast("double") / lit(1e9)).as("chi2"),
          r6(sqrt(col("sum_nano").cast("double") / lit(1e9)
            / (col("n_docs").cast("double")
              * least(col("n_langs") - 1, col("n_sources") - 1)
                .cast("double")))).as("cramers_v"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_gamma_mom" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sy,
                    CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)
                         * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)) AS HUGEINT) AS syy
                 FROM orders),
            f AS (SELECT n,
                    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS m,
                    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      / 10000.0 AS v
                  FROM a)
         SELECT n, round(m, 6) AS mean_dollars,
                round(v, 6) AS var_dollars2,
                round(m * m / v, 6) AS gamma_shape,
                round(v / m, 6) AS gamma_scale
         FROM f""",

    "q_agg_lognormal_fit" ->
      """WITH x AS (SELECT CAST(round(ln(CAST(CAST(CAST(o_totalprice
                      AS DECIMAL(18,2)) * 100 AS BIGINT) AS DOUBLE))
                      * 1e6) AS BIGINT) AS l_micro
                 FROM orders),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(l_micro) AS BIGINT) AS sl,
                    CAST(SUM(CAST(l_micro AS HUGEINT)
                      * CAST(l_micro AS HUGEINT)) AS HUGEINT) AS sll
                  FROM x),
            f AS (SELECT n,
                    CAST(sl AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS mu,
                    (CAST(n AS DOUBLE) * CAST(sll AS DOUBLE)
                      - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      / 1e12 AS s2
                  FROM a)
         SELECT n, round(mu, 6) AS mu_ln_cents,
                round(s2, 6) AS sigma2_ln,
                round(exp(mu) / 100.0, 6) AS median_dollars,
                round(exp(mu + s2 / 2.0) / 100.0, 6) AS mean_dollars
         FROM f""",

    "q_ts_ami_lag1" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM daily),
            binned AS (SELECT dt,
                    (4 * (CAST(row_number() OVER (ORDER BY y, dt)
                      AS BIGINT) - 1)) // nn AS bin
                  FROM daily, t),
            pairs AS (SELECT lag(bin) OVER (ORDER BY dt) AS b1, bin,
                        dt
                      FROM binned),
            cc AS (SELECT b1, bin, CAST(COUNT(*) AS BIGINT) AS c
                   FROM pairs WHERE b1 IS NOT NULL GROUP BY 1, 2),
            m AS (SELECT b1, bin, c,
                    CAST(SUM(c) OVER (PARTITION BY b1) AS BIGINT) AS rm,
                    CAST(SUM(c) OVER (PARTITION BY bin) AS BIGINT)
                      AS cm,
                    CAST(SUM(c) OVER () AS BIGINT) AS np
                  FROM cc),
            q AS (SELECT np,
                    CAST(round(CAST(c AS DOUBLE)
                      * log2(CAST(c AS DOUBLE) * CAST(np AS DOUBLE)
                        / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)))
                      * 1e6) AS BIGINT) AS t_micro
                  FROM m)
         SELECT MAX(np) AS n_pairs, CAST(COUNT(*) AS BIGINT) AS n_cells,
                round(CAST(SUM(t_micro) AS DOUBLE) / 1e6
                  / CAST(MAX(np) AS DOUBLE), 6) AS ami_bits
         FROM q""",

    "q_llm_lang_source_chi2" ->
      """WITH cell AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
                 FROM documents GROUP BY 1, 2),
            grid AS (SELECT l.lang, s.source, COALESCE(c.o, 0) AS o
                     FROM (SELECT DISTINCT lang FROM cell) l
                     CROSS JOIN (SELECT DISTINCT source FROM cell) s
                     LEFT JOIN cell c
                       ON c.lang = l.lang AND c.source = s.source),
            m AS (SELECT lang, source, o,
                    CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT)
                      AS rm,
                    CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT)
                      AS cm,
                    CAST(SUM(o) OVER () AS BIGINT) AS nn
                  FROM grid),
            q AS (SELECT lang, source, nn,
                    CAST(round((CAST(o AS DOUBLE)
                        - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE))
                      * (CAST(o AS DOUBLE)
                        - CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE))
                      / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)
                          / CAST(nn AS DOUBLE)) * 1e9) AS BIGINT)
                      AS term_nano
                  FROM m)
         SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                MAX(nn) AS n_docs,
                round(CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6) AS chi2,
                round(sqrt(CAST(SUM(term_nano) AS DOUBLE) / 1e9
                  / (CAST(MAX(nn) AS DOUBLE)
                    * CAST(least(COUNT(DISTINCT lang) - 1,
                        COUNT(DISTINCT source) - 1) AS DOUBLE))), 6)
                  AS cramers_v
         FROM q"""
  )
}
