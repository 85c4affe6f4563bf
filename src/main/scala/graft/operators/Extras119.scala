package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 45: classical-test round-out — the Quade
  * test (range-weighted Friedman: block ranks weight within-block
  * treatment ranks), the Siegel-Tukey dispersion test (alternating
  * extreme ranks feed a Wilcoxon tail), Tukey-HSD pairwise q
  * statistics (the post-hoc the ANOVA family lacked — statistics
  * emitted exactly; studentized-range p-values need special-function
  * tables and stay out, the stated q_agg_anova convention), and
  * process capability (Cp/Cpk and Taguchi Cpm of line quantities
  * against the 1..50 spec window).
  *
  * Scale shape: quade folds the calendar-bounded month×priority block
  * relation; tukey_hsd joins the 5-row group-moment relation with
  * itself (broadcast, 10 pairs); capability is one exact-moment fold;
  * siegel_tukey is one ordered pass over the two-priority order
  * slice — the exact-median family shape (q_agg_median,
  * q_ts_runs_test): a single global sort is the price of EXACT rank
  * statistics; the approx path at 100 TB is the existing sketch
  * family.
  *
  * Determinism contract (SURVEY §2.13): quade folds doubled midranks
  * (2R = 2·rank + t − 1) for BOTH the within-block treatment ranks and
  * the cross-block range ranks, so S×4 = q2·(dr − 6) stays exact
  * BIGINT; F = (n−1)·ΣSj² / (n·A − ΣSj²) is one IEEE division of
  * exact integers (the uniform ×16 scale cancels). siegel_tukey pins
  * ties by (value, orderkey) — stated convention, not a claimed
  * midrank correction (the friedman lesson); ranks are pure integer
  * arithmetic on the position. tukey_hsd's MSW folds per-group exact
  * SSD numerators (nj·ssj − sj², DECIMAL(38,0)) unit-quantized into a
  * decimal sum — never a cross-row double sum; capability is exact
  * moments plus one IEEE chain.
  */
object Extras119 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // QUADE TEST — Friedman weighted by block information: blocks
    // (months) with a larger revenue RANGE count more. All ranks
    // doubled-midrank exact; the statistic is a ratio of exact
    // integer sums.
    "q_agg_quade" -> ((s, d) => {
      val bm = Tables.orders(s, d)
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("ym"),
          substring(col("o_orderpriority"), 1, 1).as("prio"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("v"))
      val complete = bm.groupBy(col("ym")).agg(count(lit(1)).as("kk"))
        .where(col("kk") === 5).select(col("ym"))
      val blocks = bm.join(complete, "ym")
      val range = blocks.groupBy(col("ym"))
        .agg((max(col("v")) - min(col("v"))).as("rng"))
        .withColumn("qrnk", rank().over(Window.orderBy(col("rng"))))
        .withColumn("qt", count(lit(1)).over(
          Window.partitionBy(col("rng"))))
        .withColumn("q2", lit(2) * col("qrnk") + col("qt") - 1)
        .select(col("ym"), col("q2"))
      val ranked = blocks
        .withColumn("rnk", rank().over(
          Window.partitionBy(col("ym")).orderBy(col("v"))))
        .withColumn("t", count(lit(1)).over(
          Window.partitionBy(col("ym"), col("v"))))
        .withColumn("dr", lit(2) * col("rnk") + col("t") - 1)
        .join(range, "ym")
        .withColumn("s4", col("q2").cast("long") * (col("dr") - 6))
      val perTreat = ranked.groupBy(col("prio"))
        .agg(sum(col("s4")).as("sj4"), count(lit(1)).as("nb"))
      val a16 = ranked.agg(
        sum(col("s4") * col("s4")).as("a16"))
      perTreat.agg(max(col("nb")).as("n_blocks"),
          sum(col("sj4") * col("sj4")).as("b16n"))
        .crossJoin(broadcast(a16))
        .select(lit(5L).as("k"), col("n_blocks"),
          col("a16"), col("b16n"),
          r6((col("n_blocks") - 1).cast("double")
            * col("b16n").cast("double")
            / (col("n_blocks").cast("double") * col("a16").cast("double")
              - col("b16n").cast("double"))).as("f_quade"))
    }),

    // SIEGEL-TUKEY — dispersion difference between URGENT(1) and
    // LOW(5) order totals: alternating extreme ranks (low end 1,
    // high end 2,3, low 4,5, ...) are pure integer arithmetic on the
    // sorted position; W feeds the Wilcoxon rank-sum z tail.
    "q_agg_siegel_tukey" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .where(substring(col("o_orderpriority"), 1, 1).isin("1", "5"))
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"),
          col("o_orderkey"))
      val pos = base
        .withColumn("i", row_number().over(
          Window.orderBy(col("y"), col("o_orderkey"))).cast("long"))
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nn"))))
      val j = col("nn") + 1 - col("i")
      val st = when(col("i") <= expr("(nn + 1) div 2"),
        when(col("i") % 2 === 1, col("i") * 2 - 1).otherwise(col("i") * 2))
        .otherwise(
          when(j % 2 === 1, j * 2).otherwise(j * 2 - 1))
      val agg = pos.withColumn("st", st)
        .agg(sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === "5", 1L).otherwise(0L)).as("n2"),
          sum(when(col("g") === "1", col("st")).otherwise(0L)).as("w1"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val n = (col("n1") + col("n2")).cast("double")
      agg.select(col("n1"), col("n2"), col("w1"),
        r6((col("w1").cast("double") - n1 * (n + 1) / lit(2.0))
          / sqrt(n1 * n2 * (n + 1) / lit(12.0))).as("z"))
    }),

    // TUKEY HSD — post-hoc pairwise studentized-range q statistics
    // between the five priority mean order totals over the pooled
    // within-group variance: 10 pair rows from the broadcast 5-row
    // group-moment relation.
    "q_agg_tukey_hsd" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"), sum(col("y")).as("sj"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("ssj"))
      val msw = per
        .withColumn("ssd_unit",
          round((col("nj").cast(Big) * col("ssj")
            - col("sj").cast(Big) * col("sj").cast(Big)).cast("double")
            / col("nj").cast("double")).cast(Big))
        .agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
          sum(col("ssd_unit")).as("ssw"))
        .select(col("k"), col("n"),
          (col("ssw").cast("double") /
            (col("n") - col("k")).cast("double")).as("msw"))
      val a = per.select(col("g").as("g1"), col("nj").as("n1"),
        col("sj").as("s1"))
      val b = per.select(col("g").as("g2"), col("nj").as("n2"),
        col("sj").as("s2"))
      val m1 = col("s1").cast("double") / col("n1").cast("double")
      val m2 = col("s2").cast("double") / col("n2").cast("double")
      a.join(broadcast(b), col("g1") < col("g2"))
        .crossJoin(broadcast(msw))
        .select(col("g1"), col("g2"),
          r6(abs(m1 - m2) / lit(100.0)).as("mean_diff_dollars"),
          r6(abs(m1 - m2) /
            sqrt(col("msw") / lit(2.0) *
              (lit(1.0) / col("n1").cast("double")
                + lit(1.0) / col("n2").cast("double")))).as("q_stat"))
        .orderBy(col("g1"), col("g2"))
    }),

    // PROCESS CAPABILITY — Cp / Cpk / Taguchi Cpm of line quantities
    // against the [1, 50] spec window: one exact-moment fold, one
    // IEEE chain.
    "q_agg_capability" -> ((s, d) => {
      val agg = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
      val nD = col("n").cast("double")
      val mu = col("sy").cast("double") / nD
      val s2 = (nD * col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double")) /
        (nD * (nD - 1))
      val sd = sqrt(s2)
      val usl = lit(50.0)
      val lsl = lit(1.0)
      val target = (usl + lsl) / lit(2.0)
      agg.select(col("n"), r6(mu).as("mean_qty"), r6(sd).as("sd_qty"),
        r6((usl - lsl) / (lit(6.0) * sd)).as("cp"),
        r6(least(usl - mu, mu - lsl) / (lit(3.0) * sd)).as("cpk"),
        r6((usl - lsl) /
          (lit(6.0) * sqrt(s2 + (mu - target) * (mu - target))))
          .as("cpm"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_quade" ->
      """WITH bm AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE))
                      AS ym,
                    substr(o_orderpriority, 1, 1) AS prio,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS v
                 FROM orders GROUP BY 1, 2),
            cmp AS (SELECT ym FROM bm GROUP BY ym HAVING COUNT(*) = 5),
            blocks AS (SELECT bm.* FROM bm JOIN cmp ON bm.ym = cmp.ym),
            rg AS (SELECT ym, MAX(v) - MIN(v) AS rng FROM blocks
                   GROUP BY 1),
            qr AS (SELECT ym,
                     2 * rank() OVER (ORDER BY rng)
                       + COUNT(*) OVER (PARTITION BY rng) - 1 AS q2
                   FROM rg),
            ranked AS (SELECT b.prio,
                    CAST(q2 AS BIGINT)
                      * (2 * rank() OVER (PARTITION BY b.ym ORDER BY b.v)
                         + COUNT(*) OVER (PARTITION BY b.ym, b.v) - 1 - 6)
                      AS s4
                  FROM blocks b JOIN qr ON b.ym = qr.ym),
            pt AS (SELECT prio, CAST(SUM(s4) AS BIGINT) AS sj4,
                     CAST(COUNT(*) AS BIGINT) AS nb
                   FROM ranked GROUP BY 1),
            aa AS (SELECT CAST(SUM(s4 * s4) AS BIGINT) AS a16 FROM ranked),
            bb AS (SELECT MAX(nb) AS n_blocks,
                     CAST(SUM(sj4 * sj4) AS BIGINT) AS b16n
                   FROM pt)
         SELECT CAST(5 AS BIGINT) AS k, n_blocks, a16, b16n,
                round(CAST(n_blocks - 1 AS DOUBLE) * CAST(b16n AS DOUBLE)
                  / (CAST(n_blocks AS DOUBLE) * CAST(a16 AS DOUBLE)
                    - CAST(b16n AS DOUBLE)), 6) AS f_quade
         FROM bb, aa""",

    "q_agg_siegel_tukey" ->
      """WITH base AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y,
                    o_orderkey
                 FROM orders
                 WHERE substr(o_orderpriority, 1, 1) IN ('1', '5')),
            pos AS (SELECT g,
                      CAST(row_number() OVER (ORDER BY y, o_orderkey)
                        AS BIGINT) AS i,
                      CAST(COUNT(*) OVER () AS BIGINT) AS nn
                    FROM base),
            st AS (SELECT g,
                     CASE WHEN i <= (nn + 1) // 2 THEN
                            CASE WHEN i % 2 = 1 THEN i * 2 - 1
                                 ELSE i * 2 END
                          ELSE
                            CASE WHEN (nn + 1 - i) % 2 = 1
                                 THEN (nn + 1 - i) * 2
                                 ELSE (nn + 1 - i) * 2 - 1 END
                     END AS r
                   FROM pos),
            agg AS (SELECT
                      CAST(SUM(CASE WHEN g = '1' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                      CAST(SUM(CASE WHEN g = '5' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2,
                      CAST(SUM(CASE WHEN g = '1' THEN r ELSE 0 END)
                        AS BIGINT) AS w1
                    FROM st)
         SELECT n1, n2, w1,
                round((CAST(w1 AS DOUBLE)
                    - CAST(n1 AS DOUBLE)
                      * (CAST(n1 + n2 AS DOUBLE) + 1) / 2.0)
                  / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       * (CAST(n1 + n2 AS DOUBLE) + 1) / 12.0), 6) AS z
         FROM agg""",

    "q_agg_tukey_hsd" ->
      """WITH per AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                    CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sj,
                    CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)
                         * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)) AS HUGEINT) AS ssj
                 FROM orders GROUP BY 1),
            msw AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                      CAST(SUM(nj) AS BIGINT) AS n,
                      SUM(CAST(round(CAST(CAST(nj AS HUGEINT) * ssj
                            - CAST(sj AS HUGEINT) * CAST(sj AS HUGEINT)
                          AS DOUBLE) / CAST(nj AS DOUBLE))
                        AS HUGEINT)) AS ssw
                    FROM per),
            m AS (SELECT k, n,
                    CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE) AS msw
                  FROM msw),
            pair AS (SELECT a.g AS g1, b.g AS g2,
                       CAST(a.sj AS DOUBLE) / CAST(a.nj AS DOUBLE) AS m1,
                       CAST(b.sj AS DOUBLE) / CAST(b.nj AS DOUBLE) AS m2,
                       CAST(a.nj AS DOUBLE) AS d1,
                       CAST(b.nj AS DOUBLE) AS d2
                     FROM per a JOIN per b ON a.g < b.g)
         SELECT g1, g2,
                round(abs(m1 - m2) / 100.0, 6) AS mean_diff_dollars,
                round(abs(m1 - m2)
                  / sqrt(m.msw / 2.0 * (1.0 / d1 + 1.0 / d2)), 6)
                  AS q_stat
         FROM pair, m ORDER BY g1, g2""",

    "q_agg_capability" ->
      """WITH agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
                    CAST(SUM(CAST(l_quantity AS BIGINT)
                         * CAST(l_quantity AS BIGINT)) AS BIGINT) AS syy
                 FROM lineitem),
            f AS (SELECT n,
                    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                      AS s2
                  FROM agg)
         SELECT n, round(mu, 6) AS mean_qty,
                round(sqrt(s2), 6) AS sd_qty,
                round(49.0 / (6.0 * sqrt(s2)), 6) AS cp,
                round(least(50.0 - mu, mu - 1.0) / (3.0 * sqrt(s2)), 6)
                  AS cpk,
                round(49.0 / (6.0 * sqrt(s2 + (mu - 25.5) * (mu - 25.5))),
                  6) AS cpm
         FROM f"""
  )
}
