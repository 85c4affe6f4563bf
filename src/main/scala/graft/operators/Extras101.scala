package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 27: inequality + inventory-planning
  * round-out — the Atkinson (ε=½) and Hoover (Robin Hood) inequality
  * indices over per-customer revenue, the Palma ratio over the daily
  * revenue distribution, and XYZ demand-variability classification of
  * parts by weekly coefficient of variation.
  *
  * Scale note: Atkinson/Hoover are single customer-grain folds (the
  * |xᵢn − S| numerator is exact integer algebra, no sort); Palma
  * ranks the bounded DAY spine, not fact rows; XYZ is a two-level
  * (part, week) → part → class fold, all equi-key shuffles.
  *
  * Determinism contract (SURVEY §2.13): Hoover is all-integer;
  * Atkinson micro-quantizes each √xᵢ before the fold; Palma's
  * decile/quintile membership uses exact integer gates (r·10 > 9n,
  * r·5 ≤ 2n) on a deterministic (value, date) ordering; XYZ class
  * cuts compare the one shared CV chain against literal thresholds.
  */
object Extras101 {
  import Det._

  private val Big = DecimalType(38, 0)

  private def custRev(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ATKINSON INDEX (ε = ½) — A = 1 − ((1/n)Σ√xᵢ)²/μ over
    // per-customer revenue: each √xᵢ micro-quantized before the fold.
    "q_agg_atkinson" -> ((s, d) => {
      val m = custRev(s, d)
        .select(col("x"),
          round(sqrt(col("x").cast("double")) * 1e6).cast("long")
            .as("sq_micro"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("sq_micro")).as("ssq"))
      val nD = col("n").cast("double")
      val ede = col("ssq").cast("double") / 1e6 / nD
      m.select(col("n").as("n_customers"),
        r6(col("sx").cast("double") / nD / 100).as("mean_dollars"),
        r6(lit(1.0) - ede * ede /
          (col("sx").cast("double") / nD)).as("atkinson_half"))
    }),

    // HOOVER / ROBIN HOOD INDEX — H = Σ|xᵢ − μ|/(2Σx) with the
    // all-integer form Σ|xᵢ·n − S| / (2·n·S): the share of total
    // revenue that would have to move to equalize customers.
    "q_agg_hoover" -> ((s, d) => {
      val base = custRev(s, d)
      val tot = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val m = base.crossJoin(broadcast(tot))
        .select(col("n"), col("sx"),
          abs(col("x").cast(Big) * col("n").cast(Big)
            - col("sx").cast(Big)).as("dev"))
        .groupBy(col("n"), col("sx"))
        .agg(sum(col("dev")).as("sdev"))
      m.select(col("n").as("n_customers"),
        r6(col("sdev").cast("double") /
          (col("n").cast(Big) * col("sx").cast(Big) * 2).cast("double"))
          .as("hoover"))
    }),

    // PALMA RATIO — top-10% / bottom-40% revenue share over the
    // bounded day spine, membership by exact integer rank gates on a
    // deterministic (revenue, date) order.
    "q_agg_palma" -> ((s, d) => {
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))
      val w = Window.orderBy(col("x"), col("dt"))
      val ranked = byday.withColumn("r", row_number().over(w))
      val tot = byday.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .agg(first(col("n")).as("n_days"),
          sum(when(col("r") * 10 > col("n") * 9, col("x"))
            .otherwise(lit(0L))).as("top10"),
          sum(when(col("r") * 5 <= col("n") * 2, col("x"))
            .otherwise(lit(0L))).as("bot40"))
        .select(col("n_days"), col("top10"), col("bot40"),
          r6(col("top10").cast("double") / col("bot40").cast("double"))
            .as("palma_ratio"))
    }),

    // XYZ ANALYSIS — parts classified by the coefficient of variation
    // of weekly shipped quantity: X (CV < ½) steady, Y (< 1)
    // variable, Z (≥ 1) erratic; per-class part counts and demand
    // share.
    "q_agg_xyz_analysis" -> ((s, d) => {
      val weekly = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          weekofyear(col("l_shipdate")).as("wk"),
          year(col("l_shipdate")).as("yr"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val per = weekly.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("nw"), sum(col("q")).as("sq"),
          sum(col("q").cast(Big) * col("q").cast(Big)).as("sqq"))
      val nD = col("nw").cast("double")
      val mean = col("sq").cast("double") / nD
      val varp = (col("sqq").cast("double") -
        col("sq").cast("double") * col("sq").cast("double") / nD) / nD
      val cv = sqrt(varp) / mean
      per.select(col("sq"),
          when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z")
            .as("xyz_class"))
        .groupBy(col("xyz_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("sq")).as("demand"))
        .orderBy(col("xyz_class"))
    })
  )

  private val custRevSql =
    """cr AS (SELECT o_custkey,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1)"""

  val oracle: Map[String, String] = Map(

    "q_agg_atkinson" ->
      s"""WITH $custRevSql,
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(CAST(round(sqrt(CAST(x AS DOUBLE)) * 1e6)
                      AS BIGINT)) AS BIGINT) AS ssq
                  FROM cr)
         SELECT n AS n_customers,
                round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6)
                  AS mean_dollars,
                round(1.0 - (CAST(ssq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
                  * (CAST(ssq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
                  / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                  AS atkinson_half
         FROM m""",

    "q_agg_hoover" ->
      s"""WITH $custRevSql,
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx FROM cr),
            m AS (SELECT n, sx,
                    SUM(abs(CAST(x AS HUGEINT) * CAST(n AS HUGEINT)
                      - CAST(sx AS HUGEINT))) AS sdev
                  FROM cr, t GROUP BY 1, 2)
         SELECT n AS n_customers,
                round(CAST(sdev AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * CAST(sx AS HUGEINT) * 2
                    AS DOUBLE), 6) AS hoover
         FROM m""",

    "q_agg_palma" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS x
                 FROM orders GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM byday),
            rk AS (SELECT x, n,
                     CAST(row_number() OVER (ORDER BY x, dt) AS BIGINT)
                       AS r
                   FROM byday, t)
         SELECT CAST(MAX(n) AS BIGINT) AS n_days,
                CAST(SUM(CASE WHEN r * 10 > n * 9 THEN x ELSE 0 END)
                  AS BIGINT) AS top10,
                CAST(SUM(CASE WHEN r * 5 <= n * 2 THEN x ELSE 0 END)
                  AS BIGINT) AS bot40,
                round(CAST(SUM(CASE WHEN r * 10 > n * 9 THEN x ELSE 0 END)
                    AS DOUBLE)
                  / CAST(SUM(CASE WHEN r * 5 <= n * 2 THEN x ELSE 0 END)
                    AS DOUBLE), 6) AS palma_ratio
         FROM rk""",

    "q_agg_xyz_analysis" ->
      """WITH weekly AS (SELECT l_partkey,
                    EXTRACT(week FROM l_shipdate) AS wk,
                    EXTRACT(year FROM l_shipdate) AS yr,
                    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
                 FROM lineitem GROUP BY 1, 2, 3),
            per AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nw,
                    CAST(SUM(q) AS BIGINT) AS sq,
                    SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sqq
                  FROM weekly GROUP BY 1),
            cl AS (SELECT sq,
                    CASE WHEN sqrt((CAST(sqq AS DOUBLE)
                          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                          / CAST(nw AS DOUBLE)) / CAST(nw AS DOUBLE))
                        / (CAST(sq AS DOUBLE) / CAST(nw AS DOUBLE)) < 0.5
                      THEN 'X'
                      WHEN sqrt((CAST(sqq AS DOUBLE)
                          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                          / CAST(nw AS DOUBLE)) / CAST(nw AS DOUBLE))
                        / (CAST(sq AS DOUBLE) / CAST(nw AS DOUBLE)) < 1.0
                      THEN 'Y' ELSE 'Z' END AS xyz_class
                  FROM per)
         SELECT xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
                CAST(SUM(sq) AS BIGINT) AS demand
         FROM cl GROUP BY 1 ORDER BY 1"""
  )
}
