package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 42: multiple-testing + partition
  * round-out — Benjamini-Yekutieli FDR over per-brand quantity
  * contrasts (the dependence-robust BH sibling, harmonic correction
  * folded as exact integer nano-terms), Hartley's F-max variance
  * homogeneity screen across priorities, and the Jenks 2-class
  * natural break of the daily revenue distribution.
  *
  * Scale shape: BY walks the 25-row brand relation (window ranks on
  * a bounded set); F-max folds 5 exact group moments; Jenks scans the
  * calendar-bounded value spine with exact cumulative moments.
  *
  * Determinism contract (SURVEY §2.13): pseudo-p = exp(−z²/2) (the
  * q_agg_bh_fdr convention — Φ-free, one shared chain); the harmonic
  * correction is Σ(10⁹ div rank)/10⁹ — exact integers; the Jenks
  * argmin orders by the one shared SSE chain with the break value as
  * tiebreak.
  */
object Extras116 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BENJAMINI-YEKUTIELI — per-brand mean-quantity z vs global,
    // pseudo-p ranked ascending; discoveries at
    // p ≤ q·rank/(m·c(m)), q = 0.10, c(m) = Σ 1/i as exact
    // nano-quantized integer terms.
    "q_agg_by_fdr" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_quantity").cast("long").as("qt"))
      val glob = base.agg(count(lit(1)).as("n"), sum(col("qt")).as("s"),
        sum(col("qt").cast(Big) * col("qt").cast(Big)).as("ss"))
      val per = base.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("nj"), sum(col("qt")).as("sj"))
      val z = (col("sj").cast("double") / col("nj").cast("double")
        - col("s").cast("double") / col("n").cast("double")) /
        sqrt((col("n").cast(Big) * col("ss")
          - col("s").cast(Big) * col("s").cast(Big)).cast("double")
          / (col("n").cast("double") * col("n").cast("double"))
          / col("nj").cast("double"))
      val scored = per.crossJoin(broadcast(glob))
        .withColumn("z", z)
        .withColumn("p", exp(col("z") * col("z") / lit(-2.0)))
        .withColumn("m", count(lit(1)).over(Window.partitionBy(lit(1))))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("p"), col("p_brand"))).cast("long"))
        .withColumn("h_nano", expr("1000000000 div rank"))
        .withColumn("hm",
          sum(col("h_nano")).over(Window.partitionBy(lit(1)))
            .cast("double") / 1e9)
        .withColumn("hit",
          col("p") <= lit(0.10) * col("rank").cast("double") /
            col("m").cast("double") / col("hm"))
      scored
        .withColumn("maxr", max(when(col("hit"), col("rank")))
          .over(Window.partitionBy(lit(1))))
        .select(col("p_brand"), col("nj").as("n_rows"),
          r6(col("z")).as("z_stat"), r6(col("p")).as("pseudo_p"),
          col("rank").as("p_rank"),
          (col("rank") <= coalesce(col("maxr"), lit(0L)))
            .cast("int").as("by_discovery"))
        .orderBy(col("p_rank"))
    }),

    // HARTLEY'S F-MAX — max/min of the five per-priority sample
    // variances of order totals (cents²): the quick variance
    // homogeneity screen.
    "q_agg_hartley_fmax" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).cast("long")
          .as("g"), (dec(col("o_totalprice")) * 100).cast("long").as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"), sum(col("y")).as("sj"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("ssj"))
      val nD = col("nj").cast("double")
      val v = (col("ssj").cast("double") -
        col("sj").cast("double") * col("sj").cast("double") / nD) /
        (nD - 1)
      per.select(col("g"), v.as("v"))
        .agg(count(lit(1)).as("n_groups"), max(col("v")).as("vmax"),
          min(col("v")).as("vmin"))
        .select(col("n_groups"),
          r6(col("vmax") / 1e8).as("vmax_dollars2"),
          r6(col("vmin") / 1e8).as("vmin_dollars2"),
          r6(col("vmax") / col("vmin")).as("f_max"))
    }),

    // JENKS NATURAL BREAK (2 classes) — the revenue value minimizing
    // total within-class SSE when daily revenues split at ≤ v:
    // exact cumulative first/second moments over the sorted value
    // spine, argmin with the break value as tiebreak.
    "q_ts_jenks_breaks" -> ((s, d) => {
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val per = byday.groupBy(col("y")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("y"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = per.agg(sum(col("c")).as("n"),
        sum(col("y").cast(Big) * col("c").cast(Big)).as("s"),
        sum(col("y").cast(Big) * col("y").cast(Big)
          * col("c").cast(Big)).as("q"))
      val sp = per
        .withColumn("cl", sum(col("c")).over(w))
        .withColumn("sl", sum(col("y").cast(Big) * col("c").cast(Big))
          .over(w))
        .withColumn("ql", sum(col("y").cast(Big) * col("y").cast(Big)
          * col("c").cast(Big)).over(w))
        .crossJoin(broadcast(tot))
        .where(col("cl") < col("n"))
      def sse(qc: Column, sc: Column, cc: Column) =
        qc.cast("double") - sc.cast("double") * sc.cast("double") /
          cc.cast("double")
      val total = sse(col("ql"), col("sl"), col("cl")) +
        sse(col("q") - col("ql"), col("s") - col("sl"),
          col("n") - col("cl"))
      sp.select(col("y"), col("cl"), total.as("sse"),
          sse(col("q"), col("s"), col("n")).as("sse_root"))
        .orderBy(col("sse"), col("y"))
        .limit(1)
        .select(r6(col("y").cast("double") / 100).as("break_dollars"),
          col("cl").as("n_low_days"),
          r6(col("sse") / 1e8).as("sse_dollars2"),
          r6(lit(1.0) - col("sse") / col("sse_root"))
            .as("goodness_of_fit"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_by_fdr" ->
      """WITH base AS (SELECT p.p_brand,
                    CAST(l.l_quantity AS BIGINT) AS qt
                 FROM lineitem l JOIN part p
                   ON l.l_partkey = p.p_partkey),
            gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(qt) AS BIGINT) AS s,
                    SUM(CAST(qt AS HUGEINT) * CAST(qt AS HUGEINT)) AS ss
                  FROM base),
            per AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(qt) AS BIGINT) AS sj
                  FROM base GROUP BY 1),
            sc AS (SELECT p_brand, nj,
                    (CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)
                      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt(CAST(CAST(n AS HUGEINT) * ss
                          - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
                          AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                        / CAST(nj AS DOUBLE)) AS z
                  FROM per, gm),
            pp AS (SELECT p_brand, nj, z,
                     exp(z * z / -2.0) AS p
                   FROM sc),
            rk AS (SELECT p_brand, nj, z, p,
                     CAST(COUNT(*) OVER () AS BIGINT) AS m,
                     CAST(row_number() OVER (ORDER BY p, p_brand)
                       AS BIGINT) AS rank
                   FROM pp),
            hm AS (SELECT p_brand, nj, z, p, m, rank,
                     CAST(SUM(1000000000 // rank) OVER () AS DOUBLE)
                       / 1e9 AS hm
                   FROM rk),
            ht AS (SELECT p_brand, nj, z, p, rank,
                     CASE WHEN p <= 0.10 * CAST(rank AS DOUBLE)
                       / CAST(m AS DOUBLE) / hm THEN rank ELSE NULL END
                       AS hitrank
                   FROM hm),
            mx AS (SELECT MAX(hitrank) AS maxr FROM ht)
         SELECT p_brand, nj AS n_rows, round(z, 6) AS z_stat,
                round(p, 6) AS pseudo_p, rank AS p_rank,
                CAST(CASE WHEN rank <= COALESCE(maxr, 0) THEN 1 ELSE 0
                  END AS INT) AS by_discovery
         FROM ht, mx ORDER BY p_rank""",

    "q_agg_hartley_fmax" ->
      """WITH per AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                      AS g,
                    CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(y) AS BIGINT) AS sj,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS ssj
                 FROM (SELECT o_orderpriority,
                         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS y
                       FROM orders)
                 GROUP BY 1),
            v AS (SELECT g,
                    (CAST(ssj AS DOUBLE) - CAST(sj AS DOUBLE)
                      * CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE))
                      / (CAST(nj AS DOUBLE) - 1) AS v
                  FROM per)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                round(MAX(v) / 1e8, 6) AS vmax_dollars2,
                round(MIN(v) / 1e8, 6) AS vmin_dollars2,
                round(MAX(v) / MIN(v), 6) AS f_max
         FROM v""",

    "q_ts_jenks_breaks" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            per AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c
                    FROM byday GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                    SUM(CAST(y AS HUGEINT) * CAST(c AS HUGEINT)) AS s,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)
                      * CAST(c AS HUGEINT)) AS q
                  FROM per),
            sp AS (SELECT y,
                     CAST(SUM(c) OVER wc AS BIGINT) AS cl,
                     SUM(CAST(y AS HUGEINT) * CAST(c AS HUGEINT))
                       OVER wc AS sl,
                     SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)
                       * CAST(c AS HUGEINT)) OVER wc AS ql
                   FROM per
                   WINDOW wc AS (ORDER BY y
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            f AS (SELECT y, cl, sl, ql, n, s, q FROM sp, t
                  WHERE cl < n),
            e AS (SELECT y, cl,
                    (CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE)
                        * CAST(sl AS DOUBLE) / CAST(cl AS DOUBLE))
                      + (CAST(q - ql AS DOUBLE) - CAST(s - sl AS DOUBLE)
                        * CAST(s - sl AS DOUBLE) / CAST(n - cl AS DOUBLE))
                      AS sse,
                    CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS sse_root
                  FROM f)
         SELECT round(CAST(y AS DOUBLE) / 100, 6) AS break_dollars,
                cl AS n_low_days, round(sse / 1e8, 6) AS sse_dollars2,
                round(1.0 - sse / sse_root, 6) AS goodness_of_fit
         FROM e ORDER BY sse, y LIMIT 1"""
  )
}
