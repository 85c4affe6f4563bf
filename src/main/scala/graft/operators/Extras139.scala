package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-12 additions, part 3: Kendall's coefficient of concordance
  * (do the calendar months agree on the weekday revenue ranking?),
  * the paired sign test (first vs second order per customer), the
  * seasonal Theil-Sen slope (median of within-season year-pair
  * slopes — the robust-trend sibling of q_ts_theil_sen and
  * q_ts_mann_kendall_seasonal), and the SCC condensation DAG
  * (the component-level flow graph over q_graph_scc's labels).
  *
  * Scale shape: kendall_w folds the fact table to a (month × 7)
  * grid; sign_test is one custkey window pass; sen_seasonal folds to
  * a (year, month) spine whose pair join is calendar-bounded;
  * scc_dag reuses the shared SCC label kernel plus one edge-label
  * join.
  *
  * Determinism contract (SURVEY §2.13): kendall_w ranks by
  * row_number with the dow tiebreak (stated; no midranks, so S is an
  * exact integer) and W = 12S / (k²(n³−n)), χ² = 12S / (k·n·(n+1))
  * are each ONE division of exact integers. sign_test is exact
  * counts + a 2-op IEEE tail. sen_seasonal micro-quantizes each
  * pair slope with truncating integer division (identical in both
  * engines) and picks the LOWER median by row_number over the total
  * (slope, season, year-pair) order — never an averaged median.
  * scc_dag is integer labels + counts only.
  */
object Extras139 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KENDALL'S W — k raters = calendar months, n = 7 weekdays ranked
    // by exact total cents (row_number, dow tiebreak) over the full
    // month × dow grid (absent cells rank as 0 revenue).
    "q_agg_kendall_w" -> ((s, d) => {
      import s.implicits._
      val cells = Tables.orders(s, d)
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("ym"),
          pmod(unix_date(to_date(col("o_orderdate"))).cast("long"),
            lit(7L)).as("dow"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("c"))
      val grid = cells.select(col("ym")).distinct()
        .crossJoin(broadcast(s.range(7).select(col("id").as("dow"))))
        .join(cells, Seq("ym", "dow"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val ranked = grid.withColumn("rk",
        row_number().over(Window.partitionBy(col("ym"))
          .orderBy(col("c"), col("dow"))).cast("long"))
      val rj = ranked.groupBy(col("dow"))
        .agg(sum(col("rk")).as("rsum"))
      val k = ranked.select(col("ym")).distinct().count()
      // S = Σ_j (R_j − k(n+1)/2)²; n = 7 so k(n+1)/2 = 4k exactly.
      val dev = col("rsum") - lit(4L * k)
      val agg = rj.agg(count(lit(1)).as("n_items"),
        sum((dev * dev).cast(Big)).as("s_stat"))
      val denomW = BigDecimal(k) * BigDecimal(k) * (343 - 7)
      val denomC = BigDecimal(k) * 7 * 8
      agg.select(lit(k).as("n_raters"), col("n_items"),
        col("s_stat").cast("long").as("s_stat"),
        r6(lit(12.0) * col("s_stat").cast("double")
          / lit(denomW.toDouble)).as("w"),
        r6(lit(12.0) * col("s_stat").cast("double")
          / lit(denomC.toDouble)).as("chi2"))
    }),

    // PAIRED SIGN TEST — does a customer's second order spend more
    // than the first? Exact (+, −, 0) counts over the per-customer
    // (date, orderkey)-ordered first two orders; z over the nonzero
    // pairs.
    "q_agg_sign_test" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt"), col("o_orderkey"))
      val r2 = Tables.orders(s, d)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("dt"),
          col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("c"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
      val pairs = r2.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"),
          max(when(col("rn") === 1, col("c"))).as("c1"),
          max(when(col("rn") === 2, col("c"))).as("c2"))
        .where(col("n_ord") === 2)
      val agg = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("c2") > col("c1"), 1L).otherwise(0L)).as("n_plus"),
        sum(when(col("c2") < col("c1"), 1L).otherwise(0L)).as("n_minus"),
        sum(when(col("c2") === col("c1"), 1L).otherwise(0L)).as("n_zero"))
      agg.select(col("n_pairs"), col("n_plus"), col("n_minus"),
        col("n_zero"),
        r6((col("n_plus") - col("n_minus")).cast("double")
          / sqrt((col("n_plus") + col("n_minus")).cast("double")))
          .as("z"))
    }),

    // SEASONAL THEIL-SEN — lower median of the within-month-of-year
    // year-pair slopes of monthly revenue (micro-cents per year,
    // truncating integer division; the Sen slope robust to both
    // outliers and seasonality).
    "q_ts_sen_seasonal" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val slopes = monthly.as("a").join(monthly.as("b"),
          col("a.m") === col("b.m") && col("a.yr") < col("b.yr"))
        .select(col("a.m").as("m"), col("a.yr").as("ya"),
          col("b.yr").as("yb"),
          expr("((b.y - a.y) * 1000000) div (b.yr - a.yr)")
            .as("slope_micro"))
      val ranked = slopes
        .withColumn("rn", row_number().over(Window.orderBy(
          col("slope_micro"), col("m"), col("ya"), col("yb")))
          .cast("long"))
        .crossJoin(broadcast(slopes.agg(count(lit(1)).as("ns"))))
      ranked.where(col("rn") === expr("(ns + 1) div 2"))
        .select(col("ns").as("n_slopes"),
          col("slope_micro").as("sen_micro"),
          r6(col("slope_micro").cast("double") / 1e6 / 100.0)
            .as("sen_usd_per_year"))
    }),

    // SCC CONDENSATION — the component-level DAG: distinct
    // (scc(src) → scc(dst)) cross-component edges with multiplicity.
    "q_graph_scc_dag" -> ((s, d) => {
      val lbl = Extras138.sccLabels(s, d).duckCkpt()
      Extras138.directedEdges(s, d)
        .join(lbl.select(col("u").as("src"), col("scc_id").as("scc_a")),
          "src")
        .join(lbl.select(col("u").as("dst"), col("scc_id").as("scc_b")),
          "dst")
        .where(col("scc_a") =!= col("scc_b"))
        .groupBy(col("scc_a"), col("scc_b"))
        .agg(count(lit(1)).as("n_edges"))
        .orderBy("scc_a", "scc_b")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_kendall_w" ->
      """WITH cells AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE))
                      AS ym,
                    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7
                      AS dow,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS c
                 FROM orders GROUP BY 1, 2),
            grid AS (SELECT m.ym, d.dow, COALESCE(cells.c, 0) AS c
                     FROM (SELECT DISTINCT ym FROM cells) m
                     CROSS JOIN (SELECT CAST(unnest(generate_series(0, 6))
                                   AS BIGINT) AS dow) d
                     LEFT JOIN cells ON cells.ym = m.ym
                       AND cells.dow = d.dow),
            ranked AS (SELECT ym, dow,
                      CAST(row_number() OVER (PARTITION BY ym
                        ORDER BY c, dow) AS BIGINT) AS rk
                    FROM grid),
            k AS (SELECT CAST(COUNT(DISTINCT ym) AS BIGINT) AS k
                  FROM ranked),
            rj AS (SELECT dow, CAST(SUM(rk) AS BIGINT) AS rsum
                   FROM ranked GROUP BY 1),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                    CAST(SUM(CAST(rsum - 4 * k AS HUGEINT)
                      * CAST(rsum - 4 * k AS HUGEINT)) AS HUGEINT)
                      AS s_stat
                  FROM rj, k)
         SELECT k AS n_raters, n_items,
                CAST(s_stat AS BIGINT) AS s_stat,
                round(12.0 * CAST(s_stat AS DOUBLE)
                  / CAST(k * k * 336 AS DOUBLE), 6) AS w,
                round(12.0 * CAST(s_stat AS DOUBLE)
                  / CAST(k * 56 AS DOUBLE), 6) AS chi2
         FROM s, k""",

    "q_agg_sign_test" ->
      """WITH r2 AS (SELECT o_custkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS c,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                      AS rn
                 FROM orders),
            pairs AS (SELECT o_custkey,
                    MAX(CASE WHEN rn = 1 THEN c END) AS c1,
                    MAX(CASE WHEN rn = 2 THEN c END) AS c2
                  FROM r2 WHERE rn <= 2 GROUP BY 1
                  HAVING COUNT(*) = 2),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(CASE WHEN c2 > c1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_plus,
                    CAST(SUM(CASE WHEN c2 < c1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_minus,
                    CAST(SUM(CASE WHEN c2 = c1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_zero
                  FROM pairs)
         SELECT n_pairs, n_plus, n_minus, n_zero,
                round(CAST(n_plus - n_minus AS DOUBLE)
                  / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6) AS z
         FROM a""",

    "q_ts_sen_seasonal" ->
      """WITH monthly AS (SELECT CAST(year(CAST(o_orderdate AS DATE))
                      AS BIGINT) AS yr,
                    CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1, 2),
            slopes AS (SELECT a.m, a.yr AS ya, b.yr AS yb,
                    ((b.y - a.y) * 1000000) // (b.yr - a.yr)
                      AS slope_micro
                  FROM monthly a JOIN monthly b
                    ON a.m = b.m AND a.yr < b.yr),
            ranked AS (SELECT slope_micro,
                    CAST(row_number() OVER (ORDER BY slope_micro, m,
                      ya, yb) AS BIGINT) AS rn
                  FROM slopes),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM slopes)
         SELECT ns AS n_slopes, slope_micro AS sen_micro,
                round(CAST(slope_micro AS DOUBLE) / 1e6 / 100.0, 6)
                  AS sen_usd_per_year
         FROM ranked, c WHERE rn = (ns + 1) // 2""",

    "q_graph_scc_dag" ->
      s"""WITH RECURSIVE ${Extras138.sccCoreSql}
         SELECT la.scc_id AS scc_a, lb.scc_id AS scc_b,
                CAST(COUNT(*) AS BIGINT) AS n_edges
         FROM e
         JOIN lbl la ON la.u = e.src
         JOIN lbl lb ON lb.u = e.dst
         WHERE la.scc_id <> lb.scc_id
         GROUP BY 1, 2 ORDER BY scc_a, scc_b"""
  )
}
