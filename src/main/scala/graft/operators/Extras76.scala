package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 2: the round-10 verdict's remaining
  * unclaimed surface — Cochran's Q (the binary-outcome sibling of
  * q_agg_friedman), the seasonal Mann-Kendall PER-SEASON breakdown
  * rows (the month-level decomposition of q_ts_mann_kendall_seasonal),
  * and geohash encoding (bit-interleave + base32, the second
  * space-filling curve beside graft.functions.HilbertIndex).
  *
  * Determinism contract (SURVEY §2.13): all three are exact-integer
  * folds — Cochran's moments widen to DECIMAL(38,0) before the first
  * multiply (HUGEINT parity); the per-month MK variance is the exact
  * tie-corrected integer; the geohash interleave is pure bit
  * arithmetic with the base32 alphabet as a shared literal. Each
  * emitted ratio is one shared IEEE chain.
  */
object Extras76 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Geohash bit-interleave: x supplies the EVEN-weight bits (the
    * lon position of the classic encoding), y the odd, 20 bits each →
    * one 40-bit cell id = 8 base32 characters. */
  private val GeoBits = 20
  private val GeoAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def interleaved(x: Column, y: Column): Column =
    (0 until GeoBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** The same interleave as a DuckDB SQL expression over columns x, y. */
  private def interleavedSql: String =
    (0 until GeoBits).map { i =>
      s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // COCHRAN'S Q — do the event types have the same weekly incidence
    // rate? (binary repeated measures: blocks = (user, week) periods,
    // treatments = the event-type alphabet, x_ij = "block i saw type j
    // at least once"; week = exact epoch-day div 7, the q_evt_churn
    // idiom — engines disagree on native week truncation). Every-user-
    // every-type is saturated over the full window (all R_i = k ⇒ the
    // denominator k·N − ΣR_i² is literally zero), so the WEEKLY grain
    // is what makes the statistic exist. Q = (k−1)(k·ΣC_j² − N²)
    // /(k·N − ΣR_i²) with column totals C_j, block totals R_i, N = ΣR;
    // one (user, week, type) dedup + two bounded aggregates; squared
    // sums widen to DECIMAL(38,0) BEFORE the multiply (C_j² passes
    // 1e18 at 1e9 blocks).
    "q_agg_cochran_q" -> ((s, d) => {
      val inc = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(to_date(ts), DATE '2020-01-06') div 7").as("wk"),
          col("event_type")).distinct()
      val rows = inc.groupBy(col("user_id"), col("wk"))
        .agg(count(lit(1)).as("r"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("r")).as("n_total"),
          sum(col("r").cast(Big) * col("r").cast(Big)).as("sum_r2"))
      val cols = inc.groupBy(col("event_type"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("k"),
          sum(col("c").cast(Big) * col("c").cast(Big)).as("sum_c2"))
      rows.crossJoin(broadcast(cols))
        .select(col("k"), col("n_blocks"), col("n_total"),
          r6(((col("k") - 1).cast(Big)
              * (col("k").cast(Big) * col("sum_c2")
                 - col("n_total").cast(Big) * col("n_total").cast(Big)))
            .cast("double")
            / (col("k").cast(Big) * col("n_total").cast(Big)
               - col("sum_r2")).cast("double")).as("q_cochran"))
    }),

    // SEASONAL MANN-KENDALL, PER-SEASON BREAKDOWN — the month-level
    // rows q_ts_mann_kendall_seasonal sums over: for each calendar
    // month, the cross-year S_m, pair/tie counts, exact tie-corrected
    // 18·Var_m, and the continuity-corrected per-month Z. A month
    // whose variance is zero (degenerate: <2 years or all ties) emits
    // NULL z on both engines. Same broadcast month-equality pair
    // stage as the aggregate test — calendar²-bounded at any volume.
    "q_ts_mk_seasonal_breakdown" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(year(to_date(col("o_orderdate"))).as("yr"),
          month(to_date(col("o_orderdate"))).as("m"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val pairs = monthly.as("a").join(broadcast(monthly.as("b")),
          col("a.m") === col("b.m") && col("a.yr") < col("b.yr"))
        .groupBy(col("a.m").as("m"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(signum(col("b.y") - col("a.y")).cast("long")).as("s"),
          sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L))
            .as("n_tie_pairs"))
      val varM = monthly
        .groupBy(col("m"), col("y")).agg(count(lit(1)).as("tt"))
        .groupBy(col("m"))
        .agg(sum(col("tt")).as("n_years"),
          (sum(expr("tt * (tt - 1) * (2 * tt + 5)"))).as("tie18"))
        .select(col("m"), col("n_years"),
          (col("n_years") * (col("n_years") - 1)
            * (col("n_years") * 2 + 5) - col("tie18")).as("var18"))
      pairs.join(varM, "m")
        .select(col("m").cast("long").as("m"), col("n_years"),
          col("n_pairs"), col("s"), col("n_tie_pairs"), col("var18"),
          when(col("var18") > 0,
            r6((col("s").cast("double")
              - signum(col("s").cast("double")))
              / sqrt(col("var18").cast("double") / 18.0)))
            .as("z_m"))
        .orderBy("m")
    }),

    // GEOHASH ENCODE — the classic bit-interleave + base32 curve
    // beside the Hilbert walk (q_layout_hilbert; same synthesized
    // grid: x from the customer key, y from the price cents). The
    // interleave is a constant 40-term bit expression inside
    // whole-stage codegen — no UDF, no shuffle before the final
    // bucket aggregate. Emitted per 2-char geohash prefix (the
    // 10-bit top-level cell): row count, the cell's full 8-char
    // geohash floor (min — proves the whole encode), and the x/y
    // spans that a lakehouse would use for file skipping.
    "q_fn_geohash" -> ((s, d) => {
      val x = pmod(col("o_custkey"), lit(1L << GeoBits))
      val y = pmod((dec(col("o_totalprice")) * 100).cast("long"),
        lit(1L << GeoBits))
      val withV = Tables.orders(s, d)
        .select(x.as("x"), y.as("y"))
        .withColumn("v", interleaved(col("x"), col("y")))
      val gh = (0 until 8).map(i =>
        expr(s"substring('$GeoAlphabet', " +
          s"CAST((v >> ${5 * (7 - i)}) & 31 AS INT) + 1, 1)"))
      withV.withColumn("gh", concat(gh: _*))
        .groupBy(substring(col("gh"), 1, 2).as("gh2"))
        .agg(count(lit(1)).as("n"), min(col("gh")).as("gh8_floor"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("gh2")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_cochran_q" ->
      """WITH inc AS (SELECT DISTINCT user_id,
                          (CAST(ts AS DATE) - DATE '2020-01-06') // 7 AS wk,
                          event_type
                   FROM events),
            r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                         CAST(SUM(rr) AS BIGINT) AS n_total,
                         SUM(rr * rr) AS sum_r2
                  FROM (SELECT user_id, wk, CAST(COUNT(*) AS HUGEINT) AS rr
                        FROM inc GROUP BY 1, 2)),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                         SUM(cc * cc) AS sum_c2
                  FROM (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS cc
                        FROM inc GROUP BY 1))
         SELECT k, n_blocks, n_total,
                round(CAST((k - 1) * (k * sum_c2
                             - CAST(n_total AS HUGEINT)
                               * CAST(n_total AS HUGEINT)) AS DOUBLE)
                  / CAST(k * CAST(n_total AS HUGEINT) - sum_r2 AS DOUBLE),
                  6) AS q_cochran
         FROM r, c""",

    "q_ts_mk_seasonal_breakdown" ->
      """WITH monthly AS (SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE))
                      AS yr,
                    EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS m,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1, 2),
            p AS (SELECT a.m AS m, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(CASE WHEN b.y > a.y THEN 1
                              WHEN b.y < a.y THEN -1 ELSE 0 END)
                      AS BIGINT) AS s,
                    CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tie_pairs
                  FROM monthly a JOIN monthly b
                    ON a.m = b.m AND a.yr < b.yr
                  GROUP BY 1),
            vm AS (SELECT m, CAST(SUM(tt) AS BIGINT) AS n_years,
                     CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT)
                       AS tie18
                   FROM (SELECT m, y, CAST(COUNT(*) AS BIGINT) AS tt
                         FROM monthly GROUP BY m, y)
                   GROUP BY m),
            v AS (SELECT m, n_years,
                    n_years * (n_years - 1) * (2 * n_years + 5) - tie18
                      AS var18
                  FROM vm)
         SELECT CAST(p.m AS BIGINT) AS m, v.n_years, p.n_pairs, p.s,
                p.n_tie_pairs, v.var18,
                CASE WHEN v.var18 > 0 THEN
                  round((CAST(p.s AS DOUBLE)
                    - CASE WHEN p.s > 0 THEN 1.0
                           WHEN p.s < 0 THEN -1.0 ELSE 0.0 END)
                    / sqrt(CAST(v.var18 AS DOUBLE) / 18.0), 6)
                END AS z_m
         FROM p JOIN v ON p.m = v.m
         ORDER BY m""",

    "q_fn_geohash" -> {
      val side = 1L << GeoBits
      s"""WITH pts AS (SELECT o_custkey % $side AS x,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) % $side AS y
              FROM orders),
            iv AS (SELECT x, y, $interleavedSql AS v FROM pts),
            gh AS (SELECT x, y, ${(0 until 8).map(i =>
                s"substr('$GeoAlphabet', CAST((v >> ${5 * (7 - i)}) & 31 AS INT) + 1, 1)")
                .mkString(" || ")} AS gh
                   FROM iv)
         SELECT substr(gh, 1, 2) AS gh2, CAST(COUNT(*) AS BIGINT) AS n,
                MIN(gh) AS gh8_floor,
                MIN(x) AS min_x, MAX(x) AS max_x,
                MIN(y) AS min_y, MAX(y) AS max_y
         FROM gh GROUP BY 1 ORDER BY 1"""
    }
  )
}
