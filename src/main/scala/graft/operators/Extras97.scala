package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 23: stratified-epidemiology round-out —
  * the Cochran-Armitage trend test (final-status rate across ordered
  * priorities), the Mantel-Haenszel pooled odds ratio and MH
  * chi-square (discount exposure vs return outcome stratified by ship
  * year), and the Nelson-Aalen cumulative-hazard estimator over user
  * activity lifetimes with 7-day right censoring.
  *
  * Scale note: each test folds its fact table once into a bounded
  * relation (≤5 priority rows, ≤7 year strata, calendar-bounded
  * duration spine); the only windows ride those bounded spines.
  *
  * Determinism contract (SURVEY §2.13): trend numerator/denominator
  * are exact integers (DECIMAL(38,0) before any multiply); the
  * per-stratum rational terms (a·d/N, expected counts, hypergeometric
  * variances, hazard increments d/n) are MICRO-quantized per term and
  * summed as integers — never a cross-row double sum.
  */
object Extras97 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** year-stratified 2×2: exposure = discount ≥ 0.05, outcome =
    * returned (R) — the shared Mantel-Haenszel fold. */
  private def strata(s: SparkSession, d: String): DataFrame = {
    val exp = (dec(col("l_discount")) >= 0.05).cast("long")
    val out = (col("l_returnflag") === "R").cast("long")
    Tables.lineitem(s, d)
      .select(year(col("l_shipdate")).as("yr"), exp.as("e"), out.as("o"))
      .groupBy(col("yr"))
      .agg(sum(col("e") * col("o")).as("a"),
        sum(col("e") * (lit(1) - col("o"))).as("b"),
        sum((lit(1) - col("e")) * col("o")).as("c"),
        sum((lit(1) - col("e")) * (lit(1) - col("o"))).as("dd"))
      .withColumn("nt", col("a") + col("b") + col("c") + col("dd"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // COCHRAN-ARMITAGE TREND — does the final-status (F) rate trend
    // across the ordered priorities 1..5 (scores wᵢ = i)?
    // z = A/√(R(N−R)B/N) with A = N·Σwr − R·Σwn and
    // B = N·Σw²n − (Σwn)² exact integers.
    "q_agg_cochran_armitage" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("w"),
          (col("o_orderstatus") === "F").cast("long").as("f"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("ni"), sum(col("f")).as("ri"))
      val m = per.agg(sum(col("ni")).as("nn"), sum(col("ri")).as("rr"),
        sum(col("w") * col("ni")).as("swn"),
        sum(col("w") * col("ri")).as("swr"),
        sum(col("w") * col("w") * col("ni")).as("sw2n"))
      val aT = (col("nn").cast(Big) * col("swr")
        - col("rr").cast(Big) * col("swn").cast(Big))
      val bT = (col("nn").cast(Big) * col("sw2n")
        - col("swn").cast(Big) * col("swn").cast(Big))
      m.select(col("nn").as("n_orders"), col("rr").as("n_final"),
        r6(aT.cast("double") /
          sqrt(col("rr").cast("double") * (col("nn") - col("rr"))
            .cast("double") * bT.cast("double") /
            col("nn").cast("double"))).as("z_trend"))
    }),

    // MANTEL-HAENSZEL POOLED ODDS RATIO — OR = Σaᵢdᵢ/Nᵢ / Σbᵢcᵢ/Nᵢ
    // across ship-year strata; each rational term micro-quantized
    // (×1e6) before the integer fold.
    "q_agg_mantel_haenszel" -> ((s, d) => {
      val st = strata(s, d)
        .select(col("yr"),
          round((col("a").cast(Big) * col("dd").cast(Big)).cast("double")
            / col("nt").cast("double") * 1e6).cast("long").as("num_micro"),
          round((col("b").cast(Big) * col("c").cast(Big)).cast("double")
            / col("nt").cast("double") * 1e6).cast("long").as("den_micro"))
      st.agg(count(lit(1)).as("n_strata"),
        sum(col("num_micro")).as("sn"), sum(col("den_micro")).as("sd"))
        .select(col("n_strata"),
          r6(col("sn").cast("double") / col("sd").cast("double"))
            .as("or_mh"),
          r6(log(col("sn").cast("double") / col("sd").cast("double")))
            .as("log_or_mh"))
    }),

    // MANTEL-HAENSZEL CHI-SQUARE (continuity-corrected) —
    // (|Σaᵢ − ΣEᵢ| − ½)²/ΣVᵢ with Eᵢ = (a+b)(a+c)/N and
    // Vᵢ = (a+b)(c+d)(a+c)(b+d)/(N²(N−1)), each micro-quantized.
    "q_agg_mh_chi2" -> ((s, d) => {
      val e = ((col("a") + col("b")).cast(Big)
        * (col("a") + col("c")).cast(Big)).cast("double") /
        col("nt").cast("double")
      val v = ((col("a") + col("b")).cast(Big)
        * (col("c") + col("dd")).cast(Big)
        * (col("a") + col("c")).cast(Big)
        * (col("b") + col("dd")).cast(Big)).cast("double") /
        (col("nt").cast(Big) * col("nt").cast(Big)).cast("double") /
        (col("nt") - 1).cast("double")
      val st = strata(s, d).select(col("a"),
        round(e * lit(1e6)).cast("long").as("e_micro"),
        round(v * lit(1e6)).cast("long").as("v_micro"))
      val m = st.agg(count(lit(1)).as("n_strata"), sum(col("a")).as("sa"),
        sum(col("e_micro")).as("se"), sum(col("v_micro")).as("sv"))
      val dev = abs(col("sa").cast("double") -
        col("se").cast("double") / 1e6) - 0.5
      m.select(col("n_strata"), col("sa").as("sum_exposed_returns"),
        r6(dev * dev / (col("sv").cast("double") / 1e6)).as("chi2_mh"))
    }),

    // NELSON-AALEN CUMULATIVE HAZARD — customer order lifetime in days
    // (first→last order); customers whose last order is within 90 days
    // of the corpus end are right-censored. H(t) = Σ_{s≤t} d(s)/n(s),
    // the per-step hazard nano-quantized before the running integer
    // fold on the bounded duration spine.
    "q_evt_nelson_aalen" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(to_date(min(col("o_orderdate"))).as("fd"),
          to_date(max(col("o_orderdate"))).as("ld"))
      val mx = per.agg(max(col("ld")).as("mxd"))
      val life = per.crossJoin(broadcast(mx))
        .select(datediff(col("ld"), col("fd")).cast("long").as("dur"),
          (datediff(col("mxd"), col("ld")) > 90).cast("long").as("obs"))
      val byDur = life.groupBy(col("dur"))
        .agg(count(lit(1)).as("cnt"), sum(col("obs")).as("dv"))
      val w = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = byDur.agg(sum(col("cnt")).as("ntot"))
      val h = byDur.crossJoin(broadcast(tot))
        .withColumn("nrisk",
          col("ntot") - (sum(col("cnt")).over(w) - col("cnt")))
        .withColumn("inc_nano",
          round(col("dv").cast("double") / col("nrisk").cast("double")
            * 1e9).cast("long"))
        .withColumn("h_nano", sum(col("inc_nano")).over(w))
      h.where(col("dv") > 0)
        .select(col("dur").as("dur_days"), col("nrisk").as("n_risk"),
          col("dv").as("d_events"),
          r6(col("h_nano").cast("double") / 1e9).as("h_na"))
        .orderBy(col("dur_days"))
    })
  )

  private val strataSql =
    """st AS (SELECT EXTRACT(year FROM l_shipdate) AS yr,
                CAST(SUM(e * o) AS BIGINT) AS a,
                CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
                CAST(SUM((1 - e) * o) AS BIGINT) AS c,
                CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS dd
           FROM (SELECT l_shipdate,
                   CASE WHEN CAST(l_discount AS DECIMAL(18,2)) >= 0.05
                     THEN 1 ELSE 0 END AS e,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS o
                 FROM lineitem)
          GROUP BY 1),
       st2 AS (SELECT yr, a, b, c, dd, a + b + c + dd AS nt FROM st)"""

  val oracle: Map[String, String] = Map(

    "q_agg_cochran_armitage" ->
      """WITH per AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                      AS w,
                    CAST(COUNT(*) AS BIGINT) AS ni,
                    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                      END) AS BIGINT) AS ri
                 FROM orders GROUP BY 1),
            m AS (SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                    CAST(SUM(ri) AS BIGINT) AS rr,
                    CAST(SUM(w * ni) AS BIGINT) AS swn,
                    CAST(SUM(w * ri) AS BIGINT) AS swr,
                    CAST(SUM(w * w * ni) AS BIGINT) AS sw2n
                  FROM per)
         SELECT nn AS n_orders, rr AS n_final,
                round(CAST(CAST(nn AS HUGEINT) * swr
                    - CAST(rr AS HUGEINT) * CAST(swn AS HUGEINT)
                    AS DOUBLE)
                  / sqrt(CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE)
                    * CAST(CAST(nn AS HUGEINT) * sw2n
                      - CAST(swn AS HUGEINT) * CAST(swn AS HUGEINT)
                      AS DOUBLE)
                    / CAST(nn AS DOUBLE)), 6) AS z_trend
         FROM m""",

    "q_agg_mantel_haenszel" ->
      s"""WITH $strataSql,
            q AS (SELECT yr,
                    CAST(round(CAST(CAST(a AS HUGEINT) * CAST(dd AS HUGEINT)
                      AS DOUBLE) / CAST(nt AS DOUBLE) * 1e6) AS BIGINT)
                      AS num_micro,
                    CAST(round(CAST(CAST(b AS HUGEINT) * CAST(c AS HUGEINT)
                      AS DOUBLE) / CAST(nt AS DOUBLE) * 1e6) AS BIGINT)
                      AS den_micro
                  FROM st2)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                round(CAST(SUM(num_micro) AS DOUBLE)
                  / CAST(SUM(den_micro) AS DOUBLE), 6) AS or_mh,
                round(ln(CAST(SUM(num_micro) AS DOUBLE)
                  / CAST(SUM(den_micro) AS DOUBLE)), 6) AS log_or_mh
         FROM q""",

    "q_agg_mh_chi2" ->
      s"""WITH $strataSql,
            q AS (SELECT a,
                    CAST(round(CAST(CAST(a + b AS HUGEINT)
                        * CAST(a + c AS HUGEINT) AS DOUBLE)
                      / CAST(nt AS DOUBLE) * 1e6) AS BIGINT) AS e_micro,
                    CAST(round(CAST(CAST(a + b AS HUGEINT)
                        * CAST(c + dd AS HUGEINT)
                        * CAST(a + c AS HUGEINT)
                        * CAST(b + dd AS HUGEINT) AS DOUBLE)
                      / CAST(CAST(nt AS HUGEINT) * CAST(nt AS HUGEINT)
                        AS DOUBLE)
                      / CAST(nt - 1 AS DOUBLE) * 1e6) AS BIGINT) AS v_micro
                  FROM st2),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                    CAST(SUM(a) AS BIGINT) AS sa,
                    CAST(SUM(e_micro) AS BIGINT) AS se,
                    CAST(SUM(v_micro) AS BIGINT) AS sv
                  FROM q)
         SELECT n_strata, sa AS sum_exposed_returns,
                round((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1e6)
                    - 0.5)
                  * (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1e6)
                    - 0.5)
                  / (CAST(sv AS DOUBLE) / 1e6), 6) AS chi2_mh
         FROM m""",

    "q_evt_nelson_aalen" ->
      """WITH per AS (SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS fd,
                    CAST(MAX(o_orderdate) AS DATE) AS ld
                 FROM orders GROUP BY 1),
            mx AS (SELECT MAX(ld) AS mxd FROM per),
            life AS (SELECT
                       CAST(date_diff('day', fd, ld) AS BIGINT) AS dur,
                       CASE WHEN date_diff('day', ld, mxd) > 90
                         THEN 1 ELSE 0 END AS obs
                     FROM per, mx),
            bydur AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
                        CAST(SUM(obs) AS BIGINT) AS dv
                      FROM life GROUP BY 1),
            t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ntot FROM bydur),
            h AS (SELECT dur, cnt, dv,
                    CAST(ntot - (SUM(cnt) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - cnt) AS BIGINT) AS nrisk
                  FROM bydur, t),
            h2 AS (SELECT dur, dv, nrisk,
                     CAST(round(CAST(dv AS DOUBLE) / CAST(nrisk AS DOUBLE)
                       * 1e9) AS BIGINT) AS inc_nano
                   FROM h),
            h3 AS (SELECT dur, dv, nrisk,
                     SUM(inc_nano) OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS h_nano
                   FROM h2)
         SELECT dur AS dur_days, nrisk AS n_risk, dv AS d_events,
                round(CAST(h_nano AS DOUBLE) / 1e9, 6) AS h_na
         FROM h3 WHERE dv > 0 ORDER BY dur"""
  )
}
