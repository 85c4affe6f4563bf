package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 35: tail/shift/pooling round-out — the
  * Hill tail-index estimator over the top customer revenues, a
  * one-sided CUSUM mean-shift chart with reset on the daily revenue
  * series (the fourth exact-integer recurrence kernel), and
  * fixed-effect inverse-variance meta-analysis of the yearly
  * returned-vs-kept quantity contrast with Cochran's Q and I².
  *
  * Scale shape: Hill is a TakeOrdered top-101 (bounded) after one
  * customer-grain fold; CUSUM's fact-sized stage is the daily
  * aggregation — the recurrence walks the calendar-bounded spine;
  * meta-analysis folds per-(year, class) exact moments (≤14 rows).
  *
  * Determinism contract (SURVEY §2.13): Hill log-terms are
  * nano-quantized before the bounded fold; the CUSUM state is exact
  * BIGINT cents with integer mean/reference; meta-analysis weights
  * w = 1/vᵢ and wθᵢ are nano-quantized per year before the integer
  * folds, and Q re-walks the bounded year relation against the
  * broadcast pooled effect.
  */
object Extras109 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HILL TAIL INDEX (k=100) — α̂ = k/Σln(xᵢ/x₍ₖ₊₁₎) over the top-101
    // customer revenues (the reference row's ln 1 = 0 term is
    // harmless); heavy tails give small α.
    "q_agg_hill_tail" -> ((s, d) => {
      val top = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))
        .orderBy(col("x").desc, col("o_custkey"))
        .limit(101)
        .duckCkpt()
      val ref = top.agg(min(col("x")).as("xref"))
      top.crossJoin(broadcast(ref))
        .select(round(log(col("x").cast("double") /
          col("xref").cast("double")) * 1e9).cast("long").as("t_nano"),
          col("xref"))
        .groupBy(col("xref"))
        .agg(sum(col("t_nano")).as("sn"))
        .select(lit(100L).as("k"),
          r6(col("xref").cast("double") / 100).as("x_ref_dollars"),
          r6(lit(100.0) / (col("sn").cast("double") / 1e9))
            .as("hill_alpha"))
    }),

    // CUSUM MEAN-SHIFT CHART — Sₜ± = max(0, Sₜ₋₁± ± (xₜ − μ) − kᵣ)
    // with integer mean μ = Σx div n, reference kᵣ = μ div 20 and
    // decision limit h = μ div 4; the statistic RESETS after each
    // alarm. All-integer cents state.
    "q_ts_cusum_chart" -> ((s, d) => {
      import s.implicits._
      val ser = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("x"))
        .select(struct(col("dt"), col("x")).as("p"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(expr("transform(ps, q -> q.x)").as("xs"))
      ser.as[Seq[Long]]
        .map { xs =>
          val n = xs.length.toLong
          val mu = xs.sum / n
          val kr = mu / 20
          val h = mu / 4
          var su = 0L; var sl = 0L
          var au = 0L; var al = 0L
          var maxSu = 0L
          xs.foreach { x =>
            su = math.max(0L, su + (x - mu) - kr)
            sl = math.max(0L, sl + (mu - x) - kr)
            if (su > maxSu) maxSu = su
            if (su > h) { au += 1; su = 0L }
            if (sl > h) { al += 1; sl = 0L }
          }
          (n, au, al, maxSu)
        }
        .toDF("n_days", "alarms_upper", "alarms_lower", "max_su_cents")
        .select(col("n_days"), col("alarms_upper"), col("alarms_lower"),
          r6(col("max_su_cents").cast("double") / 100).as("max_su_dollars"))
    }),

    // FIXED-EFFECT META-ANALYSIS — yearly returned-vs-kept quantity
    // contrasts pooled by inverse variance; heterogeneity via
    // Cochran's Q and I² = max(0, (Q − (k−1))/Q).
    "q_agg_meta_analysis" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select(year(col("l_shipdate")).as("yr"),
          (col("l_returnflag") === "R").cast("long").as("g"),
          col("l_quantity").cast("long").as("q"))
        .groupBy(col("yr"))
        .agg(sum(col("g")).as("n1"),
          sum(col("g") * col("q")).as("s1"),
          sum(col("g").cast(Big) * col("q").cast(Big)
            * col("q").cast(Big)).as("ss1"),
          sum(lit(1) - col("g")).as("n0"),
          sum((lit(1) - col("g")) * col("q")).as("s0"),
          sum((lit(1) - col("g")).cast(Big) * col("q").cast(Big)
            * col("q").cast(Big)).as("ss0"))
      def mv(n: String, s1c: String, ssc: String): (Column, Column) = {
        val nD = col(n).cast("double")
        val m = col(s1c).cast("double") / nD
        val v = (col(ssc).cast("double") -
          col(s1c).cast("double") * col(s1c).cast("double") / nD) /
          (nD - 1) / nD
        (m, v)
      }
      val (m1, v1) = mv("n1", "s1", "ss1")
      val (m0, v0) = mv("n0", "s0", "ss0")
      val theta = m1 - m0
      val vi = v1 + v0
      val quant = per.select(col("yr"),
        round(lit(1.0) / vi * 1e9).cast("long").as("w_nano"),
        round(theta / vi * 1e9).cast("long").as("wt_nano"),
        round(theta * 1e9).cast("long").as("th_nano"))
        .duckCkpt()
      val pooled = quant.agg(count(lit(1)).as("k"),
        sum(col("w_nano")).as("sw"), sum(col("wt_nano")).as("swt"))
        .withColumn("th_pool",
          col("swt").cast("double") / col("sw").cast("double"))
      val qstat = quant.crossJoin(broadcast(pooled))
        .select(col("k"), col("th_pool"),
          round(col("w_nano").cast("double") / 1e9 *
            (col("th_nano").cast("double") / 1e9 - col("th_pool")) *
            (col("th_nano").cast("double") / 1e9 - col("th_pool")) * 1e9)
            .cast("long").as("q_nano"))
        .groupBy(col("k"), col("th_pool"))
        .agg(sum(col("q_nano")).as("sq"))
      val qv = col("sq").cast("double") / 1e9
      qstat.select(col("k").as("k_years"),
        r6(col("th_pool")).as("theta_pooled"), r6(qv).as("q_stat"),
        r6(greatest((qv - (col("k") - 1).cast("double")) / qv, lit(0.0)))
          .as("i2"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_hill_tail" ->
      """WITH top AS (SELECT o_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS x
                 FROM orders GROUP BY 1
                 ORDER BY x DESC, o_custkey LIMIT 101),
            r AS (SELECT CAST(MIN(x) AS BIGINT) AS xref FROM top),
            q AS (SELECT CAST(round(ln(CAST(x AS DOUBLE)
                      / CAST(xref AS DOUBLE)) * 1e9) AS BIGINT) AS t_nano,
                    xref
                  FROM top, r)
         SELECT CAST(100 AS BIGINT) AS k,
                round(CAST(xref AS DOUBLE) / 100, 6) AS x_ref_dollars,
                round(100.0 / (CAST(SUM(t_nano) AS DOUBLE) / 1e9), 6)
                  AS hill_alpha
         FROM q GROUP BY xref""",

    "q_ts_cusum_chart" ->
      """WITH RECURSIVE byday AS (
              SELECT CAST(o_orderdate AS DATE) AS dt,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                       * 100 AS BIGINT)) AS BIGINT) AS x
              FROM orders GROUP BY 1),
            arr AS (SELECT list(x ORDER BY dt) AS xs,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(x) AS BIGINT) AS sx
                    FROM byday),
            c AS (SELECT xs, n, sx // n AS mu,
                    (sx // n) // 20 AS kr, (sx // n) // 4 AS h
                  FROM arr),
            r AS (
              SELECT xs, n, mu, kr, h, CAST(0 AS BIGINT) AS t,
                     CAST(0 AS BIGINT) AS su, CAST(0 AS BIGINT) AS sl,
                     CAST(0 AS BIGINT) AS au, CAST(0 AS BIGINT) AS al,
                     CAST(0 AS BIGINT) AS maxsu
              FROM c
              UNION ALL
              SELECT xs, n, mu, kr, h, t + 1,
                     CASE WHEN su2 > h THEN 0 ELSE su2 END,
                     CASE WHEN sl2 > h THEN 0 ELSE sl2 END,
                     au + CASE WHEN su2 > h THEN 1 ELSE 0 END,
                     al + CASE WHEN sl2 > h THEN 1 ELSE 0 END,
                     CASE WHEN su2 > maxsu THEN su2 ELSE maxsu END
              FROM (SELECT xs, n, mu, kr, h, t, au, al, maxsu,
                      greatest(0, su + (xs[CAST(t + 1 AS INT)] - mu) - kr)
                        AS su2,
                      greatest(0, sl + (mu - xs[CAST(t + 1 AS INT)]) - kr)
                        AS sl2
                    FROM r WHERE t < n) q)
         SELECT n AS n_days, au AS alarms_upper, al AS alarms_lower,
                round(CAST(maxsu AS DOUBLE) / 100, 6) AS max_su_dollars
         FROM r WHERE t = n""",

    "q_agg_meta_analysis" ->
      """WITH per AS (SELECT EXTRACT(year FROM l_shipdate) AS yr,
                    CAST(SUM(g) AS BIGINT) AS n1,
                    CAST(SUM(g * q) AS BIGINT) AS s1,
                    SUM(CAST(g AS HUGEINT) * CAST(q AS HUGEINT)
                      * CAST(q AS HUGEINT)) AS ss1,
                    CAST(SUM(1 - g) AS BIGINT) AS n0,
                    CAST(SUM((1 - g) * q) AS BIGINT) AS s0,
                    SUM(CAST(1 - g AS HUGEINT) * CAST(q AS HUGEINT)
                      * CAST(q AS HUGEINT)) AS ss0
                 FROM (SELECT l_shipdate,
                         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                           AS g,
                         CAST(l_quantity AS BIGINT) AS q
                       FROM lineitem WHERE l_returnflag IN ('R', 'N'))
                 GROUP BY 1),
            ev AS (SELECT yr,
                    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS theta,
                    ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                        * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) - 1) / CAST(n1 AS DOUBLE)
                     + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                        * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                      / (CAST(n0 AS DOUBLE) - 1) / CAST(n0 AS DOUBLE))
                      AS vi
                  FROM per),
            quant AS (SELECT yr,
                    CAST(round(1.0 / vi * 1e9) AS BIGINT) AS w_nano,
                    CAST(round(theta / vi * 1e9) AS BIGINT) AS wt_nano,
                    CAST(round(theta * 1e9) AS BIGINT) AS th_nano
                  FROM ev),
            pooled AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                    CAST(SUM(w_nano) AS BIGINT) AS sw,
                    CAST(SUM(wt_nano) AS BIGINT) AS swt
                  FROM quant),
            p2 AS (SELECT k,
                    CAST(swt AS DOUBLE) / CAST(sw AS DOUBLE) AS th_pool
                  FROM pooled),
            qs AS (SELECT k, th_pool,
                    CAST(SUM(CAST(round(CAST(w_nano AS DOUBLE) / 1e9
                      * (CAST(th_nano AS DOUBLE) / 1e9 - th_pool)
                      * (CAST(th_nano AS DOUBLE) / 1e9 - th_pool) * 1e9)
                      AS BIGINT)) AS BIGINT) AS sq
                  FROM quant, p2 GROUP BY 1, 2)
         SELECT k AS k_years, round(th_pool, 6) AS theta_pooled,
                round(CAST(sq AS DOUBLE) / 1e9, 6) AS q_stat,
                round(greatest((CAST(sq AS DOUBLE) / 1e9
                    - CAST(k - 1 AS DOUBLE)) / (CAST(sq AS DOUBLE) / 1e9),
                  0.0), 6) AS i2
         FROM qs"""
  )
}
