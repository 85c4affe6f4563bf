package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 10: inference round-out — the maximum-sum
  * revenue run (Kadane's best segment as prefix statistics),
  * difference-in-differences, the survey ratio estimator with
  * delta-method variance, and chi-square goodness-of-fit against the
  * uniform type mix (whose quadratic form is an EXACT integer).
  *
  * Determinism contract (SURVEY §2.13): prefix sums, segment bounds,
  * cell totals and the GOF quadratic form are exact integers (the GOF
  * identity χ² = Σ(O·k − N)²/(k·N) keeps the numerator integral);
  * run bounds tie-break on the earliest day; every emitted real is
  * one shared IEEE chain.
  */
object Extras84 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BEST REVENUE RUN — the maximum-sum consecutive-day segment of
    // (daily revenue − calendar median): Kadane's statistic as pure
    // prefix windows (S_t − min prefix), with the earliest attaining
    // END day and the earliest matching prefix START. All exact cents;
    // the virtual S_0 = 0 prefix makes the empty-prefix start (day 1)
    // a real match rather than a special case.
    "q_ts_best_run" -> ((s, d) => {
      val dr = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", row_number().over(Window.orderBy(col("dt")))
          .cast("long"))
      val wAll = Window.partitionBy(lit(1))
      val med = dr
        .withColumn("rn", row_number().over(
          Window.orderBy(col("y"), col("dt"))))
        .withColumn("n", count(lit(1)).over(wAll))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("y").as("med"))
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sp = dr.crossJoin(broadcast(med))
        .withColumn("x", col("y") - col("med"))
        .withColumn("s", sum(col("x")).over(wCum))
        .withColumn("mp",
          least(lit(0L), coalesce(min(col("s")).over(wPrev), lit(0L))))
        .withColumn("ph", col("s") - col("mp"))
        .duckCkpt()
      val top = sp.agg(max(col("ph")).as("best_cents"))
      val endRow = sp.crossJoin(broadcast(top))
        .where(col("ph") === col("best_cents"))
        .groupBy(col("best_cents"))
        .agg(min(struct(col("t"), col("dt"), col("s"))).as("e"))
        .select(col("best_cents"), col("e.t").as("end_t"),
          col("e.dt").as("end_dt"),
          (col("e.s") - col("best_cents")).as("mp_target"))
      val startRow = sp.crossJoin(broadcast(endRow))
        .where(col("t") < col("end_t") && col("s") === col("mp_target"))
        .groupBy(col("best_cents"), col("end_t"), col("end_dt"),
          col("mp_target"))
        .agg(min(col("t")).as("pre_t"))
      // mp_target = 0 with no matching prefix row ⇒ the run starts on
      // day 1 (the virtual S_0 = 0); otherwise day pre_t + 1.
      endRow.join(broadcast(startRow.select(col("end_t").as("et2"),
          col("pre_t"))), col("end_t") === col("et2"), "left")
        .select(col("best_cents"), col("end_dt"),
          coalesce(col("pre_t") + 1, lit(1L)).as("start_t"),
          col("end_t"))
        .join(broadcast(dr.select(col("t").as("start_t"),
          col("dt").as("start_dt"))), Seq("start_t"))
        .select(col("start_dt"), col("end_dt"),
          (col("end_t") - col("start_t") + 1).as("n_days_run"),
          col("best_cents"),
          r6(col("best_cents").cast("double") / 100.0).as("best_usd"))
    }),

    // DIFFERENCE-IN-DIFFERENCES — the 2×2 (variant × calendar-half)
    // readout: DiD = (ȳ₁₁−ȳ₁₀) − (ȳ₀₁−ȳ₀₀) over per-(user, period)
    // purchase cents, variant = user parity, periods split at the
    // calendar midpoint (the q_evt_cuped convention). All four cell
    // means come from exact integer sums pivoted to one row; DiD is
    // the one IEEE chain.
    "q_evt_diff_in_diff" -> ((s, d) => {
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("dmin"),
          max(to_date(col("ts"))).as("dmax"))
      val cells = Tables.events(s, d).crossJoin(broadcast(span))
        .where(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2L)).as("v"),
          (datediff(to_date(col("ts")), col("dmin")) * 2
            > datediff(col("dmax"), col("dmin"))).cast("long").as("post"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .groupBy(col("v"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      def cell(v: Int, p: Int, c: String) =
        max(when(col("v") === v && col("post") === p, col(c)))
          .as(s"${c}$v$p")
      val piv = cells.agg(
        cell(0, 0, "n"), cell(0, 1, "n"), cell(1, 0, "n"), cell(1, 1, "n"),
        cell(0, 0, "sc"), cell(0, 1, "sc"), cell(1, 0, "sc"),
        cell(1, 1, "sc"))
      def mean(v: Int, p: Int) =
        col(s"sc$v$p").cast("double") / col(s"n$v$p").cast("double")
      piv.select(col("n00"), col("n01"), col("n10"), col("n11"),
        r6((mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0)))
          .as("did_cents"))
    }),

    // RATIO ESTIMATOR — R̂ = Σy/Σx (per-user purchase cents over
    // per-user event count) with the delta-method variance
    // v̂ = (Σy² − 2R̂Σxy + R̂²Σx²)·n/((n−1)·(Σx)²) — the survey
    // statistician's ratio mean. Moments exact in DECIMAL(38,0);
    // R̂ and v̂ each one chain.
    "q_agg_ratio_est" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"),
          sum(when(col("event_type") === "purchase",
            (dec(col("value")) * 100).cast("long")).otherwise(0L))
            .as("y"))
      val mo = per.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val r = col("sy").cast("double") / col("sx").cast("double")
      mo.select(col("n"), col("sx"), col("sy"),
        r6(r).as("ratio_cents_per_event"),
        r6((col("syy").cast("double") - lit(2.0) * r * col("sxy").cast("double")
          + r * r * col("sxx").cast("double"))
          * col("n").cast("double")
          / ((col("n") - 1).cast("double")
            * col("sx").cast("double") * col("sx").cast("double")))
          .as("var_ratio"))
    }),

    // CHI-SQUARE GOODNESS-OF-FIT vs the uniform type mix: the
    // quadratic form Σ(O·k − N)² is an EXACT integer (DECIMAL), so
    // χ² = Σ(O·k − N)²/(k·N) is one IEEE chain — no per-cell double
    // summation ever crosses the engines (the q_dq_chi2 lesson).
    "q_agg_chisq_gof" -> ((s, d) => {
      val o = Tables.events(s, d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("o"))
      val tot = o.agg(count(lit(1)).as("k"), sum(col("o")).as("nn"))
      o.crossJoin(broadcast(tot))
        .select(col("event_type"), col("o"), col("k"), col("nn"),
          (col("o").cast(Big) * col("k").cast(Big)
            - col("nn").cast(Big)).as("dev"))
        .agg(max(col("k")).as("k"), max(col("nn")).as("n_events"),
          sum(col("dev") * col("dev")).as("q_num"))
        .select(col("k"), col("n_events"),
          r6(col("q_num").cast("double")
            / (col("k").cast(Big) * col("n_events").cast(Big))
              .cast("double")).as("chi2_gof"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_best_run" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            med AS (SELECT y AS med
                    FROM (SELECT y, row_number() OVER (ORDER BY y, dt)
                            AS rn, COUNT(*) OVER () AS n
                          FROM dr)
                    WHERE rn = (n + 1) // 2),
            sp AS (SELECT dt, t,
                     CAST(SUM(y - med) OVER (ORDER BY t ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS s
                   FROM dr, med),
            sp2 AS (SELECT dt, t, s,
                      least(CAST(0 AS BIGINT),
                        COALESCE(MIN(s) OVER (ORDER BY t ROWS BETWEEN
                          UNBOUNDED PRECEDING AND 1 PRECEDING),
                          CAST(0 AS BIGINT))) AS mp
                    FROM sp),
            ph AS (SELECT dt, t, s, mp, s - mp AS ph FROM sp2),
            top AS (SELECT MAX(ph) AS best_cents FROM ph),
            e AS (SELECT best_cents, t AS end_t, dt AS end_dt,
                    s - best_cents AS mp_target
                  FROM ph, top
                  WHERE ph = best_cents
                  ORDER BY t LIMIT 1),
            st AS (SELECT e.best_cents, e.end_t, e.end_dt,
                     COALESCE((SELECT MIN(p.t) + 1 FROM ph p
                               WHERE p.t < e.end_t
                                 AND p.s = e.mp_target),
                              1) AS start_t
                   FROM e)
         SELECT d2.dt AS start_dt, st.end_dt,
                st.end_t - st.start_t + 1 AS n_days_run,
                st.best_cents,
                round(CAST(st.best_cents AS DOUBLE) / 100.0, 6)
                  AS best_usd
         FROM st JOIN dr d2 ON d2.t = st.start_t""",

    "q_evt_diff_in_diff" ->
      """WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS dmin,
                    MAX(CAST(ts AS DATE)) AS dmax FROM events),
            cells AS (SELECT user_id % 2 AS v,
                        CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                               > (dmax - dmin) THEN 1 ELSE 0 END AS post,
                        CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS BIGINT) AS sc
                      FROM events, span
                      WHERE event_type = 'purchase'
                      GROUP BY 1, 2)
         SELECT MAX(CASE WHEN v = 0 AND post = 0 THEN n END) AS n00,
                MAX(CASE WHEN v = 0 AND post = 1 THEN n END) AS n01,
                MAX(CASE WHEN v = 1 AND post = 0 THEN n END) AS n10,
                MAX(CASE WHEN v = 1 AND post = 1 THEN n END) AS n11,
                round((CAST(MAX(CASE WHEN v = 1 AND post = 1 THEN sc END)
                      AS DOUBLE)
                    / CAST(MAX(CASE WHEN v = 1 AND post = 1 THEN n END)
                      AS DOUBLE)
                  - CAST(MAX(CASE WHEN v = 1 AND post = 0 THEN sc END)
                      AS DOUBLE)
                    / CAST(MAX(CASE WHEN v = 1 AND post = 0 THEN n END)
                      AS DOUBLE))
                  - (CAST(MAX(CASE WHEN v = 0 AND post = 1 THEN sc END)
                      AS DOUBLE)
                    / CAST(MAX(CASE WHEN v = 0 AND post = 1 THEN n END)
                      AS DOUBLE)
                  - CAST(MAX(CASE WHEN v = 0 AND post = 0 THEN sc END)
                      AS DOUBLE)
                    / CAST(MAX(CASE WHEN v = 0 AND post = 0 THEN n END)
                      AS DOUBLE)), 6) AS did_cents
         FROM cells""",

    "q_agg_ratio_est" ->
      """WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
                    CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY 1),
            mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
                     SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                     SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
                   FROM per)
         SELECT n, sx, sy,
                round(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6)
                  AS ratio_cents_per_event,
                round((CAST(syy AS DOUBLE)
                    - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                      * CAST(sxy AS DOUBLE)
                    + (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                      * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                      * CAST(sxx AS DOUBLE))
                  * CAST(n AS DOUBLE)
                  / (CAST(n - 1 AS DOUBLE)
                    * CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                  AS var_ratio
         FROM mo""",

    "q_agg_chisq_gof" ->
      """WITH o AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS o
                    FROM events GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                      CAST(SUM(o) AS BIGINT) AS nn
                    FROM o),
            dev AS (SELECT o.o, tot.k, tot.nn,
                      CAST(o.o AS HUGEINT) * tot.k
                        - CAST(tot.nn AS HUGEINT) AS dev
                    FROM o, tot)
         SELECT MAX(k) AS k, MAX(nn) AS n_events,
                round(CAST(SUM(dev * dev) AS DOUBLE)
                  / CAST(CAST(MAX(k) AS HUGEINT)
                    * CAST(MAX(nn) AS HUGEINT) AS DOUBLE), 6)
                  AS chi2_gof
         FROM dev"""
  )
}
