package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 8: classical time-series decomposition and
  * spectral/graph distribution statistics — additive decomposition
  * (centered-MA trend, per-weekday seasonal indices, seasonality
  * strength), the day-of-week DFT amplitude spectrum, the degree
  * histogram, and the continuous-MLE power-law exponent.
  *
  * Determinism contract (SURVEY §2.13): the MA trend and seasonal
  * indices are exact micro-quantized integers (truncating div both
  * engines); variance folds widen to DECIMAL(38,0) before the first
  * multiply; DFT terms are rounded to exact integer cents per (k, t)
  * then integer-summed (the nano-quantization discipline — engine
  * libm differences vanish at the 1-cent quantum); π enters as
  * acos(-1) on BOTH engines (the same nearest double); every emitted
  * real is one shared IEEE chain.
  */
object Extras82 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Daily order revenue (exact cents) with 1-based index and the
    * engine-agnostic weekday (days since Monday 1990-01-01, mod 7). */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("dt")))
        .cast("long"))
      .withColumn("dow",
        pmod(datediff(col("dt"), lit("1990-01-01").cast("date")),
          lit(7)).cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CLASSICAL ADDITIVE DECOMPOSITION — trend = centered 7-day MA
    // (full windows only), detrended = y − trend, per-weekday seasonal
    // index = mean(detrended) (exact micro div), residual = detrended −
    // seasonal. Emits the 7 weekday rows plus the Hyndman seasonality
    // strength 1 − Var(resid)/Var(detrended) (variances from exact
    // DECIMAL(38,0) moment sums, one shared chain, repeated per row).
    "q_ts_decompose" -> ((s, d) => {
      val wMa = Window.orderBy(col("t")).rowsBetween(-3, 3)
      val detr = daily(s, d)
        .withColumn("nw", count(lit(1)).over(wMa))
        .withColumn("trend_micro",
          expr("(sum(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND"
            + " 3 FOLLOWING) * 1000000) div 7"))
        .where(col("nw") === 7)
        .select(col("dow"), (col("y") * 1000000L - col("trend_micro"))
          .as("detr"))
      val seas = detr.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("detr")).as("sd"))
        .select(col("dow"), col("n_days"),
          expr("sd div n_days").as("seasonal_micro"))
      val resid = detr.join(broadcast(seas), "dow")
        .select(col("detr"), (col("detr") - col("seasonal_micro"))
          .as("resid"))
      val mo = resid.agg(count(lit(1)).as("n"),
        sum(col("detr").cast(Big)).as("s_d"),
        sum(col("detr").cast(Big) * col("detr").cast(Big)).as("s_dd"),
        sum(col("resid").cast(Big)).as("s_r"),
        sum(col("resid").cast(Big) * col("resid").cast(Big)).as("s_rr"))
      seas.crossJoin(broadcast(mo))
        .select(col("dow"), col("n_days"), col("seasonal_micro"),
          r6(lit(1.0)
            - (col("n").cast(Big) * col("s_rr")
                - col("s_r") * col("s_r")).cast("double")
              / (col("n").cast(Big) * col("s_dd")
                - col("s_d") * col("s_d")).cast("double"))
            .as("seasonal_strength"))
        .orderBy("dow")
    }),

    // DOW DFT AMPLITUDE SPECTRUM — discrete Fourier amplitudes of
    // daily revenue at k = 1..8 cycles (weekly energy concentrates at
    // k ≈ n/7): per (k, t) the cos/sin terms round to EXACT integer
    // cents before summing (term magnitude ~y, so the 1-cent quantum
    // swallows any last-ulp libm disagreement); amplitude =
    // √(a² + b²)/n with the squares in DECIMAL(38,0). The (k, t)
    // relation is calendar-bounded (8·n rows).
    "q_ts_fourier" -> ((s, d) => {
      val n1 = daily(s, d).agg(max(col("t")).as("n"))
      val terms = daily(s, d).crossJoin(broadcast(n1))
        .select(col("t"), col("y"), col("n"),
          explode(sequence(lit(1), lit(8))).as("k"))
        .select(col("k"), col("n"),
          round(col("y").cast("double")
            * cos(expr("acos(-1D) * 2 * k * t") / col("n").cast("double")))
            .cast("long").as("ac"),
          round(col("y").cast("double")
            * sin(expr("acos(-1D) * 2 * k * t") / col("n").cast("double")))
            .cast("long").as("bc"))
      terms.groupBy(col("k"))
        .agg(max(col("n")).as("n_days"),
          sum(col("ac")).as("a_cents"), sum(col("bc")).as("b_cents"))
        .select(col("k").cast("long").as("k"), col("n_days"),
          col("a_cents"), col("b_cents"),
          r6(sqrt((col("a_cents").cast(Big) * col("a_cents").cast(Big)
              + col("b_cents").cast(Big) * col("b_cents").cast(Big))
            .cast("double")) / col("n_days").cast("double") / 100.0)
            .as("amp_usd"))
        .orderBy("k")
    }),

    // DEGREE DISTRIBUTION — the degree histogram of the shared
    // co-occurrence graph (the raw material under assortativity /
    // kcore / powerlaw): one edge agg, one bounded histogram agg.
    "q_graph_degree_dist" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d)
      val deg = und.select(col("a").as("u"))
        .unionByName(und.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("degree"))
      deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // POWER-LAW EXPONENT — continuous MLE α = 1 + n/Σ ln(d/(dmin−½))
    // over the degree tail d ≥ 2: per-node log terms NANO-quantized
    // then integer-summed; α is the one IEEE tail. The d_min = 2
    // threshold is part of the operator contract (stated, not fitted).
    "q_graph_powerlaw_alpha" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d)
      val deg = und.select(col("a").as("u"))
        .unionByName(und.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("degree"))
        .where(col("degree") >= 2)
      deg
        .select(col("degree"),
          round(log(col("degree").cast("double") / 1.5) * 1e9)
            .cast("long").as("term_nano"))
        .agg(count(lit(1)).as("n_tail"),
          max(col("degree")).as("d_max"),
          sum(col("term_nano")).as("sum_ln_nano"))
        .select(col("n_tail"), lit(2L).as("d_min"), col("d_max"),
          r6(lit(1.0) + col("n_tail").cast("double") * 1e9
            / col("sum_ln_nano").cast("double")).as("alpha"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_decompose" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
                     CAST((dt - DATE '1990-01-01') % 7 AS BIGINT) AS dow
                   FROM daily),
            ma AS (SELECT dow, y, t,
                     COUNT(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING
                       AND 3 FOLLOWING) AS nw,
                     (SUM(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING
                       AND 3 FOLLOWING) * 1000000) // 7 AS trend_micro
                   FROM dr),
            detr AS (SELECT dow, y * 1000000 - trend_micro AS detr
                     FROM ma WHERE nw = 7),
            seas AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
                       CAST(SUM(detr) AS BIGINT) // COUNT(*)
                         AS seasonal_micro
                     FROM detr GROUP BY 1),
            resid AS (SELECT d.detr,
                        d.detr - s.seasonal_micro AS resid
                      FROM detr d JOIN seas s ON s.dow = d.dow),
            mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                     SUM(CAST(detr AS HUGEINT)) AS s_d,
                     SUM(CAST(detr AS HUGEINT) * CAST(detr AS HUGEINT))
                       AS s_dd,
                     SUM(CAST(resid AS HUGEINT)) AS s_r,
                     SUM(CAST(resid AS HUGEINT) * CAST(resid AS HUGEINT))
                       AS s_rr
                   FROM resid)
         SELECT seas.dow, seas.n_days, seas.seasonal_micro,
                round(1.0
                  - CAST(mo.n * mo.s_rr - mo.s_r * mo.s_r AS DOUBLE)
                    / CAST(mo.n * mo.s_dd - mo.s_d * mo.s_d AS DOUBLE),
                  6) AS seasonal_strength
         FROM seas, mo ORDER BY dow""",

    "q_ts_fourier" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            nn AS (SELECT MAX(t) AS n FROM dr),
            terms AS (SELECT k.k, nn.n,
                        CAST(round(CAST(y AS DOUBLE)
                          * cos(acos(-1) * 2 * k.k * dr.t
                            / CAST(nn.n AS DOUBLE))) AS BIGINT) AS ac,
                        CAST(round(CAST(y AS DOUBLE)
                          * sin(acos(-1) * 2 * k.k * dr.t
                            / CAST(nn.n AS DOUBLE))) AS BIGINT) AS bc
                      FROM dr, nn,
                        (SELECT UNNEST(generate_series(1, 8)) AS k) k)
         SELECT CAST(k AS BIGINT) AS k, MAX(n) AS n_days,
                CAST(SUM(ac) AS BIGINT) AS a_cents,
                CAST(SUM(bc) AS BIGINT) AS b_cents,
                round(sqrt(CAST(
                    CAST(SUM(ac) AS HUGEINT) * CAST(SUM(ac) AS HUGEINT)
                    + CAST(SUM(bc) AS HUGEINT) * CAST(SUM(bc) AS HUGEINT)
                  AS DOUBLE)) / CAST(MAX(n) AS DOUBLE) / 100.0, 6)
                  AS amp_usd
         FROM terms GROUP BY k ORDER BY k""",

    "q_graph_degree_dist" ->
      s"""WITH ${Extras11.GraphSql},
            deg AS (SELECT src AS u, CAST(COUNT(*) AS BIGINT) AS degree
                    FROM e GROUP BY 1)
         SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY 1 ORDER BY 1""",

    "q_graph_powerlaw_alpha" ->
      s"""WITH ${Extras11.GraphSql},
            deg AS (SELECT src AS u, CAST(COUNT(*) AS BIGINT) AS degree
                    FROM e GROUP BY 1),
            tail AS (SELECT degree,
                       CAST(round(ln(CAST(degree AS DOUBLE) / 1.5) * 1e9)
                         AS BIGINT) AS term_nano
                     FROM deg WHERE degree >= 2)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                CAST(2 AS BIGINT) AS d_min,
                CAST(MAX(degree) AS BIGINT) AS d_max,
                round(1.0 + CAST(COUNT(*) AS DOUBLE) * 1e9
                  / CAST(SUM(term_nano) AS DOUBLE), 6) AS alpha
         FROM tail"""
  )
}
