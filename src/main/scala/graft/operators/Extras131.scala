package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 57: TOST equivalence testing (two
  * one-sided Welch t statistics against a ±$20,000 margin — the
  * "prove they're the SAME" inversion of q_agg_ttest), Yule-Walker
  * AR(2) coefficients from exact autocorrelations (the parametric
  * reading of q_ts_acf), and the post-hoc minimum detectable effect
  * for a two-arm conversion experiment at 80% power / 5% α (fixed
  * z constants — the experiment-sizing number every A/B readout
  * quotes beside q_evt_ab_test).
  *
  * Scale shape: all three fold exact moment sets — TOST per group,
  * AR2 over the calendar-day lag self-joins (equi on t+k), MDE at
  * user grain.
  *
  * Determinism contract (SURVEY §2.13): TOST folds exact
  * DECIMAL(38,0) moments into one shared Welch chain; the
  * equivalence flag compares the same IEEE t values on both engines
  * (the q_agg_by_fdr gate precedent). AR2 autocorrelation numerators
  * fold (n·y_t − S)(n·y_{t+k} − S) exactly in DECIMAL(38,0) — the
  * mean never becomes a float before the final divisions. MDE uses
  * the fixed literals z_{0.975} = 1.959964, z_{0.8} = 0.841621
  * (stated constants, not computed quantiles).
  */
object Extras131 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TOST — are URGENT and LOW mean order totals equivalent within
    // ±$20,000? (the observed mean gap is ~$8k at every SF) Both one-sided Welch t's must clear +1.645.
    "q_agg_tost" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .where(substring(col("o_orderpriority"), 1, 1).isin("1", "5"))
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"), sum(col("y")).as("sj"),
          sum(col("y").cast(Big) * col("y").cast(Big)).as("ssj"))
      val a = per.where(col("g") === "1")
        .select(col("nj").as("n1"), col("sj").as("s1"),
          col("ssj").as("ss1"))
      val b = per.where(col("g") === "5")
        .select(col("nj").as("n2"), col("sj").as("s2"),
          col("ssj").as("ss2"))
      def v(n: org.apache.spark.sql.Column,
            sm: org.apache.spark.sql.Column,
            ss: org.apache.spark.sql.Column) =
        (n.cast("double") * ss.cast("double")
          - sm.cast("double") * sm.cast("double")) /
          (n.cast("double") * (n.cast("double") - 1))
      val j = a.crossJoin(broadcast(b))
      val diff = col("s1").cast("double") / col("n1").cast("double") -
        col("s2").cast("double") / col("n2").cast("double")
      val se = sqrt(
        v(col("n1"), col("s1"), col("ss1")) / col("n1").cast("double")
          + v(col("n2"), col("s2"), col("ss2"))
            / col("n2").cast("double"))
      val margin = lit(2000000.0) // $20,000 in cents
      val tLo = (diff + margin) / se
      val tHi = (margin - diff) / se
      j.select(col("n1"), col("n2"),
        r6(diff / lit(100.0)).as("diff_dollars"),
        r6(tLo).as("t_lower"), r6(tHi).as("t_upper"),
        (tLo > 1.645 && tHi > 1.645).cast("int").as("equivalent"))
    }),

    // YULE-WALKER AR(2) — from exact lag-1/lag-2 autocorrelations of
    // daily revenue: φ1 = r1(1−r2)/(1−r1²), φ2 = (r2−r1²)/(1−r1²).
    "q_ts_ar2_yw" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", row_number().over(Window.orderBy(col("dt")))
          .cast("long"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sY"))
      val cent = daily.crossJoin(broadcast(tot))
        .select(col("t"),
          (col("y").cast(Big) * col("n").cast(Big)
            - col("sY").cast(Big)).as("c"))
      def num(k: Int) = cent.as("a")
        .join(cent.select(col("t").as("t2"), col("c").as("c2")),
          col("t") + k === col("t2"))
        .agg(sum(col("c") * col("c2")).as(s"num$k"))
      val den = cent.agg(sum(col("c") * col("c")).as("den"),
        count(lit(1)).as("n_days"))
      val r1 = col("num1").cast("double") / col("den").cast("double")
      val r2 = col("num2").cast("double") / col("den").cast("double")
      den.crossJoin(broadcast(num(1))).crossJoin(broadcast(num(2)))
        .select(col("n_days"), r6(r1).as("r1"), r6(r2).as("r2"),
          r6(r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1)).as("phi1"),
          r6((r2 - r1 * r1) / (lit(1.0) - r1 * r1)).as("phi2"))
    }),

    // POST-HOC MDE — two-arm conversion experiment over the event
    // user base (conversion = purchase within 3 days of first
    // activity — the non-saturated definition) at α = 0.05
    // (two-sided), power = 0.8.
    "q_evt_power_mde" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(tsUs(col("ts"))).as("t0"),
          min(when(col("event_type") === "purchase", tsUs(col("ts"))))
            .as("tp"))
        .select((col("tp").isNotNull &&
          col("tp") <= col("t0") + lit(259200000000L)).cast("long")
          .as("conv"))
      val a = per.agg(count(lit(1)).as("n_users"),
        sum(col("conv")).as("n_conv"))
      val p = col("n_conv").cast("double") / col("n_users").cast("double")
      val nArm = col("n_users").cast("double") / lit(2.0)
      val mde = (lit(1.959964) + lit(0.841621)) *
        sqrt(lit(2.0) * p * (lit(1.0) - p) / nArm)
      a.select(col("n_users"), col("n_conv"),
        r6(p).as("conv_rate"),
        r6(mde).as("mde_abs"),
        r6(mde / p).as("mde_rel"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_tost" ->
      """WITH per AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                    CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sj,
                    CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)
                         * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * 100 AS BIGINT) AS HUGEINT)) AS HUGEINT) AS ssj
                 FROM orders
                 WHERE substr(o_orderpriority, 1, 1) IN ('1', '5')
                 GROUP BY 1),
            a AS (SELECT nj AS n1, sj AS s1, ssj AS ss1 FROM per
                  WHERE g = '1'),
            b AS (SELECT nj AS n2, sj AS s2, ssj AS ss2 FROM per
                  WHERE g = '5'),
            f AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS diff,
                    sqrt(
                      ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1)))
                        / CAST(n1 AS DOUBLE)
                      + ((CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
                        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                        / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1)))
                        / CAST(n2 AS DOUBLE)) AS se
                  FROM a, b)
         SELECT n1, n2, round(diff / 100.0, 6) AS diff_dollars,
                round((diff + 2000000.0) / se, 6) AS t_lower,
                round((2000000.0 - diff) / se, 6) AS t_upper,
                CAST(CASE WHEN (diff + 2000000.0) / se > 1.645
                       AND (2000000.0 - diff) / se > 1.645
                     THEN 1 ELSE 0 END AS INT) AS equivalent
         FROM f""",

    "q_ts_ar2_yw" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                    CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                  FROM daily),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sY FROM idx),
            cent AS (SELECT t,
                    CAST(y AS HUGEINT) * CAST(n AS HUGEINT)
                      - CAST(sY AS HUGEINT) AS c
                  FROM idx, tot),
            n1 AS (SELECT CAST(SUM(a.c * b.c) AS HUGEINT) AS num1
                   FROM cent a JOIN cent b ON a.t + 1 = b.t),
            n2 AS (SELECT CAST(SUM(a.c * b.c) AS HUGEINT) AS num2
                   FROM cent a JOIN cent b ON a.t + 2 = b.t),
            dn AS (SELECT CAST(SUM(c * c) AS HUGEINT) AS den,
                    CAST(COUNT(*) AS BIGINT) AS n_days FROM cent),
            f AS (SELECT n_days,
                    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
                    CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2
                  FROM dn, n1, n2)
         SELECT n_days, round(r1, 6) AS r1, round(r2, 6) AS r2,
                round(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1,
                round((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2
         FROM f""",

    "q_evt_power_mde" ->
      """WITH pu AS (SELECT user_id,
                    MIN(epoch_us(ts::TIMESTAMP)) AS t0,
                    MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts::TIMESTAMP) END) AS tp
                 FROM events GROUP BY 1),
            per AS (SELECT CAST(CASE WHEN tp IS NOT NULL
                      AND tp <= t0 + 259200000000
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
                  FROM pu),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                    CAST(SUM(conv) AS BIGINT) AS n_conv FROM per),
            f AS (SELECT n_users, n_conv,
                    CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                      AS p,
                    CAST(n_users AS DOUBLE) / 2.0 AS n_arm
                  FROM a)
         SELECT n_users, n_conv, round(p, 6) AS conv_rate,
                round((1.959964 + 0.841621)
                  * sqrt(2.0 * p * (1.0 - p) / n_arm), 6) AS mde_abs,
                round((1.959964 + 0.841621)
                  * sqrt(2.0 * p * (1.0 - p) / n_arm) / p, 6)
                  AS mde_rel
         FROM f"""
  )
}
