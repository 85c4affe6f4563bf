package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 1: normality and effect-size tests —
  * Jarque-Bera, Cohen's d, and the Brown-Forsythe (median-based Levene)
  * homogeneity-of-variance test.
  *
  * Determinism contract (SURVEY §2.13): every statistic folds exact
  * DECIMAL/BIGINT power sums distributed (order-free), pivots the
  * bounded group relation to ONE row (the q_agg_anova idiom — a 5-row
  * IEEE sum would be merge-order-dependent), and computes the final
  * statistic as one shared IEEE expression tree.
  */
object Extras63 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JARQUE-BERA — normality of the order-value distribution from
    // exact moment sums: JB = n/6·(S² + K²/4) with S the sample skew
    // and K the EXCESS kurtosis. Values are whole dollars (exact floor
    // of the 2-dp decimal) so the 4th-power DECIMAL(38,0) sum keeps
    // ~14 digits of headroom at SF100. One distributed agg, no shuffle
    // beyond the partial-merge; the statistic is a scalar IEEE tail.
    "q_agg_jarque_bera" -> ((s, d) => {
      val v = floor(dec(col("o_totalprice"))).cast("long")
      val big = DecimalType(38, 0)
      // power products fold in DECIMAL(38,0) FROM THE FIRST multiply —
      // v⁴ ≈ 9e22 for a 550k order and overflows BIGINT per-row
      val vd = v.cast(big)
      Tables.orders(s, d)
        .agg(count(lit(1)).as("n"),
          sum(vd).as("s1"),
          sum(vd * vd).as("s2"),
          sum(vd * vd * vd).as("s3"),
          sum(vd * vd * vd * vd).as("s4"))
        .select(col("n"),
          col("s1").cast("double").as("m1"),
          col("s2").cast("double").as("m2"),
          col("s3").cast("double").as("m3"),
          col("s4").cast("double").as("m4"))
        .withColumn("nn", col("n").cast("double"))
        .withColumn("mean", col("m1") / col("nn"))
        .withColumn("ex2", col("m2") / col("nn"))
        .withColumn("ex3", col("m3") / col("nn"))
        .withColumn("va", col("ex2") - col("mean") * col("mean"))
        // skew/kurt are ROUNDED FIRST and JB folds the rounded values —
        // the same order of operations the oracle states, so the one
        // rounding boundary is shared, not duplicated-and-divergent.
        .withColumn("skew",
          r6((col("ex3") - lit(3.0) * col("mean") * col("ex2")
            + lit(2.0) * col("mean") * col("mean") * col("mean"))
            / (col("va") * sqrt(col("va")))))
        .withColumn("ex_kurt",
          r6((col("m4") / col("nn") - lit(4.0) * col("mean") * col("ex3")
            + lit(6.0) * col("mean") * col("mean") * col("ex2")
            - lit(3.0) * col("mean") * col("mean") * col("mean")
              * col("mean"))
            / (col("va") * col("va")) - lit(3.0)))
        .select(col("n"), col("skew"), col("ex_kurt"),
          r6(col("nn") / lit(6.0) * (col("skew") * col("skew")
            + col("ex_kurt") * col("ex_kurt") / lit(4.0))).as("jb"))
    }),

    // COHEN'S D — standardized mean difference of order value, URGENT
    // vs non-urgent priority, with the pooled sample SD. Exact cents
    // sums per group (DECIMAL(38,0) for the squares), pivoted to one
    // row; d is the single IEEE chain over them.
    "q_agg_cohens_d" -> ((s, d) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("long")
      val big = DecimalType(38, 0)
      val m = Tables.orders(s, d)
        .select((col("o_orderpriority") === "1-URGENT").as("g"),
          cents.as("v"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(big)).as("s1"),
          sum((col("v") * col("v")).cast(big)).as("s2"))
      def side(u: Boolean, c: String) = max(when(col("g") === u, col(c)))
      val p = m.agg(
        side(true, "n").as("n1"),
        side(true, "s1").cast("double").as("s11"),
        side(true, "s2").cast("double").as("s21"),
        side(false, "n").as("n2"),
        side(false, "s1").cast("double").as("s12"),
        side(false, "s2").cast("double").as("s22"))
      def nD(c: String) = col(c).cast("double")
      val m1 = col("s11") / nD("n1")
      val m2 = col("s12") / nD("n2")
      val v1 = (col("s21") - col("s11") * col("s11") / nD("n1")) /
        (nD("n1") - lit(1.0))
      val v2 = (col("s22") - col("s12") * col("s12") / nD("n2")) /
        (nD("n2") - lit(1.0))
      val pooled = ((nD("n1") - lit(1.0)) * v1
        + (nD("n2") - lit(1.0)) * v2) / (nD("n1") + nD("n2") - lit(2.0))
      p.select(col("n1"), col("n2"),
        r6((m1 - m2) / lit(100.0)).as("mean_diff_usd"),
        r6((m1 - m2) / sqrt(pooled)).as("cohens_d"))
    }),

    // BROWN-FORSYTHE (median-based Levene) — equality of order-value
    // spread across the five priority classes. Per-group LOWER MEDIAN
    // is the exact cents value at ordered position (n+1) div 2 (an
    // integer — never an interpolated IEEE midpoint), deviations
    // |x − med| are exact ints, and the one-way F over them folds
    // exact sums pivoted to one row (the q_agg_anova idiom; the
    // per-group sort is the accepted order-statistic budget, sharded
    // by the 5 priority partitions).
    "q_agg_levene" -> ((s, d) => {
      val cents = (dec(col("o_totalprice")) * 100).cast("long")
      val big = DecimalType(38, 0)
      val base = Tables.orders(s, d)
        .select(substring(col("o_orderpriority"), 1, 1).as("g"),
          cents.as("v"))
      val wOrd = Window.partitionBy(col("g")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("g"))
      val dev = base
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("ng", count(lit(1)).over(wAll))
        .withColumn("med", max(when(
          col("rn") === expr("(ng + 1) div 2"), col("v"))).over(wAll))
        .select(col("g"), abs(col("v") - col("med")).as("z"))
      val m = dev.groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("z").cast(big)).as("s1"),
          sum((col("z") * col("z")).cast(big)).as("s2"))
      def side(k: String, c: String) = max(when(col("g") === k, col(c)))
      val pivots =
        for { k <- Seq("1", "2", "3", "4", "5"); c <- Seq("n", "s1", "s2") }
          yield (if (c == "n") side(k, c) else side(k, c).cast("double"))
            .as(s"$c$k")
      val p = m.agg(pivots.head, pivots.tail: _*)
      def nD(k: String) = col(s"n$k").cast("double")
      val bg = Seq("1", "2", "3", "4", "5")
        .map(k => col(s"s1$k") * col(s"s1$k") / nD(k))
        .reduce(_ + _)
      val s1t = Seq("1", "2", "3", "4", "5").map(k => col(s"s1$k"))
        .reduce(_ + _)
      val s2t = Seq("1", "2", "3", "4", "5").map(k => col(s"s2$k"))
        .reduce(_ + _)
      val nT = Seq("1", "2", "3", "4", "5").map(nD).reduce(_ + _)
      val ssb = bg - s1t * s1t / nT
      val ssw = s2t - bg
      p.select(col("n1"), col("n2"), col("n3"), col("n4"), col("n5"),
        r6((ssb / lit(4.0)) / (ssw / (nT - lit(5.0)))).as("f_bf"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_jarque_bera" ->
      """WITH a AS (
           SELECT COUNT(*) AS n,
                  CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE) AS m1,
                  CAST(SUM(CAST(v AS HUGEINT)*v) AS DOUBLE) AS m2,
                  CAST(SUM(CAST(v AS HUGEINT)*v*v) AS DOUBLE) AS m3,
                  CAST(SUM(CAST(v AS HUGEINT)*v*v*v) AS DOUBLE) AS m4
           FROM (SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS BIGINT) AS v FROM orders)),
          b AS (
           SELECT n, CAST(n AS DOUBLE) AS nn,
                  m1 / n AS mean, m2 / n AS ex2, m3 / n AS ex3, m4,
                  m2 / n - (m1/n)*(m1/n) AS va
           FROM a),
          c AS (
           SELECT n, nn,
                  round((ex3 - 3.0*mean*ex2 + 2.0*mean*mean*mean)
                    / (va * sqrt(va)), 6) AS skew,
                  round((m4/nn - 4.0*mean*ex3 + 6.0*mean*mean*ex2
                    - 3.0*mean*mean*mean*mean) / (va*va) - 3.0, 6)
                    AS ex_kurt
           FROM b)
         SELECT n, skew, ex_kurt,
                round(nn / 6.0 * (skew*skew + ex_kurt*ex_kurt/4.0), 6)
                  AS jb
         FROM c""",

    "q_agg_cohens_d" ->
      """WITH m AS (
           SELECT (o_orderpriority = '1-URGENT') AS g, COUNT(*) AS n,
                  CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(v*v AS DECIMAL(38,0))) AS DOUBLE) AS s2
           FROM (SELECT o_orderpriority,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS v FROM orders)
           GROUP BY 1),
          p AS (
           SELECT MAX(CASE WHEN g THEN n END) AS n1,
                  MAX(CASE WHEN g THEN s1 END) AS s11,
                  MAX(CASE WHEN g THEN s2 END) AS s21,
                  MAX(CASE WHEN NOT g THEN n END) AS n2,
                  MAX(CASE WHEN NOT g THEN s1 END) AS s12,
                  MAX(CASE WHEN NOT g THEN s2 END) AS s22
           FROM m)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                round((s11/n1 - s12/n2) / 100.0, 6) AS mean_diff_usd,
                round((s11/n1 - s12/n2)
                  / sqrt(((n1-1.0) * ((s21 - s11*s11/n1) / (n1-1.0))
                        + (n2-1.0) * ((s22 - s12*s12/n2) / (n2-1.0)))
                      / (n1 + n2 - 2.0)), 6) AS cohens_d
         FROM p""",

    "q_agg_levene" ->
      """WITH base AS (
           SELECT substr(o_orderpriority, 1, 1) AS g,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS v
           FROM orders),
          med AS (
           SELECT g, v,
                  row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                  COUNT(*) OVER (PARTITION BY g) AS ng
           FROM base),
          medv AS (
           SELECT g, MAX(CASE WHEN rn = (ng + 1) // 2 THEN v END) AS med
           FROM med GROUP BY g),
          dev AS (
           SELECT base.g, abs(base.v - medv.med) AS z
           FROM base JOIN medv ON base.g = medv.g),
          m AS (
           SELECT g, COUNT(*) AS n,
                  CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(z*z AS DECIMAL(38,0))) AS DOUBLE) AS s2
           FROM dev GROUP BY g),
          p AS (
           SELECT MAX(CASE WHEN g='1' THEN n END) AS n1,
                  MAX(CASE WHEN g='1' THEN s1 END) AS s11,
                  MAX(CASE WHEN g='1' THEN s2 END) AS s21,
                  MAX(CASE WHEN g='2' THEN n END) AS n2,
                  MAX(CASE WHEN g='2' THEN s1 END) AS s12,
                  MAX(CASE WHEN g='2' THEN s2 END) AS s22,
                  MAX(CASE WHEN g='3' THEN n END) AS n3,
                  MAX(CASE WHEN g='3' THEN s1 END) AS s13,
                  MAX(CASE WHEN g='3' THEN s2 END) AS s23,
                  MAX(CASE WHEN g='4' THEN n END) AS n4,
                  MAX(CASE WHEN g='4' THEN s1 END) AS s14,
                  MAX(CASE WHEN g='4' THEN s2 END) AS s24,
                  MAX(CASE WHEN g='5' THEN n END) AS n5,
                  MAX(CASE WHEN g='5' THEN s1 END) AS s15,
                  MAX(CASE WHEN g='5' THEN s2 END) AS s25
           FROM m)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CAST(n3 AS BIGINT) AS n3, CAST(n4 AS BIGINT) AS n4,
                CAST(n5 AS BIGINT) AS n5,
                round(
                  (((s11*s11/n1 + s12*s12/n2 + s13*s13/n3 + s14*s14/n4
                     + s15*s15/n5)
                    - (s11+s12+s13+s14+s15)*(s11+s12+s13+s14+s15)
                      / (n1+n2+n3+n4+n5)) / 4.0)
                  / (((s21+s22+s23+s24+s25)
                      - (s11*s11/n1 + s12*s12/n2 + s13*s13/n3
                         + s14*s14/n4 + s15*s15/n5))
                     / (n1+n2+n3+n4+n5 - 5.0)), 6) AS f_bf
         FROM p"""
  )
}
