package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 17: the two-sample / ordered-alternative
  * test battery — Welch's unequal-variance t with Satterthwaite df,
  * Mood's median test across the five order priorities,
  * Jonckheere-Terpstra against the priority ordering, and the
  * Ansari-Bradley scale test on returned-vs-kept quantities.
  *
  * Determinism contract (SURVEY §2.13): medians and ranks ride the
  * VALUE-LEVEL cumulative trick (windows over distinct values — the
  * q_agg_kruskal_wallis spine, never a fact-row sort); rank scores
  * stay doubled so tie-averages are integral; every statistic is one
  * fixed-shape IEEE chain over named exact scalars with
  * DECIMAL(38,0)/HUGEINT square headroom.
  */
object Extras91 {
  import Det._

  private val Big = DecimalType(38, 0)

  private val Priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** (g, x) order-priority cents rows. */
  private def rows(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"),
        (dec(col("o_totalprice")) * 100).cast("long").as("x"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WELCH'S T — URGENT vs LOW order totals: exact per-group
    // (n, Σx, Σx²); t = (m1−m2)/√(s1²/n1+s2²/n2) and the
    // Welch-Satterthwaite df in one scalar chain.
    "q_agg_welch_t" -> ((s, d) => {
      val a = rows(s, d)
        .where(col("g").isin("1-URGENT", "5-LOW"))
        .agg(
          sum((col("g") === "1-URGENT").cast("long")).as("n1"),
          sum(when(col("g") === "1-URGENT", col("x"))).as("s1"),
          sum(when(col("g") === "1-URGENT",
            col("x").cast(Big) * col("x").cast(Big))).as("ss1"),
          sum((col("g") === "5-LOW").cast("long")).as("n2"),
          sum(when(col("g") === "5-LOW", col("x"))).as("s2"),
          sum(when(col("g") === "5-LOW",
            col("x").cast(Big) * col("x").cast(Big))).as("ss2"))
      def m(i: Int) = col(s"s$i").cast("double") / col(s"n$i").cast("double")
      def v(i: Int) = (col(s"n$i").cast(Big) * col(s"ss$i")
        - col(s"s$i").cast(Big) * col(s"s$i").cast(Big)).cast("double") /
        (col(s"n$i").cast("double") * (col(s"n$i") - 1).cast("double"))
      def vn(i: Int) = v(i) / col(s"n$i").cast("double")
      val df = (vn(1) + vn(2)) * (vn(1) + vn(2)) /
        (vn(1) * vn(1) / (col("n1") - 1).cast("double")
          + vn(2) * vn(2) / (col("n2") - 1).cast("double"))
      a.select(col("n1"), col("n2"),
        r6((m(1) - m(2)) / sqrt(vn(1) + vn(2))).as("t_welch"),
        r6(df).as("df_satterthwaite"))
    }),

    // MOOD'S MEDIAN TEST — 2×5 contingency of above/at-or-below the
    // global median across priorities: the median comes off the
    // value-level cumulative spine; χ² = Σ(O−E)²/E over the ten cells
    // as a fixed-shape chain over the five pivoted group counts.
    "q_agg_moods_median" -> ((s, d) => {
      val vals = rows(s, d).groupBy(col("x")).agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = vals.agg(sum(col("t")).as("nn"))
      val med = vals.withColumn("cum", sum(col("t")).over(wv))
        .crossJoin(broadcast(tot))
        .where(col("cum") >= expr("(nn + 1) div 2"))
        .orderBy(col("x")).limit(1).select(col("x").as("med"))
      val cells = Priorities.zipWithIndex.flatMap { case (p, i) =>
        Seq(sum((col("g") === p && col("x") > col("med")).cast("long"))
            .as(s"a${i + 1}"),
          sum((col("g") === p).cast("long")).as(s"n${i + 1}"))
      }
      val piv = rows(s, d).crossJoin(broadcast(med))
        .agg(cells.head, cells.tail: _*)
      val bigN = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
      val bigA = col("a1") + col("a2") + col("a3") + col("a4") + col("a5")
      def term(i: Int): Column = {
        val ea = col(s"n$i").cast("double") * bigA.cast("double") /
          bigN.cast("double")
        val eb = col(s"n$i").cast("double") *
          (bigN - bigA).cast("double") / bigN.cast("double")
        ((col(s"a$i").cast("double") - ea) *
          (col(s"a$i").cast("double") - ea) / ea) +
          (((col(s"n$i") - col(s"a$i")).cast("double") - eb) *
            ((col(s"n$i") - col(s"a$i")).cast("double") - eb) / eb)
      }
      piv.select(bigN.as("n_total"), bigA.as("n_above"),
        r6(term(1) + term(2) + term(3) + term(4) + term(5))
          .as("moods_chi2"))
    }),

    // JONCKHEERE-TERPSTRA — ordered alternative across the priority
    // order: doubled 2·JT = Σ_v Σ_{j<k} t_j(v)·(2·below_k(v)+t_k(v))
    // folds per-group value counts and cumulative below-counts on one
    // value-spine pass; z uses the tie-free mean/variance (documented
    // approximation under ties).
    "q_agg_jonckheere" -> ((s, d) => {
      val conds = Priorities.zipWithIndex.map { case (p, i) =>
        sum((col("g") === p).cast("long")).as(s"t${i + 1}")
      }
      val vals = rows(s, d).groupBy(col("x")).agg(conds.head, conds.tail: _*)
      val wv = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      var v = vals
      for (i <- 1 to 5)
        v = v.withColumn(s"b$i",
          sum(col(s"t$i")).over(wv) - col(s"t$i"))
      val contrib = (for (j <- 1 to 5; k <- j + 1 to 5) yield
        col(s"t$j") * (col(s"b$k") * 2 + col(s"t$k")))
        .reduce(_ + _)
      val aggs = (1 to 5).map(i => sum(col(s"t$i")).as(s"n$i")) :+
        sum(contrib).as("jt2")
      val a = v.agg(aggs.head, aggs.tail: _*)
      val bigN = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
      def sq(c: Column) = c.cast(Big) * c.cast(Big)
      val sumN2 = (1 to 5).map(i => sq(col(s"n$i"))).reduce(_ + _)
      val mean2 = (sq(bigN) - sumN2).cast("double") / 2
      val varr = ((sq(bigN) * (bigN.cast(Big) * 2 + 3)).cast("double")
        - (1 to 5).map(i =>
          (sq(col(s"n$i")) * (col(s"n$i").cast(Big) * 2 + 3))
            .cast("double")).reduce(_ + _)) / 72
      a.select(bigN.as("n_total"), col("jt2"),
        r6((col("jt2").cast("double") - mean2) / 2 / sqrt(varr))
          .as("z_stat"))
    }),

    // ANSARI-BRADLEY — scale difference between returned (R) and
    // kept (N) lineitem quantities: doubled end-ranks
    // s2 = min(r2, 2(N+1)−r2) off the value spine; AB2 = Σ t_R·s2 is
    // twice the AB statistic; z uses the tie-free even-N/odd-N
    // mean/variance picked by a shared parity CASE.
    "q_agg_ansari_bradley" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("x"))
      val vals = base.groupBy(col("x"))
        .agg(count(lit(1)).as("t"),
          sum((col("g") === "R").cast("long")).as("tr"))
      val wv = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val a = vals
        .withColumn("cum", sum(col("t")).over(wv))
        .withColumn("r2", lit(2L) * (col("cum") - col("t")) + col("t") + 1L)
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nn"),
          sum((col("g") === "R").cast("long")).as("m"))))
        .withColumn("s2",
          least(col("r2"), (col("nn") + 1) * 2 - col("r2")))
        .agg(max(col("nn")).as("nn"), max(col("m")).as("m"),
          sum(col("tr") * col("s2")).as("ab2"))
      val nD = col("nn").cast("double")
      val mD = col("m").cast("double")
      val even = pmod(col("nn"), lit(2L)) === 0
      val mean2 = when(even, mD * (nD + 2) / 2)
        .otherwise(mD * (nD + 1) * (nD + 1) / (nD * 2))
      a.select(col("nn").as("n_total"), col("m").as("n_returned"),
        col("ab2"),
        r6((col("ab2").cast("double") - mean2 * 2) / 2
          / sqrt(when(even,
            mD * (nD - mD) * (nD + 2) * (nD - 2)
              / (lit(48.0) * (nD - 1)))
            .otherwise(mD * (nD - mD) * (nD + 1)
              * (lit(3.0) + nD * nD)
              / (lit(48.0) * nD * nD)))).as("z_stat"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_welch_t" ->
      """WITH r AS (SELECT o_orderpriority AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS x
                 FROM orders
                 WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
            a AS (SELECT
                    CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                    CAST(SUM(CASE WHEN g = '1-URGENT' THEN x END)
                      AS BIGINT) AS s1,
                    SUM(CASE WHEN g = '1-URGENT' THEN
                      CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END) AS ss1,
                    CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN g = '5-LOW' THEN x END)
                      AS BIGINT) AS s2,
                    SUM(CASE WHEN g = '5-LOW' THEN
                      CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END) AS ss2
                  FROM r),
            e AS (SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                    CAST(CAST(n1 AS HUGEINT) * ss1
                        - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                      AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
                      / CAST(n1 AS DOUBLE) AS vn1,
                    CAST(CAST(n2 AS HUGEINT) * ss2
                        - CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT)
                      AS DOUBLE)
                      / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
                      / CAST(n2 AS DOUBLE) AS vn2
                  FROM a)
         SELECT n1, n2,
                round((m1 - m2) / sqrt(vn1 + vn2), 6) AS t_welch,
                round((vn1 + vn2) * (vn1 + vn2)
                  / (vn1 * vn1 / CAST(n1 - 1 AS DOUBLE)
                    + vn2 * vn2 / CAST(n2 - 1 AS DOUBLE)), 6)
                  AS df_satterthwaite
         FROM e""",

    "q_agg_moods_median" -> {
      val cells = Priorities.zipWithIndex.map { case (p, i) =>
        s"""CAST(SUM(CASE WHEN g = '$p' AND x > med THEN 1 ELSE 0 END)
              AS BIGINT) AS a${i + 1},
            CAST(SUM(CASE WHEN g = '$p' THEN 1 ELSE 0 END)
              AS BIGINT) AS n${i + 1}"""
      }.mkString(", ")
      def term(i: Int) =
        s"""(CAST(a$i AS DOUBLE) - CAST(n$i AS DOUBLE)
              * CAST(a1 + a2 + a3 + a4 + a5 AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))
            * (CAST(a$i AS DOUBLE) - CAST(n$i AS DOUBLE)
              * CAST(a1 + a2 + a3 + a4 + a5 AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))
            / (CAST(n$i AS DOUBLE)
              * CAST(a1 + a2 + a3 + a4 + a5 AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))
          + (CAST(n$i - a$i AS DOUBLE) - CAST(n$i AS DOUBLE)
              * CAST((n1 + n2 + n3 + n4 + n5)
                - (a1 + a2 + a3 + a4 + a5) AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))
            * (CAST(n$i - a$i AS DOUBLE) - CAST(n$i AS DOUBLE)
              * CAST((n1 + n2 + n3 + n4 + n5)
                - (a1 + a2 + a3 + a4 + a5) AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))
            / (CAST(n$i AS DOUBLE)
              * CAST((n1 + n2 + n3 + n4 + n5)
                - (a1 + a2 + a3 + a4 + a5) AS DOUBLE)
              / CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE))"""
      s"""WITH r AS (SELECT o_orderpriority AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS x
                 FROM orders),
            vals AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t
                     FROM r GROUP BY 1),
            tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn FROM vals),
            med AS (SELECT x AS med FROM
                      (SELECT x, SUM(t) OVER (ORDER BY x ROWS BETWEEN
                         UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                       FROM vals), tot
                    WHERE cum >= (nn + 1) // 2
                    ORDER BY x LIMIT 1),
            piv AS (SELECT $cells FROM r, med)
         SELECT CAST(n1 + n2 + n3 + n4 + n5 AS BIGINT) AS n_total,
                CAST(a1 + a2 + a3 + a4 + a5 AS BIGINT) AS n_above,
                round(${(1 to 5).map(term).mkString(" + ")}, 6)
                  AS moods_chi2
         FROM piv"""
    },

    "q_agg_jonckheere" -> {
      val tcols = Priorities.zipWithIndex.map { case (p, i) =>
        s"""CAST(SUM(CASE WHEN g = '$p' THEN 1 ELSE 0 END) AS BIGINT)
            AS t${i + 1}"""
      }.mkString(", ")
      val bcols = (1 to 5).map(i =>
        s"""SUM(t$i) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) - t$i AS b$i""").mkString(", ")
      val contrib = (for (j <- 1 to 5; k <- j + 1 to 5) yield
        s"t$j * (b$k * 2 + t$k)").mkString(" + ")
      val sumN2 = (1 to 5).map(i =>
        s"CAST(n$i AS HUGEINT) * CAST(n$i AS HUGEINT)").mkString(" + ")
      val sumVar = (1 to 5).map(i =>
        s"""CAST(CAST(n$i AS HUGEINT) * CAST(n$i AS HUGEINT)
             * (CAST(n$i AS HUGEINT) * 2 + 3) AS DOUBLE)""")
        .mkString(" + ")
      s"""WITH r AS (SELECT o_orderpriority AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS x
                 FROM orders),
            vals AS (SELECT x, $tcols FROM r GROUP BY 1),
            cums AS (SELECT x, t1, t2, t3, t4, t5, $bcols FROM vals),
            a AS (SELECT CAST(SUM(t1) AS BIGINT) AS n1,
                    CAST(SUM(t2) AS BIGINT) AS n2,
                    CAST(SUM(t3) AS BIGINT) AS n3,
                    CAST(SUM(t4) AS BIGINT) AS n4,
                    CAST(SUM(t5) AS BIGINT) AS n5,
                    CAST(SUM($contrib) AS BIGINT) AS jt2
                  FROM cums),
            e AS (SELECT n1 + n2 + n3 + n4 + n5 AS nn, jt2,
                    n1, n2, n3, n4, n5 FROM a)
         SELECT CAST(nn AS BIGINT) AS n_total, jt2,
                round((CAST(jt2 AS DOUBLE)
                    - CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)
                        - ($sumN2) AS DOUBLE) / 2) / 2
                  / sqrt((CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)
                        * (CAST(nn AS HUGEINT) * 2 + 3) AS DOUBLE)
                      - ($sumVar)) / 72), 6) AS z_stat
         FROM e"""
    },

    "q_agg_ansari_bradley" ->
      """WITH base AS (SELECT l_returnflag AS g,
                    CAST(l_quantity AS BIGINT) AS x
                 FROM lineitem WHERE l_returnflag IN ('R', 'N')),
            vals AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t,
                       CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
                         AS BIGINT) AS tr
                     FROM base GROUP BY 1),
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                    CAST(SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
                      AS BIGINT) AS m
                  FROM base),
            sc AS (SELECT tr,
                     least(2 * (cum - t) + t + 1,
                       (nn + 1) * 2 - (2 * (cum - t) + t + 1)) AS s2,
                     nn, m
                   FROM (SELECT x, t, tr,
                           SUM(t) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum
                         FROM vals), g),
            a AS (SELECT MAX(nn) AS nn, MAX(m) AS m,
                    CAST(SUM(tr * s2) AS BIGINT) AS ab2 FROM sc)
         SELECT nn AS n_total, m AS n_returned, ab2,
                round((CAST(ab2 AS DOUBLE)
                    - (CASE WHEN nn % 2 = 0
                       THEN CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 2) / 2
                       ELSE CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1)
                         * (CAST(nn AS DOUBLE) + 1)
                         / (CAST(nn AS DOUBLE) * 2) END) * 2) / 2
                  / sqrt(CASE WHEN nn % 2 = 0
                     THEN CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE)
                         - CAST(m AS DOUBLE)) * (CAST(nn AS DOUBLE) + 2)
                         * (CAST(nn AS DOUBLE) - 2)
                       / (48.0 * (CAST(nn AS DOUBLE) - 1))
                     ELSE CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE)
                         - CAST(m AS DOUBLE)) * (CAST(nn AS DOUBLE) + 1)
                         * (3.0 + CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
                       / (48.0 * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
                     END), 6) AS z_stat
         FROM a"""
  )
}
