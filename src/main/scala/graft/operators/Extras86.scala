package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 12: the classical nonparametric /
  * contingency test battery — tie-corrected Kruskal-Wallis and
  * Bartlett's variance-homogeneity across the five order priorities,
  * McNemar's paired-binary test on early/late user activity,
  * Benjamini-Hochberg FDR selection over per-type z statistics, and
  * Cohen's kappa between two binary user raters.
  *
  * Determinism contract (SURVEY §2.13): rank sums ride DOUBLED ranks
  * (2·below + t + 1) so tie-averaged ranks stay integral; every
  * per-group moment is an exact integer pivoted into ONE row, so each
  * statistic is a single fixed-shape IEEE expression over named
  * scalars (never a cross-row double sum); squares take the
  * DECIMAL(38,0)/HUGEINT route before multiplying.
  */
object Extras86 {
  import Det._

  private val Big = DecimalType(38, 0)

  private val Priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Per-priority exact moments (n_j, Σx, Σx², rank sums) pivoted to
    * one row: n1..n5 plus the chosen per-group column under c1..c5. */
  private def pivot5(perGroup: DataFrame, valueCol: String): DataFrame = {
    val aggs = Priorities.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        max(when(col("g") === p, col("nj"))).as(s"n${i + 1}"),
        max(when(col("g") === p, col(valueCol))).as(s"c${i + 1}"))
    }
    perGroup.agg(aggs.head, aggs.tail: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KRUSKAL-WALLIS H — rank ANOVA across the five order priorities
    // with the exact tie correction. Ranks are value-level (distinct
    // cents → doubled average rank r2 = 2·below + t + 1); per-group
    // doubled rank sums S2_j and the tie sum Σ(t³−t) are exact
    // integers; H = [12·Σ R_j²/n_j / (N(N+1)) − 3(N+1)] / C over the
    // five pivoted scalars in one fixed-shape chain.
    "q_agg_kruskal_wallis" -> ((s, d) => {
      val rows = Tables.orders(s, d)
        .select(col("o_orderpriority").as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("x"))
      val vals = rows.groupBy(col("x")).agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = vals
        .withColumn("cum", sum(col("t")).over(wv))
        .withColumn("r2",
          lit(2L) * (col("cum") - col("t")) + col("t") + 1L)
      val byG = rows.groupBy(col("g"), col("x"))
        .agg(count(lit(1)).as("tj"))
        .join(ranked.select(col("x"), col("r2")), Seq("x"))
        .groupBy(col("g"))
        .agg(sum(col("tj")).as("nj"),
          sum(col("tj") * col("r2")).as("s2j"))
      val ties = vals.agg(
        sum(col("t")).as("nn"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      def term(i: Int): Column =
        (col(s"c$i").cast(Big) * col(s"c$i").cast(Big)).cast("double") /
          (lit(4.0) * col(s"n$i").cast("double"))
      pivot5(byG, "s2j").crossJoin(broadcast(ties))
        .select(col("nn").as("n_total"), col("tsum").as("tie_sum"),
          r6((lit(12.0)
            * (term(1) + term(2) + term(3) + term(4) + term(5))
            / (col("nn").cast("double") * (col("nn") + 1).cast("double"))
            - lit(3.0) * (col("nn") + 1).cast("double"))
            / (lit(1.0) - col("tsum").cast("double")
              / (col("nn").cast(Big) * col("nn").cast(Big)
                * col("nn").cast(Big) - col("nn").cast(Big))
                .cast("double"))).as("h_stat"))
    }),

    // BARTLETT'S TEST — variance homogeneity across the same five
    // groups: per-group exact (n_j, Σx, Σx²) pivoted to one row;
    // pooled and per-group sample variances, their logs and the
    // correction factor form one scalar chain (the five ln terms are
    // named scalars, never a cross-row double sum).
    "q_agg_bartlett" -> ((s, d) => {
      val byG = Tables.orders(s, d)
        .select(col("o_orderpriority").as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("x"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("nj"),
          struct(sum(col("x")).as("sx"),
            sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"))
            .as("m"))
      def ssd(i: Int): Column =
        (col(s"n$i").cast(Big) * col(s"c$i.sxx")
          - col(s"c$i.sx").cast(Big) * col(s"c$i.sx").cast(Big))
          .cast("double") /
          (col(s"n$i").cast("double") * (col(s"n$i") - 1).cast("double"))
      def dfj(i: Int): Column = (col(s"n$i") - 1).cast("double")
      val n = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
      val k = lit(5)
      val pooled = (dfj(1) * ssd(1) + dfj(2) * ssd(2) + dfj(3) * ssd(3)
        + dfj(4) * ssd(4) + dfj(5) * ssd(5)) / (n - k).cast("double")
      val num = (n - k).cast("double") * log(pooled) -
        (dfj(1) * log(ssd(1)) + dfj(2) * log(ssd(2))
          + dfj(3) * log(ssd(3)) + dfj(4) * log(ssd(4))
          + dfj(5) * log(ssd(5)))
      val corr = lit(1.0) + (lit(1.0) / dfj(1) + lit(1.0) / dfj(2)
        + lit(1.0) / dfj(3) + lit(1.0) / dfj(4) + lit(1.0) / dfj(5)
        - lit(1.0) / (n - k).cast("double")) / (lit(3.0) * (k - 1))
      pivot5(byG, "m")
        .select(n.cast("long").as("n_total"), r6(pooled).as("pooled_var"),
          r6(num / corr).as("bartlett_stat"))
    }),

    // McNEMAR'S TEST — paired binary outcomes per (user, day-of-week)
    // pair: "made a purchase on that weekday" in the first calendar
    // half vs the second (the user grain alone has zero discordance —
    // every user is active in both halves). The discordant cells b
    // (early only) and c (late only) are exact; χ² = (b−c)²/(b+c) and
    // the continuity-corrected variant are each one IEEE division.
    "q_agg_mcnemar" -> ((s, d) => {
      val span = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("dmin"),
          max(to_date(col("ts"))).as("dmax"))
      val per = Tables.events(s, d).crossJoin(broadcast(span))
        .select(col("user_id"),
          pmod(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))),
            lit(7)).as("dow"),
          (datediff(to_date(col("ts")), col("dmin")) * 2
            <= datediff(col("dmax"), col("dmin"))).cast("int")
            .as("early"),
          (col("event_type") === "purchase").cast("int").as("pur"))
        .groupBy(col("user_id"), col("dow"))
        .agg(max(col("early") * col("pur")).as("f"),
          max((lit(1) - col("early")) * col("pur")).as("sec"))
      per.agg(
          count(lit(1)).as("n_pairs"),
          sum((col("f") === 1 && col("sec") === 0).cast("long")).as("b"),
          sum((col("f") === 0 && col("sec") === 1).cast("long")).as("c"))
        .select(col("n_pairs"), col("b"), col("c"),
          r6(((col("b") - col("c")) * (col("b") - col("c")))
            .cast("double") / (col("b") + col("c")).cast("double"))
            .as("mcnemar_chi2"),
          r6((abs(col("b") - col("c")) - 1).cast("double")
            * (abs(col("b") - col("c")) - 1).cast("double")
            / (col("b") + col("c")).cast("double"))
            .as("mcnemar_cc"))
    }),

    // BENJAMINI-HOCHBERG FDR — the multiple-testing step-up over the
    // per-event-type mean-value z tests (α = 0.10): exact per-type and
    // global moments → one z chain per type; the monotone pseudo-p
    // exp(−z²/2) ranks the hypotheses (documented stand-in for the
    // normal tail — the BH ORDERING and cutoff algebra are what this
    // key grades); reject ranks ≤ the largest rank with
    // p ≤ α·rank/m. Type count is alphabet-bounded, so the windows
    // ride a tiny relation.
    "q_agg_bh_fdr" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_type"),
          (dec(col("value")) * 100).cast("long").as("cents"))
      val glob = base.agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"),
        sum(col("cents").cast(Big) * col("cents").cast(Big)).as("ss"))
      val per = base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nj"), sum(col("cents")).as("sj"))
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
          Window.orderBy(col("p"), col("event_type"))))
        .withColumn("hit",
          col("p") <= lit(0.10) * col("rank").cast("double")
            / col("m").cast("double"))
      scored
        .withColumn("maxr", max(when(col("hit"), col("rank")))
          .over(Window.partitionBy(lit(1))))
        .select(col("event_type"), col("nj").as("n_events"),
          r6(col("z")).as("z_stat"), r6(col("p")).as("pseudo_p"),
          col("rank").cast("long").as("p_rank"),
          (col("rank") <= coalesce(col("maxr"), lit(0)))
            .cast("long").as("rejected"))
        .orderBy("p_rank")
    }),

    // COHEN'S KAPPA — chance-corrected agreement between two binary
    // user raters: A = "has a purchase", B = "event count above the
    // user median". The 2×2 table is exact; κ = (p_o − p_e)/(1 − p_e)
    // in one chain over the four pivoted cells.
    "q_agg_cohen_kappa" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          max((col("event_type") === "purchase").cast("int")).as("a"))
      val med = per
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cnt"), col("user_id"))))
        .crossJoin(broadcast(per.agg(count(lit(1)).as("nu"))))
        .where(col("rn") === expr("(nu + 1) div 2"))
        .select(col("cnt").as("med"))
      val tab = per.crossJoin(broadcast(med))
        .select(col("a"), (col("cnt") > col("med")).cast("int").as("b"))
        .agg(count(lit(1)).as("n"),
          sum((col("a") === 1 && col("b") === 1).cast("long")).as("n11"),
          sum((col("a") === 1 && col("b") === 0).cast("long")).as("n10"),
          sum((col("a") === 0 && col("b") === 1).cast("long")).as("n01"),
          sum((col("a") === 0 && col("b") === 0).cast("long")).as("n00"))
      val po = (col("n11") + col("n00")).cast("double") /
        col("n").cast("double")
      val pe = ((col("n11") + col("n10")).cast(Big)
        * (col("n11") + col("n01")).cast(Big)
        + (col("n01") + col("n00")).cast(Big)
          * (col("n10") + col("n00")).cast(Big)).cast("double") /
        (col("n").cast(Big) * col("n").cast(Big)).cast("double")
      tab.select(col("n").as("n_users"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        r6((po - pe) / (lit(1.0) - pe)).as("kappa"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_kruskal_wallis" -> {
      val terms = (1 to 5).map(i =>
        s"""(CAST(CAST(c$i AS HUGEINT) * CAST(c$i AS HUGEINT) AS DOUBLE)
            / (4.0 * CAST(n$i AS DOUBLE)))""").mkString(" + ")
      val cells = Priorities.zipWithIndex.map { case (p, i) =>
        s"""MAX(CASE WHEN g = '$p' THEN nj END) AS n${i + 1},
            MAX(CASE WHEN g = '$p' THEN s2j END) AS c${i + 1}"""
      }.mkString(", ")
      s"""WITH rows0 AS (SELECT o_orderpriority AS g,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS x
                 FROM orders),
            vals AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t
                     FROM rows0 GROUP BY 1),
            ranked AS (SELECT x, t,
                         2 * (SUM(t) OVER (ORDER BY x ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) - t)
                           + t + 1 AS r2
                       FROM vals),
            byg AS (SELECT g, CAST(SUM(tj) AS BIGINT) AS nj,
                      CAST(SUM(tj * r2) AS BIGINT) AS s2j
                    FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS tj
                          FROM rows0 GROUP BY 1, 2) gx
                    JOIN ranked USING (x) GROUP BY 1),
            ties AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
                       CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
                     FROM vals),
            piv AS (SELECT $cells FROM byg)
         SELECT nn AS n_total, tsum AS tie_sum,
                round((12.0 * ($terms)
                    / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
                    - 3.0 * CAST(nn + 1 AS DOUBLE))
                  / (1.0 - CAST(tsum AS DOUBLE)
                    / CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)
                        * CAST(nn AS HUGEINT) - CAST(nn AS HUGEINT)
                      AS DOUBLE)), 6) AS h_stat
         FROM piv, ties"""
    },

    "q_agg_bartlett" -> {
      def ssd(i: Int) =
        s"""(CAST(CAST(n$i AS HUGEINT) * sxx$i
              - CAST(sx$i AS HUGEINT) * CAST(sx$i AS HUGEINT) AS DOUBLE)
            / (CAST(n$i AS DOUBLE) * CAST(n$i - 1 AS DOUBLE)))"""
      def dfj(i: Int) = s"CAST(n$i - 1 AS DOUBLE)"
      val cells = Priorities.zipWithIndex.map { case (p, i) =>
        s"""MAX(CASE WHEN g = '$p' THEN nj END) AS n${i + 1},
            MAX(CASE WHEN g = '$p' THEN sx END) AS sx${i + 1},
            MAX(CASE WHEN g = '$p' THEN sxx END) AS sxx${i + 1}"""
      }.mkString(", ")
      val pooled = (1 to 5).map(i => s"${dfj(i)} * ${ssd(i)}")
        .mkString(" + ")
      val lnsum = (1 to 5).map(i => s"${dfj(i)} * ln(${ssd(i)})")
        .mkString(" + ")
      val invsum = (1 to 5).map(i => s"1.0 / ${dfj(i)}").mkString(" + ")
      s"""WITH byg AS (SELECT o_orderpriority AS g,
                    CAST(COUNT(*) AS BIGINT) AS nj,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * 100 AS BIGINT)) AS BIGINT) AS sx,
                    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * 100 AS BIGINT) AS HUGEINT)
                      * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * 100 AS BIGINT) AS HUGEINT)) AS sxx
                 FROM orders GROUP BY 1),
            piv AS (SELECT $cells FROM byg),
            e AS (SELECT n1 + n2 + n3 + n4 + n5 AS n,
                    ($pooled) / CAST(n1 + n2 + n3 + n4 + n5 - 5
                      AS DOUBLE) AS pooled,
                    $lnsum AS lnsum,
                    $invsum AS invsum,
                    n1, n2, n3, n4, n5
                  FROM piv)
         SELECT CAST(n AS BIGINT) AS n_total,
                round(pooled, 6) AS pooled_var,
                round((CAST(n - 5 AS DOUBLE) * ln(pooled) - lnsum)
                  / (1.0 + (invsum - 1.0 / CAST(n - 5 AS DOUBLE))
                    / (3.0 * 4)), 6) AS bartlett_stat
         FROM e"""
    },

    "q_agg_mcnemar" ->
      """WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS dmin,
                    MAX(CAST(ts AS DATE)) AS dmax FROM events),
            per AS (SELECT user_id,
                      (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow,
                      MAX(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                            <= (dmax - dmin) AND event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS f,
                      MAX(CASE WHEN (CAST(ts AS DATE) - dmin) * 2
                            > (dmax - dmin) AND event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS sec
                    FROM events, span GROUP BY 1, 2),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(CASE WHEN f = 1 AND sec = 0 THEN 1
                          ELSE 0 END) AS BIGINT) AS b,
                    CAST(SUM(CASE WHEN f = 0 AND sec = 1 THEN 1
                          ELSE 0 END) AS BIGINT) AS c
                  FROM per)
         SELECT n_pairs, b, c,
                round(CAST((b - c) * (b - c) AS DOUBLE)
                  / CAST(b + c AS DOUBLE), 6) AS mcnemar_chi2,
                round(CAST(abs(b - c) - 1 AS DOUBLE)
                  * CAST(abs(b - c) - 1 AS DOUBLE)
                  / CAST(b + c AS DOUBLE), 6) AS mcnemar_cc
         FROM a""",

    "q_agg_bh_fdr" ->
      """WITH base AS (SELECT event_type,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                 FROM events),
            gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(cents) AS BIGINT) AS s,
                       SUM(CAST(cents AS HUGEINT)
                         * CAST(cents AS HUGEINT)) AS ss
                     FROM base),
            per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
                      CAST(SUM(cents) AS BIGINT) AS sj
                    FROM base GROUP BY 1),
            z AS (SELECT event_type, nj,
                    (CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE)
                      - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / sqrt(CAST(CAST(n AS HUGEINT) * ss
                        - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
                        AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                      / CAST(nj AS DOUBLE)) AS z
                  FROM per, gm),
            scored AS (SELECT event_type, nj, z,
                         exp(z * z / -2.0) AS p,
                         COUNT(*) OVER () AS m,
                         row_number() OVER (ORDER BY exp(z * z / -2.0),
                           event_type) AS rank
                       FROM z),
            hits AS (SELECT *,
                       CASE WHEN p <= 0.10 * CAST(rank AS DOUBLE)
                              / CAST(m AS DOUBLE)
                            THEN rank END AS hitrank
                     FROM scored)
         SELECT event_type, nj AS n_events, round(z, 6) AS z_stat,
                round(p, 6) AS pseudo_p, CAST(rank AS BIGINT) AS p_rank,
                CAST(CASE WHEN rank <= COALESCE(MAX(hitrank) OVER (), 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS rejected
         FROM hits ORDER BY p_rank""",

    "q_agg_cohen_kappa" ->
      """WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
                    MAX(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS a
                 FROM events GROUP BY 1),
            med AS (SELECT cnt AS med FROM
                      (SELECT cnt, row_number() OVER
                         (ORDER BY cnt, user_id) AS rn,
                         COUNT(*) OVER () AS nu
                       FROM per)
                    WHERE rn = (nu + 1) // 2),
            tab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN a = 1 AND cnt > med THEN 1
                            ELSE 0 END) AS BIGINT) AS n11,
                      CAST(SUM(CASE WHEN a = 1 AND cnt <= med THEN 1
                            ELSE 0 END) AS BIGINT) AS n10,
                      CAST(SUM(CASE WHEN a = 0 AND cnt > med THEN 1
                            ELSE 0 END) AS BIGINT) AS n01,
                      CAST(SUM(CASE WHEN a = 0 AND cnt <= med THEN 1
                            ELSE 0 END) AS BIGINT) AS n00
                    FROM per, med)
         SELECT n AS n_users, n11, n10, n01, n00,
                round((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(CAST(n11 + n10 AS HUGEINT)
                        * CAST(n11 + n01 AS HUGEINT)
                      + CAST(n01 + n00 AS HUGEINT)
                        * CAST(n10 + n00 AS HUGEINT) AS DOUBLE)
                      / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                        AS DOUBLE))
                  / (1.0 - CAST(CAST(n11 + n10 AS HUGEINT)
                        * CAST(n11 + n01 AS HUGEINT)
                      + CAST(n01 + n00 AS HUGEINT)
                        * CAST(n10 + n00 AS HUGEINT) AS DOUBLE)
                      / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                        AS DOUBLE)), 6) AS kappa
         FROM tab"""
  )
}
