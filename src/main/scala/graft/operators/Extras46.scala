package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 9: year-over-year growth, partial
  * autocorrelation, ROUGE-1 overlap scoring on the near-dup candidate
  * set, and session-free event-type affinity.
  *
  * Determinism contract (SURVEY §2.13) throughout: exact integer folds,
  * shared IEEE tails, integer-only rankings.
  */
object Extras46 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // YEAR-OVER-YEAR — monthly revenue vs the same month last year
    // (lag 12 over the contiguous month spine). Cents are exact; the
    // growth rate is one IEEE division. Month relation is
    // calendar-bounded.
    "q_ts_yoy" -> ((s, d) => {
      val ord = Window.orderBy(col("month"))
      Tables.orders(s, d)
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 12).over(ord))
        .where(col("prev_cents").isNotNull)
        .select(col("month"), col("cents"), col("prev_cents"),
          r6((col("cents") - col("prev_cents")).cast("double")
            / col("prev_cents").cast("double")).as("yoy_growth"))
        .orderBy("month")
    }),

    // PARTIAL AUTOCORRELATION — PACF at lags 1..3 of daily revenue via
    // Durbin-Levinson on the exact lag-moment sums (kilodollar integer
    // units keep every Σxy/Σx² a BIGINT fold; the r's and φ's are one
    // shared IEEE chain — identical op sequence both engines, rounded
    // once at emit). The lag columns ride the calendar-bounded spine.
    "q_ts_pacf" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val lagged = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("y1", lag(col("y"), 1).over(ord))
        .withColumn("y2", lag(col("y"), 2).over(ord))
        .withColumn("y3", lag(col("y"), 3).over(ord))
      def corrCols(lc: String, tag: String) = Seq(
        count(when(col(lc).isNotNull, 1)).as(s"n$tag"),
        sum(when(col(lc).isNotNull, col("y"))).as(s"sx$tag"),
        sum(when(col(lc).isNotNull, col(lc))).as(s"sy$tag"),
        sum(when(col(lc).isNotNull, col("y") * col(lc))).as(s"sxy$tag"),
        sum(when(col(lc).isNotNull, col("y") * col("y"))).as(s"sxx$tag"),
        sum(when(col(lc).isNotNull, col(lc) * col(lc))).as(s"syy$tag"))
      val m = lagged.agg(
        (corrCols("y1", "1") ++ corrCols("y2", "2") ++ corrCols("y3", "3"))
          .head,
        (corrCols("y1", "1") ++ corrCols("y2", "2") ++ corrCols("y3", "3"))
          .tail: _*)
      def r(tag: String) =
        (col(s"n$tag") * col(s"sxy$tag") - col(s"sx$tag") * col(s"sy$tag"))
          .cast("double") /
        (sqrt((col(s"n$tag") * col(s"sxx$tag")
          - col(s"sx$tag") * col(s"sx$tag")).cast("double"))
          * sqrt((col(s"n$tag") * col(s"syy$tag")
            - col(s"sy$tag") * col(s"sy$tag")).cast("double")))
      val phi22 = (r("2") - r("1") * r("1")) / (lit(1.0) - r("1") * r("1"))
      val phi21 = r("1") * (lit(1.0) - phi22)
      val phi33 = (r("3") - phi21 * r("2") - phi22 * r("1")) /
        (lit(1.0) - phi21 * r("1") - phi22 * r("2"))
      m.select(col("n1").as("n_pairs_lag1"),
        r6(r("1")).as("r1"), r6(r("2")).as("r2"), r6(r("3")).as("r3"),
        r6(r("1")).as("pacf1"), r6(phi22).as("pacf2"), r6(phi33).as("pacf3"))
    }),

    // ROUGE-1 OVERLAP — precision/recall/F1 of distinct-unigram overlap
    // for every near-dup CANDIDATE pair (the summarization-metric view
    // of the same pairs q_llm_dedup_near flags): bounded by the planted
    // pair structure, never all-pairs. Word-set sizes and intersections
    // are exact integers via a posting-list join on the word key; the
    // three ratios are one shared IEEE chain.
    "q_llm_rouge_overlap" -> ((s, d) => {
      // Candidate pairs via the FixtureCache posting layout (the
      // keep/clusters convention — identical to the inline kernel,
      // Extras10Spec) and WITHOUT the near query's presentation sort,
      // which the join would immediately destroy.
      val pairs = LlmOps.nearDupPairs(s, d, cachedTrips = true)
        .select(col("doc_a"), col("doc_b"))
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
      val inter = pairs
        .join(words.as("wa"), col("wa.doc_id") === col("doc_a"))
        .join(words.as("wb"),
          col("wb.doc_id") === col("doc_b") && col("wa.w") === col("wb.w"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("nw").as("na")),
          "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("nw").as("nb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
          col("nb"),
          r6(col("inter").cast("double") / col("nb").cast("double"))
            .as("rouge_p"),
          r6(col("inter").cast("double") / col("na").cast("double"))
            .as("rouge_r"),
          r6(col("inter").cast("double") * 2.0
            / (col("na") + col("nb")).cast("double")).as("rouge_f1"))
        .orderBy("doc_a", "doc_b")
    }),

    // EVENT-TYPE AFFINITY — which event types co-occur for the same
    // user on the same day beyond independence (the behavioral
    // cross-sell matrix; the events sibling of q_evt_basket_pairs).
    // Pair candidates ride the (user, day, type) distinct relation —
    // ≤ type-alphabet per key, never types² × users; lift is EXACT in
    // integer micro-units so the ranking never compares IEEE values.
    "q_evt_type_affinity" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type").as("t"))
        .distinct()
      val marg = ud.groupBy(col("t")).agg(count(lit(1)).as("nt"))
      val tot = ud.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_keys"))
      ud.as("x").join(ud.as("y"),
          col("x.user_id") === col("y.user_id")
            && col("x.day") === col("y.day") && col("x.t") < col("y.t"))
        .groupBy(col("x.t").as("t1"), col("y.t").as("t2"))
        .agg(count(lit(1)).as("n_both"))
        .join(broadcast(marg.select(col("t").as("t1"), col("nt").as("n1"))),
          "t1")
        .join(broadcast(marg.select(col("t").as("t2"), col("nt").as("n2"))),
          "t2")
        .crossJoin(broadcast(tot))
        .withColumn("lift_micro",
          expr("""CAST(CAST(n_both AS DECIMAL(18,0)) *
            CAST(n_keys AS DECIMAL(18,0)) * 1000000
            div (n1 * n2) AS BIGINT)"""))
        .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
          col("lift_micro"),
          (col("lift_micro").cast("double") / 1e6).as("lift"))
        .orderBy(col("lift_micro").desc, col("t1"), col("t2"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_yoy" ->
      """WITH m AS (SELECT CAST(date_trunc('month',
                      CAST(o_orderdate AS DATE)) AS DATE) AS month,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
            l AS (SELECT month, cents,
                    lag(cents, 12) OVER (ORDER BY month) AS prev_cents
                  FROM m)
         SELECT month, cents, prev_cents,
                round(CAST(cents - prev_cents AS DOUBLE)
                  / CAST(prev_cents AS DOUBLE), 6) AS yoy_growth
         FROM l WHERE prev_cents IS NOT NULL ORDER BY month""",

    "q_ts_pacf" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            lg AS (SELECT y,
                     lag(y, 1) OVER (ORDER BY dt) AS y1,
                     lag(y, 2) OVER (ORDER BY dt) AS y2,
                     lag(y, 3) OVER (ORDER BY dt) AS y3
                   FROM daily),
            m AS (SELECT
                    CAST(COUNT(y1) AS BIGINT) AS n1,
                    CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT) AS sx1,
                    CAST(SUM(y1) AS BIGINT) AS sy1,
                    CAST(SUM(y * y1) AS BIGINT) AS sxy1,
                    CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx1,
                    CAST(SUM(y1 * y1) AS BIGINT) AS syy1,
                    CAST(COUNT(y2) AS BIGINT) AS n2,
                    CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT) AS sx2,
                    CAST(SUM(y2) AS BIGINT) AS sy2,
                    CAST(SUM(y * y2) AS BIGINT) AS sxy2,
                    CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx2,
                    CAST(SUM(y2 * y2) AS BIGINT) AS syy2,
                    CAST(COUNT(y3) AS BIGINT) AS n3,
                    CAST(SUM(CASE WHEN y3 IS NOT NULL THEN y END) AS BIGINT) AS sx3,
                    CAST(SUM(y3) AS BIGINT) AS sy3,
                    CAST(SUM(y * y3) AS BIGINT) AS sxy3,
                    CAST(SUM(CASE WHEN y3 IS NOT NULL THEN y * y END) AS BIGINT) AS sxx3,
                    CAST(SUM(y3 * y3) AS BIGINT) AS syy3
                  FROM lg),
            rr AS (SELECT n1 AS n_pairs_lag1,
                     CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                       / (sqrt(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE))
                          * sqrt(CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)))
                       AS r1,
                     CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
                       / (sqrt(CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE))
                          * sqrt(CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE)))
                       AS r2,
                     CAST(n3 * sxy3 - sx3 * sy3 AS DOUBLE)
                       / (sqrt(CAST(n3 * sxx3 - sx3 * sx3 AS DOUBLE))
                          * sqrt(CAST(n3 * syy3 - sy3 * sy3 AS DOUBLE)))
                       AS r3
                   FROM m),
            ph AS (SELECT n_pairs_lag1, r1, r2, r3,
                     (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
                   FROM rr),
            p2 AS (SELECT n_pairs_lag1, r1, r2, r3, phi22,
                     r1 * (1.0 - phi22) AS phi21
                   FROM ph)
         SELECT n_pairs_lag1,
                round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
                round(r1, 6) AS pacf1, round(phi22, 6) AS pacf2,
                round((r3 - phi21 * r2 - phi22 * r1)
                      / (1.0 - phi21 * r1 - phi22 * r2), 6) AS pacf3
         FROM p2""",

    "q_llm_rouge_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             COUNT(*) AS sinter
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pairs AS (SELECT doc_a, doc_b FROM cand
                      JOIN cnt ca ON ca.doc_id = doc_a
                      JOIN cnt cb ON cb.doc_id = doc_b
                      WHERE CAST(sinter AS DOUBLE)
                            / (ca.nsh + cb.nsh - sinter) >= 0.6),
            uw AS (SELECT DISTINCT doc_id,
                          unnest(string_split(text, ' ')) AS w
                   FROM documents),
            un AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw
                   FROM uw GROUP BY 1),
            ov AS (SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS inter
                   FROM pairs
                   JOIN uw wa ON wa.doc_id = doc_a
                   JOIN uw wb ON wb.doc_id = doc_b AND wa.w = wb.w
                   GROUP BY 1, 2)
         SELECT doc_a, doc_b, inter, na.nw AS na, nb.nw AS nb,
                round(CAST(inter AS DOUBLE) / CAST(nb.nw AS DOUBLE), 6)
                  AS rouge_p,
                round(CAST(inter AS DOUBLE) / CAST(na.nw AS DOUBLE), 6)
                  AS rouge_r,
                round(CAST(inter AS DOUBLE) * 2.0
                  / CAST(na.nw + nb.nw AS DOUBLE), 6) AS rouge_f1
         FROM ov
         JOIN un na ON na.doc_id = doc_a
         JOIN un nb ON nb.doc_id = doc_b
         ORDER BY doc_a, doc_b""",

    "q_evt_type_affinity" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
                           event_type AS t
                  FROM events),
            marg AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nt
                     FROM ud GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys
                    FROM (SELECT DISTINCT user_id, day FROM ud)),
            p AS (SELECT x.t AS t1, y.t AS t2,
                         CAST(COUNT(*) AS BIGINT) AS n_both
                  FROM ud x JOIN ud y
                    ON x.user_id = y.user_id AND x.day = y.day
                       AND x.t < y.t
                  GROUP BY 1, 2)
         SELECT t1, t2, n_both, m1.nt AS n1, m2.nt AS n2,
                CAST(n_both * n_keys * 1000000
                     // (m1.nt * m2.nt) AS BIGINT) AS lift_micro,
                CAST(n_both * n_keys * 1000000 // (m1.nt * m2.nt)
                  AS DOUBLE) / 1e6 AS lift
         FROM p JOIN marg m1 ON m1.t = p.t1
         JOIN marg m2 ON m2.t = p.t2, tot
         ORDER BY lift_micro DESC, t1, t2"""
  )
}
