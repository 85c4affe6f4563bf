package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 12: U-shaped (position-based) attribution,
  * prefix-duplicate families, a fixed-frequency periodogram, and the
  * cross-source duplication matrix.
  *
  * Determinism contract (SURVEY §2.13): credits are exact integer
  * micro-units that sum to exactly 1e6 per conversion; periodogram
  * weights are pre-quantized integer cos/sin tables (fixed small angle
  * sets, no boundary exposure); memberships are integer predicates.
  */
object Extras49 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // U-SHAPED ATTRIBUTION — 40% first touch, 40% last touch, 20%
    // split across the middles (the position-based model completing
    // first/last/linear). Credits are EXACT micro-units: the middle
    // split uses integer division with the remainder assigned to the
    // first touch, so every conversion distributes exactly 1,000,000
    // micro-credits — the per-channel sums are integers, order-free.
    "q_evt_attribution_ushape" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
      val firstPurchase = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
        .select(col("user_id"), col("fp.ts").as("p_ts"),
          col("fp.event_id").as("p_id"))
      val touches = ev.join(firstPurchase, "user_id")
        .where(col("event_type") =!= "purchase"
          && (col("ts") < col("p_ts")
            || (col("ts") === col("p_ts") && col("event_id") < col("p_id"))))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wn = Window.partitionBy(col("user_id"))
      touches
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("credit_micro", expr(
          """CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN rn = 1 THEN 400000 + 200000 % (n - 2)
                  WHEN rn = n THEN 400000
                  ELSE 200000 div (n - 2) END"""))
        .groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_micro")).as("credit_micro"))
        .select(col("channel"), col("n_touches"), col("credit_micro"),
          r6(col("credit_micro").cast("double") / 1e6).as("conversions"))
        .orderBy("channel")
    }),

    // PREFIX-DUPLICATE FAMILIES — documents sharing their first 8
    // tokens (the templated-intro/boilerplate-header detector; exact
    // dedup misses them when tails differ, shingle near-dup dilutes
    // them when docs are long). One md5 per doc, one groupBy; emit the
    // biggest families.
    "q_llm_prefix_dup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5long(concat_ws(" ",
            slice(split(col("text"), " "), 1, 8))).as("ph"))
        .groupBy(col("ph"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          countDistinct(col("source")).as("n_sources"))
        .where(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("min_doc"))
        .limit(50)
    }),

    // PERIODOGRAM — spectral power of daily revenue at the 7- and
    // 30-day periods (the calendar frequencies that matter): the DFT
    // weights are PRE-QUANTIZED integer cos/sin micro-tables over the
    // T fixed angles (2πk/T for k < T — none of these land near a
    // 0.5e-6 rounding boundary, so both engines' libm agree after
    // rounding), making A = Σ y·c and B = Σ y·s exact BIGINT folds;
    // the amplitude is one IEEE tail.
    "q_ts_periodogram" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100000")
          .as("y"))
        .withColumn("t", row_number().over(Window.orderBy(col("dt"))) - 1)
      def band(period: Int): DataFrame = daily
        .withColumn("c", expr(
          s"CAST(round(cos(2 * pi() * (t % $period) / $period) * 1000000) AS BIGINT)"))
        .withColumn("s2", expr(
          s"CAST(round(sin(2 * pi() * (t % $period) / $period) * 1000000) AS BIGINT)"))
        .agg(count(lit(1)).as("n"),
          sum(col("y") * col("c")).as("a_micro"),
          sum(col("y") * col("s2")).as("b_micro"))
        .select(lit(period).as("period"), col("n"), col("a_micro"),
          col("b_micro"),
          r6(sqrt(col("a_micro").cast("double") * col("a_micro")
            + col("b_micro").cast("double") * col("b_micro"))
            / col("n").cast("double") / 1e6).as("amplitude_k"))
      band(7).unionByName(band(30)).orderBy("period")
    }),

    // CROSS-SOURCE DUPLICATION MATRIX — where near-duplicate mass
    // concentrates: the q_llm_dedup_near pair set rolled up by
    // (source, source) with the pair order canonicalized by
    // least/greatest. The matrix is sources²-bounded; the pair set is
    // the planted structure, never all-pairs.
    "q_llm_dup_matrix" -> ((s, d) => {
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      // Round 16: pairs via the FixtureCache posting layout (the
      // keep/clusters convention; identical to the inline kernel,
      // Extras10Spec) and without the near query's presentation sort,
      // which the join would immediately destroy.
      LlmOps.nearDupPairs(s, d, cachedTrips = true)
        .select(col("doc_a"), col("doc_b"))
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("src1"),
          greatest(col("sa"), col("sb")).as("src2"))
        .groupBy(col("src1"), col("src2"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("src1"), col("src2"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_attribution_ushape" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
                           ts::TIMESTAMP AS t
                  FROM events),
            fp AS (SELECT user_id, min(ROW(t, event_id)) AS m
                   FROM ev WHERE event_type = 'purchase'
                   GROUP BY user_id),
            fpp AS (SELECT user_id, m[1] AS p_ts, m[2] AS p_id FROM fp),
            tc AS (SELECT e.user_id, e.event_type, e.t, e.event_id,
                     row_number() OVER (PARTITION BY e.user_id
                       ORDER BY e.t, e.event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY e.user_id) AS n
                   FROM ev e JOIN fpp USING (user_id)
                   WHERE e.event_type <> 'purchase'
                     AND (e.t < p_ts
                          OR (e.t = p_ts AND e.event_id < p_id))),
            cr AS (SELECT event_type AS channel,
                     CASE WHEN n = 1 THEN 1000000
                          WHEN n = 2 THEN 500000
                          WHEN rn = 1 THEN 400000 + 200000 % (n - 2)
                          WHEN rn = n THEN 400000
                          ELSE 200000 // (n - 2) END AS credit_micro
                   FROM tc)
         SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
                CAST(SUM(credit_micro) AS BIGINT) AS credit_micro,
                round(CAST(SUM(credit_micro) AS DOUBLE) / 1e6, 6)
                  AS conversions
         FROM cr GROUP BY channel ORDER BY channel""",

    "q_llm_prefix_dup" ->
      """WITH p AS (SELECT doc_id, source,
                    CAST(('0x' || substr(md5(array_to_string(
                      string_split(text, ' ')[1:8], ' ')), 1, 15))
                      AS BIGINT) AS ph
                 FROM documents)
         SELECT ph, CAST(COUNT(*) AS BIGINT) AS n_docs,
                MIN(doc_id) AS min_doc,
                CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         FROM p GROUP BY ph HAVING COUNT(*) >= 2
         ORDER BY n_docs DESC, min_doc LIMIT 50""",

    "q_ts_periodogram" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS y
                 FROM orders GROUP BY 1),
            b AS (SELECT y, row_number() OVER (ORDER BY dt) - 1 AS t
                  FROM daily),
            p7 AS (SELECT CAST(7 AS INT) AS period,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(y * CAST(round(cos(2 * pi() * (t % 7) / 7)
                          * 1000000) AS BIGINT)) AS BIGINT) AS a_micro,
                     CAST(SUM(y * CAST(round(sin(2 * pi() * (t % 7) / 7)
                          * 1000000) AS BIGINT)) AS BIGINT) AS b_micro
                   FROM b),
            p30 AS (SELECT CAST(30 AS INT) AS period,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(y * CAST(round(cos(2 * pi() * (t % 30) / 30)
                           * 1000000) AS BIGINT)) AS BIGINT) AS a_micro,
                      CAST(SUM(y * CAST(round(sin(2 * pi() * (t % 30) / 30)
                           * 1000000) AS BIGINT)) AS BIGINT) AS b_micro
                    FROM b),
            u AS (SELECT * FROM p7 UNION ALL SELECT * FROM p30)
         SELECT period, n, a_micro, b_micro,
                round(sqrt(CAST(a_micro AS DOUBLE) * a_micro
                      + CAST(b_micro AS DOUBLE) * b_micro)
                      / CAST(n AS DOUBLE) / 1e6, 6) AS amplitude_k
         FROM u ORDER BY period""",

    "q_llm_dup_matrix" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             COUNT(*) AS inter
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            nd AS (SELECT doc_a, doc_b FROM pairs
                   JOIN cnt ca ON ca.doc_id = doc_a
                   JOIN cnt cb ON cb.doc_id = doc_b
                   WHERE CAST(inter AS DOUBLE)
                         / (ca.nsh + cb.nsh - inter) >= 0.6),
            m AS (SELECT least(da.source, db.source) AS src1,
                         greatest(da.source, db.source) AS src2
                  FROM nd
                  JOIN documents da ON da.doc_id = nd.doc_a
                  JOIN documents db ON db.doc_id = nd.doc_b)
         SELECT src1, src2, CAST(COUNT(*) AS BIGINT) AS n_pairs
         FROM m GROUP BY 1, 2 ORDER BY n_pairs DESC, src1, src2"""
  )
}
