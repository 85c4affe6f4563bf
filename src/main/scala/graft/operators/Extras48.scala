package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 11: shingle containment (sub-document
  * duplication), first-touch attribution, expanding-window statistics,
  * and a train/holdout bigram language-model evaluation.
  *
  * Determinism contract (SURVEY §2.13) throughout; thresholds that
  * decide MEMBERSHIP are integer predicates (inter·10 ≥ na·8), never
  * IEEE comparisons — the q_ts_bollinger rule.
  */
object Extras48 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SHINGLE CONTAINMENT — |A∩B|/|A| ≥ 0.8 in EITHER direction: the
    // quote/sub-document detector (a short doc wholly contained in a
    // long one scores low Jaccard but high containment — the case
    // near-dup thresholds miss). Same posting-list candidate kernel as
    // q_llm_dedup_near (never all-pairs); membership is the INTEGER
    // predicate inter·10 ≥ n·8, so no IEEE value decides the emit.
    // The equi-join key is the PORTABLE 60-bit md5 hash applied
    // identically in BOTH engines (round-11, the threshold_sweep
    // rework): collisions produce the same spurious intersection on
    // both sides — exact parity at fixed 8-byte key width instead of
    // suffix-widened shingle strings.
    "q_llm_containment" -> ((s, d) => {
      val trips = LlmOps.shingleTrips(s, d)
        .select(col("doc_id"), Det.md5long(col("s0")).as("hs"),
          col("nsh"))
      LlmOps.postingPairs(s, trips)
        .where(col("inter") * 10 >= col("na") * 8
          || col("inter") * 10 >= col("nb") * 8)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
          col("nb"),
          r6(col("inter").cast("double") / col("na").cast("double"))
            .as("cont_a"),
          r6(col("inter").cast("double") / col("nb").cast("double"))
            .as("cont_b"))
        .orderBy("doc_a", "doc_b")
    }),

    // FIRST-TOUCH ATTRIBUTION — the complement of q_evt_attribution
    // (last-touch) and q_evt_attribution_linear: the conversion credit
    // goes to the EARLIEST touch before the user's first purchase.
    // First purchase and first touch are min-by over unique
    // (ts, event_id) orders — engine-exact; per-channel shares one
    // IEEE division of exact counts.
    "q_evt_attribution_first" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
      val firstPurchase = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
        .select(col("user_id"), col("fp.ts").as("p_ts"),
          col("fp.event_id").as("p_id"))
      val credited = ev.join(firstPurchase, "user_id")
        .where(col("event_type") =!= "purchase"
          && (col("ts") < col("p_ts")
            || (col("ts") === col("p_ts") && col("event_id") < col("p_id"))))
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("ft"))
        .select(col("ft.event_type").as("channel"))
      val tot = credited.agg(count(lit(1)).as("n_total"))
      credited.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"))
        .crossJoin(broadcast(tot))
        .select(col("channel"), col("n_conversions"),
          r6(col("n_conversions").cast("double")
            / col("n_total").cast("double")).as("share"))
        .orderBy("channel")
    }),

    // EXPANDING-WINDOW STATS — running count/sum/max/mean from the
    // start of each user's history (the unbounded-preceding complement
    // of the bounded ROWS frames elsewhere): one user shuffle, O(1)
    // state per row. Emitted for a deterministic 1-in-101 user sample
    // to keep the graded relation bounded; cents are exact and the
    // mean is the single IEEE tail.
    "q_win_expanding" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .where(pmod(col("user_id"), lit(101L)) === 0)
        .select(col("user_id"), col("event_id"), col("ts"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .withColumn("cum_n", count(lit(1)).over(w))
        .withColumn("cum_cents", sum(col("cents")).over(w))
        .withColumn("run_max", max(col("cents")).over(w))
        .select(col("user_id"), col("event_id"), col("cum_n"),
          col("cum_cents"), col("run_max"),
          r6(col("cum_cents").cast("double") / col("cum_n").cast("double"))
            .as("expanding_mean"))
        .orderBy("user_id", "event_id")
    }),

    // LM HOLDOUT EVALUATION — train an add-1-smoothed bigram LM on the
    // EVEN documents, score the ODD documents (the actual eval split a
    // data pipeline runs, vs q_llm_doc_ppl's self-scored proxy):
    // score = log2((c2+1)/(c1+V)). Train counts are vocabulary-bounded
    // broadcasts; each test bigram's bits quantize to integer
    // micro-bits before the per-source sum; the OOV rate is exact.
    "q_llm_lm_holdout" -> ((s, d) => {
      val ws = split(col("text"), " ")
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), col("source"),
          explode(zip_with(
            slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("source"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val docs = Tables.documents(s, d)
      val train = bigrams(docs.where(col("doc_id") % 2 === 0))
      val test = bigrams(docs.where(col("doc_id") % 2 === 1))
      val c2 = train.groupBy(col("w1").as("x1"), col("w2").as("x2"))
        .agg(count(lit(1)).as("c2"))
      val c1 = train.groupBy(col("w1").as("y1")).agg(count(lit(1)).as("c1"))
      val v = train.select(col("w1"))
        .unionByName(train.select(col("w2").as("w1")))
        .distinct().agg(count(lit(1)).as("vsz"))
      test
        .join(broadcast(c2), col("w1") === col("x1")
          && col("w2") === col("x2"), "left")
        .join(broadcast(c1), col("w1") === col("y1"), "left")
        .crossJoin(broadcast(v))
        .withColumn("t_micro", round(log2(
          (coalesce(col("c2"), lit(0L)) + 1).cast("double")
            / (coalesce(col("c1"), lit(0L)) + col("vsz")).cast("double"))
          * 1e6).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_unseen"),
          sum(col("t_micro")).as("sum_micro"))
        .select(col("source"), col("n_bigrams"), col("n_unseen"),
          col("sum_micro"),
          r6(-col("sum_micro").cast("double") / 1e6
            / col("n_bigrams").cast("double")).as("bits_per_bigram"),
          r6(col("n_unseen").cast("double")
            / col("n_bigrams").cast("double")).as("unseen_rate"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh0 AS (SELECT DISTINCT doc_id,
                           array_to_string(ws[i:i+2], ' ') AS s FROM x),
            sh AS (SELECT doc_id,
                          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                            AS hs
                   FROM sh0),
            cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
                    FROM sh0 GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             CAST(COUNT(*) AS BIGINT) AS inter
                      FROM sh a JOIN sh b
                        ON a.hs = b.hs AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT doc_a, doc_b, inter, ca.nsh AS na, cb.nsh AS nb,
                round(CAST(inter AS DOUBLE) / CAST(ca.nsh AS DOUBLE), 6)
                  AS cont_a,
                round(CAST(inter AS DOUBLE) / CAST(cb.nsh AS DOUBLE), 6)
                  AS cont_b
         FROM pairs
         JOIN cnt ca ON ca.doc_id = doc_a
         JOIN cnt cb ON cb.doc_id = doc_b
         WHERE inter * 10 >= ca.nsh * 8 OR inter * 10 >= cb.nsh * 8
         ORDER BY doc_a, doc_b""",

    "q_evt_attribution_first" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
                           ts::TIMESTAMP AS t
                  FROM events),
            fp AS (SELECT user_id,
                     min(ROW(t, event_id)) AS m
                   FROM ev WHERE event_type = 'purchase'
                   GROUP BY user_id),
            fpp AS (SELECT user_id, m[1] AS p_ts, m[2] AS p_id
                    FROM fp),
            ft AS (SELECT e.user_id,
                     min(ROW(e.t, e.event_id, e.event_type)) AS m
                   FROM ev e JOIN fpp USING (user_id)
                   WHERE e.event_type <> 'purchase'
                     AND (e.t < p_ts
                          OR (e.t = p_ts AND e.event_id < p_id))
                   GROUP BY e.user_id),
            ch AS (SELECT m[3] AS channel FROM ft),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ch)
         SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
                round(CAST(COUNT(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
                  AS share
         FROM ch, tot GROUP BY channel, n_total ORDER BY channel""",

    "q_win_expanding" ->
      """WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                 FROM events WHERE user_id % 101 = 0)
         SELECT user_id, event_id,
                CAST(COUNT(*) OVER w AS BIGINT) AS cum_n,
                CAST(SUM(cents) OVER w AS BIGINT) AS cum_cents,
                MAX(cents) OVER w AS run_max,
                round(CAST(SUM(cents) OVER w AS DOUBLE)
                  / CAST(COUNT(*) OVER w AS DOUBLE), 6) AS expanding_mean
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "q_llm_lm_holdout" ->
      """WITH tr AS (SELECT w[i] AS w1, w[i + 1] AS w2
                  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                        FROM (SELECT string_split(text, ' ') AS w
                              FROM documents WHERE doc_id % 2 = 0) t0) t),
            te AS (SELECT source, w[i] AS w1, w[i + 1] AS w2
                   FROM (SELECT source, w,
                           unnest(generate_series(1, len(w) - 1)) AS i
                         FROM (SELECT source, string_split(text, ' ') AS w
                               FROM documents WHERE doc_id % 2 = 1) t0) t),
            c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                   FROM tr GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
                   FROM tr GROUP BY 1),
            v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vsz
                  FROM (SELECT w1 FROM tr UNION SELECT w2 FROM tr)),
            sc AS (SELECT te.source,
                     c2.c2 IS NULL AS unseen,
                     CAST(round(log2(
                       CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
                       / CAST(coalesce(c1.c1, 0) + vsz AS DOUBLE)) * 1e6)
                       AS BIGINT) AS t_micro
                   FROM te
                   LEFT JOIN c2 ON te.w1 = c2.w1 AND te.w2 = c2.w2
                   LEFT JOIN c1 ON te.w1 = c1.w1, v)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                CAST(SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unseen,
                CAST(SUM(t_micro) AS BIGINT) AS sum_micro,
                round(-CAST(SUM(t_micro) AS DOUBLE) / 1e6
                  / CAST(COUNT(*) AS DOUBLE), 6) AS bits_per_bigram,
                round(CAST(SUM(CASE WHEN unseen THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                  AS unseen_rate
         FROM sc GROUP BY source ORDER BY source"""
  )
}
