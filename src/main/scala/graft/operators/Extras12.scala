package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 2: product/cohort analytics (retention) and
  * corpus statistics for the LLM pipeline (per-doc token entropy, PMI
  * collocations, k-anonymity audit, exact heavy hitters).
  *
  * Floating-point discipline: every formula that must hash-match DuckDB
  * keeps its accumulations in EXACT integer space (counts, or 6-dp
  * micro-unit integers) and applies one shared IEEE-double tail formula —
  * the q_agg_corr pattern. No double is ever SUMmed across rows.
  */
object Extras12 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // COHORT RETENTION — the product-analytics matrix: users grouped by
    // first-active day, activity counted in whole weeks since cohort
    // entry (floor(days/7) — NOT calendar-week crossings, which
    // engines define differently). Two shuffles: min-ts per user, then
    // the (cohort, week) distinct-user aggregate; the first-touch
    // relation joins back on user_id, the natural co-partitioned key.
    "q_evt_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val f = ev.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      ev.join(f, "user_id")
        .select(col("user_id"), col("cohort"),
          (datediff(to_date(col("ts")), to_date(col("cohort")))
            .cast("long") / 7).cast("int").as("wk"))
        .groupBy(tsUs(col("cohort")).as("cohort_us"), col("wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_us", "wk")
    }),

    // PER-DOCUMENT TOKEN ENTROPY — the Shannon-entropy quality signal
    // (low entropy = repetitive/degenerate text). H = log2(n) -
    // (Σ c·log2 c)/n; the Σ term is 6-dp-quantized per token and summed
    // as BIGINT (order-independent), then one shared double tail
    // formula. Shape: explode → (doc, token) count → per-doc aggregate;
    // both groupBys hash-partition on doc_id, so Catalyst reuses the
    // exchange for the second.
    "q_llm_entropy" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(round(col("c") * log2(col("c")) * lit(1000000.0), 0)
            .cast("long")).as("sterm"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(log2(col("n_tokens"))
            - (col("sterm").cast("double") / lit(1000000.0))
              / col("n_tokens"), 6).as("entropy"))
        .orderBy("doc_id")
    }),

    // PMI COLLOCATIONS — pointwise mutual information of adjacent token
    // pairs across the corpus: PMI(a,b) = log2(n_ab·N / (n_a·n_b)) with
    // bigram-based marginals, all four counts exact integers (products
    // < 2^53, so the double conversion is lossless). Bigram generation
    // is a pure per-row zip_with projection (no shuffle); then three
    // count aggregates and two equi-joins on the word keys — the
    // word-marginal relations are tiny (vocabulary-sized) and
    // broadcast. The classic first step of phrase mining at 100 TB.
    "q_llm_colloc_pmi" -> ((s, d) => {
      val b = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(explode(expr(
          """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
             (x, y) -> struct(x AS w1, y AS w2))""")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val nab = b.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      val n1 = b.groupBy(col("w1")).agg(count(lit(1)).as("n_a"))
      val n2 = b.groupBy(col("w2")).agg(count(lit(1)).as("n_b"))
      val tot = b.agg(count(lit(1)).as("n_total"))
      nab.join(broadcast(n1), "w1").join(broadcast(n2), "w2")
        .crossJoin(broadcast(tot))
        .where(col("n_ab") >= 5)
        .select(col("w1"), col("w2"), col("n_ab"),
          round(log2((col("n_ab") * col("n_total")).cast("double")
            / (col("n_a") * col("n_b")).cast("double")), 6).as("pmi"))
        .orderBy("w1", "w2")
    }),

    // K-ANONYMITY AUDIT — group sizes over the quasi-identifier pair
    // (market segment, nation): any group smaller than k=10 re-identifies
    // its members. The privacy pre-flight every training-data release
    // runs; one hash aggregate, integer output.
    "q_llm_kanon" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("int").as("nationkey"))
        .agg(count(lit(1)).as("n"))
        .select(col("seg"), col("nationkey"), col("n"),
          (col("n") < 10).as("risky"))
        .orderBy("seg", "nationkey")
    }),

    // EXACT HEAVY HITTERS — join-key skew diagnostic: suppliers whose
    // lineitem share exceeds 1.03× the uniform share, decided by the
    // pure-integer cross-multiplication n·k·100 ≥ tot·103 (no division,
    // no epsilon). This is the exact ground truth the count-min sketch
    // (q_agg_countmin) approximates, and the detector that decides when
    // q_join_salted's salting is worth applying. Two aggregates + one
    // broadcast of a single totals row.
    "q_agg_heavyhitters" -> ((s, d) => {
      val c = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("tot"), count(lit(1)).as("k"))
      c.crossJoin(broadcast(t))
        .where(col("n") * col("k") * 100 >= col("tot") * 103)
        .select(col("l_suppkey"), col("n"),
          expr("CAST(n * 1000000 div tot AS BIGINT)").as("ppm"))
        .orderBy("l_suppkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_evt_retention" ->
      """WITH f AS (SELECT user_id,
                date_trunc('day', MIN(ts::TIMESTAMP)) AS cohort
              FROM events GROUP BY 1),
            a AS (SELECT e.user_id, f.cohort,
                CAST((CAST(e.ts::TIMESTAMP AS DATE)
                      - CAST(f.cohort AS DATE)) // 7 AS INT) AS wk
              FROM events e JOIN f USING (user_id))
         SELECT epoch_us(cohort) AS cohort_us, wk,
                COUNT(DISTINCT user_id) AS n_users
         FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_llm_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents),
            c AS (SELECT doc_id, w, COUNT(*) AS c
                  FROM tok GROUP BY 1, 2),
            p AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                    COUNT(*) AS n_distinct,
                    CAST(SUM(CAST(round(c * log2(c) * 1000000.0, 0)
                                  AS BIGINT)) AS BIGINT) AS sterm
                  FROM c GROUP BY 1)
         SELECT doc_id, n_tokens, n_distinct,
                round(log2(n_tokens)
                  - (CAST(sterm AS DOUBLE) / 1000000.0) / n_tokens, 6)
                  AS entropy
         FROM p ORDER BY doc_id""",
    "q_llm_colloc_pmi" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
            b AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
                  FROM w, unnest(generate_series(1, len(ws) - 1)) t(i)),
            nab AS (SELECT w1, w2, COUNT(*) AS n_ab FROM b GROUP BY 1, 2),
            n1 AS (SELECT w1, COUNT(*) AS n_a FROM b GROUP BY 1),
            n2 AS (SELECT w2, COUNT(*) AS n_b FROM b GROUP BY 1),
            tot AS (SELECT COUNT(*) AS n_total FROM b)
         SELECT nab.w1, nab.w2, n_ab,
                round(log2(CAST(n_ab * n_total AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE)), 6) AS pmi
         FROM nab JOIN n1 USING (w1) JOIN n2 USING (w2) CROSS JOIN tot
         WHERE n_ab >= 5
         ORDER BY w1, w2""",
    "q_llm_kanon" ->
      """SELECT c_mktsegment AS seg, CAST(c_nationkey AS INT) AS nationkey,
                COUNT(*) AS n, COUNT(*) < 10 AS risky
         FROM customer GROUP BY 1, 2 ORDER BY seg, nationkey""",
    "q_agg_heavyhitters" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS n
                    FROM lineitem GROUP BY 1),
            t AS (SELECT SUM(n) AS tot, COUNT(*) AS k FROM c)
         SELECT l_suppkey, n, CAST(n * 1000000 // tot AS BIGINT) AS ppm
         FROM c, t WHERE n * k * 100 >= tot * 103
         ORDER BY l_suppkey"""
  )
}
