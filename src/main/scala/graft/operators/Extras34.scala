package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{FixtureCache, Tables}

/** Round-8 additions: PII scrub audit, order-free quantized entropy,
  * parquet bloom-filter source, weekly activity streaks, exact weighted
  * moving average, and session-reset running sums.
  *
  * Determinism rules follow SURVEY.md §2.13: every graded cell is either
  * an exact integer/decimal, a string, or the result of ONE shared IEEE
  * expression chain per row (never an order-dependent float sum).
  */
object Extras34 {
  import graft.Det._

  /** PII-injection expression shared by query and spec: a deterministic
    * synthetic email for doc_id % 7 == 0 and phone for doc_id % 11 == 0
    * appended to the raw text (the testdata corpus is PII-free word
    * salad, so the detector needs a seeded haystack — the injection is
    * part of the graded expression on BOTH engines, not a fixture). */
  private[operators] def piiText = concat(
    col("text"),
    when(col("doc_id") % 7 === 0,
      concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
      .otherwise(lit("")),
    when(col("doc_id") % 11 === 0,
      concat(lit(" call 555-"),
        lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
        lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(lit("")))

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PII SCRUB AUDIT — the pre-training hygiene pass: detect emails and
    // phone numbers per document, redact them, and report per-source
    // counts plus the exact character volume removed. Patterns are
    // conservative ASCII regexes with identical semantics in Java regex
    // and RE2 (no backrefs, no lookaround). Everything emitted is an
    // exact integer; the scan is one corpus pass (regex per row, no
    // shuffle beyond the per-source aggregate) — at 100 TB this is the
    // embarrassingly-parallel map stage it should be.
    "q_llm_pii_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("t", piiText)
      docs
        .select(col("source"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
            .cast("long").as("ne"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
            .cast("long").as("np"),
          (length(col("t"))
            - length(regexp_replace(regexp_replace(col("t"),
                EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")))
            .cast("long").as("delta"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ne") > 0, 1L).otherwise(0L)).as("docs_email"),
          sum(when(col("np") > 0, 1L).otherwise(0L)).as("docs_phone"),
          sum(col("ne")).as("email_hits"),
          sum(col("np")).as("phone_hits"),
          sum(col("delta")).as("chars_redacted"))
        .orderBy("source")
    }),

    // LANGUAGE-MIX ENTROPY — per-source Shannon entropy of the language
    // distribution, quantized ORDER-FREE: each language term
    // −(c/n)·log2(c/n) is one deterministic per-row IEEE chain, rounded
    // to integer NANOBITS (×1e9) BEFORE summation, so the cross-language
    // sum is exact integer addition in any order — the float-fold
    // order-dependence that makes naive entropy un-oracle-able never
    // arises. Two tiny aggregates (lang grain, then source grain); the
    // only data-sized pass is the first count.
    "q_agg_entropy" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val wn = Window.partitionBy(col("source"))
      counts
        .withColumn("n", sum(col("c")).over(wn))
        .withColumn("term_nb",
          round(-(col("c").cast("double") / col("n").cast("double"))
            * log2(col("c").cast("double") / col("n").cast("double"))
            * lit(1e9), 0).cast("long"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          sum(col("term_nb")).as("entropy_nanobits"))
        .orderBy("source")
    }),

    // PARQUET BLOOM-FILTER SOURCE — the point-lookup layout: orders
    // rewritten once (FixtureCache) with a bloom filter on o_custkey,
    // then a single-key probe read. At 100 TB the bloom skips every row
    // group without the key (the file-format analog of the reference
    // store's per-block filters); correctness is graded on the probe
    // result, the layout on StorageSpec's skipping assertions. The probe
    // key is the dataset's MIN custkey — data-derived, engine-neutral.
    "q_source_bloom" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_bloom", Seq(s"$d/orders.parquet"),
        "bloom(o_custkey) fpp 0.01 v1") { dest =>
        Tables.orders(s, d).write
          .option("parquet.bloom.filter.enabled#o_custkey", "true")
          .option("parquet.bloom.filter.expected.ndv#o_custkey", "200000")
          .parquet(dest)
      }
      val k = Tables.orders(s, d).agg(min(col("o_custkey"))).head().getLong(0)
      s.read.parquet(dir)
        .where(col("o_custkey") === k)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .orderBy("o_orderkey")
    }),

    // WEEKLY ACTIVITY STREAKS — per-user longest run of CONSECUTIVE
    // active weeks (integer Monday-epoch week indexes, the q_evt_churn /
    // q_evt_retention rule): dedup to (user, week), islands via
    // wk − row_number, then per-user streak accounting. Entirely
    // user-partitioned — no global sort, scales with users × weeks.
    "q_evt_streak_weekly" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(to_date(ts), DATE '2020-01-06') div 7").as("wk"))
        .distinct()
      val byU = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val runs = uw.withColumn("grp", col("wk") - row_number().over(byU))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("wk")).as("wk0"))
      val best = Window.partitionBy(col("user_id"))
        .orderBy(col("len").desc, col("wk0"))
      runs.withColumn("rk", row_number().over(best))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_weeks"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("max_streak"),
          min(when(col("rk") === 1, col("wk0"))).as("best_start_wk"))
        .orderBy("user_id")
    }),

    // WEIGHTED MOVING AVERAGE — trailing-7-day linearly-weighted mean of
    // daily revenue (weights 7..1, newest heaviest): the numerator is an
    // EXACT BIGINT (7 lag terms in integer cents — a weighted frame no
    // built-in window aggregate expresses), the mean one shared IEEE
    // division by the constant 28. Calendar-bounded single-partition
    // spine (the q_ts_acf argument); the daily aggregate is the only
    // data-sized shuffle.
    "q_ts_wma" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val w = Window.orderBy("dt")
      val num = (0 until 7).map(i =>
        lit(7L - i) * coalesce(lag(col("y"), i).over(w), lit(0L)))
        .reduce(_ + _)
      daily
        .withColumn("rn", row_number().over(w))
        .withColumn("wma_num", num)
        .where(col("rn") >= 7)
        .select(col("dt"), col("y").as("y_cents"),
          col("wma_num"),
          (col("wma_num").cast("double") / lit(28.0)).as("wma_cents"))
        .orderBy("dt")
    }),

    // SESSION-RESET RUNNING SUM — per-user cumulative spend that RESETS
    // at each session boundary (30-min inactivity gap): the sessionize
    // kernel (lag + gap flag + running flag-sum = session id) composed
    // with a (user, session)-framed running sum. Everything is
    // PARTITIONED BY user — both windows shuffle once on the same key;
    // exact integer cents end to end, ties pinned by (ts, event_id).
    "q_win_reset_cumsum" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("us"),
          (dec(col("value")) * 100).cast("long").as("cents"))
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val newSess = when(
        col("us") - lag(col("us"), 1).over(byU) > 1800000000L ||
          lag(col("us"), 1).over(byU).isNull, 1L).otherwise(0L)
      val withSess = ev.withColumn("sess",
        sum(newSess).over(byU.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      val bySess = Window.partitionBy(col("user_id"), col("sess"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withSess
        .select(col("user_id"), col("event_id"), col("sess"),
          sum(col("cents")).over(bySess).as("run_cents"))
        .orderBy("user_id", "event_id")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_pii_audit" -> s"""
      WITH aug AS (SELECT source,
             text
               || CASE WHEN doc_id % 7 = 0
                    THEN ' contact user' || doc_id || '@example.com'
                    ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                    THEN ' call 555-'
                      || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END AS t
            FROM documents),
        per AS (SELECT source,
             len(regexp_extract_all(t, '$EmailRe')) AS ne,
             len(regexp_extract_all(t, '$PhoneRe')) AS np,
             length(t) - length(
               regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS delta
            FROM aug)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_email,
             CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_phone,
             CAST(SUM(ne) AS BIGINT) AS email_hits,
             CAST(SUM(np) AS BIGINT) AS phone_hits,
             CAST(SUM(delta) AS BIGINT) AS chars_redacted
      FROM per GROUP BY source ORDER BY source""",

    "q_agg_entropy" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS c
                    FROM documents GROUP BY 1, 2),
            t AS (SELECT source, c,
                    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
                  FROM c)
         SELECT source, MAX(n) AS n_docs, COUNT(*) AS n_langs,
                CAST(SUM(CAST(round(
                  -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9, 0)
                  AS BIGINT)) AS BIGINT) AS entropy_nanobits
         FROM t GROUP BY source ORDER BY source""",

    "q_source_bloom" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents
         FROM orders
         WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
         ORDER BY o_orderkey""",

    "q_evt_streak_weekly" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                       (CAST(ts AS DATE) - DATE '2020-01-06') // 7 AS wk
                     FROM events),
            g AS (SELECT user_id, wk,
                    wk - row_number() OVER (PARTITION BY user_id
                                            ORDER BY wk) AS grp
                  FROM uw),
            runs AS (SELECT user_id, grp, COUNT(*) AS len,
                            MIN(wk) AS wk0
                     FROM g GROUP BY 1, 2),
            mx AS (SELECT user_id, MAX(len) AS mlen FROM runs GROUP BY 1)
         SELECT r.user_id,
                CAST(SUM(r.len) AS BIGINT) AS n_weeks,
                COUNT(*) AS n_streaks,
                CAST(MAX(r.len) AS BIGINT) AS max_streak,
                CAST(MIN(CASE WHEN r.len = m.mlen THEN r.wk0 END) AS BIGINT)
                  AS best_start_wk
         FROM runs r JOIN mx m USING (user_id)
         GROUP BY r.user_id ORDER BY r.user_id""",

    "q_ts_wma" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS y
              FROM orders GROUP BY 1),
            lagged AS (SELECT dt, y,
                row_number() OVER (ORDER BY dt) AS rn,
                7 * y
                  + 6 * COALESCE(lag(y, 1) OVER (ORDER BY dt), 0)
                  + 5 * COALESCE(lag(y, 2) OVER (ORDER BY dt), 0)
                  + 4 * COALESCE(lag(y, 3) OVER (ORDER BY dt), 0)
                  + 3 * COALESCE(lag(y, 4) OVER (ORDER BY dt), 0)
                  + 2 * COALESCE(lag(y, 5) OVER (ORDER BY dt), 0)
                  + 1 * COALESCE(lag(y, 6) OVER (ORDER BY dt), 0) AS num
              FROM daily)
         SELECT dt, y AS y_cents, CAST(num AS BIGINT) AS wma_num,
                CAST(num AS DOUBLE) / 28.0 AS wma_cents
         FROM lagged WHERE rn >= 7 ORDER BY dt""",

    "q_win_reset_cumsum" ->
      """WITH ev AS (SELECT user_id, event_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                       CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS cents
                     FROM events),
            flagged AS (SELECT user_id, event_id, us, cents,
                    CASE WHEN us - lag(us) OVER w > 1800000000
                           OR lag(us) OVER w IS NULL
                         THEN 1 ELSE 0 END AS new_sess
                  FROM ev
                  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
            sess AS (SELECT user_id, event_id, us, cents,
                    CAST(SUM(new_sess) OVER (PARTITION BY user_id
                      ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS sess
                  FROM flagged)
         SELECT user_id, event_id, sess,
                CAST(SUM(cents) OVER (PARTITION BY user_id, sess
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS run_cents
         FROM sess ORDER BY user_id, event_id"""
  )
}
