package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 8: HDR-style log₂ latency histogram,
  * historical VaR/CVaR, deterministic name-based UUIDs, and
  * overlapping sliding-window chunking.
  *
  * Determinism contract (SURVEY §2.13) throughout. The log₂ bucket is
  * computed as the BINARY STRING LENGTH of the integer (floor(log2)+1)
  * — a pure integer/string operation in both engines, immune to the
  * log2(2^k)-returns-k−ε IEEE hazard a float floor(log2(x)) carries.
  */
object Extras45 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HDR LOG-HISTOGRAM — inter-event gaps per user bucketed by powers
    // of two (the latency-engineering histogram shape: exact counts,
    // exponentially growing bins, cumulative percentile column). Gap
    // extraction is one (user) shuffle + lag; the bucket relation is
    // ~log₂(max gap) rows. Bucket id = length(bin(gap)) — exact.
    "q_agg_hdr_histogram" -> ((s, d) => {
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_s",
          expr("(us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) div 1000000"))
        .where(col("gap_s").isNotNull && col("gap_s") >= 1)
        .withColumn("bucket", length(bin(col("gap_s"))).cast("long"))
      val hist = gaps.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("gap_s")).as("min_gap_s"),
          max(col("gap_s")).as("max_gap_s"))
      val tot = hist.agg(sum(col("n")).as("total"))
      hist.crossJoin(broadcast(tot))
        .withColumn("cum_n",
          sum(col("n")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))")
            .as("lo_s"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1")
            .as("hi_s"),
          col("n"), col("min_gap_s"), col("max_gap_s"), col("cum_n"),
          r6(col("cum_n").cast("double") / col("total").cast("double"))
            .as("cum_pct"))
        .orderBy("bucket")
    }),

    // HISTORICAL VaR/CVaR — the 95% value-at-risk of day-over-day
    // revenue changes: the k-th worst delta (k = ⌈0.05·n⌉, exact
    // discrete quantile via row_number with date tie-break) and the
    // mean of the k worst (CVaR/expected shortfall). Deltas are exact
    // cent integers; CVaR is the one IEEE division.
    "q_ts_var95" -> ((s, d) => {
      val ord = Window.orderBy(col("dt"))
      val deltas = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("delta", col("y") - lag(col("y"), 1).over(ord))
        .where(col("delta").isNotNull)
      val ranked = deltas
        .withColumn("rn", row_number().over(
          Window.orderBy(col("delta"), col("dt"))))
        .crossJoin(broadcast(deltas.agg(count(lit(1)).as("n"))))
        .withColumn("k", ceil(col("n") * 0.05).cast("long"))
      ranked
        .where(col("rn") <= col("k"))
        .groupBy(col("n"), col("k"))
        .agg(max(col("delta")).as("worst_kth"),
          sum(col("delta")).as("tail_sum"))
        .select(col("n").as("n_deltas"), col("k"),
          (-col("worst_kth")).as("var95_cents"),
          (-col("tail_sum")).cast("double").as("tail_loss_cents"),
          r6(-col("tail_sum").cast("double") / col("k").cast("double"))
            .as("cvar95_cents"))
    }),

    // NAME-BASED UUID (v3 shape) — the deterministic id-minting
    // primitive for cross-system entity resolution: md5 of the name,
    // formatted 8-4-4-4-12 with the version nibble forced to 3 and the
    // variant nibble to [89ab] — pure integer/hex-string ops, identical
    // bytes in both engines. Embarrassingly parallel over any table.
    "q_fn_uuid5" -> ((s, d) => {
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"),
          lower(md5(col("n_name"))).as("h"))
        .select(col("n_nationkey"), col("n_name"),
          concat(
            substring(col("h"), 1, 8), lit("-"),
            substring(col("h"), 9, 4), lit("-"),
            lit("3"), substring(col("h"), 14, 3), lit("-"),
            lower(conv(
              (conv(substring(col("h"), 17, 1), 16, 10).cast("long")
                .bitwiseAND(3L).bitwiseOR(8L)).cast("string"), 10, 16)),
            substring(col("h"), 18, 3), lit("-"),
            substring(col("h"), 21, 12)).as("uuid"))
        .orderBy("n_nationkey")
    }),

    // OVERLAPPING CHUNKING — the sliding-window tokenizer-prep shape
    // (window 128, stride 64): every token lands in ≥ 1 chunk, interior
    // tokens in 2. Chunk starts are a pure per-row sequence projection;
    // the per-source rollup reports the token-expansion ratio the
    // training-data budget planner needs. All counts exact integers.
    "q_llm_chunk_overlap" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("n_tok"))
        .select(col("source"), col("doc_id"), col("n_tok"),
          explode(sequence(lit(1),
            greatest(col("n_tok") - 127, lit(1)), lit(64))).as("start"))
        .withColumn("chunk_len",
          least(lit(128), col("n_tok") - col("start") + 1))
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_len")).as("chunk_tokens"),
          sum(when(col("start") === 1, col("n_tok")).otherwise(0L))
            .as("raw_tokens"))
        .select(col("source"), col("n_docs"), col("n_chunks"),
          col("chunk_tokens"), col("raw_tokens"),
          r6(col("chunk_tokens").cast("double")
            / col("raw_tokens").cast("double")).as("expansion"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_hdr_histogram" ->
      """WITH g AS (SELECT user_id,
                    CAST((epoch_us(ts::TIMESTAMP)
                          - epoch_us(lag(ts::TIMESTAMP, 1) OVER
                              (PARTITION BY user_id
                               ORDER BY ts::TIMESTAMP, event_id)))
                         // 1000000 AS BIGINT) AS gap_s
                 FROM events),
            b AS (SELECT CAST(length(format('{:b}', gap_s)) AS BIGINT)
                      AS bucket, gap_s
                  FROM g WHERE gap_s IS NOT NULL AND gap_s >= 1),
            h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                         MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s
                  FROM b GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
            c AS (SELECT bucket, n, min_gap_s, max_gap_s,
                    CAST(SUM(n) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_n
                  FROM h)
         SELECT bucket,
                CAST(1::BIGINT << CAST(bucket - 1 AS INT) AS BIGINT)
                  AS lo_s,
                CAST((1::BIGINT << CAST(bucket AS INT)) - 1 AS BIGINT)
                  AS hi_s,
                n, min_gap_s, max_gap_s, cum_n,
                round(CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE), 6)
                  AS cum_pct
         FROM c, t ORDER BY bucket""",

    "q_ts_var95" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            del AS (SELECT dt, y - lag(y, 1) OVER (ORDER BY dt) AS delta
                    FROM daily),
            dd AS (SELECT dt, CAST(delta AS BIGINT) AS delta FROM del
                   WHERE delta IS NOT NULL),
            r AS (SELECT delta,
                    row_number() OVER (ORDER BY delta, dt) AS rn,
                    (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n
                  FROM dd),
            k AS (SELECT n AS kn, CAST(ceil(n * 0.05) AS BIGINT) AS k
                  FROM r LIMIT 1),
            tail AS (SELECT kn, k,
                       MAX(delta) AS worst_kth,
                       CAST(SUM(delta) AS BIGINT) AS tail_sum
                     FROM r, k WHERE rn <= k GROUP BY kn, k)
         SELECT kn AS n_deltas, k, -worst_kth AS var95_cents,
                CAST(-tail_sum AS DOUBLE) AS tail_loss_cents,
                round(-CAST(tail_sum AS DOUBLE) / CAST(k AS DOUBLE), 6)
                  AS cvar95_cents
         FROM tail""",

    "q_fn_uuid5" ->
      """WITH h AS (SELECT n_nationkey, n_name, lower(md5(n_name)) AS h
                 FROM nation)
         SELECT n_nationkey, n_name,
                substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
                '3' || substr(h, 14, 3) || '-' ||
                format('{:x}',
                  (CAST(('0x' || substr(h, 17, 1)) AS BIGINT) & 3) | 8)
                || substr(h, 18, 3) || '-' || substr(h, 21, 12) AS uuid
         FROM h ORDER BY n_nationkey""",

    "q_llm_chunk_overlap" ->
      """WITH d AS (SELECT source, doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                 FROM documents),
            c AS (SELECT source, doc_id, n_tok,
                    unnest(generate_series(1,
                      greatest(n_tok - 127, 1), 64)) AS start
                  FROM d),
            l AS (SELECT source, doc_id, n_tok, start,
                    least(128, n_tok - start + 1) AS chunk_len
                  FROM c)
         SELECT source,
                CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_chunks,
                CAST(SUM(chunk_len) AS BIGINT) AS chunk_tokens,
                CAST(SUM(CASE WHEN start = 1 THEN n_tok ELSE 0 END)
                  AS BIGINT) AS raw_tokens,
                round(CAST(SUM(chunk_len) AS DOUBLE)
                  / CAST(SUM(CASE WHEN start = 1 THEN n_tok ELSE 0 END)
                         AS DOUBLE), 6) AS expansion
         FROM l GROUP BY source ORDER BY source"""
  )
}
