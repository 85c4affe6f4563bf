package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{Det, Tables}
import graft.streaming.StreamOps

/** Round-5 batch 2: GROUPS-frame emulation, calendar-month arithmetic,
  * two rolling time-series signals (z-score anomaly, truncated EWMA), a
  * sixth REAL streaming query (stateful dedup), and two training-pipeline
  * ops (deterministic dataset mixing, winnowing fingerprints).
  *
  * Recurring scale theme: every windowed query here shuffles ONCE on its
  * partition key and computes the signal inside the sorted partition —
  * frames are bounded (≤24 rows), so state per row is O(1) and the plan
  * is a single Exchange + Sort + Window regardless of table size.
  */
object Extras7 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GROUPS frame emulation: Spark has no GROUPS BETWEEN (SQL:2011), but
    // a dense_rank pre-pass turns peer groups into consecutive integers,
    // after which RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING over the rank
    // IS the GROUPS frame — each row aggregates over all peers of the
    // previous/current/next distinct order-key value. Two windows share
    // one partitioning (l_returnflag), so Catalyst plans a single
    // Exchange+Sort and both Window operators run on the same sorted run.
    "q_win_groups_frame" -> ((s, d) => {
      val wr = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val wg = Window.partitionBy(col("l_returnflag")).orderBy(col("g"))
        .rangeBetween(-1, 1)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        .withColumn("g", dense_rank().over(wr))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          count(lit(1)).over(wg).as("n_frame"),
          sum(dec(col("l_quantity"))).over(wg).cast(DoubleType).as("qty_frame"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — order by every output column so any remaining
        // duplicates are bit-identical rows (interchangeable under hash).
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    // Calendar-month arithmetic: months_between's three semantic regimes
    // in one query — the 31-day fractional rule, the both-last-days
    // integer rule (mb_lastday), and the day-clamp interaction with
    // add_months (mb_same: Sep 29 − 7 months clamps to Feb 28, so the
    // "same day" shortcut misses and the 1/31 fraction appears). The
    // oracle reconstructs Spark's documented rule from day/month/year
    // parts — both engines round the identical IEEE double to 8 dp.
    "q_fn_months" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          months_between(col("o_orderdate"), lit("1994-06-15").cast("date"))
            .as("mb"),
          months_between(last_day(col("o_orderdate")),
            lit("1994-06-30").cast("date")).as("mb_lastday"),
          months_between(col("o_orderdate"),
            add_months(col("o_orderdate"), -7)).as("mb_same"))
        .orderBy("o_orderkey")
    }),

    // Rolling z-score anomaly detection: each event scored against the
    // trailing 24-event window of its own user. Exact DECIMAL power sums
    // (order-free across merges) feed ONE shared IEEE formula; only rows
    // with n>1 and positive variance score (constant windows → NULL).
    // Frames are ROWS-bounded, so executor state is 24 rows per user
    // regardless of history length — the streaming-friendly shape.
    "q_ts_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-23, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          dec(col("value")).as("v"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("v")).over(w).cast(DoubleType))
        .withColumn("s2", sum((col("v") * col("v")).cast(DecimalType(38, 4)))
          .over(w).cast(DoubleType))
        .withColumn("varp",
          (col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
        .select(col("event_id"), col("user_id"), col("n"), col("s1"),
          when(col("n") > 1 && col("varp") > 0,
            r6((col("v").cast(DoubleType) - col("s1") / col("n"))
              / sqrt(col("varp")))).as("z"))
        .orderBy("event_id")
    }),

    // Truncated EWMA (α = 1/2, 16-tap): weights are exact powers of two,
    // so numerator products and their sum stay EXACT integers in double
    // space (≤ 2^36 ≪ 2^53) — order-free with no decimal cast needed.
    // collect_list over a ROWS frame is frame-ordered (oldest→newest) in
    // both engines; one division + 6-dp round at the end. The per-row
    // array is ≤16 elements, so the HOF cost is O(1) per row.
    "q_ts_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-15, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .withColumn("lst", collect_list(col("cents")).over(w))
        .select(col("event_id"), col("user_id"),
          size(col("lst")).as("n_win"),
          expr("""aggregate(
                    zip_with(lst, sequence(1, size(lst)),
                             (v, k) -> CAST(v AS DOUBLE) * power(2, k - 1)),
                    CAST(0 AS DOUBLE), (a, x) -> a + x)""").as("num"))
        .select(col("event_id"), col("user_id"), col("n_win"), col("num"),
          r6(col("num") / (pow(lit(2.0), col("n_win")) - 1.0) / 100.0)
            .as("ewma"))
        .orderBy("event_id")
    }),

    // Sixth REAL streaming query: stateful in-stream dedup. The dedup key
    // state lives in the state store; append mode emits each key's first
    // arrival only. Projecting BEFORE dedup makes the output independent
    // of which physical duplicate wins the intra-batch race (all dup rows
    // project identically), so a parallel read stays hash-deterministic.
    // Production variant with bounded state (dropDuplicatesWithinWatermark)
    // is exercised in StreamingSpec; the fixture replay needs full history.
    "q_stream_live_dedup" -> ((s, d) => {
      val dd = StreamOps.eventsFileStream(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      StreamOps.runToMemoryAppend(dd, "live_dedup")
        .orderBy("user_id", "event_type")
    }),

    // Deterministic dataset mixing — the training-mix step that upsamples
    // or downsamples each source toward a target ratio. Per-doc keep
    // decision = portable md5 bucket vs the source's target rate (ppm), so
    // the mix is reproducible across engines, runs, and partitionings —
    // never rand()/TABLESAMPLE. One row-local predicate + one source agg.
    "q_llm_mix" -> ((s, d) => {
      val srcNum = substring(col("source"), 4, 10).cast("int")
      val thr = element_at(
        array(lit(1000000L), lit(500000L), lit(250000L), lit(100000L)),
        pmod(srcNum, lit(4)).cast("int") + 1)
      val keep = pmod(md5long(concat(col("doc_id").cast("string"),
        lit(":mix"))), lit(1000000L)) < thr
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(max(thr).as("target_ppm"),
          count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // Winnowing fingerprints (the MOSS document-fingerprint scheme): hash
    // every 4-gram, then per sliding window of 5 consecutive hashes keep
    // the minimum — guarantees any shared substring ≥ 8 words contributes
    // a shared fingerprint while storing ~2/(w+1) of the hashes. Shape:
    // per-row gram expansion (no shuffle), ONE doc_id window pass, one
    // agg; at 100 TB the distinct fingerprints would feed the same
    // posting-list join as q_llm_dedup_near.
    "q_llm_winnow" -> ((s, d) => {
      val K = 4
      val W = 5
      val ws = split(col("text"), " ")
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), ws.as("w"))
        .where(size(col("w")) >= K)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("w")) - K),
          i => md5long(concat_ws(" ", slice(col("w"), i + 1, lit(K)))))))
        .toDF("doc_id", "pos", "h")
      val wm = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(-(W - 1), 0)
      grams
        .withColumn("m", min(col("h")).over(wm))
        .where(col("pos") >= W - 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("m")).as("n_fp"),
          min(col("m")).as("min_fp"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_groups_frame" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
                           dense_rank() OVER (PARTITION BY l_returnflag
                             ORDER BY l_quantity) AS g
                    FROM lineitem)
         SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
                COUNT(*) OVER w AS n_frame,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w
                     AS DOUBLE) AS qty_frame
         FROM t
         WINDOW w AS (PARTITION BY l_returnflag ORDER BY g
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""",
    "q_fn_months" ->
      """WITH t AS (SELECT o_orderkey, o_orderdate::DATE AS d1,
                           (o_orderdate::DATE - INTERVAL 7 MONTH)::DATE AS d7
                    FROM orders)
         SELECT o_orderkey,
                round(CAST((year(d1)-1994)*12 + (month(d1)-6) AS DOUBLE)
                      + CASE WHEN day(d1) = 15 THEN 0.0
                             ELSE (day(d1)-15)/31.0 END, 8) AS mb,
                CAST((year(d1)-1994)*12 + (month(d1)-6) AS DOUBLE)
                  AS mb_lastday,
                round(CAST((year(d1)-year(d7))*12 + (month(d1)-month(d7))
                        AS DOUBLE)
                      + CASE WHEN day(d1) = day(d7)
                               OR (d1 = last_day(d1) AND d7 = last_day(d7))
                             THEN 0.0
                             ELSE (day(d1)-day(d7))/31.0 END, 8) AS mb_same
         FROM t ORDER BY o_orderkey""",
    "q_ts_zscore" ->
      """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS t,
                           CAST(value AS DECIMAL(18,2)) AS v
                    FROM events),
            s AS (SELECT event_id, user_id, v,
                         COUNT(*) OVER w AS n,
                         CAST(SUM(v) OVER w AS DOUBLE) AS s1,
                         CAST(SUM(CAST(v*v AS DECIMAL(38,4))) OVER w
                              AS DOUBLE) AS s2
                  FROM e
                  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
            x AS (SELECT event_id, user_id, n, s1, v,
                         (s2 - s1*s1/n)/n AS varp
                  FROM s)
         SELECT event_id, user_id, n, s1,
                CASE WHEN n > 1 AND varp > 0
                     THEN round((CAST(v AS DOUBLE) - s1/n) / sqrt(varp), 6)
                     ELSE NULL END AS z
         FROM x ORDER BY event_id""",
    "q_ts_ewma" ->
      """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS t,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                             AS cents
                    FROM events),
            l AS (SELECT event_id, user_id,
                         list(cents) OVER (PARTITION BY user_id
                           ORDER BY t, event_id
                           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS lst
                  FROM e),
            n AS (SELECT event_id, user_id,
                         CAST(len(lst) AS INT) AS n_win,
                         list_dot_product(
                           list_transform(lst, x -> CAST(x AS DOUBLE)),
                           list_transform(generate_series(1, len(lst)),
                                          k -> power(2, k - 1))) AS num
                  FROM l)
         SELECT event_id, user_id, n_win, num,
                round(num / (power(2, n_win) - 1) / 100, 6) AS ewma
         FROM n ORDER BY event_id""",
    "q_stream_live_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "q_llm_mix" ->
      """SELECT source,
                CAST(MAX(([1000000, 500000, 250000, 100000])
                    [(CAST(substr(source, 4) AS INT) % 4) + 1])
                  AS BIGINT) AS target_ppm,
                COUNT(*) AS n_total,
                CAST(SUM(CASE WHEN
                    CAST(('0x' || substr(md5(doc_id || ':mix'), 1, 15))
                         AS BIGINT) % 1000000
                    < ([1000000, 500000, 250000, 100000])
                      [(CAST(substr(source, 4) AS INT) % 4) + 1]
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM documents GROUP BY source ORDER BY source""",
    "q_llm_winnow" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 4),
            g AS (SELECT doc_id, i - 1 AS pos,
                         CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]
                           || ' ' || ws[i+2] || ' ' || ws[i+3]), 1, 15))
                           AS BIGINT) AS h
                  FROM (SELECT doc_id, ws,
                          unnest(generate_series(1, len(ws) - 3)) AS i
                        FROM w)),
            m AS (SELECT doc_id, pos,
                         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS m
                  FROM g)
         SELECT doc_id, COUNT(*) AS n_windows,
                COUNT(DISTINCT m) AS n_fp, MIN(m) AS min_fp
         FROM m WHERE pos >= 4 GROUP BY doc_id ORDER BY doc_id""")
}
