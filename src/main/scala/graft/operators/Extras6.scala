package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}
import graft.streaming.StreamOps

/** Round-5 operator additions: exact-distinct bitmap aggregation, median/
  * count_if, interval arithmetic, Z-order layout clustering, scan-internal
  * row positions, nearest as-of join, two more REAL streaming queries
  * (sliding windows and a stream-stream interval join), and two
  * training-pipeline ops (URL-canonicalization dedup, bigram-LM quality
  * scoring).
  *
  * Scale notes are inline per query; the recurring theme: bitmaps and
  * Z-values are the two classic "turn an expensive global property into a
  * mergeable per-partition artifact" tricks — bitmaps make exact distinct
  * counts partial-aggregatable, Z-values make multi-dimension locality a
  * 1-D sort key that file min/max stats can prune on.
  */
object Extras6 {
  import Det._

  /** Morton bit-spread of the low 16 bits of `c`: inserts a zero between
    * consecutive bits (0b1011 → 0b1000101). Four mask-and-shift rounds —
    * pure codegen'd integer ops, no UDF. */
  private def spread(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // median + count_if + SUM(DISTINCT): the exact-median completes the
    // percentile family (q_agg_percentile holds the general form); all
    // three are single-pass grouped aggregates — median sorts within the
    // group, DISTINCT-sum expands then re-aggregates, both standard
    // two-phase shapes at scale.
    "q_agg_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(r6(median(col("l_quantity"))).as("med_qty"),
          count_if(col("l_discount") > 0.05).as("n_disc"),
          sum_distinct(dec(col("l_quantity"))).cast("double")
            .as("sum_dist_qty"))
        .orderBy("l_returnflag")
    }),

    // EXACT distinct counts via the bitmap family (Spark 3.5+): each
    // (status, bucket) holds a 32k-bit bitmap of key positions;
    // bitmap_count sums exact cardinality per status, bitmap_or_agg
    // merges buckets across statuses for the global count WITHOUT
    // re-touching raw rows. This is the exact-arithmetic sibling of
    // q_agg_hll_union — build once, merge anywhere, and (unlike HLL)
    // oracle-checkable against COUNT(DISTINCT). At 100 TB the per-bucket
    // bitmaps are the mergeable per-partition artifact; raw keys never
    // re-shuffle to a second stage.
    "q_fn_bitmap" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"),
          expr("bitmap_bucket_number(o_custkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
          .as("bm"))
      val perStatus = per.groupBy(col("o_orderstatus"))
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_distinct"))
      val all = per.groupBy(col("bkt"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_distinct"))
        .select(lit("ALL").as("o_orderstatus"), col("n_distinct"))
      perStatus.unionByName(all).orderBy("o_orderstatus")
    }),

    // Interval arithmetic family: literal-interval shift, column-scaled
    // timestampadd, timestampdiff against a truncation anchor (both
    // engines agree exactly when the anchor is unit-aligned), and ISO
    // week truncation. Outputs as epoch-µs per §2.13 rule 3.
    "q_fn_interval" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          tsUs(col("ts") + expr("INTERVAL 90 MINUTE")).as("plus90m_us"),
          tsUs(expr("timestampadd(DAY, user_id % 5, ts)")).as("plus_days_us"),
          expr("timestampdiff(MINUTE, date_trunc('DAY', ts), ts)")
            .as("min_since_midnight"),
          tsUs(date_trunc("week", col("ts"))).as("week_us"))
        .orderBy("event_id")
    }),

    // Z-order (Morton) layout clustering: interleave the bits of two
    // dimensions into one sort key, so ONE file sort gives locality in
    // BOTH dimensions — the lakehouse data-layout op behind multi-column
    // file skipping. The query proves the property the optimizer would
    // exploit: within each Z-bucket both x and y are range-bounded (the
    // min/max spans shrink ~√bucket-count per dim), so a predicate on
    // EITHER dimension prunes most buckets by file stats alone. The
    // Z-value is four mask-shift rounds per dim — codegen'd integer ops,
    // a per-row map with no shuffle beyond the final stats agg.
    "q_layout_zorder" -> ((s, d) => {
      val x = pmod(col("o_custkey"), lit(4096L))
      val y = pmod(floor(col("o_totalprice")).cast("long"), lit(4096L))
      Tables.orders(s, d)
        .select(col("o_orderkey"), x.as("x"), y.as("y"),
          spread(x).bitwiseOR(shiftleft(spread(y), 1)).as("zval"))
        .groupBy(shiftright(col("zval"), 16).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("zbucket")
    }),

    // Scan-internal row positions: the parquet reader's file ordinal
    // (_metadata.row_index) IS the storage-level offset of the row — the
    // Spark spelling of the reference store's physical offset. The fixture
    // writes events in event_id order, so position must equal id; the
    // filter exercises predicate evaluation over metadata columns (no
    // pushdown — evaluated post-scan, but the scan itself stays columnar).
    "q_scan_rowindex" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"),
          col("_metadata.row_index").as("row_idx"),
          col("_metadata.file_name").as("fname"))
        .where(col("row_idx") % 97 === 0)
        .orderBy("event_id")
    }),

    // Nearest as-of join: each purchase matched to the temporally CLOSEST
    // click of the same user within ±1 hour — backward OR forward, unlike
    // q_join_asof's backward-only. Shape: the user-key equi-join carries
    // the shuffle, the ±1h band bounds the candidate fan-out, one
    // per-purchase window picks the minimum distance (ties → earlier
    // click, pinned). At 100 TB the band predicate is what keeps the join
    // linear — candidates per probe stay O(events within 2h), not O(user
    // history) — and the band would become the 2-bucket explode of
    // q_join_range_bucketed to avoid the nested-loop.
    "q_join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          tsUs(col("ts")).as("p_us"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          tsUs(col("ts")).as("c_us"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(abs(col("c_us") - col("p_us")), col("c_us"), col("c_id"))
      p.join(c, col("c_user") === col("user_id")
          && abs(col("c_us") - col("p_us")) <= 3600000000L)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("p_id"), col("user_id"), col("p_us"),
          col("c_id"), col("c_us"))
        .orderBy("p_id")
    }),

    // URL-canonicalization dedup — the CommonCrawl-style first pass of a
    // web-corpus pipeline: scheme/www/utm-parameter variants of the same
    // page collapse to one canonical form; keep the smallest doc_id per
    // canonical URL. The fixture has no URL column, so variants are
    // synthesized deterministically from doc_id (both engines build the
    // same strings). Pure row-local regex → one canonical-key shuffle.
    "q_llm_dedup_url" -> ((s, d) => {
      val base = pmod(col("doc_id"), lit(211L))
      val url = concat(
        when(pmod(col("doc_id"), lit(2L)) === 0, "https").otherwise("http"),
        lit("://"),
        when(pmod(col("doc_id"), lit(3L)) === 0, "www.").otherwise(""),
        lit("site"), pmod(base, lit(7L)), lit(".org/p/"), base,
        when(pmod(col("doc_id"), lit(2L)) === 1,
          concat(lit("?utm_source=feed&utm_id="), col("doc_id")))
          .otherwise(""))
      val canon = regexp_replace(regexp_replace(regexp_replace(
        url, "^https?://", ""), "^www\\.", ""), "\\?utm.*$", "")
      Tables.documents(s, d)
        .select(col("doc_id"), canon.as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_doc"))
        .orderBy("canonical")
    }),

    // Bigram-LM quality score — the KenLM-style fluency signal of a
    // training pipeline, self-trained on the corpus: per doc, the mean
    // conditional probability P(w2|w1) = C(w1w2)/C(w1·) of its bigrams
    // under the corpus counts. Gibberish scores low, templated text high.
    // Determinism: each P is one IEEE division of exact counts rounded to
    // 6 dp, summed in DECIMAL (order-free), one final division+round.
    // Scale: two count aggregates + two joins keyed on the bigram/prefix —
    // the model "table" is vocabulary-sized, NOT corpus-sized, and both
    // joins shuffle only (hashable) token keys.
    "q_llm_ngram_lm" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), ws.as("w"))
        .where(size(col("w")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("w1"),
            element_at(col("w"), i + 2).as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      // The per-doc score is the exact DECIMAL SUM of the 6-dp-rounded
      // probabilities — deliberately NOT the average: avg's final
      // divide+round can land on a true decimal tie (observed: doc with
      // sum 0.378378 over 12 bigrams → 0.0315315, which Spark HALF_UPs
      // and DuckDB's double path rounds down). The sum is tie-free. The
      // per-row round(c12/c1, 6) can only tie when the quotient
      // terminates at the 7th decimal; checked exhaustively over the
      // fixtures, the sole such pair (35/896 at sf0.001) is dyadic —
      // binary-exact — and both engines round it up.
      bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .select(col("doc_id"),
          round(col("c12").cast("double") / col("c1"), 6).as("p"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("p").cast("decimal(18,6)")).cast("double").as("lm_sum"))
        .orderBy("doc_id")
    }),

    // Fourth REAL streaming query: sliding windows (1h window, 15min
    // slide) under MicroBatchExecution — each event contributes to 4
    // overlapping window states. Same oracle as the batch twin
    // q_stream_sliding: window() is the same declarative operator in both
    // execution modes.
    "q_stream_live_sliding" -> ((s, d) => {
      val sl = StreamOps.eventsFileStream(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"),
          col("sum_v"))
      StreamOps.runToMemory(sl, "live_sliding")
        .select(tsUs(col("ws")).as("ws_us"), col("event_type"), col("n"),
          col("sum_v"))
        .orderBy("ws_us", "event_type")
    }),

    // Fifth REAL streaming query: STREAM-STREAM interval self-join —
    // purchases matched to the same user's clicks in the preceding hour,
    // both sides watermarked so buffered state expires (the state-bounded
    // join contract at scale). Inner-join matches emit as soon as both
    // sides arrive; with AvailableNow over the fixture file every match
    // lands in the first micro-batch, so the result equals the batch
    // range join the oracle states.
    "q_stream_live_ssjoin" -> ((s, d) => {
      val joined = StreamOps.purchaseClickJoin(StreamOps.eventsFileStream(s, d))
      StreamOps.runToMemoryAppend(joined, "live_ssjoin")
        .select(col("p_id"), col("p_user"), col("c_id"),
          tsUs(col("p_ts")).as("p_us"), tsUs(col("c_ts")).as("c_us"))
        .orderBy("p_id", "c_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_median" ->
      """SELECT l_returnflag,
                round(median(l_quantity), 6) AS med_qty,
                CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
                CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2)))
                     AS DOUBLE) AS sum_dist_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_fn_bitmap" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
         FROM orders GROUP BY o_orderstatus
         UNION ALL
         SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders
         ORDER BY o_orderstatus""",
    "q_fn_interval" ->
      """SELECT event_id,
                epoch_us(ts::TIMESTAMP + INTERVAL 90 MINUTE) AS plus90m_us,
                epoch_us(ts::TIMESTAMP + INTERVAL ((user_id % 5)::INT) DAY)
                  AS plus_days_us,
                date_diff('minute', date_trunc('day', ts::TIMESTAMP),
                  ts::TIMESTAMP) AS min_since_midnight,
                epoch_us(date_trunc('week', ts::TIMESTAMP)) AS week_us
         FROM events ORDER BY event_id""",
    "q_layout_zorder" ->
      """WITH t AS (SELECT o_orderkey,
                          o_custkey % 4096 AS x,
                          CAST(floor(o_totalprice) AS BIGINT) % 4096 AS y
                   FROM orders),
            sx AS (SELECT *,
                     ((x | (x << 8)) & 16711935) AS x1,
                     ((y | (y << 8)) & 16711935) AS y1 FROM t),
            s2 AS (SELECT *,
                     ((x1 | (x1 << 4)) & 252645135) AS x2,
                     ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sx),
            s3 AS (SELECT *,
                     ((x2 | (x2 << 2)) & 858993459) AS x3,
                     ((y2 | (y2 << 2)) & 858993459) AS y3 FROM s2),
            s4 AS (SELECT *,
                     ((x3 | (x3 << 1)) & 1431655765) AS x4,
                     ((y3 | (y3 << 1)) & 1431655765) AS y4 FROM s3)
         SELECT (x4 | (y4 << 1)) >> 16 AS zbucket, COUNT(*) AS n,
                MIN(x) AS min_x, MAX(x) AS max_x,
                MIN(y) AS min_y, MAX(y) AS max_y
         FROM s4 GROUP BY 1 ORDER BY zbucket""",
    "q_scan_rowindex" ->
      """SELECT event_id, user_id, rn AS row_idx,
                'events.parquet' AS fname
         FROM (SELECT event_id, user_id,
                      row_number() OVER (ORDER BY event_id) - 1 AS rn
               FROM events)
         WHERE rn % 97 = 0 ORDER BY event_id""",
    "q_join_asof_nearest" ->
      """WITH p AS (SELECT event_id AS p_id, user_id,
                          epoch_us(ts::TIMESTAMP) AS p_us
                   FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS c_id, user_id AS c_user,
                         epoch_us(ts::TIMESTAMP) AS c_us
                  FROM events WHERE event_type = 'click'),
            j AS (SELECT p_id, user_id, p_us, c_id, c_us,
                         row_number() OVER (PARTITION BY p_id
                           ORDER BY abs(c_us - p_us), c_us, c_id) AS rn
                  FROM p JOIN c ON c_user = user_id
                                AND abs(c_us - p_us) <= 3600000000)
         SELECT p_id, user_id, p_us, c_id, c_us
         FROM j WHERE rn = 1 ORDER BY p_id""",
    "q_llm_dedup_url" ->
      """WITH u AS (SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
                  || '://'
                  || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                  || 'site' || ((doc_id % 211) % 7) || '.org/p/'
                  || (doc_id % 211)
                  || (CASE WHEN doc_id % 2 = 1
                        THEN '?utm_source=feed&utm_id=' || doc_id
                        ELSE '' END) AS url
                   FROM documents)
         SELECT regexp_replace(regexp_replace(regexp_replace(url,
                  '^https?://', ''), '^www\.', ''), '\?utm.*$', '')
                  AS canonical,
                COUNT(*) AS n_variants, MIN(doc_id) AS keep_doc
         FROM u GROUP BY 1 ORDER BY canonical""",
    "q_llm_ngram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
            bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                   FROM (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws) - 1)) AS i
                         FROM w)),
            c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
            c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
            p AS (SELECT doc_id,
                         round(CAST(c12 AS DOUBLE) / c1, 6) AS p
                  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
         SELECT doc_id, COUNT(*) AS n_bigrams,
                CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS lm_sum
         FROM p GROUP BY doc_id ORDER BY doc_id""",
    "q_stream_live_sliding" ->
      """WITH e AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
                           epoch_us(ts::TIMESTAMP) AS tu FROM events),
            x AS (SELECT event_type, v,
                         ((tu // 1000000) // 900) * 900 AS b,
                         unnest([0, 1, 2, 3]) AS g
                  FROM e)
         SELECT (b - g * 900) * 1000000 AS ws_us, event_type,
                COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_v
         FROM x GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    "q_stream_live_ssjoin" ->
      """SELECT p.event_id AS p_id, p.user_id AS p_user, c.event_id AS c_id,
                epoch_us(p.ts::TIMESTAMP) AS p_us,
                epoch_us(c.ts::TIMESTAMP) AS c_us
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.user_id = c.user_id
          AND c.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 1 HOUR
          AND c.ts::TIMESTAMP <= p.ts::TIMESTAMP
         ORDER BY p_id, c_id""")
}
