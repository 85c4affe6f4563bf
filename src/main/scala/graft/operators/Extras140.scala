package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-12 additions, part 4: content-defined chunking (the
  * FastCDC-style rolling-boundary splitter every dedup-at-scale
  * pipeline runs before hashing), a complete-mode live streaming
  * aggregate (the output-mode surface q_stream_live_* hadn't
  * covered), the two-sided Page-Hinkley drift detector (round-11
  * verdict's "Page-Hinkley variants"), and weight-proportional
  * sampling without replacement (Efraimidis-Spirakis priorities from
  * a portable md5 uniform — the importance-weighted cousin of
  * q_scan_sample_fixed).
  *
  * Scale shape: cdc_chunk is one corpus-linear explode + per-doc
  * window + two bounded aggs; live_complete keeps |event_type| rows
  * of state; page_hinkley_two rides the calendar-bounded daily spine;
  * sample_weighted is one fact pass + a two-phase-eligible top-k
  * (global k=100 via TakeOrderedAndProject heaps).
  *
  * Determinism contract (SURVEY §2.13): chunk boundaries are integer
  * predicates on the portable 60-bit md5 (identical in both
  * engines); PH terms are the exact integer-micro recurrence of
  * q_ts_page_hinkley in both directions; sampling priorities
  * ln(u)/w are nano-quantized BEFORE the top-k so the selected set
  * is an integer ranking; the complete-mode agg is count + exact
  * decimal cents.
  */
object Extras140 {
  import Det._

  private val Big = DecimalType(38, 0)

  private def dailyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("dt")))
        .cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CONTENT-DEFINED CHUNKING — a token opens a new chunk when its
    // portable hash ≡ 0 (mod 64) (expected chunk ≈ 64 tokens, cut
    // points stable under insertions — the CDC property). Output:
    // the corpus chunk-length histogram.
    "q_llm_cdc_chunk" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("bnd",
          (pmod(md5long(col("w")), lit(64L)) === 0).cast("long"))
        .withColumn("chunk", sum(col("bnd")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      toks.groupBy(col("doc_id"), col("chunk"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("len"))
        .agg(count(lit(1)).as("n_chunks"))
        .orderBy("len")
    }),

    // COMPLETE-MODE LIVE AGGREGATE — the streaming output mode the
    // live suite hadn't covered: an unwatermarked global groupBy
    // whose sink holds the FULL recomputed result each micro-batch;
    // the final table equals the batch aggregate exactly.
    "q_stream_live_complete" -> ((s, d) => {
      val events = graft.streaming.StreamOps.eventsFileStream(s, d)
      val agg = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      graft.streaming.StreamOps.runToMemory(agg, "live_complete")
        .orderBy("event_type")
    }),

    // TWO-SIDED PAGE-HINKLEY — the q_ts_page_hinkley recurrence run
    // in both directions: ph_up = m − min(m) flags upward drift,
    // ph_down = max(m) − m downward; one row per direction with its
    // alarm day.
    "q_ts_page_hinkley_two" -> ((s, d) => {
      val dr = dailyRevenue(s, d)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = dr
        .withColumn("cum", sum(col("y").cast(Big)).over(wCum))
        .withColumn("term",
          col("y").cast(Big) * 1000000L
            - expr("(cum * 1000000) div t"))
      val m = terms.withColumn("m", sum(col("term")).over(wCum))
        .withColumn("ph_up", col("m") - min(col("m")).over(wCum))
        .withColumn("ph_down", max(col("m")).over(wCum) - col("m"))
        .duckCkpt()
      def side(ph: String, tag: String): DataFrame = {
        val top = m.agg(max(col(ph)).as("stat"), max(col("t")).as("n_days"))
        m.crossJoin(broadcast(top))
          .where(col(ph) === col("stat"))
          .groupBy(col("n_days"), col("stat"))
          .agg(min(col("dt")).as("alarm_day"))
          .select(lit(tag).as("direction"), col("n_days"),
            col("stat").cast("long").as("ph_micro"), col("alarm_day"),
            r6(col("stat").cast("double") / 1e6 / 100.0).as("ph_usd"))
      }
      side("ph_up", "up").unionByName(side("ph_down", "down"))
        .orderBy("direction")
    }),

    // WEIGHTED SAMPLE — Efraimidis-Spirakis: priority ln(u)/w (u a
    // portable md5 uniform on the key, w = exact cents), top-100 by
    // nano-quantized priority. Spend-heavy orders are proportionally
    // likelier to be kept; the selection is reproducible run to run.
    "q_scan_sample_weighted" -> ((s, d) => {
      val w = (dec(col("o_totalprice")) * 100).cast("long")
      val u = (pmod(md5long(col("o_orderkey").cast("string")),
        lit(1000000L)) + 1).cast("double") / lit(1000001.0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), w.as("cents"),
          round(log(u) / w.cast("double") * lit(1e15)).cast("long")
            .as("prio_femto"))
        .orderBy(col("prio_femto").desc, col("o_orderkey"))
        .limit(100)
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_cdc_chunk" ->
      """WITH toks AS (SELECT doc_id, i AS pos, ws[i] AS w
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws))) AS i
                       FROM (SELECT doc_id, string_split(text, ' ') AS ws
                             FROM documents) t0) t1),
            b AS (SELECT doc_id, pos,
                    CASE WHEN CAST(('0x' || substr(md5(w), 1, 15))
                        AS BIGINT) % 64 = 0 THEN 1 ELSE 0 END AS bnd
                  FROM toks),
            ch AS (SELECT doc_id,
                    CAST(SUM(bnd) OVER (PARTITION BY doc_id
                      ORDER BY pos) AS BIGINT) AS chunk
                  FROM b),
            lens AS (SELECT doc_id, chunk,
                    CAST(COUNT(*) AS BIGINT) AS len
                  FROM ch GROUP BY 1, 2)
         SELECT len, CAST(COUNT(*) AS BIGINT) AS n_chunks
         FROM lens GROUP BY 1 ORDER BY len""",

    "q_stream_live_complete" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_v
         FROM events GROUP BY 1 ORDER BY event_type""",

    "q_ts_page_hinkley_two" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            terms AS (SELECT dt, t,
                        CAST(y AS HUGEINT) * 1000000
                          - (SUM(CAST(y AS HUGEINT)) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND
                            CURRENT ROW) * 1000000) // t AS term
                      FROM dr),
            mm AS (SELECT dt, t,
                     SUM(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS m
                   FROM terms),
            ph AS (SELECT dt, t,
                     m - MIN(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS ph_up,
                     MAX(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) - m AS ph_down
                   FROM mm),
            up AS (SELECT 'up' AS direction, MAX(t) AS n_days,
                     MAX(ph_up) AS stat FROM ph),
            dn AS (SELECT 'down' AS direction, MAX(t) AS n_days,
                     MAX(ph_down) AS stat FROM ph),
            rows_up AS (SELECT up.direction, up.n_days,
                     CAST(up.stat AS BIGINT) AS ph_micro,
                     MIN(ph.dt) AS alarm_day,
                     round(CAST(up.stat AS DOUBLE) / 1e6 / 100.0, 6)
                       AS ph_usd
                   FROM ph, up WHERE ph.ph_up = up.stat
                   GROUP BY 1, 2, 3, 5),
            rows_dn AS (SELECT dn.direction, dn.n_days,
                     CAST(dn.stat AS BIGINT) AS ph_micro,
                     MIN(ph.dt) AS alarm_day,
                     round(CAST(dn.stat AS DOUBLE) / 1e6 / 100.0, 6)
                       AS ph_usd
                   FROM ph, dn WHERE ph.ph_down = dn.stat
                   GROUP BY 1, 2, 3, 5)
         SELECT * FROM rows_up UNION ALL SELECT * FROM rows_dn
         ORDER BY direction""",

    "q_scan_sample_weighted" ->
      """WITH base AS (SELECT o_orderkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents,
                    (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                       1, 15)) AS BIGINT) % 1000000 + 1) AS um
                 FROM orders),
            pr AS (SELECT o_orderkey, cents,
                    CAST(round(ln(CAST(um AS DOUBLE) / 1000001.0)
                      / CAST(cents AS DOUBLE) * 1e15) AS BIGINT)
                      AS prio_femto
                  FROM base)
         SELECT o_orderkey, cents, prio_femto
         FROM pr ORDER BY prio_femto DESC, o_orderkey LIMIT 100"""
  )
}
