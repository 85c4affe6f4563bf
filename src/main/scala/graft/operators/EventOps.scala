package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.9 event-stream operators — batch twins of the Structured Streaming
  * queries (graft.streaming covers the streaming-only semantics with
  * MemoryStream tests; these twins run the identical aggregation logic
  * over the static events table so the DuckDB oracle can grade them).
  *
  * Scale: tumbling/sliding aggregate per (window × type) — bounded output;
  * the session twin is one shuffle on user_id + two linear window passes,
  * the gaps-and-islands shape that streams as session_window at 100 TB.
  */
object EventOps {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling 1h window per event type.
    "q_stream_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(tsUs(col("w.start")).as("ws_us"), col("event_type"),
          col("n"), col("sum_v"))
        .orderBy("ws_us", "event_type")),

    // The SAME tumbling aggregation executed as a REAL Structured
    // Streaming query: file stream source over the events parquet →
    // incremental windowed agg under MicroBatchExecution → memory sink,
    // Trigger.AvailableNow (processes the full backlog, then self-stops).
    // Complete-mode output over a static input is deterministic, and the
    // sums are exact decimals — so actual streaming execution lands in
    // the DuckDB-graded surface, not just in MemoryStream tests. The
    // 100 TB shape is identical: the file source feeds offsets
    // incrementally; state is bounded by the (window × type) key space.
    "q_stream_live_tumbling" -> ((s, d) => {
      import graft.streaming.StreamOps
      StreamOps.runToMemory(
          StreamOps.tumbling(StreamOps.eventsFileStream(s, d)),
          "live_tumbling")
        .select(tsUs(col("ws")).as("ws_us"), col("event_type"),
          col("n"), col("sum_v"))
        .orderBy("ws_us", "event_type")
    }),

    // Stream-STATIC join as a REAL streaming query: the event stream is
    // enriched against the broadcast customer dimension (user_id is a
    // customer key in the fixture) and aggregated per (window × market
    // segment) — the canonical "enrich a stream with a dim table" shape.
    // Same AvailableNow/memory-sink harness as q_stream_live_tumbling;
    // at scale the static side stays broadcast (no stream repartition).
    "q_stream_live_join" -> ((s, d) => {
      import graft.streaming.StreamOps
      val dim = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")))
      val enriched = StreamOps.eventsFileStream(s, d)
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(col("w.start").as("ws"), col("c_mktsegment"),
          col("n"), col("sum_v"))
      StreamOps.runToMemory(enriched, "live_join")
        .select(tsUs(col("ws")).as("ws_us"), col("c_mktsegment"),
          col("n"), col("sum_v"))
        .orderBy("ws_us", "c_mktsegment")
    }),

    // Sliding 1h window, 15-minute slide (each event in 4 windows).
    "q_stream_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(tsUs(col("w.start")).as("ws_us"), col("event_type"),
          col("n"), col("sum_v"))
        .orderBy("ws_us", "event_type")),

    // Session windows (30-minute gap) per user: gaps-and-islands — the
    // batch twin of session_window(ts, '30 minutes').
    "q_stream_session" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("pts", lag(col("ts"), 1).over(byUser))
        .withColumn("nw",
          when(col("pts").isNull ||
            tsUs(col("ts")) - tsUs(col("pts")) > 1800000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("nw"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(tsUs(min(col("ts"))).as("start_us"), tsUs(max(col("ts"))).as("end_us"),
          count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .orderBy("user_id", "sid")
    }),

    // Gap-fill / resample: replay each user's value series on a fixed
    // 1-hour grid with forward fill (last observation carried forward) —
    // the "read the stream at a cadence" idiom of an event store. Shape:
    // dedupe to one value per (user, ts) with a pinned tie rule, generate
    // the per-user grid, union grid markers into the event stream, and
    // take running last(ignoreNulls) over ONE user_id shuffle — the same
    // linear as-of pass as q_join_asof, no range join, no O(n·m).
    "q_ts_resample" -> ((s, d) => {
      val H = 3600000000L // 1 hour in µs
      // NULL values are dropped up front ON BOTH SIDES: forward-fill below
      // uses last(ignoreNulls), which would carry an OLDER value across a
      // null event while the DuckDB ASOF oracle would return the raw NULL
      // — "latest non-null observation" is the pinned contract.
      val ev = Tables.events(s, d).where(col("user_id") < 5)
        .where(col("value").isNotNull)
        .select(col("user_id"), tsUs(col("ts")).as("us"),
          col("value"), col("event_id"))
        .groupBy(col("user_id"), col("us"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min("us").as("mn"), max("us").as("mx"))
        // Guard the degenerate span: sequence(a, b) silently DESCENDS when
        // a > b (a user active within one hour, no boundary crossed) where
        // DuckDB's generate_series is empty — filter those users out
        // before exploding so both engines agree.
        .where(expr(s"(mn + ${H - 1}) div $H") <= expr(s"mx div $H"))
        .select(col("user_id"),
          explode(sequence(expr(s"(mn + ${H - 1}) div $H"),
            expr(s"mx div $H"))).as("hb"))
        .select(col("user_id"), (col("hb") * H).as("us"),
          lit(null).cast("double").as("v"), lit(1).as("is_grid"))
      val markers = ev.select(col("user_id"), col("us"), col("v"),
          lit(0).as("is_grid"))
        .unionByName(grid)
      // Events sort before grid markers at the same instant, so a reading
      // exactly on the grid is included — DuckDB ASOF (>=) semantics.
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      markers
        .withColumn("ff", last(col("v"), ignoreNulls = true).over(w))
        .where(col("is_grid") === 1)
        .select(col("user_id"), col("us").as("grid_us"), col("ff").as("value_ff"))
        .orderBy("user_id", "grid_us")
    }),

    // Keyed dedup keeping the first event per (user, type) — batch twin
    // of dropDuplicatesWithinWatermark.
    "q_stream_dedup_first" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          tsUs(col("ts")).as("ts_us"))
        .orderBy("user_id", "event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS ws_us,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    // The live streaming run computes the identical aggregation, so it
    // shares the tumbling oracle statement.
    "q_stream_live_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS ws_us,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    "q_stream_live_join" ->
      """SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS ws_us,
                c_mktsegment, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2 ORDER BY ws_us, c_mktsegment""",
    "q_stream_sliding" ->
      """WITH e AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
                           epoch_us(ts::TIMESTAMP) AS tu FROM events),
            x AS (SELECT event_type, v,
                         ((tu // 1000000) // 900) * 900 AS b,
                         unnest([0, 1, 2, 3]) AS g
                  FROM e)
         SELECT (b - g * 900) * 1000000 AS ws_us, event_type,
                COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_v
         FROM x GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    "q_stream_session" ->
      """WITH e AS (SELECT event_id, user_id, CAST(value AS DECIMAL(18,2)) AS v,
                           ts::TIMESTAMP AS ts FROM events),
            l AS (SELECT *, lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM e),
            f AS (SELECT *, CASE WHEN pts IS NULL
                                   OR epoch_us(ts) - epoch_us(pts) > 1800000000
                                 THEN 1 ELSE 0 END AS nw FROM l),
            s AS (SELECT *, CAST(SUM(nw) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
                  FROM f)
         SELECT user_id, sid, epoch_us(MIN(ts)) AS start_us,
                epoch_us(MAX(ts)) AS end_us, COUNT(*) AS n,
                CAST(SUM(v) AS DOUBLE) AS sum_v
         FROM s GROUP BY user_id, sid ORDER BY user_id, sid""",
    "q_ts_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS us,
                           max_by(value, event_id) AS v
                    FROM events WHERE user_id < 5 AND value IS NOT NULL
                    GROUP BY user_id, epoch_us(ts::TIMESTAMP)),
            b AS (SELECT user_id, MIN(us) AS mn, MAX(us) AS mx
                  FROM e GROUP BY user_id),
            g AS (SELECT user_id,
                         unnest(generate_series((mn + 3599999999) // 3600000000,
                                                mx // 3600000000)) AS hb
                  FROM b),
            grid AS (SELECT user_id, hb * 3600000000 AS gus FROM g)
         SELECT grid.user_id AS user_id, gus AS grid_us, e.v AS value_ff
         FROM grid ASOF JOIN e
           ON grid.user_id = e.user_id AND grid.gus >= e.us
         ORDER BY grid.user_id, grid_us""",
    "q_stream_dedup_first" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
                           epoch_us(ts::TIMESTAMP) AS ts_us,
                           row_number() OVER
                             (PARTITION BY user_id, event_type
                              ORDER BY ts::TIMESTAMP, event_id) AS rn
                    FROM events)
         SELECT user_id, event_type, event_id, ts_us FROM r
         WHERE rn = 1 ORDER BY user_id, event_type"""
  )
}
