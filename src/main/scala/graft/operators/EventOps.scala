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
