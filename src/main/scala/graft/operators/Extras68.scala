package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-10 additions, part 6: the streaming merge-on-read view —
  * a compacted BASE aggregate served together with a LIVE streaming
  * delta, reconciled at read time (round-9 advice's "streaming
  * merge-on-read view" item; the streaming sibling of
  * q_scan_merge_on_read).
  *
  * Determinism contract (SURVEY §2.13): the base/delta split is the
  * even/odd event_id parity (content-derived, batch-split-invariant);
  * both sides aggregate exact integer cents; the merge is a full-outer
  * coalesce — no IEEE value and no wall-clock enters the emit.
  */
object Extras68 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STREAMING MERGE-ON-READ — base = per-user totals of the even
    // event_ids read as a STATIC compacted snapshot; delta = the odd
    // event_ids arriving through a REAL streaming aggregation
    // (AvailableNow, complete-mode memory sink); the read-side view is
    // the full-outer merge with per-side provenance counts. This is the
    // serving shape of an MoR table with a live tail: the base never
    // rewrites, the delta stays a running aggregate, and the reader
    // pays one co-partitioned join. At 100 TB both sides are
    // user-partitioned and the join co-locates on the same key.
    "q_stream_live_mor" -> ((s, d) => {
      import graft.streaming.StreamOps
      val base = Tables.events(s, d)
        .where(expr("event_id % 2 = 0"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_base"),
          sum((dec(col("value")) * 100).cast("long")).as("cents_base"))
      val delta = StreamOps.eventsFileStream(s, d)
        .where(expr("event_id % 2 = 1"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_delta"),
          sum((dec(col("value")) * 100).cast("long")).as("cents_delta"))
      val live = StreamOps.runToMemory(delta, "live_mor")
      base.as("b").join(live.as("dl"), Seq("user_id"), "full")
        .select(col("user_id"),
          (coalesce(col("n_base"), lit(0L))
            + coalesce(col("n_delta"), lit(0L))).as("n_total"),
          (coalesce(col("cents_base"), lit(0L))
            + coalesce(col("cents_delta"), lit(0L))).as("cents_total"),
          col("n_base").isNotNull.as("in_base"),
          col("n_delta").isNotNull.as("in_delta"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_stream_live_mor" ->
      """WITH b AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_base,
                    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents_base
                 FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
            dl AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_delta,
                     CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS BIGINT) AS cents_delta
                   FROM events WHERE event_id % 2 = 1 GROUP BY user_id)
         SELECT COALESCE(b.user_id, dl.user_id) AS user_id,
                COALESCE(n_base, 0) + COALESCE(n_delta, 0) AS n_total,
                COALESCE(cents_base, 0) + COALESCE(cents_delta, 0)
                  AS cents_total,
                b.user_id IS NOT NULL AS in_base,
                dl.user_id IS NOT NULL AS in_delta
         FROM b FULL OUTER JOIN dl ON b.user_id = dl.user_id
         ORDER BY user_id"""
  )
}
