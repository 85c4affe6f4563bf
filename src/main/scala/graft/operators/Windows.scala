package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.5 window functions + §2.6 sorts / limits / top-k.
  *
  * Scale notes: every window partitions on a real key (user_id / brand /
  * custkey) — never a global unpartitioned window, which would serialize
  * 100 TB through one task. Global top-k uses orderBy+limit which Spark
  * plans as TakeOrderedAndProject (per-partition heaps + driver merge of
  * k rows, no full sort).
  */
object Windows {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Ranking family. rn/ntile need a total per-partition order (ties
    // broken by p_partkey); rank/dense_rank run on the tied key alone —
    // deterministic by definition of rank semantics.
    "q_win_rank" -> ((s, d) => {
      val unique = Window.partitionBy("p_brand").orderBy(col("p_size"), col("p_partkey"))
      val tied = Window.partitionBy("p_brand").orderBy(col("p_size"))
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          row_number().over(unique).as("rn"),
          rank().over(tied).as("rk"),
          dense_rank().over(tied).as("drk"),
          ntile(4).over(unique).as("quartile"))
        .orderBy("p_partkey")
    }),

    // Analytic family: previous/next event value per user, first event
    // type in the stream-so-far.
    "q_win_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          first(col("event_type"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_type"))
        .orderBy("event_id")
    }),

    // Positional analytics: nth_value over a growing frame, first/last
    // value over a bounded sliding frame (frame edges exercise the
    // CURRENT ROW / FOLLOWING bound handling).
    "q_win_analytic2" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy("event_id")
      val grow = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val slide = ord.rowsBetween(-1, 1)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          nth_value(col("value"), 2).over(grow).as("second_v"),
          first(col("value")).over(slide).as("win_first"),
          last(col("value")).over(slide).as("win_last"))
        .orderBy("event_id")
    }),

    // Running aggregate, ROWS frame (exact decimal running sum).
    "q_win_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          sum(dec(col("value"))).over(w).cast("double").as("running_v"),
          count(lit(1)).over(w).as("n_so_far"))
        .orderBy("event_id")
    }),

    // Sliding aggregate, RANGE frame: trailing 24h per user over epoch
    // seconds. RANGE frames are order-insensitive within the bound, and
    // the decimal sum keeps the value exact.
    "q_win_frame_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_s")
        .rangeBetween(-86400L, 0L)
      Tables.events(s, d)
        .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
        .select(col("event_id"), col("user_id"), col("ts_s"),
          sum(dec(col("value"))).over(w).cast("double").as("trailing_24h"),
          count(lit(1)).over(w).as("n_24h"))
        .orderBy("event_id")
    }),

    // Multi-key sort with explicit null ordering.
    "q_sort_multi" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderpriority").desc_nulls_last,
          col("o_totalprice").asc_nulls_first, col("o_orderkey"))),

    // Global top-k → TakeOrderedAndProject (no full sort at scale).
    "q_topk" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(50)),

    // Top-k per group via ranked window + filter.
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // LIMIT/OFFSET pagination over a total order.
    "q_limit_offset" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50))
  )

  val oracle: Map[String, String] = Map(
    "q_win_analytic2" ->
      """SELECT event_id, user_id,
                nth_value(value, 2) OVER
                  (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_v,
                first_value(value) OVER w AS win_first,
                last_value(value) OVER w AS win_last
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         ORDER BY event_id""",
    "q_win_rank" ->
      """SELECT p_partkey, p_brand, p_size,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS INT) AS rn,
         CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS INT) AS rk,
         CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS INT) AS drk,
         CAST(ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS INT) AS quartile
         FROM part ORDER BY p_partkey""",
    "q_win_analytic" ->
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
                           value FROM events)
         SELECT event_id, user_id,
         lag(value)  OVER w AS prev_v,
         lead(value) OVER w AS next_v,
         first_value(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "q_win_frame_rows" ->
      """SELECT event_id, user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_v,
         COUNT(*) OVER w AS n_so_far
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_win_frame_range" ->
      """WITH e AS (SELECT event_id, user_id, value,
                           epoch_us(ts::TIMESTAMP) // 1000000 AS ts_s
                    FROM events)
         SELECT event_id, user_id, ts_s,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_24h,
         COUNT(*) OVER w AS n_24h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         ORDER BY o_orderpriority DESC NULLS LAST,
                  o_totalprice ASC NULLS FIRST, o_orderkey""",
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 50""",
    "q_topk_per_group" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100"""
  )
}
