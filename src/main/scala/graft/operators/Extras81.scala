package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 7: scale-infrastructure operators — the
  * bucketed interval-overlap join (the scalable interval-join shape:
  * grid-bucket both sides, join within bucket, dedup pairs),
  * deterministic per-group hash sampling, delta-of-delta encoding
  * accounting (the Gorilla/TSDB compression primitive), and
  * bitmap-index container accounting (the roaring-style storage
  * planner's sizing pass).
  *
  * Determinism contract (SURVEY §2.13): interval pairs, sample ranks,
  * deltas and container counts are exact integers; sample selection
  * orders by (portable md5, key) — a total order; emitted ratios are
  * one shared IEEE chain.
  */
object Extras81 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BUCKETED INTERVAL-OVERLAP JOIN — concurrent session pairs: two
    // users' 30-min-gap sessions that overlap in time. The scalable
    // form: each session explodes to the HOUR buckets it spans, pairs
    // join WITHIN a bucket on the exact overlap predicate, and the
    // distinct pair set collapses double-counted grid hits. Per-bucket
    // cost is (sessions-per-hour)², never |sessions|²; at 100 TB the
    // grid is the partition key. Emitted: concurrent-pair count per
    // day (calendar-bounded output).
    "q_join_interval_sessions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("brk", when(col("prev").isNull
          || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      val bucketed = sess.select(col("user_id"), col("sid"),
        col("s_us"), col("e_us"),
        explode(sequence(expr("s_us div 3600000000"),
          expr("e_us div 3600000000"))).as("hb"))
      val pairs = bucketed.as("a").join(bucketed.as("b"),
          col("a.hb") === col("b.hb")
            && col("a.user_id") < col("b.user_id")
            && col("a.s_us") <= col("b.e_us")
            && col("b.s_us") <= col("a.e_us"))
        .select(col("a.user_id").as("ua"), col("a.sid").as("sa"),
          col("b.user_id").as("ub"), col("b.sid").as("sb"),
          greatest(col("a.s_us"), col("b.s_us")).as("ov_us"))
        .distinct()
      pairs
        .groupBy(expr("CAST(ov_us div 86400000000 AS BIGINT)").as("epoch_day"))
        .agg(count(lit(1)).as("n_concurrent_pairs"))
        .orderBy("epoch_day")
    }),

    // PER-GROUP DETERMINISTIC SAMPLE — 3 orders per priority class by
    // (portable md5 of the key, key) rank: the reproducible
    // stratified-spot-check every pipeline audit needs. The hash rank
    // is a total order, so the sample is stable across runs,
    // partitionings, and engines. TWO-PHASE top-k: a 5-partition
    // priority window would funnel the whole fact table through 5
    // sort partitions (measured 2.8× at the 8× probe), so phase 1
    // takes local top-3 per (priority, salt-of-key) — 32-way parallel
    // — and phase 2 re-ranks the ≤480 candidates. Identical output to
    // the single-window form; the oracle keeps the direct rank.
    "q_scan_sample_pergroup" -> ((s, d) => {
      val h = md5long(col("o_orderkey").cast("string"))
      val base = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
          h.as("h"), pmod(col("o_orderkey"), lit(32L)).as("salt"))
      val wLocal = Window.partitionBy(col("o_orderpriority"), col("salt"))
        .orderBy(col("h"), col("o_orderkey"))
      val cand = base
        .withColumn("lrn", row_number().over(wLocal))
        .where(col("lrn") <= 3)
      val wGlobal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("h"), col("o_orderkey"))
      cand
        .withColumn("rn", row_number().over(wGlobal))
        .where(col("rn") <= 3)
        .select(col("o_orderpriority").as("priority"),
          col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("cents"))
        .orderBy("priority", "rn")
    }),

    // DELTA-OF-DELTA ENCODING ACCOUNTING — the Gorilla/TSDB codec
    // sizing pass over daily revenue: first differences d, second
    // differences dd; points bucketed by the Gorilla width classes
    // (dd = 0 → 1 bit, |dd| < 2⁷ → 9, < 2¹⁵ → 17, else 37) and the
    // projected bits-per-point. Pure lag windows + exact integers.
    "q_fn_delta_encode" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val wD = Window.orderBy(col("dt"))
      val dd = daily
        .withColumn("d", col("y") - lag(col("y"), 1).over(wD))
        .withColumn("dd", col("d") - lag(col("d"), 1).over(wD))
        .where(col("dd").isNotNull)
        .withColumn("bits",
          when(col("dd") === 0, 1L)
            .when(abs(col("dd")) < 128L, 9L)
            .when(abs(col("dd")) < 32768L, 17L)
            .otherwise(37L))
      dd.groupBy(col("bits"))
        .agg(count(lit(1)).as("n_points"))
        .withColumn("total_bits", col("bits") * col("n_points"))
        .orderBy("bits")
    }),

    // BITMAP-INDEX CONTAINER ACCOUNTING — the roaring-style sizing
    // pass: order keys per priority bucketed into 4096-key containers;
    // per priority the container count, set-bit total, mean density,
    // and the bitmap-vs-id-list size decision (a 4096-bit container
    // beats a 4-byte-per-id list above 128 ids — the integer predicate
    // n_in_container > 128). One fact agg, category-bounded output.
    "q_agg_bitmap_index" -> ((s, d) => {
      val cont = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"),
          expr("o_orderkey div 4096").as("cont"))
        .agg(count(lit(1)).as("n_bits"))
      cont.groupBy(col("priority"))
        .agg(count(lit(1)).as("n_containers"),
          sum(col("n_bits")).as("n_set_bits"),
          sum(when(col("n_bits") > 128, 1L).otherwise(0L))
            .as("n_bitmap_containers"))
        .select(col("priority"), col("n_containers"), col("n_set_bits"),
          col("n_bitmap_containers"),
          r6(col("n_set_bits").cast("double")
            / (col("n_containers") * 4096).cast("double")).as("density"))
        .orderBy("priority")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_join_interval_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
                    epoch_us(ts::TIMESTAMP) AS us
                 FROM events),
            lg AS (SELECT *, lag(us) OVER (PARTITION BY user_id
                     ORDER BY us, event_id) AS prev FROM e),
            br AS (SELECT *, CASE WHEN prev IS NULL
                       OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk
                   FROM lg),
            sd AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                     ORDER BY us, event_id ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS sid
                   FROM br),
            sess AS (SELECT user_id, sid, MIN(us) AS s_us,
                       MAX(us) AS e_us
                     FROM sd GROUP BY 1, 2),
            pairs AS (SELECT DISTINCT a.user_id AS ua, a.sid AS sa,
                        b.user_id AS ub, b.sid AS sb,
                        greatest(a.s_us, b.s_us) AS ov_us
                      FROM sess a JOIN sess b
                        ON a.user_id < b.user_id
                       AND a.s_us <= b.e_us AND b.s_us <= a.e_us)
         SELECT CAST(ov_us // 86400000000 AS BIGINT) AS epoch_day,
                CAST(COUNT(*) AS BIGINT) AS n_concurrent_pairs
         FROM pairs GROUP BY 1 ORDER BY 1""",

    "q_scan_sample_pergroup" ->
      """WITH r AS (SELECT o_orderpriority AS priority, o_orderkey,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents,
                    CAST(row_number() OVER (PARTITION BY o_orderpriority
                      ORDER BY CAST(('0x' || substr(md5(
                        CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT),
                        o_orderkey) AS BIGINT) AS rn
                 FROM orders)
         SELECT priority, rn, o_orderkey, cents
         FROM r WHERE rn <= 3 ORDER BY priority, rn""",

    "q_fn_delta_encode" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            d1 AS (SELECT dt, y, y - lag(y) OVER (ORDER BY dt) AS d
                   FROM daily),
            d2 AS (SELECT dt, d - lag(d) OVER (ORDER BY dt) AS dd
                   FROM d1),
            b AS (SELECT CASE WHEN dd = 0 THEN 1
                          WHEN abs(dd) < 128 THEN 9
                          WHEN abs(dd) < 32768 THEN 17
                          ELSE 37 END AS bits
                  FROM d2 WHERE dd IS NOT NULL)
         SELECT CAST(bits AS BIGINT) AS bits,
                CAST(COUNT(*) AS BIGINT) AS n_points,
                CAST(bits * COUNT(*) AS BIGINT) AS total_bits
         FROM b GROUP BY bits ORDER BY bits""",

    "q_agg_bitmap_index" ->
      """WITH cont AS (SELECT o_orderpriority AS priority,
                    o_orderkey // 4096 AS cont,
                    CAST(COUNT(*) AS BIGINT) AS n_bits
                 FROM orders GROUP BY 1, 2)
         SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_containers,
                CAST(SUM(n_bits) AS BIGINT) AS n_set_bits,
                CAST(SUM(CASE WHEN n_bits > 128 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bitmap_containers,
                round(CAST(SUM(n_bits) AS DOUBLE)
                  / CAST(COUNT(*) * 4096 AS DOUBLE), 6) AS density
         FROM cont GROUP BY 1 ORDER BY 1"""
  )
}
