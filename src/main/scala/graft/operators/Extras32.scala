package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 22: M4 downsampling, Zipf rank-frequency,
  * dynamic partition overwrite, rolling 28-day MAU, and signup-cohort
  * LTV.
  */
object Extras32 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M4 DOWNSAMPLING — the dashboard-rendering standard: per series,
    // split the time range into 16 equal-width buckets and keep only
    // first/last/min/max per bucket (the four points that preserve the
    // drawn line's envelope exactly at pixel resolution). Fully
    // parallel — unlike LTTB there is NO sequential dependency between
    // buckets, which is why M4 is the downsampler that survives a
    // cluster. Exact integers; argfirst/arglast resolved by
    // (t_us, event_id) rank, never a nondeterministic first().
    "q_ts_m4" -> ((s, d) => {
      val v = Tables.events(s, d)
        .select(col("event_type").as("t"), col("event_id"),
          unix_micros(col("ts")).as("t_us"),
          (dec(col("value")) * 100).cast("long").as("cents"))
      val range = v.groupBy(col("t"))
        .agg(min(col("t_us")).as("lo"), max(col("t_us")).as("hi"))
      val bucketed = v.join(range, "t")
        .withColumn("w", expr("(hi - lo) div 16 + 1"))
        .withColumn("bucket", expr("(t_us - lo) div w"))
      val byB = Window.partitionBy(col("t"), col("bucket"))
      val asc = byB.orderBy(col("t_us"), col("event_id"))
      val desc = byB.orderBy(col("t_us").desc, col("event_id").desc)
      bucketed
        .withColumn("rn_a", row_number().over(asc))
        .withColumn("rn_d", row_number().over(desc))
        .groupBy(col("t"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          max(when(col("rn_a") === 1, col("cents"))).as("v_first"),
          max(when(col("rn_d") === 1, col("cents"))).as("v_last"),
          min(col("cents")).as("v_min"),
          max(col("cents")).as("v_max"))
        .orderBy("t", "bucket")
    }),

    // ZIPF RANK-FREQUENCY — the top-25 token curve (rank, count,
    // corpus share): the one-glance tokenizer-health audit (a missing
    // whitespace rule shows up as a glued mega-token instantly).
    // Vocab-bounded global sort; ties pinned by (count desc, token).
    "q_llm_zipf" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
      val counts = tok.groupBy(col("w")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("w"))))
        .where(col("rank") <= 25)
        .select(col("rank"), col("w"), col("n"),
          (col("n").cast("double") / col("total").cast("double"))
            .as("share"))
        .orderBy("rank")
    }),

    // DYNAMIC PARTITION OVERWRITE — the incremental-maintenance write
    // mode: an overwrite that replaces ONLY the partitions present in
    // the incoming batch (status P, repriced 2×) and leaves F/O files
    // untouched — vs static overwrite truncating the whole table. The
    // read-back audit proves exactly one partition changed. This is
    // how a 100 TB partitioned table takes daily corrections without
    // rewriting history.
    "q_sink_dynamic_overwrite" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_sink_dynamic",
        Seq(s"$d/orders.parquet"), "v1: dynamic overwrite of P") { dest =>
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"),
            (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
            col("o_orderstatus"))
        base.write.partitionBy("o_orderstatus").mode("overwrite")
          .parquet(dest)
        base.where(col("o_orderstatus") === "P")
          .withColumn("cents", col("cents") * 2)
          .write.partitionBy("o_orderstatus").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(dest)
      }
      s.read.parquet(dir)
        .groupBy(col("o_orderstatus").cast("string").as("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .orderBy("status")
    }),

    // ROLLING 28-DAY MAU — distinct users active in the trailing 28
    // days, per day. The exact distributed form: dedup to (user, day),
    // EXPAND each active day to the ≤28 report days it supports, dedup
    // again, count — a bounded 28× row inflation instead of a running
    // distinct (which needs one partition) or a 28-way self-join.
    "q_evt_mau_rolling" -> ((s, d) => {
      val active = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val span = active.agg(max(col("day")).as("dmax"))
      active
        .select(col("user_id"), explode(sequence(col("day"),
          date_add(col("day"), 27), expr("interval 1 day"))).as("d"))
        .distinct()
        .crossJoin(broadcast(span))
        .where(col("d") <= col("dmax"))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("mau_28d"))
        .orderBy("d")
    }),

    // SIGNUP-COHORT LTV — per signup day: how many signed up, how many
    // ever purchased after signing up, and the exact cents of each
    // converter's FIRST purchase (the metric that prices acquisition).
    // First-purchase selection is a (ts, event_id) rank, never a
    // nondeterministic first(); two user-grain aggs + one join.
    "q_evt_ltv_cohort" -> ((s, d) => {
      val e = Tables.events(s, d)
      val signup = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val firstPurchase = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        .join(signup, "user_id")
        .where(col("ts") >= col("signup_ts"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
        .where(col("rn") === 1)
        .select(col("user_id"), col("signup_ts"), col("cents"))
      signup
        .join(firstPurchase.select(col("user_id"), col("cents")),
          Seq("user_id"), "left")
        .groupBy(to_date(col("signup_ts")).as("cohort_day"))
        .agg(count(lit(1)).as("n_signups"),
          sum(when(col("cents").isNotNull, 1L).otherwise(0L))
            .as("n_converted"),
          sum(coalesce(col("cents"), lit(0L))).as("first_cents"))
        .select(col("cohort_day"), col("n_signups"), col("n_converted"),
          col("first_cents"),
          (col("n_converted").cast("double")
            / col("n_signups").cast("double")).as("conv_rate"))
        .orderBy("cohort_day")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_m4" ->
      """WITH v AS (
           SELECT event_type AS t, event_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
           FROM events),
         r AS (SELECT t, MIN(t_us) AS lo, MAX(t_us) AS hi
               FROM v GROUP BY 1),
         b AS (SELECT v.t, v.event_id, v.t_us, v.cents,
                 (v.t_us - r.lo) // ((r.hi - r.lo) // 16 + 1) AS bucket
               FROM v JOIN r ON v.t = r.t),
         rk AS (SELECT t, bucket, cents,
                  row_number() OVER (PARTITION BY t, bucket
                    ORDER BY t_us, event_id) AS rn_a,
                  row_number() OVER (PARTITION BY t, bucket
                    ORDER BY t_us DESC, event_id DESC) AS rn_d
                FROM b)
         SELECT t, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
                MAX(CASE WHEN rn_a = 1 THEN cents END) AS v_first,
                MAX(CASE WHEN rn_d = 1 THEN cents END) AS v_last,
                MIN(cents) AS v_min, MAX(cents) AS v_max
         FROM rk GROUP BY t, bucket ORDER BY t, bucket""",

    "q_llm_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
            c AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
            rk AS (SELECT w, n,
                     CAST(row_number() OVER (ORDER BY n DESC, w) AS INT)
                       AS rank
                   FROM c)
         SELECT rank, w, n,
                CAST(n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
         FROM rk CROSS JOIN t
         WHERE rank <= 25 ORDER BY rank""",

    "q_sink_dynamic_overwrite" ->
      """SELECT CAST(o_orderstatus AS VARCHAR) AS status,
                COUNT(*) AS n,
                CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)
                         * CASE WHEN o_orderstatus = 'P' THEN 2 ELSE 1
                           END) AS BIGINT) AS cents
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_evt_mau_rolling" ->
      """WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
            span AS (SELECT MAX(day) AS dmax FROM active),
            x AS (SELECT DISTINCT user_id,
                    CAST(unnest(generate_series(day, day + INTERVAL 27 DAY,
                                INTERVAL 1 DAY)) AS DATE) AS d
                  FROM active)
         SELECT d, COUNT(DISTINCT user_id) AS mau_28d
         FROM x CROSS JOIN span
         WHERE d <= dmax
         GROUP BY d ORDER BY d""",

    "q_evt_ltv_cohort" ->
      """WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
                 FROM events WHERE event_type = 'signup' GROUP BY 1),
            p AS (SELECT e.user_id, s.signup_ts,
                    CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents,
                    row_number() OVER (PARTITION BY e.user_id
                      ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS rn
                  FROM events e JOIN s ON e.user_id = s.user_id
                  WHERE e.event_type = 'purchase'
                    AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts),
            fp AS (SELECT user_id, cents FROM p WHERE rn = 1)
         SELECT CAST(s.signup_ts AS DATE) AS cohort_day,
                COUNT(*) AS n_signups,
                CAST(SUM(CASE WHEN fp.cents IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_converted,
                CAST(SUM(COALESCE(fp.cents, 0)) AS BIGINT) AS first_cents,
                CAST(SUM(CASE WHEN fp.cents IS NOT NULL THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS conv_rate
         FROM s LEFT JOIN fp ON s.user_id = fp.user_id
         GROUP BY 1 ORDER BY 1"""
  )
}
