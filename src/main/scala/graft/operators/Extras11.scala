package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-7 additions, part 1: warehouse-maintenance and sequence analytics
  * shapes that round out the surface — MERGE/upsert, SCD-2 interval build
  * (gaps-and-islands), gap-based sessionization, series autocorrelation,
  * calendar gap-fill with forward-fill, and two more graph kernels (degree
  * histogram, multi-hop BFS) plus last-touch attribution.
  *
  * Determinism (SURVEY.md §2.13): money stays DECIMAL(18,2) until a final
  * DOUBLE cast; every window that feeds a graded value orders by a total
  * order ((ts, event_id) or a unique key); timestamps leave as epoch-µs
  * BIGINTs (Det.tsUs); the one floating-point formula (ACF) is the shared
  * exact-moment pattern q_agg_corr established.
  */
object Extras11 {
  import Det._

  /** The co-occurrence graph q_graph_triangles/q_graph_pagerank defined
    * (same-hour, same-event-type user pairs over the user_id%7 slice) —
    * one definition so the four graph kernels are views of one graph. */
  private[operators] def undirectedEdges(s: SparkSession, d: String): DataFrame = {
    val v = Tables.events(s, d)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct()
  }

  private[operators] val GraphSql =
    """v AS (SELECT DISTINCT date_trunc('hour', ts::TIMESTAMP) AS h,
                             event_type AS t, user_id AS u
             FROM events WHERE user_id % 7 = 0),
       und AS (SELECT DISTINCT x.u AS a, y.u AS b
               FROM v x JOIN v y
                 ON x.h = y.h AND x.t = y.t AND x.u < y.u),
       e AS (SELECT a AS src, b AS dst FROM und
             UNION ALL SELECT b, a FROM und)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MERGE / UPSERT — the warehouse-maintenance primitive (MERGE INTO
    // target USING source): matched rows take the source's values
    // ('update'), source-only rows are inserted, target-only rows kept.
    // Expressed as ONE full-outer equi-join on the merge key — the shape
    // every distributed MERGE lowers to: both sides shuffle on
    // o_orderkey once (or not at all when the target is bucketed on the
    // key), no row is read twice, and AQE handles key skew. Money moves
    // in DECIMAL(18,2); the +100.00 source delta is exact.
    "q_merge_upsert" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val tgt = o.where(pmod(col("o_orderkey"), lit(5L)) =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("t_status"),
          dec(col("o_totalprice")).as("t_price"))
      val src = o.where(pmod(col("o_orderkey"), lit(2L)) === 0)
        .select(col("o_orderkey"), lit("U").as("s_status"),
          (dec(col("o_totalprice")) + lit(100).cast(Det.D2)).as("s_price"))
      tgt.join(src, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("s_status"), col("t_status")).as("status"),
          coalesce(col("s_price"), col("t_price")).cast("double")
            .as("totalprice"),
          when(col("t_status").isNotNull && col("s_status").isNotNull,
            lit("update"))
            .when(col("t_status").isNull, lit("insert"))
            .otherwise(lit("keep")).as("action"))
        .orderBy("o_orderkey")
    }),

    // SCD TYPE-2 BUILD — gaps-and-islands: each maximal run of a constant
    // event_type per user becomes one versioned dimension row with
    // [valid_from, valid_to] and a per-user version sequence. The
    // row_number difference trick turns run detection into two windows
    // over the SAME (user_id) shuffle — Catalyst reuses the exchange, so
    // the whole build is one shuffle + one groupBy. The (ts, event_id)
    // tiebreak is a total order, so islands are engine-independent.
    "q_scd2" -> ((s, d) => {
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val isl = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wTyp))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("vf"), max(col("ts")).as("vt"),
          count(lit(1)).as("n_events"))
      val wSeq = Window.partitionBy(col("user_id")).orderBy(col("vf"))
      isl.select(col("user_id"),
          row_number().over(wSeq).as("seq"), col("event_type"),
          tsUs(col("vf")).as("from_us"), tsUs(col("vt")).as("to_us"),
          col("n_events"))
        .orderBy("user_id", "seq")
    }),

    // GAP-BASED SESSIONIZATION — the batch twin of the streaming session
    // window (q_stream_session): a >30-minute silence starts a new
    // session. Marker flag via lag, session id via running sum of the
    // flag — again two windows over one (user_id) exchange. Gap compare
    // in integer µs (no sub-second truncation). Output one row per
    // session with bounds, size, and exact-decimal value sum.
    "q_ts_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_s")).over(w))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"),
          count(lit(1)).as("n_events"), dsum(col("value")).as("sum_v"))
        .orderBy("user_id", "session_seq")
    }),

    // AUTOCORRELATION — ACF of the daily-revenue series at lags 1..3, via
    // the exact-moment pattern (q_agg_corr): decimal sums of (v, v_lag)
    // cross-moments, one shared IEEE corr formula, round 6. The daily
    // series is CALENDAR-BOUNDED (~2.4k points here, ≤36.5k for a
    // century) regardless of data volume, so the unpartitioned lag
    // window is a constant-size tail stage at any scale — the heavy part
    // (daily aggregation) shuffles once on the date key.
    "q_ts_acf" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum(dec(col("o_totalprice"))).cast(Det.D2).as("v"))
      val w = Window.orderBy("dt")
      val lagged = (1 to 3).map { k =>
        daily.select(lit(k).as("lag"), col("v"),
          lag(col("v"), k).over(w).as("vl"))
      }.reduce(_ unionByName _).where(col("vl").isNotNull)
      lagged.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("sx"),
          sum(col("vl")).cast("double").as("sy"),
          sum(col("v") * col("vl")).cast("double").as("sxy"),
          sum(col("v") * col("v")).cast("double").as("sxx"),
          sum(col("vl") * col("vl")).cast("double").as("syy"))
        .select(col("lag"), col("n"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 6)
            .as("acf"))
        .orderBy("lag")
    }),

    // CALENDAR GAP-FILL + FORWARD FILL — densify a sparse daily series
    // (orders %37 slice → ~85% of days missing) onto the full calendar
    // with sequence()/explode, then carry the last observation forward
    // with last(ignoreNulls) over a rows-frame. Same calendar-bounded
    // argument as q_ts_acf: the filled series size is fixed by the date
    // span, not the data volume, so the single-partition window is a
    // bounded tail; the sparse aggregate itself is one date-key shuffle.
    "q_ts_interp" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .where(pmod(col("o_orderkey"), lit(37L)) === 0)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val cal = daily.agg(min(col("dt")).as("dmin"), max(col("dt")).as("dmax"))
        .select(explode(sequence(col("dmin"), col("dmax"),
          expr("interval 1 day"))).as("dt"))
      val w = Window.orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("dt"), "left")
        .select(col("dt"),
          last(col("rev"), ignoreNulls = true).over(w).cast("double")
            .as("rev_ff"),
          col("rev").isNull.as("filled"))
        .orderBy("dt")
    }),

    // DEGREE HISTOGRAM — degree distribution of the shared co-occurrence
    // graph (the first thing anyone computes on a 100 TB edge list, and
    // the skew diagnostic that decides salting). Two bounded aggregates:
    // degree per node over the symmetrized edges, then nodes per degree.
    "q_graph_degree" -> ((s, d) => {
      val und = undirectedEdges(s, d)
      val sym = und.select(col("a").as("u"))
        .unionByName(und.select(col("b").as("u")))
      sym.groupBy(col("u")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // MULTI-HOP BFS — minimum-hop labels within 3 hops of the seed set
    // (u%35=0) on the same graph: the iterative frontier-expansion
    // kernel (join frontier→edges, dedupe, anti-join visited), each
    // round localCheckpoint'd exactly like Components/PageRank so
    // lineage stays constant. At scale the edge relation stays
    // partitioned by src across rounds and only the frontier — strictly
    // shrinking — moves. The DuckDB twin is a recursive CTE (UNION
    // dedup) + MIN(hops).
    "q_graph_bfs" -> ((s, d) => {
      val und = undirectedEdges(s, d)
      val e = und.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
        .duckCkpt()
      val nodes = e.select(col("src").as("u")).distinct()
      var res = nodes.where(pmod(col("u"), lit(35L)) === 0)
        .select(col("u"), lit(0).as("hops")).duckCkpt()
      var frontier = res
      for (h <- 1 to 3) {
        val next = e
          .join(frontier.select(col("u").as("src")), "src")
          .select(col("dst").as("u")).distinct()
          .join(res, Seq("u"), "left_anti")
          .select(col("u"), lit(h).as("hops"))
          .duckCkpt()
        res = res.unionByName(next)
        frontier = next
      }
      res.orderBy("u")
    }),

    // LAST-TOUCH ATTRIBUTION — credit each purchase to the user's most
    // recent preceding non-purchase event (the marketing-analytics
    // staple). last(ignoreNulls) over an unbounded-to-previous rows
    // frame resolves the attribution in ONE pass over the per-user
    // event order — no self-join, no as-of join: one (user_id) shuffle,
    // then a 5-row aggregate.
    "q_evt_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .withColumn("attr",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr"), lit("none")).as("attr_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sum_v"))
        .orderBy("attr_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH tgt AS (SELECT o_orderkey, o_orderstatus AS t_status,
                             CAST(o_totalprice AS DECIMAL(18,2)) AS t_price
                      FROM orders WHERE o_orderkey % 5 <> 0),
            src AS (SELECT o_orderkey, 'U' AS s_status,
                           CAST(o_totalprice AS DECIMAL(18,2))
                             + CAST(100 AS DECIMAL(18,2)) AS s_price
                    FROM orders WHERE o_orderkey % 2 = 0)
         SELECT COALESCE(tgt.o_orderkey, src.o_orderkey) AS o_orderkey,
                COALESCE(s_status, t_status) AS status,
                CAST(COALESCE(s_price, t_price) AS DOUBLE) AS totalprice,
                CASE WHEN t_status IS NOT NULL AND s_status IS NOT NULL
                       THEN 'update'
                     WHEN t_status IS NULL THEN 'insert'
                     ELSE 'keep' END AS action
         FROM tgt FULL JOIN src ON tgt.o_orderkey = src.o_orderkey
         ORDER BY o_orderkey""",
    "q_scd2" ->
      """WITH o AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts::TIMESTAMP, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts::TIMESTAMP, event_id) AS grp
             FROM events),
            isl AS (SELECT user_id, event_type,
                      MIN(ts) AS vf, MAX(ts) AS vt, COUNT(*) AS n_events
                    FROM o GROUP BY user_id, event_type, grp)
         SELECT user_id,
                CAST(row_number() OVER (PARTITION BY user_id ORDER BY vf)
                     AS INT) AS seq,
                event_type, epoch_us(vf) AS from_us, epoch_us(vt) AS to_us,
                n_events
         FROM isl ORDER BY user_id, seq""",
    "q_ts_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, value,
                      epoch_us(ts::TIMESTAMP) AS us,
                      epoch_us(ts::TIMESTAMP)
                        - lag(epoch_us(ts::TIMESTAMP)) OVER
                            (PARTITION BY user_id
                             ORDER BY ts::TIMESTAMP, event_id) AS gap_us
                    FROM events),
            f AS (SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                                 THEN 1 ELSE 0 END AS new_s FROM x),
            g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS BIGINT) AS session_seq FROM f)
         SELECT user_id, session_seq,
                MIN(us) AS start_us, MAX(us) AS end_us,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM g GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "q_ts_acf" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                -- DECIMAL(19,2), NOT (18,2): precision 19 forces DuckDB's
                -- int128 decimal path; at precision <= 18 its int64
                -- multiply fast path overflows on the sf0.1 cross-moments
                -- (observed). Spark keeps (18,2) - both sides stay EXACT,
                -- so the final double casts still agree.
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(19,2)) AS v
              FROM orders GROUP BY 1),
            lagged AS (SELECT l.lag, v,
                lag(v, l.lag) OVER (PARTITION BY l.lag ORDER BY dt) AS vl
              FROM daily CROSS JOIN (VALUES (1),(2),(3)) l(lag)),
            m AS (SELECT lag, COUNT(*) AS n,
                CAST(SUM(v) AS DOUBLE) AS sx,
                CAST(SUM(vl) AS DOUBLE) AS sy,
                CAST(SUM(v * vl) AS DOUBLE) AS sxy,
                CAST(SUM(v * v) AS DOUBLE) AS sxx,
                CAST(SUM(vl * vl) AS DOUBLE) AS syy
              FROM lagged WHERE vl IS NOT NULL GROUP BY 1)
         SELECT lag, n,
                round((sxy - sx * sy / n)
                  / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
                  AS acf
         FROM m ORDER BY lag""",
    "q_ts_interp" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders WHERE o_orderkey % 37 = 0 GROUP BY 1),
            b AS (SELECT MIN(dt) AS dmin, MAX(dt) AS dmax FROM daily),
            cal AS (SELECT CAST(unnest(generate_series(dmin, dmax,
                      INTERVAL 1 DAY)) AS DATE) AS dt FROM b)
         SELECT c.dt,
                CAST(last_value(daily.rev IGNORE NULLS) OVER
                  (ORDER BY c.dt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS rev_ff,
                daily.rev IS NULL AS filled
         FROM cal c LEFT JOIN daily ON daily.dt = c.dt
         ORDER BY c.dt""",
    "q_graph_degree" ->
      s"""WITH $GraphSql,
            deg AS (SELECT src AS u, COUNT(*) AS degree FROM e GROUP BY 1)
         SELECT degree, COUNT(*) AS n_nodes
         FROM deg GROUP BY degree ORDER BY degree""",
    "q_graph_bfs" ->
      s"""WITH RECURSIVE $GraphSql,
            r(u, hops) AS (
              SELECT DISTINCT src, 0 FROM e WHERE src % 35 = 0
              UNION
              SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.u
              WHERE r.hops < 3)
         SELECT u, CAST(MIN(hops) AS INT) AS hops
         FROM r GROUP BY u ORDER BY u""",
    "q_evt_attribution" ->
      """SELECT COALESCE(attr, 'none') AS attr_type, COUNT(*) AS n,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM (SELECT user_id, event_type, value,
                 last_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts::TIMESTAMP, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS attr
               FROM events)
         WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1"""
  )
}
