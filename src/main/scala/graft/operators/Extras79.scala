package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 5: experimentation & behavioral analytics —
  * the sequential probability ratio test (the always-valid sibling of
  * the fixed-horizon q_agg_ttest/q_evt_cuped readouts), top event-type
  * trigram paths, per-session event-mix entropy, expected steps to
  * absorption in the event-type Markov chain (truncated Neumann
  * series — the absorption sibling of q_evt_markov_stationary), and
  * the conversion-window sweep.
  *
  * Determinism contract (SURVEY §2.13): all counts/cumulative counts
  * are exact integers; SPRT boundaries and LLRs are per-row single
  * IEEE chains over agreed integers (shared literals only); session
  * entropy terms are NANO-quantized per (session, type) then
  * integer-summed; the absorption iteration runs in micro-quantized
  * integer state with truncating division (the q_ts_holt_winters
  * discipline), oracle-unrolled in a recursive CTE carrying the
  * packed transition matrix as LIST-of-LISTs.
  */
object Extras79 {
  import Det._

  private val AbsorbIters = 30

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SPRT — Wald's sequential test on the variant-1 (user_id parity)
    // daily conversion rate: H0 p=0.25 vs H1 p=0.30, α=β=0.05.
    // Trials = active (user, day) pairs, successes = user-days with a
    // purchase; both accumulate over the calendar via one window.
    // LLR_t = s·ln(p1/p0) + (n−s)·ln((1−p1)/(1−p0)); boundaries
    // ±ln(19). Emits the horizon, final counts/LLR, and the FIRST
    // crossing day in each direction (NULL when never crossed).
    "q_evt_sprt" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .where(pmod(col("user_id"), lit(2L)) === 1)
        .groupBy(col("user_id"), to_date(col("ts")).as("dt"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
      val daily = ud.groupBy(col("dt"))
        .agg(count(lit(1)).as("n_d"), sum(col("conv")).as("s_d"))
      val wCum = Window.orderBy(col("dt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val llr = daily
        .withColumn("n", sum(col("n_d")).over(wCum))
        .withColumn("s", sum(col("s_d")).over(wCum))
        .withColumn("llr",
          col("s").cast("double") * log(lit(0.30) / lit(0.25))
            + (col("n") - col("s")).cast("double")
              * log(lit(0.70) / lit(0.75)))
      llr.agg(count(lit(1)).as("n_days"),
          max(col("n")).as("n_trials"), max(col("s")).as("n_success"),
          max(struct(col("dt"), col("llr"))).as("last"),
          min(when(col("llr") >= log(lit(19.0)), col("dt")))
            .as("accept_h1_day"),
          min(when(col("llr") <= -log(lit(19.0)), col("dt")))
            .as("accept_h0_day"))
        .select(col("n_days"), col("n_trials"), col("n_success"),
          r6(col("last.llr")).as("llr_final"),
          col("accept_h1_day"), col("accept_h0_day"))
    }),

    // TOP EVENT-TYPE TRIGRAM PATHS — the 10 most-travelled 3-step
    // journeys: per-user (ts, event_id)-ordered lead chain (the
    // q_evt_markov window, one user shuffle), exact path counts,
    // deterministic (count desc, path) top-k via TakeOrdered.
    "q_evt_path_trigram" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("e1"), col("ts"),
          col("event_id"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .where(col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // SESSION ENTROPY — how mixed are event types inside a session?
    // Sessions are 30-minute-gap bounded per user (the q_ts_sessionize
    // rule); each (session, type) contributes the NANO-quantized term
    // −(c/n)·ln(c/n); session entropies aggregate into length buckets
    // (1, 2-3, 4-7, 8+) with the bucket average as the one IEEE tail.
    "q_evt_session_entropy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"), tsUs(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull
            || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perType = sess
        .groupBy(col("user_id"), col("sid"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val wSess = Window.partitionBy(col("user_id"), col("sid"))
      val perSess = perType
        .withColumn("n", sum(col("c")).over(wSess))
        .withColumn("term_nano",
          round((col("c").cast("double") / col("n").cast("double"))
            * -log(col("c").cast("double") / col("n").cast("double"))
            * 1e9).cast("long"))
        .groupBy(col("user_id"), col("sid"))
        .agg(max(col("n")).as("n_events"),
          sum(col("term_nano")).as("ent_nano"))
      perSess
        .withColumn("bucket",
          when(col("n_events") === 1, "1")
            .when(col("n_events") <= 3, "2-3")
            .when(col("n_events") <= 7, "4-7")
            .otherwise("8+"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("ent_nano")).as("sum_ent_nano"))
        .select(col("bucket"), col("n_sessions"),
          r6(col("sum_ent_nano").cast("double") / 1e9
            / col("n_sessions").cast("double")).as("avg_entropy_nats"))
        .orderBy("bucket")
    }),

    // MARKOV ABSORPTION — expected steps to reach 'purchase' from each
    // non-absorbing event type, as the 30-term truncated Neumann
    // series v ← 1 + Q·v over the micro-quantized substochastic
    // transition matrix (q_ij = c_ij·1e6 div t_i, t_i counting ALL
    // outgoing transitions including into the absorbing state). The
    // state relation is alphabet-bounded and BROADCAST; each iteration
    // is exact integer arithmetic with truncating division on both
    // engines; the oracle carries the packed dense matrix and the
    // state vector as LISTs through a recursive CTE.
    "q_evt_markov_absorb" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("src"), col("ts"),
          col("event_id"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .where(col("dst").isNotNull && col("src") =!= "purchase")
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      val tot = trans.groupBy(col("src")).agg(sum(col("c")).as("t"))
      // Bounded driver fold (the Components scalar pattern; round-11
      // verdict item 7): the transition matrix is event-type-alphabet-
      // bounded (≤|types|² rows at ANY data scale), so running the 30
      // Neumann rounds as 30 localCheckpoint'd Spark jobs was pure
      // orchestration overhead (~4.7 s of bench for a ≤25-row
      // computation). Collect the two bounded relations once and
      // iterate locally in the IDENTICAL exact integer-micro
      // arithmetic (truncating division on non-negative values —
      // same on both engines and in Scala Long division).
      import s.implicits._
      val totM = tot.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val cM = trans.where(col("dst") =!= "purchase").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val states = totM.keys.toSeq.sorted
      var v = states.map(_ -> 0L).toMap
      for (_ <- 1 to AbsorbIters) {
        v = states.map { src =>
          src -> (1000000L + states.map { dst =>
            val q = cM.getOrElse((src, dst), 0L) * 1000000L / totM(src)
            q * v(dst) / 1000000L
          }.sum)
        }.toMap
      }
      states.map(st => (st, v(st))).toDF("state", "v_micro")
        .select(col("state"), col("v_micro"),
          r6(col("v_micro").cast("double") / 1e6).as("exp_steps"))
        .orderBy("state")
    }),

    // CONVERSION-WINDOW SWEEP — of users whose first event is a view,
    // how many purchase within 1/3/7/14 days of that first view?
    // Two user-grain aggs + one broadcast window spine; exact
    // microsecond timestamp arithmetic.
    "q_evt_conversion_window" -> ((s, d) => {
      import s.implicits._
      val firstView = Tables.events(s, d)
        .where(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(tsUs(col("ts"))).as("v_us"))
      val firstBuy = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(tsUs(col("ts"))).as("b_us"))
      val joined = firstView.join(firstBuy, Seq("user_id"), "left")
      joined
        .crossJoin(broadcast(Seq(1L, 3L, 7L, 14L).toDF("w")))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_viewers"),
          sum(when(col("b_us").isNotNull
              && col("b_us") >= col("v_us")
              && col("b_us") - col("v_us") <= col("w") * 86400000000L,
            1L).otherwise(0L)).as("n_converted"))
        .select(col("w").as("window_days"), col("n_viewers"),
          col("n_converted"),
          r6(col("n_converted").cast("double")
            / col("n_viewers").cast("double")).as("conv_rate"))
        .orderBy("window_days")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_sprt" ->
      """WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS dt,
                    MAX(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS conv
                 FROM events WHERE user_id % 2 = 1
                 GROUP BY 1, 2),
            daily AS (SELECT dt, CAST(COUNT(*) AS BIGINT) AS n_d,
                        CAST(SUM(conv) AS BIGINT) AS s_d
                      FROM ud GROUP BY 1),
            cum AS (SELECT dt,
                      CAST(SUM(n_d) OVER (ORDER BY dt ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                        AS n,
                      CAST(SUM(s_d) OVER (ORDER BY dt ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                        AS s
                    FROM daily),
            llr AS (SELECT dt, n, s,
                      CAST(s AS DOUBLE) * ln(0.30 / 0.25)
                        + CAST(n - s AS DOUBLE) * ln(0.70 / 0.75) AS llr
                    FROM cum)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                MAX(n) AS n_trials, MAX(s) AS n_success,
                round(MAX(CASE WHEN rn = 1 THEN llr END), 6) AS llr_final,
                MIN(CASE WHEN llr >= ln(19.0) THEN dt END)
                  AS accept_h1_day,
                MIN(CASE WHEN llr <= -ln(19.0) THEN dt END)
                  AS accept_h0_day
         FROM (SELECT *, row_number() OVER (ORDER BY dt DESC) AS rn
               FROM llr)""",

    "q_evt_path_trigram" ->
      """WITH e AS (SELECT user_id, event_type AS e1, ts::TIMESTAMP AS ts,
                           event_id FROM events),
            c AS (SELECT e1,
                    lead(e1, 1) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS e2,
                    lead(e1, 2) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS e3
                  FROM e)
         SELECT e1 || '>' || e2 || '>' || e3 AS path,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM c WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path LIMIT 10""",

    "q_evt_session_entropy" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                    epoch_us(ts::TIMESTAMP) AS us
                 FROM events),
            lg AS (SELECT *, lag(us) OVER (PARTITION BY user_id
                     ORDER BY us, event_id) AS prev_us
                   FROM e),
            br AS (SELECT *, CASE WHEN prev_us IS NULL
                       OR us - prev_us > 1800000000 THEN 1 ELSE 0 END
                     AS brk
                   FROM lg),
            sid AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                      ORDER BY us, event_id ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW) AS sid
                    FROM br),
            pt AS (SELECT user_id, sid, event_type,
                     CAST(COUNT(*) AS BIGINT) AS c
                   FROM sid GROUP BY 1, 2, 3),
            ps AS (SELECT user_id, sid,
                     CAST(MAX(n) AS BIGINT) AS n_events,
                     CAST(SUM(term_nano) AS BIGINT) AS ent_nano
                   FROM (SELECT user_id, sid, c,
                           SUM(c) OVER (PARTITION BY user_id, sid) AS n,
                           CAST(round((CAST(c AS DOUBLE)
                               / CAST(SUM(c) OVER (PARTITION BY user_id,
                                   sid) AS DOUBLE))
                             * -ln(CAST(c AS DOUBLE)
                               / CAST(SUM(c) OVER (PARTITION BY user_id,
                                   sid) AS DOUBLE)) * 1e9) AS BIGINT)
                             AS term_nano
                         FROM pt)
                   GROUP BY 1, 2),
            bk AS (SELECT CASE WHEN n_events = 1 THEN '1'
                          WHEN n_events <= 3 THEN '2-3'
                          WHEN n_events <= 7 THEN '4-7'
                          ELSE '8+' END AS bucket,
                          ent_nano
                   FROM ps)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
                round(CAST(SUM(ent_nano) AS DOUBLE) / 1e9
                  / CAST(COUNT(*) AS DOUBLE), 6) AS avg_entropy_nats
         FROM bk GROUP BY 1 ORDER BY 1""",

    "q_evt_markov_absorb" ->
      s"""WITH RECURSIVE e AS (SELECT user_id, event_type AS src,
                    ts::TIMESTAMP AS ts, event_id FROM events),
            b AS (SELECT src, lead(src) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS dst FROM e),
            trans AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
                      FROM b WHERE dst IS NOT NULL
                        AND src <> 'purchase'
                      GROUP BY 1, 2),
            tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS t
                    FROM trans GROUP BY 1),
            states AS (SELECT src,
                         CAST(row_number() OVER (ORDER BY src) AS BIGINT)
                           AS i
                       FROM (SELECT DISTINCT src FROM tot)),
            ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM states),
            dense AS (SELECT si.i AS i, sj.i AS j,
                        (COALESCE(tr.c, 0) * 1000000) // tot.t AS q_micro
                      FROM states si
                      JOIN states sj ON TRUE
                      JOIN tot ON tot.src = si.src
                      LEFT JOIN trans tr
                        ON tr.src = si.src AND tr.dst = sj.src
                        AND tr.dst <> 'purchase'),
            qm AS (SELECT list(rowl ORDER BY i) AS qm
                   FROM (SELECT i, list(q_micro ORDER BY j) AS rowl
                         FROM dense GROUP BY i)),
            r AS (
              SELECT CAST(0 AS BIGINT) AS it, qm.qm AS qm, ns.n AS n,
                     list_transform(range(1, CAST(ns.n AS INT) + 1),
                       i -> CAST(0 AS BIGINT)) AS v
              FROM qm, ns
              UNION ALL
              SELECT it + 1, qm, n,
                     list_transform(range(1, CAST(n AS INT) + 1), i ->
                       1000000 + CAST(list_sum(
                         list_transform(range(1, CAST(n AS INT) + 1),
                           j -> (qm[i][j] * v[j]) // 1000000))
                         AS BIGINT))
              FROM r WHERE it < $AbsorbIters),
            fin AS (SELECT v FROM r WHERE it = $AbsorbIters)
         SELECT s.src AS state, fin.v[CAST(s.i AS INT)] AS v_micro,
                round(CAST(fin.v[CAST(s.i AS INT)] AS DOUBLE) / 1e6, 6)
                  AS exp_steps
         FROM states s, fin ORDER BY state""",

    "q_evt_conversion_window" ->
      """WITH fv AS (SELECT user_id,
                    MIN(epoch_us(ts::TIMESTAMP)) AS v_us
                 FROM events WHERE event_type = 'view' GROUP BY 1),
            fb AS (SELECT user_id,
                     MIN(epoch_us(ts::TIMESTAMP)) AS b_us
                   FROM events WHERE event_type = 'purchase' GROUP BY 1),
            j AS (SELECT fv.user_id, fv.v_us, fb.b_us
                  FROM fv LEFT JOIN fb ON fb.user_id = fv.user_id),
            win AS (SELECT UNNEST([1, 3, 7, 14]) AS w)
         SELECT CAST(win.w AS BIGINT) AS window_days,
                CAST(COUNT(*) AS BIGINT) AS n_viewers,
                CAST(SUM(CASE WHEN j.b_us IS NOT NULL
                          AND j.b_us >= j.v_us
                          AND j.b_us - j.v_us <= win.w * 86400000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
                round(CAST(SUM(CASE WHEN j.b_us IS NOT NULL
                          AND j.b_us >= j.v_us
                          AND j.b_us - j.v_us <= win.w * 86400000000
                        THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS conv_rate
         FROM j, win GROUP BY win.w ORDER BY window_days"""
  )
}
