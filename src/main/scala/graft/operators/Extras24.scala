package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-7 additions, part 14: one-way ANOVA, DAU/WAU engagement
  * stickiness, calendar gap ranges, trimmed mean, naive-seasonal
  * forecast error, and inter-event-time statistics.
  */
object Extras24 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ONE-WAY ANOVA — F statistic for price across the three return
    // flags (the k-group generalization of q_agg_ttest, same
    // determinism pattern: exact DECIMAL power sums per group, pivoted
    // to one row, ONE shared IEEE formula, r6-rounded outputs). The
    // Σ_g terms are three explicit pivoted columns — no double
    // accumulation order exists to disagree on.
    "q_agg_anova" -> ((s, d) => {
      val m = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), dec(col("l_extendedprice")).as("v"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("s1"),
          sum((col("v") * col("v")).cast(DecimalType(38, 4)))
            .cast("double").as("s2"))
      def side(t: String, c: String) =
        max(when(col("g") === t, col(c)))
      val p = m.agg(
        side("A", "n").as("na"), side("A", "s1").as("s1a"), side("A", "s2").as("s2a"),
        side("N", "n").as("nn"), side("N", "s1").as("s1n"), side("N", "s2").as("s2n"),
        side("R", "n").as("nr"), side("R", "s1").as("s1r"), side("R", "s2").as("s2r"))
      def nD(c: String) = col(c).cast("double")
      val bg = (col("s1a") * col("s1a") / nD("na")
        + col("s1n") * col("s1n") / nD("nn")
        + col("s1r") * col("s1r") / nD("nr"))
      val s1t = col("s1a") + col("s1n") + col("s1r")
      val nT = (col("na") + col("nn") + col("nr")).cast("double")
      val ssb = bg - s1t * s1t / nT
      val ssw = (col("s2a") + col("s2n") + col("s2r")) - bg
      p.select(col("na"), col("nn"), col("nr"),
        r6(ssb / lit(2.0) / (ssw / (nT - lit(3.0)))).as("f_stat"),
        r6(ssb / (ssb + ssw)).as("eta_sq"))
    }),

    // DAU / WAU STICKINESS — daily active users over trailing-7-day
    // active users, the engagement ratio every growth dashboard leads
    // with. A user-day dedup is the ONLY fact shuffle; the trailing
    // window is a constant 7× day-offset explode (never a per-day
    // history re-scan), so cost is 7·|user-days| at any scale. Only
    // days that exist as activity days are emitted (identical rule in
    // both engines); the ratio is one shared IEEE division.
    "q_evt_dau_wau" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("dt"))
        .distinct()
      val dau = ud.groupBy(col("dt")).agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("dt"))
        .select(col("user_id"), date_add(col("dt"), col("off")).as("dt"))
        .distinct()
        .groupBy(col("dt")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "dt")
        .select(col("dt"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
        .orderBy("dt")
    }),

    // REORDER GAP RANGES — per customer, the runs of days between
    // consecutive order days (the complement of q_ts_islands' presence
    // runs; the reorder-interval / churn-risk shape — a dense global
    // dimension would have no gaps at scale, a customer's own calendar
    // always does). One distinct to the (customer, day) grain, one lag
    // per customer partition — everything scales with customers, no
    // global sort. Reports per customer with ≥1 gap: gap count, total
    // waiting days, longest gap and its start (tie → earliest).
    "q_ts_gaps" -> ((s, d) => {
      val pd = Tables.orders(s, d)
        .select(col("o_custkey").as("c"),
          to_date(col("o_orderdate")).as("dt"))
        .distinct()
      val byC = Window.partitionBy(col("c")).orderBy(col("dt"))
      val gaps = pd
        .withColumn("prev", lag(col("dt"), 1).over(byC))
        .where(col("prev").isNotNull && datediff(col("dt"), col("prev")) > 1)
        .select(col("c"),
          (datediff(col("dt"), col("prev")) - 1).as("len"),
          date_add(col("prev"), 1).as("gstart"))
      val best = Window.partitionBy(col("c"))
        .orderBy(col("len").desc, col("gstart"))
      gaps
        .withColumn("rk", row_number().over(best))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("len")).as("missing_days"),
          max(col("len")).as("max_gap"),
          min(when(col("rk") === 1, col("gstart"))).as("longest_start"))
        .orderBy("c")
    }),

    // TRIMMED MEAN — per return flag, the mean of prices with the
    // bottom and top 5% (by rank) dropped, the robust-location
    // estimator that survives fat tails. Ranks come from one per-flag
    // sort; tie order between equal values is irrelevant because
    // trimming cuts a sorted MULTISET by position — the kept values
    // are identical whichever physical rows carry the boundary ranks.
    // The kept sum is exact cents; the mean is a shared IEEE tail.
    "q_agg_trimmed_mean" -> ((s, d) => {
      val v = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      val byG = Window.partitionBy(col("g")).orderBy(col("cents"))
      val all = Window.partitionBy(col("g"))
      v.withColumn("rn", row_number().over(byG))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("k", expr("n div 20"))
        .where(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
        .groupBy(col("g"))
        .agg(max(col("n")).as("n"), max(col("k")).as("k_trim"),
          sum(col("cents")).as("kept_cents"), count(lit(1)).as("kept_n"))
        .select(col("g"), col("n"), col("k_trim"),
          (col("kept_cents").cast("double")
            / col("kept_n").cast("double") / lit(100.0))
            .as("trimmed_mean"))
        .orderBy("g")
    }),

    // NAIVE-SEASONAL FORECAST ERROR — score yesterday's-week forecast
    // (ŷ_t = y_{t−7}) over the daily revenue series: MAE, bias, and
    // WAPE. Error sums are EXACT cents (|Σ| < 2^53 at the graded
    // scales); each reported metric is one shared IEEE division — no
    // per-row ratio is ever summed (a MAPE would be accumulation-
    // order-dependent, the chi2 rule).
    "q_ts_forecast_err" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val ord = Window.orderBy(col("dt"))
      val e = daily
        .withColumn("l7", lag(col("y"), 7).over(ord))
        .where(col("l7").isNotNull)
        .withColumn("err", col("y") - col("l7"))
      e.agg(count(lit(1)).as("n"),
          sum(abs(col("err"))).as("sum_abs"),
          sum(col("err")).as("sum_err"),
          sum(col("y")).as("sum_y"))
        .select(col("n"),
          (col("sum_abs").cast("double") / col("n").cast("double")
            / lit(100.0)).as("mae"),
          (col("sum_err").cast("double") / col("n").cast("double")
            / lit(100.0)).as("bias"),
          (col("sum_abs").cast("double") / col("sum_y").cast("double"))
            .as("wape"))
    }),

    // INTER-EVENT TIME STATS — per event type, the distribution of
    // microsecond gaps between a user's consecutive events of that
    // type (the arrival-process profile behind rate limits and
    // session models). The lag order is made TOTAL with event_id as
    // tiebreaker, so the gap multiset is engine-exact; median/p90 are
    // exact interpolation on integer µs (q_agg_percentile precedent).
    "q_evt_inter_event" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type").as("t"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val seq = Window.partitionBy(col("t"), col("user_id"))
        .orderBy(col("us"), col("event_id"))
      e.withColumn("prev", lag(col("us"), 1).over(seq))
        .where(col("prev").isNotNull)
        .withColumn("gap", col("us") - col("prev"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, 0.5)").as("med_us"),
          expr("percentile(gap, 0.9)").as("p90_us"),
          max(col("gap")).as("max_us"))
        .orderBy("t")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_anova" ->
      """WITH m AS (SELECT l_returnflag AS g, COUNT(*) AS n,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) AS s1,
                    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_extendedprice AS DECIMAL(18,2))
                             AS DECIMAL(38,4))) AS DOUBLE) AS s2
                 FROM lineitem GROUP BY 1),
            p AS (SELECT
                    MAX(CASE WHEN g = 'A' THEN n END) AS na,
                    MAX(CASE WHEN g = 'A' THEN s1 END) AS s1a,
                    MAX(CASE WHEN g = 'A' THEN s2 END) AS s2a,
                    MAX(CASE WHEN g = 'N' THEN n END) AS nn,
                    MAX(CASE WHEN g = 'N' THEN s1 END) AS s1n,
                    MAX(CASE WHEN g = 'N' THEN s2 END) AS s2n,
                    MAX(CASE WHEN g = 'R' THEN n END) AS nr,
                    MAX(CASE WHEN g = 'R' THEN s1 END) AS s1r,
                    MAX(CASE WHEN g = 'R' THEN s2 END) AS s2r
                  FROM m),
            f AS (SELECT na, nn, nr,
                    s1a * s1a / CAST(na AS DOUBLE)
                      + s1n * s1n / CAST(nn AS DOUBLE)
                      + s1r * s1r / CAST(nr AS DOUBLE) AS bg,
                    s1a + s1n + s1r AS s1t,
                    CAST(na + nn + nr AS DOUBLE) AS nt,
                    s2a + s2n + s2r AS s2t
                  FROM p),
            ss AS (SELECT na, nn, nr, nt,
                     bg - s1t * s1t / nt AS ssb, s2t - bg AS ssw
                   FROM f)
         SELECT na, nn, nr,
                round(ssb / 2.0 / (ssw / (nt - 3.0)), 6) AS f_stat,
                round(ssb / (ssb + ssw), 6) AS eta_sq
         FROM ss""",

    "q_evt_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
                     FROM events),
            dau AS (SELECT dt, COUNT(*) AS dau FROM ud GROUP BY 1),
            tgt AS (SELECT DISTINCT user_id, dt + CAST(off AS INT) AS dt
                    FROM ud, range(7) t(off)),
            wau AS (SELECT dt, COUNT(*) AS wau FROM tgt GROUP BY 1)
         SELECT d.dt, d.dau, w.wau,
                CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
         FROM dau d JOIN wau w ON d.dt = w.dt
         ORDER BY d.dt""",

    "q_ts_gaps" ->
      """WITH pd AS (SELECT DISTINCT o_custkey AS c,
                    CAST(o_orderdate AS DATE) AS dt
                 FROM orders),
            lg AS (SELECT c, dt,
                     lag(dt) OVER (PARTITION BY c ORDER BY dt) AS prev
                   FROM pd),
            gaps AS (SELECT c,
                       datediff('day', prev, dt) - 1 AS len,
                       prev + 1 AS gstart
                     FROM lg
                     WHERE prev IS NOT NULL
                       AND datediff('day', prev, dt) > 1),
            rk AS (SELECT c, len, gstart,
                     row_number() OVER (PARTITION BY c
                       ORDER BY len DESC, gstart) AS rk
                   FROM gaps)
         SELECT c, COUNT(*) AS n_gaps,
                CAST(SUM(len) AS BIGINT) AS missing_days,
                CAST(MAX(len) AS INT) AS max_gap,
                MIN(CASE WHEN rk = 1 THEN gstart END) AS longest_start
         FROM rk GROUP BY c ORDER BY c""",

    "q_agg_trimmed_mean" ->
      """WITH v AS (SELECT l_returnflag AS g,
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM lineitem),
            r AS (SELECT g, cents,
                    row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
                    COUNT(*) OVER (PARTITION BY g) AS n
                  FROM v),
            kept AS (SELECT g, cents, n, n // 20 AS k
                     FROM r WHERE rn > n // 20 AND rn <= n - n // 20)
         SELECT g, CAST(MAX(n) AS BIGINT) AS n,
                CAST(MAX(k) AS BIGINT) AS k_trim,
                CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS trimmed_mean
         FROM kept GROUP BY g ORDER BY g""",

    "q_ts_forecast_err" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            e AS (SELECT dt, y,
                    lag(y, 7) OVER (ORDER BY dt) AS l7
                  FROM daily),
            v AS (SELECT y, y - l7 AS err FROM e WHERE l7 IS NOT NULL),
            agg AS (SELECT COUNT(*) AS n,
                      CAST(SUM(abs(err)) AS BIGINT) AS sum_abs,
                      CAST(SUM(err) AS BIGINT) AS sum_err,
                      CAST(SUM(y) AS BIGINT) AS sum_y
                    FROM v)
         SELECT n,
                CAST(sum_abs AS DOUBLE) / CAST(n AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS mae,
                CAST(sum_err AS DOUBLE) / CAST(n AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS bias,
                CAST(sum_abs AS DOUBLE) / CAST(sum_y AS DOUBLE) AS wape
         FROM agg""",

    "q_evt_inter_event" ->
      """WITH e AS (SELECT event_type AS t, user_id,
                    epoch_us(ts::TIMESTAMP) AS us, event_id
                 FROM events),
            lg AS (SELECT t, us,
                     lag(us) OVER (PARTITION BY t, user_id
                                   ORDER BY us, event_id) AS prev
                   FROM e),
            g AS (SELECT t, us - prev AS gap FROM lg WHERE prev IS NOT NULL)
         SELECT t, COUNT(*) AS n_gaps,
                quantile_cont(gap, 0.5) AS med_us,
                quantile_cont(gap, 0.9) AS p90_us,
                CAST(MAX(gap) AS BIGINT) AS max_us
         FROM g GROUP BY t ORDER BY t"""
  )
}
