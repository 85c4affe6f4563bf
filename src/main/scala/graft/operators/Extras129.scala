package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 55: Harrell's concordance index for
  * time-to-purchase against a first-day activity score (the survival
  * family's model-evaluation number beside KM/hazard/logrank), a
  * deterministic moving-block bootstrap variance of the daily-revenue
  * mean (the time-series sibling of q_agg_poisson_bootstrap — blocks
  * preserve autocorrelation that iid resampling destroys), and
  * 2-D iterative proportional fitting (raking) of the
  * priority×status order grid to uniform margins.
  *
  * Scale shape: cindex folds users to a bounded (T, event, score)
  * grid, then pair-joins the GRID with itself (broadcast — cells²,
  * never users²); block_bootstrap joins a 2000-row broadcast
  * (resample, block) spine to the rolling-7-sum relation on the
  * md5-picked start index (equi-join); raking iterates on the
  * 15-row grid with window normalizations — three unrolled
  * iterations, no recursion.
  *
  * Determinism contract (SURVEY §2.13): cindex counts ride exact
  * integer cell products with DOUBLED concordance (2·conc + ties);
  * block starts are the portable md5long hash mod (n−6) — identical
  * picks both engines; resample means are micro-quantized before the
  * variance fold; raking re-quantizes the weight to integer micro
  * units after EVERY scaling step (the Holt-Winters shared-state
  * discipline), so both engines iterate identical integers.
  */
object Extras129 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HARRELL'S C — does first-24h activity predict time to first
    // purchase? Comparable pairs: T_i < T_j with subject i uncensored;
    // concordant when score_i > score_j (more activity → sooner).
    "q_evt_cindex" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_type").as("et"),
          tsUs(col("ts")).as("t"))
      val gmax = ev.agg(max(col("t")).as("tmax"))
      val per = ev.groupBy(col("u"))
        .agg(min(col("t")).as("t0"),
          min(when(col("et") === "purchase", col("t"))).as("tp"))
        .crossJoin(broadcast(gmax))
      val scored = ev.select(col("u"), col("t"))
        .join(per.select(col("u"), col("t0")), "u")
        .where(col("t") < col("t0") + lit(86400000000L))
        .groupBy(col("u")).agg(count(lit(1)).as("score"))
      val subj = per.join(scored, "u")
        .select(col("u"),
          when(col("tp").isNotNull,
            expr("(tp - t0) div 86400000000")).otherwise(
            expr("(tmax - t0) div 86400000000")).as("tt"),
          when(col("tp").isNotNull, 1L).otherwise(0L).as("e"),
          col("score"))
      val grid = subj.groupBy(col("tt"), col("e"), col("score"))
        .agg(count(lit(1)).as("c"))
      val b = grid.select(col("tt").as("tt2"), col("e").as("e2"),
        col("score").as("s2"), col("c").as("c2"))
      val pairs = grid.where(col("e") === 1)
        .join(broadcast(b), col("tt") < col("tt2"))
      pairs.agg(
          sum(col("c") * col("c2")).as("comparable"),
          sum(when(col("score") > col("s2"),
            col("c") * col("c2") * 2).otherwise(0L)).as("conc2a"),
          sum(when(col("score") === col("s2"),
            col("c") * col("c2")).otherwise(0L)).as("ties"))
        .select(col("comparable"),
          expr("(conc2a + ties) div 2").as("conc_x2_half"),
          r6((col("conc2a") + col("ties")).cast("double") /
            (lit(2.0) * col("comparable").cast("double")))
            .as("c_index"))
    }),

    // MOVING-BLOCK BOOTSTRAP — 50 deterministic resamples of 40
    // length-7 blocks (md5-picked starts) from the daily revenue
    // series; variance of the resample means estimates Var(x̄) under
    // autocorrelation.
    "q_ts_block_bootstrap" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val w7 = Window.orderBy(col("dt")).rowsBetween(0, 6)
      val idx = daily
        .withColumn("i", row_number().over(
          Window.orderBy(col("dt"))).cast("long"))
        .withColumn("bs", sum(col("y")).over(w7))
        .withColumn("bn", count(lit(1)).over(w7))
        .where(col("bn") === 7)
        .select(col("i"), col("bs"))
      val nTot = daily.agg(count(lit(1)).as("nn"))
      val spine = s.range(0, 50).select(col("id").as("r"))
        .crossJoin(broadcast(s.range(0, 40).select(col("id").as("b"))))
      val picks = spine.crossJoin(broadcast(nTot))
        .withColumn("i", pmod(
          md5long(concat(col("r"), lit("_"), col("b"))),
          col("nn") - 6) + 1)
      // Shared-subtree rule (round-15 ADVICE): res feeds BOTH the stats
      // aggregate `a` and the deviation pass `sdd`; without the cut the
      // picks-join-aggregate resample subtree recomputes once per
      // reference (deterministic via md5long, so correctness-safe, but
      // it doubled the key's heaviest stage).
      val res = picks.join(idx, "i")
        .groupBy(col("r"))
        .agg(sum(col("bs")).as("tot"))
        .withColumn("mean_micro",
          round(col("tot").cast("double") / lit(280.0) * lit(1e6))
            .cast("long"))
        .duckCkpt()
      // sm accumulates in DECIMAL(38,0) and emits via the two-limb
      // split (round-14 FenceProbe: Σmean_micro read 7.8e16 > 2^53
      // at sf0.1, ∝ volume — int64 overflow by ~sf12). The variance
      // is CENTERED (round-15 decimal fence): the raw second moment
      // Σx² read 1.2e30 at sf0.01 — past even the two-limb 2^93
      // horizon, and n·Σx²−(Σx)² cancels catastrophically anyway.
      // Deviations from m = sm div nr square to ~1e26 (∝ volume²),
      // accumulate exactly in DECIMAL(38,0) to ~sf300, and emit via
      // the three-limb split; the centering remainder rem = sm−nr·m
      // is ≤ nr, so its exact-double correction rem²/nr costs nothing.
      val big = org.apache.spark.sql.types.DecimalType(38, 0)
      val a = res.agg(count(lit(1)).as("nr"),
        sum(col("mean_micro").cast(big)).as("sm"))
        .withColumn("m", expr("CAST(sm div nr AS BIGINT)"))
        .withColumn("rem", expr("CAST(sm - CAST(nr AS DECIMAL(38,0))" +
          " * CAST(m AS DECIMAL(38,0)) AS BIGINT)"))
      val sdd = res.crossJoin(broadcast(a.select(col("m"))))
        .select(((col("mean_micro") - col("m")).cast(big) *
          (col("mean_micro") - col("m")).cast(big)).as("d2"))
        .agg(sum(col("d2")).as("sdd"))
      val nD = col("nr").cast("double")
      // Σ(x−x̄)² = Σ(x−m)² − rem²/n, every term from an exact-int path
      val varMicro = (limbDouble3("sdd")
        - col("rem").cast("double") * col("rem").cast("double") / nD) /
        (nD - 1)
      a.crossJoin(broadcast(sdd)).select(col("nr").as("n_resamples"),
        r6(limbDouble("sm") / lit(1e6) / nD / lit(100.0))
          .as("boot_mean_dollars"),
        r6(sqrt(varMicro) / lit(1e6) / lit(100.0))
          .as("boot_se_dollars"))
    }),

    // IPF RAKING — adjust priority×status cell weights to UNIFORM
    // row/column margins in three unrolled iterations; weights
    // re-quantized to micro units after every scaling.
    "q_agg_ipf_raking" -> ((s, d) => {
      // Bounded driver fold (the markov_absorb pattern; round-12
      // verdict item 4): the (priority-digit × status) grid is ≤15
      // cells at ANY data scale, so running the six raking passes as
      // six chained Spark window stages was pure orchestration
      // overhead (3.9 s of driver bench for a 15-cell computation).
      // One distributed agg builds the grid; the IPF iterates locally
      // in the IDENTICAL IEEE sequence: sparkRound replicates Spark's
      // Round(double, 0) exactly (java BigDecimal.valueOf → HALF_UP —
      // NOT math.round, whose x+0.5 differs below .5 boundaries), and
      // every product/division keeps the window version's op order.
      import s.implicits._
      def sparkRound(x: Double): Long =
        java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val cells = Tables.orders(s, d)
        .groupBy(substring(col("o_orderpriority"), 1, 1).as("p"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val nn = cells.map(_._3).sum
      var w = cells.map { case (p, st, n) => (p, st) -> n * 1000000L }
        .toMap
      def rake(keyOf: ((String, String)) => String, tgt: Double)
          : Unit = {
        val sums = w.groupBy { case (k, _) => keyOf(k) }
          .map { case (g, m) => g -> m.values.sum }
        w = w.map { case (k, wv) =>
          k -> sparkRound(wv.toDouble * (nn.toDouble / tgt)
            / (sums(keyOf(k)).toDouble / 1e6))
        }
      }
      for (_ <- 1 to 3) { rake(_._1, 5.0); rake(_._2, 3.0) }
      cells.map { case (p, st, n) => (p, st, n, w((p, st))) }
        .toSeq.toDF("p", "st", "n", "w")
        .select(col("p"), col("st"), col("n"),
          r6(col("w").cast("double") / lit(1e6)).as("weight_mass"),
          r6(col("w").cast("double") / lit(1e6)
            / col("n").cast("double")).as("raking_factor"))
        .orderBy(col("p"), col("st"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_cindex" ->
      """WITH ev AS (SELECT user_id AS u, event_type AS et,
                    epoch_us(ts::TIMESTAMP) AS t
                 FROM events),
            gmax AS (SELECT MAX(t) AS tmax FROM ev),
            per AS (SELECT u, MIN(t) AS t0,
                    MIN(CASE WHEN et = 'purchase' THEN t END) AS tp
                  FROM ev GROUP BY 1),
            scored AS (SELECT ev.u, CAST(COUNT(*) AS BIGINT) AS score
                    FROM ev JOIN per ON ev.u = per.u
                    WHERE ev.t < per.t0 + 86400000000
                    GROUP BY 1),
            subj AS (SELECT per.u,
                    CASE WHEN tp IS NOT NULL
                         THEN (tp - t0) // 86400000000
                         ELSE (tmax - t0) // 86400000000 END AS tt,
                    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e,
                    score
                  FROM per JOIN scored ON per.u = scored.u
                  CROSS JOIN gmax),
            grid AS (SELECT tt, e, score, CAST(COUNT(*) AS BIGINT) AS c
                     FROM subj GROUP BY 1, 2, 3),
            pairs AS (SELECT a.score AS s1, b.score AS s2,
                      a.c * b.c AS m
                    FROM grid a JOIN grid b ON a.tt < b.tt
                    WHERE a.e = 1)
         SELECT CAST(SUM(m) AS BIGINT) AS comparable,
                CAST((SUM(CASE WHEN s1 > s2 THEN m * 2 ELSE 0 END)
                  + SUM(CASE WHEN s1 = s2 THEN m ELSE 0 END)) // 2
                  AS BIGINT) AS conc_x2_half,
                round(CAST(SUM(CASE WHEN s1 > s2 THEN m * 2 ELSE 0 END)
                    + SUM(CASE WHEN s1 = s2 THEN m ELSE 0 END)
                    AS DOUBLE)
                  / (2.0 * CAST(SUM(m) AS DOUBLE)), 6) AS c_index
         FROM pairs""",

    "q_ts_block_bootstrap" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT i, bs FROM (
                   SELECT CAST(row_number() OVER (ORDER BY dt)
                       AS BIGINT) AS i,
                     CAST(SUM(y) OVER (ORDER BY dt
                       ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
                       AS BIGINT) AS bs,
                     COUNT(*) OVER (ORDER BY dt
                       ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS bn
                   FROM daily) t WHERE bn = 7),
            nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM daily),
            spine AS (SELECT r.r, b.b FROM
                      (SELECT unnest(generate_series(0, 49)) AS r) r,
                      (SELECT unnest(generate_series(0, 39)) AS b) b),
            picks AS (SELECT r,
                      CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || '_'
                          || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
                        % (nn - 6) + 1 AS i
                    FROM spine, nt),
            res AS (SELECT r,
                      CAST(round(CAST(SUM(bs) AS DOUBLE) / 280.0 * 1e6)
                        AS BIGINT) AS mean_micro
                    FROM picks JOIN idx USING (i) GROUP BY 1),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr,
                    CAST(SUM(mean_micro) AS HUGEINT) AS sm
                  FROM res),
            am AS (SELECT nr, sm,
                     CAST(sm // nr AS BIGINT) AS m,
                     CAST(sm - CAST(nr AS HUGEINT)
                       * (sm // nr) AS BIGINT) AS rem
                   FROM a),
            sd AS (SELECT CAST(SUM(CAST(mean_micro - m AS HUGEINT)
                       * CAST(mean_micro - m AS HUGEINT)) AS HUGEINT)
                     AS sdd
                   FROM res, am),
            lm AS (SELECT nr, rem, sdd,
                     (CAST(CAST(sm // 1073741824 AS BIGINT) AS DOUBLE)
                        * 1073741824.0
                      + CAST(CAST(sm % 1073741824 AS BIGINT)
                        AS DOUBLE)) AS smd,
                     (CAST(CAST(sdd // 1152921504606846976 AS BIGINT)
                        AS DOUBLE) * 1152921504606846976.0
                      + CAST(CAST((sdd % 1152921504606846976)
                          // 1073741824 AS BIGINT) AS DOUBLE)
                        * 1073741824.0
                      + CAST(CAST(sdd % 1073741824 AS BIGINT)
                        AS DOUBLE)) AS sddd
                   FROM am, sd)
         SELECT nr AS n_resamples,
                round(smd / 1e6 / CAST(nr AS DOUBLE)
                  / 100.0, 6) AS boot_mean_dollars,
                round(sqrt((sddd - CAST(rem AS DOUBLE)
                    * CAST(rem AS DOUBLE) / CAST(nr AS DOUBLE))
                  / (CAST(nr AS DOUBLE) - 1))
                  / 1e6 / 100.0, 6) AS boot_se_dollars
         FROM lm""",

    "q_agg_ipf_raking" ->
      """WITH grid AS (SELECT substr(o_orderpriority, 1, 1) AS p,
                    o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
                 FROM orders GROUP BY 1, 2),
            g0 AS (SELECT p, st, n,
                    CAST(SUM(n) OVER () AS BIGINT) AS nn,
                    n * 1000000 AS w
                  FROM grid),
            r1 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 5.0)
                      / (CAST(SUM(w) OVER (PARTITION BY p) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM g0),
            c1 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 3.0)
                      / (CAST(SUM(w) OVER (PARTITION BY st) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM r1),
            r2 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 5.0)
                      / (CAST(SUM(w) OVER (PARTITION BY p) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM c1),
            c2 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 3.0)
                      / (CAST(SUM(w) OVER (PARTITION BY st) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM r2),
            r3 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 5.0)
                      / (CAST(SUM(w) OVER (PARTITION BY p) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM c2),
            c3 AS (SELECT p, st, n, nn,
                    CAST(round(CAST(w AS DOUBLE)
                      * (CAST(nn AS DOUBLE) / 3.0)
                      / (CAST(SUM(w) OVER (PARTITION BY st) AS DOUBLE)
                        / 1e6)) AS BIGINT) AS w
                  FROM r3)
         SELECT p, st, n,
                round(CAST(w AS DOUBLE) / 1e6, 6) AS weight_mass,
                round(CAST(w AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6)
                  AS raking_factor
         FROM c3 ORDER BY p, st"""
  )
}
