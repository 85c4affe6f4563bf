package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-10 additions, part 8: KMV/theta distinct sketch with set
  * operations (the mergeable-sketch family's set-algebra member beside
  * HLL/count-min/quantile), the Markov-chain entropy rate, and the
  * Friedman repeated-measures rank test.
  *
  * Determinism contract (SURVEY §2.13): the KMV sample is the k
  * smallest portable md5 hashes (bit-identical both engines — every
  * estimate is an IEEE division of exact integers); entropy terms are
  * nano-quantized before the alphabet²-bounded sum; Friedman ranks are
  * exact doubled integers (the mannwhitney tied-rank discipline).
  */
object Extras70 {
  import Det._

  private val KmvK = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KMV / THETA SKETCH — distinct-count estimation WITH set algebra:
    // keep the k=64 smallest 60-bit hashes of each set's members (A =
    // customers with an URGENT order, B = customers with a finished
    // order); D̂ = (k−1)·M/h_k. θ = min(h_k^A, h_k^B); the union/
    // intersection estimates count sample hashes below θ (the theta-
    // sketch construction — the sketches MERGE, so at 100 TB each
    // partition ships k hashes, never raw keys). True exact distinct
    // counts are emitted beside the estimates so the sketch error is
    // graded, not argued.
    "q_agg_kmv_theta" -> ((s, d) => {
      val m = lit(1.152921504606846976e18) // 2^60, the md5long domain
      def kmv(df: DataFrame): DataFrame = {
        val h = df.select(md5long(col("k").cast("string")).as("h")).distinct()
        h.withColumn("rn", row_number().over(Window.orderBy(col("h"))))
          .where(col("rn") <= KmvK)
      }
      val aSet = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k")).distinct()
      val bSet = Tables.orders(s, d)
        .where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k")).distinct()
      val ka = kmv(aSet).agg(max(col("h")).as("hka"),
        count(lit(1)).as("na_s"))
      val kb = kmv(bSet).agg(max(col("h")).as("hkb"),
        count(lit(1)).as("nb_s"))
      val theta = ka.crossJoin(broadcast(kb))
        .select(col("hka"), col("hkb"), col("na_s"), col("nb_s"),
          least(col("hka"), col("hkb")).as("theta"))
      val below = kmv(aSet).select(col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
        .unionByName(kmv(bSet).select(col("h"), lit(0L).as("ia"),
          lit(1L).as("ib")))
        .groupBy(col("h"))
        .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
        .crossJoin(broadcast(theta))
        .where(col("h") < col("theta"))
        .agg(max(col("hka")).as("hka"), max(col("hkb")).as("hkb"),
          max(col("na_s")).as("na_s"), max(col("nb_s")).as("nb_s"),
          max(col("theta")).as("theta"),
          count(lit(1)).as("n_union_sample"),
          sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L))
            .as("n_inter_sample"))
      val trueA = aSet.agg(count(lit(1)).as("true_a"))
      val trueB = bSet.agg(count(lit(1)).as("true_b"))
      below.crossJoin(broadcast(trueA)).crossJoin(broadcast(trueB))
        .select(col("theta"), col("n_union_sample"), col("n_inter_sample"),
          col("true_a"), col("true_b"),
          r6((col("na_s") - 1).cast("double") * m
            / col("hka").cast("double")).as("est_a"),
          r6((col("nb_s") - 1).cast("double") * m
            / col("hkb").cast("double")).as("est_b"),
          r6(col("n_union_sample").cast("double") * m
            / col("theta").cast("double")).as("est_union"),
          r6(col("n_inter_sample").cast("double") * m
            / col("theta").cast("double")).as("est_inter"))
    }),

    // MARKOV ENTROPY RATE — H = −Σ_i π_i Σ_j p_ij log2 p_ij over the
    // event-type chain: how predictable is the next event given the
    // current one (the compressibility bound of the behavior stream).
    // π is the exact integer-micro stationary vector (q_evt_markov_
    // stationary's iteration, shared helper); each edge term is
    // nano-quantized from exact integers before the alphabet²-bounded
    // sum; log2 is ln/ln2-literal on BOTH engines (no engine log2
    // call enters parity).
    "q_evt_markov_entropy_rate" -> ((s, d) => {
      val closed = Extras56.transClosed(s, d)
      val pi = Extras56.stationaryVec(s, d)
      val p = col("n").cast("double") / col("rs").cast("double")
      closed.join(broadcast(pi), col("src") === col("state"))
        .withColumn("term_nano",
          round(lit(-1.0) * (col("v").cast("double") / lit(1e6))
            * p * log(p) / lit(0.6931471805599453) * lit(1e9))
            .cast("long"))
        .agg(countDistinct(col("state")).as("n_states"),
          sum(col("term_nano")).as("h_nano"))
        .select(col("n_states"), col("h_nano"),
          r6(col("h_nano").cast("double") / lit(1e9)).as("h_bits"))
    }),

    // FRIEDMAN TEST — do the five priority classes keep the same
    // revenue ORDERING across months (repeated-measures, distribution-
    // free)? Blocks = complete months; within each block the 5
    // treatments get exact DOUBLED average ranks (2R = 2·rank + t − 1,
    // ties by value-group size); χ²_F folds the per-treatment doubled
    // rank sums pivoted... computed from the 5-row treatment relation
    // in exact integers. Tied cells are COUNTED AND EMITTED; the
    // statistic is the standard uncorrected form (stated, not claimed
    // corrected — the mann_kendall lesson).
    "q_agg_friedman" -> ((s, d) => {
      val bm = Tables.orders(s, d)
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("ym"),
          substring(col("o_orderpriority"), 1, 1).as("prio"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("v"))
      val complete = bm.groupBy(col("ym")).agg(count(lit(1)).as("kk"))
        .where(col("kk") === 5).select(col("ym"))
      val ranked = bm.join(complete, "ym")
        .withColumn("rnk", rank().over(
          Window.partitionBy(col("ym")).orderBy(col("v"))))
        .withColumn("t", count(lit(1)).over(
          Window.partitionBy(col("ym"), col("v"))))
        .withColumn("dr", lit(2) * col("rnk") + col("t") - 1)
      val perTreat = ranked.groupBy(col("prio"))
        .agg(sum(col("dr")).as("r2"),
          sum(when(col("t") > 1, 1L).otherwise(0L)).as("tie_rows"),
          count(lit(1)).as("nb"))
      val agg = perTreat.agg(
        max(col("nb")).as("n_blocks"),
        sum(col("r2") * col("r2")).as("sum_r2sq"),
        sum(col("tie_rows")).as("n_tie_rows"))
      val nD = col("n_blocks").cast("double")
      val kD = lit(5.0)
      agg.select(lit(5L).as("k"), col("n_blocks"), col("n_tie_rows"),
        r6(lit(12.0) * (col("sum_r2sq").cast("double") / lit(4.0))
          / (nD * kD * (kD + lit(1.0)))
          - lit(3.0) * nD * (kD + lit(1.0))).as("chi2_f"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_kmv_theta" ->
      s"""WITH aset AS (SELECT DISTINCT o_custkey AS k FROM orders
                  WHERE o_orderpriority = '1-URGENT'),
            bset AS (SELECT DISTINCT o_custkey AS k FROM orders
                  WHERE o_orderstatus = 'F'),
            ah AS (SELECT h FROM (
                   SELECT h, row_number() OVER (ORDER BY h) AS rn
                   FROM (SELECT DISTINCT
                           CAST(('0x' || substr(md5(CAST(k AS VARCHAR)),
                             1, 15)) AS BIGINT) AS h
                         FROM aset))
                   WHERE rn <= $KmvK),
            bh AS (SELECT h FROM (
                   SELECT h, row_number() OVER (ORDER BY h) AS rn
                   FROM (SELECT DISTINCT
                           CAST(('0x' || substr(md5(CAST(k AS VARCHAR)),
                             1, 15)) AS BIGINT) AS h
                         FROM bset))
                   WHERE rn <= $KmvK),
            ka AS (SELECT MAX(h) AS hka, CAST(COUNT(*) AS BIGINT) AS na_s
                   FROM ah),
            kb AS (SELECT MAX(h) AS hkb, CAST(COUNT(*) AS BIGINT) AS nb_s
                   FROM bh),
            th AS (SELECT hka, hkb, na_s, nb_s,
                     LEAST(hka, hkb) AS theta FROM ka, kb),
            mrg AS (SELECT h, MAX(ia) AS ia, MAX(ib) AS ib
                    FROM (SELECT h, 1 AS ia, 0 AS ib FROM ah
                          UNION ALL
                          SELECT h, 0 AS ia, 1 AS ib FROM bh)
                    GROUP BY h),
            bel AS (SELECT MAX(hka) AS hka, MAX(hkb) AS hkb,
                    MAX(na_s) AS na_s, MAX(nb_s) AS nb_s,
                    MAX(theta) AS theta,
                    CAST(COUNT(*) AS BIGINT) AS n_union_sample,
                    CAST(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_inter_sample
                  FROM mrg, th WHERE mrg.h < th.theta),
            ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_a FROM aset),
            tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_b FROM bset)
         SELECT theta, n_union_sample, n_inter_sample, true_a, true_b,
                round(CAST(na_s - 1 AS DOUBLE) * 1.152921504606846976e18
                  / CAST(hka AS DOUBLE), 6) AS est_a,
                round(CAST(nb_s - 1 AS DOUBLE) * 1.152921504606846976e18
                  / CAST(hkb AS DOUBLE), 6) AS est_b,
                round(CAST(n_union_sample AS DOUBLE)
                  * 1.152921504606846976e18
                  / CAST(theta AS DOUBLE), 6) AS est_union,
                round(CAST(n_inter_sample AS DOUBLE)
                  * 1.152921504606846976e18
                  / CAST(theta AS DOUBLE), 6) AS est_inter
         FROM bel, ta, tb""",

    "q_evt_markov_entropy_rate" ->
      """WITH e AS (SELECT user_id, event_type AS src,
                           ts::TIMESTAMP AS t, event_id
                 FROM events),
            tr AS (SELECT src,
                     lead(src, 1) OVER (PARTITION BY user_id
                       ORDER BY t, event_id) AS dst
                   FROM e),
            cnt AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
                    FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
            rsrc AS (SELECT src, CAST(SUM(n) AS BIGINT) AS rs
                     FROM cnt GROUP BY 1),
            states AS (SELECT DISTINCT src AS state FROM cnt),
            closed AS (SELECT c.src, c.dst, c.n, r.rs
                       FROM cnt c JOIN rsrc r USING (src)
                       JOIN states s ON s.state = c.dst),
            v0 AS (SELECT state,
                     CAST(1000000 // (SELECT COUNT(*) FROM states)
                       + CASE WHEN row_number() OVER (ORDER BY state) = 1
                         THEN 1000000 % (SELECT COUNT(*) FROM states)
                         ELSE 0 END AS BIGINT) AS v
                   FROM states),
            ITER_CTES
            terms AS (SELECT v12.state, closed.n, closed.rs, v12.v,
                     CAST(round(-1.0 * (CAST(v12.v AS DOUBLE) / 1000000.0)
                       * (CAST(closed.n AS DOUBLE) / CAST(closed.rs AS DOUBLE))
                       * ln(CAST(closed.n AS DOUBLE) / CAST(closed.rs AS DOUBLE))
                       / 0.6931471805599453 * 1000000000.0) AS BIGINT)
                       AS term_nano
                   FROM closed JOIN v12 ON closed.src = v12.state)
         SELECT CAST(COUNT(DISTINCT state) AS BIGINT) AS n_states,
                CAST(SUM(term_nano) AS BIGINT) AS h_nano,
                round(CAST(SUM(term_nano) AS DOUBLE) / 1000000000.0, 6)
                  AS h_bits
         FROM terms""".replace("ITER_CTES",
        (1 to 12).map(i =>
          s"""v$i AS (SELECT dst AS state,
                CAST(SUM(v * n // rs) AS BIGINT) AS v
              FROM v${i - 1} JOIN closed ON closed.src = v${i - 1}.state
              GROUP BY dst)""").mkString(",\n            ") + ",\n"),

    "q_agg_friedman" ->
      """WITH bm AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE))
                      AS ym,
                    substr(o_orderpriority, 1, 1) AS prio,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS v
                 FROM orders GROUP BY 1, 2),
            cmp AS (SELECT ym FROM bm GROUP BY ym HAVING COUNT(*) = 5),
            ranked AS (SELECT bm.prio,
                    rank() OVER (PARTITION BY bm.ym ORDER BY bm.v) AS rnk,
                    COUNT(*) OVER (PARTITION BY bm.ym, bm.v) AS t
                  FROM bm JOIN cmp ON bm.ym = cmp.ym),
            pt AS (SELECT prio,
                    CAST(SUM(2 * rnk + t - 1) AS BIGINT) AS r2,
                    CAST(SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS tie_rows,
                    CAST(COUNT(*) AS BIGINT) AS nb
                  FROM ranked GROUP BY prio),
            a AS (SELECT MAX(nb) AS n_blocks,
                    CAST(SUM(r2 * r2) AS BIGINT) AS sum_r2sq,
                    CAST(SUM(tie_rows) AS BIGINT) AS n_tie_rows
                  FROM pt)
         SELECT CAST(5 AS BIGINT) AS k, n_blocks, n_tie_rows,
                round(12.0 * (CAST(sum_r2sq AS DOUBLE) / 4.0)
                  / (CAST(n_blocks AS DOUBLE) * 5.0 * 6.0)
                  - 3.0 * CAST(n_blocks AS DOUBLE) * 6.0, 6) AS chi2_f
         FROM a"""
  )
}
