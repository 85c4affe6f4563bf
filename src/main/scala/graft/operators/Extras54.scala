package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 17: exponential decay fit of the survival
  * curve, portable whole-table checksums, and histogram KL divergence.
  *
  * Determinism contract (SURVEY §2.13): the decay regression's y values
  * ARE the survival kernel's integer micro-log-survivals (no new IEEE
  * source); checksums fold order-free XORs of portable md5 hashes;
  * KL terms are micro-quantized over smoothed integer bin counts.
  */
object Extras54 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DECAY FIT — fit ln S(t) = −λ·t to the Kaplan-Meier curve (is
    // repeat-purchase hazard constant?): the regression's y values are
    // q_evt_survival's cum_micro integers (1e6·ln S — already exact),
    // x the integer durations, so all five moment sums are BIGINT
    // folds over the bounded curve relation; λ and the half-life are
    // one shared IEEE chain.
    "q_evt_decay_fit" -> ((s, d) => {
      val curve = Extras50.queries("q_evt_survival")(s, d)
        .select(col("dur_days").as("x"), col("cum_micro").as("y"))
      val m = curve.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      m.select(col("n").as("n_points"),
        r6(slope / 1e6).as("lambda_per_day"),
        r6(lit(-math.log(2.0) * 1e6) / slope).as("half_life_days"))
    }),

    // TABLE CHECKSUM — the replication-validation fingerprint: an
    // order-free bit_xor of a portable per-row md5 over the business
    // key + measure columns, per table. Two engines (or two replicas
    // of the same 100 TB table) agree iff every row agrees — no sort,
    // no collect, one aggregate pass per table.
    "q_dq_table_checksum" -> ((s, d) => {
      def ck(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_hash"),
          sum(pmod(col("h"), lit(1000000007L))).as("sum_hash_mod"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("xor_hash"), col("sum_hash_mod"))
      val orders = Tables.orders(s, d)
        .select(md5long(concat_ws("|", col("o_orderkey"),
          col("o_custkey"), dec(col("o_totalprice")).cast("string")))
          .as("h"))
      val lineitem = Tables.lineitem(s, d)
        .select(md5long(concat_ws("|", col("l_orderkey"),
          col("l_linenumber"), dec(col("l_extendedprice")).cast("string")))
          .as("h"))
      val customer = Tables.customer(s, d)
        .select(md5long(concat_ws("|", col("c_custkey"), col("c_name")))
          .as("h"))
      ck("customer", customer)
        .unionByName(ck("lineitem", lineitem))
        .unionByName(ck("orders", orders))
        .orderBy("table_name")
    }),

    // HISTOGRAM KL — D(P‖Q) between URGENT and non-urgent order-value
    // distributions over 20 equal-width bins (the distribution-shift
    // lens that PSI approximates): bin membership is integer division
    // of exact cents; +1 smoothing keeps every bin supported; each
    // p·ln(p/q) term micro-quantized before the 20-term sum.
    "q_agg_histogram_kl" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select((col("o_orderpriority") === "1-URGENT").as("u"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val binned = o.withColumn("bin",
        least(expr("cents div 3000000"), lit(19L)))
      val cells = binned.groupBy(col("bin"))
        .agg(sum(when(col("u"), 1L).otherwise(0L)).as("p_raw"),
          sum(when(col("u"), 0L).otherwise(1L)).as("q_raw"))
      val tot = cells.agg(sum(col("p_raw")).as("np"),
        sum(col("q_raw")).as("nq"), count(lit(1)).as("nb"))
      cells.crossJoin(broadcast(tot))
        .withColumn("t_micro", round(
          (col("p_raw") + 1).cast("double")
            / (col("np") + col("nb")).cast("double")
            * log((col("p_raw") + 1).cast("double")
              / (col("np") + col("nb")).cast("double")
              / ((col("q_raw") + 1).cast("double")
                / (col("nq") + col("nb")).cast("double"))) * 1e6)
          .cast("long"))
        .agg(max(col("np")).as("n_urgent"), max(col("nq")).as("n_rest"),
          max(col("nb")).as("n_bins"), sum(col("t_micro")).as("kl_micro"))
        .select(col("n_urgent"), col("n_rest"), col("n_bins"),
          col("kl_micro"),
          r6(col("kl_micro").cast("double") / 1e6).as("kl_nats"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_decay_fit" -> {
      val survivalCore =
        """o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
                    o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                      AS rn
                 FROM orders),
            ft AS (SELECT o_custkey, MIN(dt) AS d1,
                     MAX(CASE WHEN rn = 2 THEN dt END) AS d2
                   FROM o WHERE rn <= 2 GROUP BY o_custkey),
            mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax
                   FROM orders),
            dur AS (SELECT CAST(CASE WHEN d2 IS NOT NULL THEN d2 - d1
                            ELSE dmax - d1 END AS BIGINT) AS dur,
                      d2 IS NOT NULL AS is_event
                    FROM ft, mx),
            bd AS (SELECT dur,
                     CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END)
                       AS BIGINT) AS d_events,
                     CAST(SUM(CASE WHEN is_event THEN 0 ELSE 1 END)
                       AS BIGINT) AS d_cens
                   FROM dur GROUP BY dur),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects FROM dur),
            c AS (SELECT dur, d_events, d_cens, n_subjects,
                    n_subjects - coalesce(SUM(d_events + d_cens)
                      OVER (ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS n_risk
                  FROM bd, nn),
            t AS (SELECT dur, d_events, n_risk,
                    CASE WHEN d_events > 0 AND d_events < n_risk
                      THEN CAST(round(ln(1.0 - CAST(d_events AS DOUBLE)
                           / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
                      END AS term_micro
                  FROM c),
            k AS (SELECT dur, d_events, n_risk,
                    CAST(SUM(term_micro) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum_micro
                  FROM t)"""
      s"""WITH $survivalCore,
            pts AS (SELECT dur AS x, cum_micro AS y FROM k
                    WHERE d_events > 0 AND d_events < n_risk),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    CAST(SUM(x * y) AS BIGINT) AS sxy,
                    CAST(SUM(x * x) AS BIGINT) AS sxx
                  FROM pts)
         SELECT n AS n_points,
                round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) / 1e6, 6)
                  AS lambda_per_day,
                round(${-math.log(2.0)} * 1e6
                  / (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)), 6)
                  AS half_life_days
         FROM m"""
    },

    "q_dq_table_checksum" ->
      """WITH oh AS (SELECT CAST(('0x' || substr(md5(
                      o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR
                      || '|' || CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR),
                      1, 15)) AS BIGINT) AS h
                 FROM orders),
            lh AS (SELECT CAST(('0x' || substr(md5(
                      l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR
                      || '|' ||
                      CAST(l_extendedprice AS DECIMAL(18,2))::VARCHAR),
                      1, 15)) AS BIGINT) AS h
                   FROM lineitem),
            ch AS (SELECT CAST(('0x' || substr(md5(
                      c_custkey::VARCHAR || '|' || c_name), 1, 15))
                      AS BIGINT) AS h
                   FROM customer),
            u AS (SELECT 'customer' AS table_name,
                    CAST(COUNT(*) AS BIGINT) AS n_rows,
                    CAST(bit_xor(h) AS BIGINT) AS xor_hash,
                    CAST(SUM(h % 1000000007) AS BIGINT) AS sum_hash_mod
                  FROM ch
                  UNION ALL
                  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
                    CAST(bit_xor(h) AS BIGINT),
                    CAST(SUM(h % 1000000007) AS BIGINT)
                  FROM lh
                  UNION ALL
                  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
                    CAST(bit_xor(h) AS BIGINT),
                    CAST(SUM(h % 1000000007) AS BIGINT)
                  FROM oh)
         SELECT * FROM u ORDER BY table_name""",

    "q_agg_histogram_kl" ->
      """WITH o AS (SELECT o_orderpriority = '1-URGENT' AS u,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
                 FROM orders),
            b AS (SELECT least(cents // 3000000, 19) AS bin, u FROM o),
            cells AS (SELECT bin,
                        CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END)
                          AS BIGINT) AS p_raw,
                        CAST(SUM(CASE WHEN u THEN 0 ELSE 1 END)
                          AS BIGINT) AS q_raw
                      FROM b GROUP BY bin),
            tot AS (SELECT CAST(SUM(p_raw) AS BIGINT) AS np,
                           CAST(SUM(q_raw) AS BIGINT) AS nq,
                           CAST(COUNT(*) AS BIGINT) AS nb
                    FROM cells),
            t AS (SELECT np, nq, nb,
                    CAST(round(CAST(p_raw + 1 AS DOUBLE)
                      / CAST(np + nb AS DOUBLE)
                      * ln(CAST(p_raw + 1 AS DOUBLE)
                        / CAST(np + nb AS DOUBLE)
                        / (CAST(q_raw + 1 AS DOUBLE)
                          / CAST(nq + nb AS DOUBLE))) * 1e6) AS BIGINT)
                      AS t_micro
                  FROM cells, tot)
         SELECT MAX(np) AS n_urgent, MAX(nq) AS n_rest,
                MAX(nb) AS n_bins,
                CAST(SUM(t_micro) AS BIGINT) AS kl_micro,
                round(CAST(SUM(t_micro) AS DOUBLE) / 1e6, 6) AS kl_nats
         FROM t GROUP BY np, nq, nb"""
  )
}
