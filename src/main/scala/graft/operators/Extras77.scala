package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 3: classical statistics round-out —
  * Grubbs' outlier test, the Pettitt change-point test, Jensen-Shannon
  * divergence (the symmetric sibling of q_agg_histogram_kl), the
  * Cox-Stuart trend sign test, the Page-Hinkley drift detector, and
  * the per-edge triangle-support histogram (the k-truss building
  * block beside q_graph_cluster_coeff).
  *
  * Determinism contract (SURVEY §2.13): deviations, rank sums, sign
  * counts, supports and cumulative sums are exact integers (products
  * widened to DECIMAL(38,0) before the first multiply where 4th-power
  * or n² headroom demands it); every emitted real number is either a
  * micro/nano-quantized per-term integer sum or ONE shared IEEE chain
  * over agreed integers.
  */
object Extras77 {
  import Det._

  private val Big = DecimalType(38, 0)

  /** Daily order revenue in exact cents with a 1-based day index. */
  private def dailyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("dt")))
        .cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GRUBBS' TEST — is the most extreme order value an outlier?
    // G = max|x − x̄| / s. The argmax is found WITHOUT any IEEE
    // compare: |x·n − Σx| is an exact integer ranking identical to
    // |x − x̄| (same positive scale factor n), so the max deviation,
    // its tie count, and the smallest attaining cents value are all
    // integer-exact; G itself is the one IEEE chain
    // (maxdev/n) / sqrt((n·Σx² − (Σx)²)/(n(n−1))).
    "q_agg_grubbs" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select((dec(col("o_totalprice")) * 100).cast("long").as("x"))
      val m = o.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"))
      val dev = o.crossJoin(broadcast(m))
        .select(col("n"), col("sx"), col("sxx"), col("x"),
          abs(col("x").cast(Big) * col("n").cast(Big)
            - col("sx").cast(Big)).as("dev_n"))
      val mx = dev.agg(max(col("dev_n")).as("maxdev_n"))
      dev.crossJoin(broadcast(mx))
        .where(col("dev_n") === col("maxdev_n"))
        .groupBy(col("n"), col("sx"), col("sxx"), col("maxdev_n"))
        .agg(count(lit(1)).as("n_at_max"),
          min(col("x")).as("outlier_cents"))
        .select(col("n"), col("n_at_max"), col("outlier_cents"),
          r6((col("maxdev_n").cast("double") / col("n").cast("double"))
            / sqrt((col("n").cast(Big) * col("sxx")
                - col("sx").cast(Big) * col("sx").cast(Big)).cast("double")
              / (col("n").cast(Big) * (col("n") - 1).cast(Big))
                .cast("double"))).as("g_stat"))
    }),

    // PETTITT CHANGE-POINT TEST — rank-based single change-point in
    // daily revenue: U_t = Σ_{i≤t<j} sgn(x_i − x_j), via the identity
    // U_t = U_{t−1} + V_t with V_t = Σ_{j≠t} sgn(x_t − x_j). V comes
    // from the BROADCAST calendar² pair relation (the mann_kendall
    // fence), U is one running-sum window over the day spine, and
    // K = max|U| with the earliest attaining day as the change point.
    // p ≈ 2·exp(−6K²/(n³+n²)) is the one IEEE tail.
    "q_ts_pettitt" -> ((s, d) => {
      val dr = dailyRevenue(s, d)
      val v = dr.as("a").join(broadcast(dr.as("b")),
          col("a.t") =!= col("b.t"))
        .groupBy(col("a.t").as("t"), col("a.dt").as("dt"))
        .agg(sum(signum(col("a.y") - col("b.y")).cast("long")).as("v"))
      val u = v.withColumn("u",
        sum(col("v")).over(Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val k = u.agg(max(abs(col("u"))).as("k_stat"),
        max(col("t")).as("n_days"))
      u.crossJoin(broadcast(k))
        .where(abs(col("u")) === col("k_stat"))
        .groupBy(col("n_days"), col("k_stat"))
        .agg(min(col("dt")).as("change_day"))
        .select(col("n_days"), col("k_stat"), col("change_day"),
          r6(lit(2.0) * exp((lit(-6.0) * col("k_stat").cast("double")
              * col("k_stat").cast("double"))
            / (col("n_days").cast("double") * col("n_days").cast("double")
               * col("n_days").cast("double")
               + col("n_days").cast("double")
                 * col("n_days").cast("double")))).as("p_approx"))
    }),

    // JENSEN-SHANNON DIVERGENCE — the symmetric, bounded sibling of
    // q_agg_histogram_kl: purchase vs click value distributions over
    // the same 20 Laplace-smoothed bins. Each bin's two contribution
    // terms p·ln(2p/(p+q)) and q·ln(2q/(p+q)) are ONE IEEE chain from
    // exact integer counts, NANO-quantized per bin, then summed as
    // integers (order-free); JSD = (Σp + Σq)/2, and the final nats
    // value is exact-integer division by 2e9 in one shared tail.
    "q_dq_jsd" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").as("p"),
          (dec(col("value")) * 100).cast("long").as("cents"))
      val cells = ev
        .withColumn("bin", least(expr("cents div 1000"), lit(19L)))
        .groupBy(col("bin"))
        .agg(sum(when(col("p"), 1L).otherwise(0L)).as("p_raw"),
          sum(when(col("p"), 0L).otherwise(1L)).as("q_raw"))
      val tot = cells.agg(sum(col("p_raw")).as("np"),
        sum(col("q_raw")).as("nq"), count(lit(1)).as("nb"))
      val pp = (col("p_raw") + 1).cast("double") /
        (col("np") + col("nb")).cast("double")
      val qq = (col("q_raw") + 1).cast("double") /
        (col("nq") + col("nb")).cast("double")
      cells.crossJoin(broadcast(tot))
        .withColumn("tp_nano",
          round(pp * log(lit(2.0) * pp / (pp + qq)) * 1e9).cast("long"))
        .withColumn("tq_nano",
          round(qq * log(lit(2.0) * qq / (pp + qq)) * 1e9).cast("long"))
        .agg(max(col("np")).as("n_purchase"), max(col("nq")).as("n_click"),
          max(col("nb")).as("n_bins"),
          sum(col("tp_nano") + col("tq_nano")).as("jsd2_nano"))
        .select(col("n_purchase"), col("n_click"), col("n_bins"),
          col("jsd2_nano"),
          r6(col("jsd2_nano").cast("double") / 2e9).as("jsd_nats"))
    }),

    // COX-STUART TREND TEST — the sign test on first-half vs
    // second-half day pairs of daily revenue: day i pairs with day
    // i + (n − c) (c = n div 2; the middle day of an odd series pairs
    // with nothing because i + (n−c) caps at n for i ≤ c). Ties drop;
    // S⁺ and the non-tie count m are exact; z = (2S⁺ − m)/√m is the
    // one IEEE chain (no continuity correction — stated form).
    "q_ts_cox_stuart" -> ((s, d) => {
      val dr = dailyRevenue(s, d)
      val n1 = dr.agg(count(lit(1)).as("n"))
        .select(col("n"), expr("n div 2").as("c"))
      val paired = dr.as("a").crossJoin(broadcast(n1))
        .where(col("a.t") <= col("c"))
        .join(dr.as("b"),
          col("b.t") === col("a.t") + (col("n") - col("c")))
        .select(col("n"), col("c"), col("a.y").as("y1"),
          col("b.y").as("y2"))
      paired.groupBy(col("n"), col("c"))
        .agg(sum(when(col("y2") > col("y1"), 1L).otherwise(0L))
            .as("s_plus"),
          sum(when(col("y2") =!= col("y1"), 1L).otherwise(0L)).as("m"))
        .select(col("n").as("n_days"), col("c").as("n_pairs_max"),
          col("s_plus"), col("m"),
          when(col("m") > 0,
            r6((col("s_plus") * 2 - col("m")).cast("double")
              / sqrt(col("m").cast("double")))).as("z_cs"))
    }),

    // PAGE-HINKLEY DRIFT DETECTOR (δ = 0, increase direction) on daily
    // revenue: m_t = Σ_{s≤t}(x_s − x̄_s) with x̄_s the running mean —
    // every term is x_s·1e6 − (cum_s·1e6 div s), an EXACT integer from
    // a cumulative-sum window (no recursion: the running mean is a
    // prefix statistic, so the whole detector is window-expressible).
    // PH_t = m_t − min_{s≤t} m_s; the statistic is max_t PH_t with the
    // earliest attaining day as the alarm day. All integer end to end.
    "q_ts_page_hinkley" -> ((s, d) => {
      val dr = dailyRevenue(s, d)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // cum·1e6 passes BIGINT at ~1e13 total daily cents (the 8× probe
      // fixture already gets there), and DuckDB's windowed SUM folds in
      // HUGEINT — widen to DECIMAL(38,0) BEFORE the multiply on the
      // Spark side so both engines carry the exact integer.
      val terms = dr
        .withColumn("cum", sum(col("y").cast(Big)).over(wCum))
        .withColumn("term",
          col("y").cast(Big) * 1000000L
            - expr("(cum * 1000000) div t"))
      val m = terms.withColumn("m", sum(col("term")).over(wCum))
        .withColumn("mmin", min(col("m")).over(wCum))
        .withColumn("ph", col("m") - col("mmin"))
      val top = m.agg(max(col("ph")).as("ph_stat_micro"),
        max(col("t")).as("n_days"))
      m.crossJoin(broadcast(top))
        .where(col("ph") === col("ph_stat_micro"))
        .groupBy(col("n_days"), col("ph_stat_micro"))
        .agg(min(col("dt")).as("alarm_day"))
        .select(col("n_days"),
          col("ph_stat_micro").cast("long").as("ph_stat_micro"),
          col("alarm_day"),
          r6(col("ph_stat_micro").cast("double") / 1e6 / 100.0)
            .as("ph_stat_usd"))
    }),

    // EDGE TRIANGLE SUPPORT — per-edge triangle counts on the shared
    // co-occurrence graph (the k-truss peel's first round): each
    // a<b<c triangle supports its three edges; the histogram over
    // support (0-support edges included) is the truss-decomposition
    // profile. Join-shaped exactly like q_graph_triangles — bounded by
    // Σdeg² on the sampled user graph.
    "q_graph_edge_support" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d).duckCkpt()
      val tri = und.as("e1")
        .join(und.as("e2"), col("e1.b") === col("e2.a"))
        .join(und.as("e3"),
          col("e2.b") === col("e3.b") && col("e1.a") === col("e3.a"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      val edgeTri = tri.select(explode(array(
          struct(col("x").as("a"), col("y").as("b")),
          struct(col("y").as("a"), col("z").as("b")),
          struct(col("x").as("a"), col("z").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
      und.join(edgeTri, Seq("a", "b"), "left")
        .select(coalesce(col("support"), lit(0L)).as("support"))
        .groupBy(col("support")).agg(count(lit(1)).as("n_edges"))
        .orderBy("support")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_grubbs" ->
      """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS x FROM orders),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                           AS sxx
                  FROM o),
            dev AS (SELECT o.x, m.n, m.sx, m.sxx,
                           abs(CAST(o.x AS HUGEINT) * m.n
                               - CAST(m.sx AS HUGEINT)) AS dev_n
                    FROM o, m),
            mx AS (SELECT MAX(dev_n) AS maxdev_n FROM dev)
         SELECT n, CAST(COUNT(*) AS BIGINT) AS n_at_max,
                MIN(x) AS outlier_cents,
                round((CAST(maxdev_n AS DOUBLE) / CAST(n AS DOUBLE))
                  / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                      AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)), 6)
                  AS g_stat
         FROM dev, mx
         WHERE dev_n = maxdev_n
         GROUP BY n, sx, sxx, maxdev_n""",

    "q_ts_pettitt" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            v AS (SELECT a.t, a.dt,
                    CAST(SUM(CASE WHEN a.y > b.y THEN 1
                              WHEN a.y < b.y THEN -1 ELSE 0 END)
                      AS BIGINT) AS v
                  FROM dr a JOIN dr b ON a.t <> b.t
                  GROUP BY a.t, a.dt),
            u AS (SELECT t, dt,
                    SUM(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW) AS u
                  FROM v),
            k AS (SELECT CAST(MAX(abs(u)) AS BIGINT) AS k_stat,
                         MAX(t) AS n_days FROM u)
         SELECT n_days, k_stat, MIN(dt) AS change_day,
                round(2.0 * exp((-6.0 * CAST(k_stat AS DOUBLE)
                    * CAST(k_stat AS DOUBLE))
                  / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                     * CAST(n_days AS DOUBLE)
                     + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))),
                  6) AS p_approx
         FROM u, k
         WHERE abs(u) = k_stat
         GROUP BY n_days, k_stat""",

    "q_dq_jsd" ->
      """WITH ev AS (SELECT event_type = 'purchase' AS p,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                 FROM events WHERE event_type IN ('purchase', 'click')),
            cells AS (SELECT least(cents // 1000, 19) AS bin,
                        CAST(SUM(CASE WHEN p THEN 1 ELSE 0 END)
                          AS BIGINT) AS p_raw,
                        CAST(SUM(CASE WHEN p THEN 0 ELSE 1 END)
                          AS BIGINT) AS q_raw
                      FROM ev GROUP BY 1),
            tot AS (SELECT CAST(SUM(p_raw) AS BIGINT) AS np,
                           CAST(SUM(q_raw) AS BIGINT) AS nq,
                           CAST(COUNT(*) AS BIGINT) AS nb
                    FROM cells),
            terms AS (SELECT np, nq, nb,
                        CAST(round(
                          ((p_raw + 1) / CAST(np + nb AS DOUBLE))
                          * ln(2.0 * ((p_raw + 1) / CAST(np + nb AS DOUBLE))
                            / (((p_raw + 1) / CAST(np + nb AS DOUBLE))
                               + ((q_raw + 1) / CAST(nq + nb AS DOUBLE))))
                          * 1e9) AS BIGINT) AS tp_nano,
                        CAST(round(
                          ((q_raw + 1) / CAST(nq + nb AS DOUBLE))
                          * ln(2.0 * ((q_raw + 1) / CAST(nq + nb AS DOUBLE))
                            / (((p_raw + 1) / CAST(np + nb AS DOUBLE))
                               + ((q_raw + 1) / CAST(nq + nb AS DOUBLE))))
                          * 1e9) AS BIGINT) AS tq_nano
                      FROM cells, tot)
         SELECT MAX(np) AS n_purchase, MAX(nq) AS n_click,
                MAX(nb) AS n_bins,
                CAST(SUM(tp_nano + tq_nano) AS BIGINT) AS jsd2_nano,
                round(CAST(SUM(tp_nano + tq_nano) AS DOUBLE) / 2e9, 6)
                  AS jsd_nats
         FROM terms""",

    "q_ts_cox_stuart" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(COUNT(*) AS BIGINT) // 2 AS c
                   FROM dr),
            paired AS (SELECT nn.n, nn.c, a.y AS y1, b.y AS y2
                       FROM dr a, nn, dr b
                       WHERE b.t = a.t + (nn.n - nn.c)
                         AND a.t <= nn.c)
         SELECT n AS n_days, c AS n_pairs_max,
                CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS s_plus,
                CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS m,
                CASE WHEN SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) > 0
                  THEN round(
                    CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) * 2
                      - SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END)
                      AS DOUBLE)
                    / sqrt(CAST(SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END)
                        AS DOUBLE)), 6)
                END AS z_cs
         FROM paired GROUP BY n, c""",

    "q_ts_page_hinkley" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            dr AS (SELECT dt, y,
                     CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
                   FROM daily),
            terms AS (SELECT dt, t,
                        CAST(y AS HUGEINT) * 1000000
                          - (SUM(CAST(y AS HUGEINT)) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND
                            CURRENT ROW) * 1000000) // t AS term
                      FROM dr),
            mm AS (SELECT dt, t,
                     SUM(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS m
                   FROM terms),
            ph AS (SELECT dt, t, m - MIN(m) OVER (ORDER BY t ROWS
                     BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
                   FROM mm),
            top AS (SELECT MAX(ph) AS ph_stat_micro, MAX(t) AS n_days
                    FROM ph)
         SELECT n_days, CAST(ph_stat_micro AS BIGINT) AS ph_stat_micro,
                MIN(dt) AS alarm_day,
                round(CAST(ph_stat_micro AS DOUBLE) / 1e6 / 100.0, 6)
                  AS ph_stat_usd
         FROM ph, top
         WHERE ph = ph_stat_micro
         GROUP BY n_days, ph_stat_micro""",

    "q_graph_edge_support" ->
      s"""WITH ${Extras11.GraphSql},
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM und e1
                    JOIN und e2 ON e1.b = e2.a
                    JOIN und e3 ON e2.b = e3.b AND e1.a = e3.a),
            edge_tri AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
                         FROM (SELECT x AS a, y AS b FROM tri
                               UNION ALL SELECT y, z FROM tri
                               UNION ALL SELECT x, z FROM tri)
                         GROUP BY 1, 2),
            sup AS (SELECT COALESCE(et.support, 0) AS support
                    FROM und LEFT JOIN edge_tri et
                      ON et.a = und.a AND et.b = und.b)
         SELECT support, CAST(COUNT(*) AS BIGINT) AS n_edges
         FROM sup GROUP BY 1 ORDER BY 1"""
  )
}
