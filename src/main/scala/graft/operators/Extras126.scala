package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 52: the weekly engagement decile mobility
  * matrix (the Markov-on-deciles retention tool: how sticky is a
  * user's activity decile week over week?), Freeman degree
  * centralization of the co-occurrence graph (one number for "hub
  * dominated vs flat"), and the empirical-characteristic-function
  * distance between the A and R quantity samples at a fixed t-grid
  * (the frequency-domain two-sample screen — stated as the unweighted
  * ECF distance, not the covariance-weighted Epps-Singleton W²).
  *
  * Scale shape: mobility is two fact-linear aggs + per-week rank
  * windows over the (user, week) relation and one consecutive-week
  * equi-join; centralization folds the degree relation of the shared
  * undirectedEdges kernel; ecf folds the ≤50-row quantity value spine
  * per t (3 t-values broadcast).
  *
  * Determinism contract (SURVEY §2.13): deciles are rank-position
  * integer arithmetic (10·(r−1) div n_week, rank ties pinned by
  * (count, user)); mobility emits exact counts + one IEEE share.
  * centralization is exact integers + one IEEE division. ecf
  * nano-quantizes each c·cos(t·v) / c·sin(t·v) term on the value
  * spine before the integer sum (the Lomb-Scargle discipline).
  */
object Extras126 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DECILE MOBILITY — weekly event-count deciles, week-over-week
    // transitions; diag mass = stickiness, upper mass = growth.
    "q_evt_decile_mobility" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id").as("u"),
          expr("unix_date(to_date(ts)) div 7").as("wk"))
        .groupBy(col("u"), col("wk")).agg(count(lit(1)).as("c"))
      val nW = Window.partitionBy(col("wk"))
      val dec10 = uw
        .withColumn("r", row_number().over(
          nW.orderBy(col("c"), col("u"))).cast("long"))
        .withColumn("nw", count(lit(1)).over(nW).cast("long"))
        .withColumn("dec", expr("(10 * (r - 1)) div nw"))
        .select(col("u"), col("wk"), col("dec"))
      val nxt = dec10.select(col("u"), (col("wk") - 1).as("wk"),
        col("dec").as("dec_to"))
      val pairs = dec10.join(nxt, Seq("u", "wk"))
        .groupBy(col("dec").as("dec_from"), col("dec_to"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("row_n", sum(col("n")).over(
          Window.partitionBy(col("dec_from"))))
        .select(col("dec_from"), col("dec_to"), col("n"),
          r6(col("n").cast("double") / col("row_n").cast("double"))
            .as("row_share"))
        .orderBy(col("dec_from"), col("dec_to"))
    }),

    // DEGREE CENTRALIZATION — Freeman: Σ(dmax − d_i) over the
    // theoretical star maximum (n−1)(n−2).
    "q_graph_centralization" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d)
      val deg = und.select(col("a").as("u"))
        .unionByName(und.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      deg.agg(count(lit(1)).as("n_nodes"),
          sum(col("deg")).as("deg_sum"), max(col("deg")).as("d_max"))
        .select(col("n_nodes"), expr("deg_sum div 2").as("n_edges"),
          col("d_max"),
          r6((col("n_nodes") * col("d_max") - col("deg_sum"))
            .cast("double") /
            ((col("n_nodes") - 1) * (col("n_nodes") - 2))
              .cast("double")).as("centralization"))
    }),

    // ECF DISTANCE — |φ_A(t) − φ_R(t)|² at t ∈ {0.1, 0.2, 0.4} over
    // the quantity spine: catches distribution differences the KS/MW
    // location tests miss (e.g. pure shape).
    "q_agg_ecf_distance" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("v"))
        .groupBy(col("v"))
        .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === "R", 1L).otherwise(0L)).as("cr"))
      val ts = s.range(1, 4)
        .select(when(col("id") === 1, 0.1).when(col("id") === 2, 0.2)
          .otherwise(0.4).as("t"))
      val sp = per.crossJoin(broadcast(ts))
        .withColumn("cosv", cos(col("t") * col("v").cast("double")))
        .withColumn("sinv", sin(col("t") * col("v").cast("double")))
      val agg = sp.groupBy(col("t"))
        .agg(sum(col("ca")).as("na"), sum(col("cr")).as("nr"),
          sum(round(col("ca").cast("double") * col("cosv") * lit(1e9))
            .cast("long")).as("rea"),
          sum(round(col("ca").cast("double") * col("sinv") * lit(1e9))
            .cast("long")).as("ima"),
          sum(round(col("cr").cast("double") * col("cosv") * lit(1e9))
            .cast("long")).as("rer"),
          sum(round(col("cr").cast("double") * col("sinv") * lit(1e9))
            .cast("long")).as("imr"))
      val dre = col("rea").cast("double") / lit(1e9) /
        col("na").cast("double") -
        col("rer").cast("double") / lit(1e9) / col("nr").cast("double")
      val dim = col("ima").cast("double") / lit(1e9) /
        col("na").cast("double") -
        col("imr").cast("double") / lit(1e9) / col("nr").cast("double")
      agg.select(r6(col("t")).as("t_val"), col("na").as("n_a"),
          col("nr").as("n_r"),
          r6(dre).as("d_re"), r6(dim).as("d_im"),
          r6(dre * dre + dim * dim).as("ecf_dist2"))
        .orderBy(col("t_val"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_evt_decile_mobility" ->
      """WITH uw AS (SELECT user_id AS u,
                    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                      // 7 AS wk,
                    CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
            dec AS (SELECT u, wk,
                    (10 * (CAST(row_number() OVER (PARTITION BY wk
                        ORDER BY c, u) AS BIGINT) - 1))
                      // CAST(COUNT(*) OVER (PARTITION BY wk) AS BIGINT)
                      AS dec
                  FROM uw),
            pairs AS (SELECT a.dec AS dec_from, b.dec AS dec_to,
                      CAST(COUNT(*) AS BIGINT) AS n
                    FROM dec a JOIN dec b
                      ON a.u = b.u AND b.wk = a.wk + 1
                    GROUP BY 1, 2)
         SELECT dec_from, dec_to, n,
                round(CAST(n AS DOUBLE)
                  / CAST(SUM(n) OVER (PARTITION BY dec_from) AS DOUBLE),
                  6) AS row_share
         FROM pairs ORDER BY dec_from, dec_to""",

    "q_graph_centralization" ->
      s"""WITH ${Extras11.GraphSql},
            deg AS (SELECT src AS u, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM e GROUP BY 1),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                    CAST(SUM(deg) AS BIGINT) AS deg_sum,
                    CAST(MAX(deg) AS BIGINT) AS d_max
                  FROM deg)
         SELECT n_nodes, deg_sum // 2 AS n_edges, d_max,
                round(CAST(n_nodes * d_max - deg_sum AS DOUBLE)
                  / CAST((n_nodes - 1) * (n_nodes - 2) AS DOUBLE), 6)
                  AS centralization
         FROM a""",

    "q_agg_ecf_distance" ->
      """WITH per AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1
                         ELSE 0 END) AS BIGINT) AS ca,
                    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1
                         ELSE 0 END) AS BIGINT) AS cr
                 FROM lineitem WHERE l_returnflag IN ('A', 'R')
                 GROUP BY 1),
            ts AS (SELECT unnest([0.1, 0.2, 0.4]::DOUBLE[]) AS t),
            sp AS (SELECT t, v, ca, cr,
                    cos(t * CAST(v AS DOUBLE)) AS cosv,
                    sin(t * CAST(v AS DOUBLE)) AS sinv
                  FROM per, ts),
            agg AS (SELECT t,
                    CAST(SUM(ca) AS BIGINT) AS na,
                    CAST(SUM(cr) AS BIGINT) AS nr,
                    CAST(SUM(CAST(round(CAST(ca AS DOUBLE) * cosv * 1e9)
                      AS BIGINT)) AS BIGINT) AS rea,
                    CAST(SUM(CAST(round(CAST(ca AS DOUBLE) * sinv * 1e9)
                      AS BIGINT)) AS BIGINT) AS ima,
                    CAST(SUM(CAST(round(CAST(cr AS DOUBLE) * cosv * 1e9)
                      AS BIGINT)) AS BIGINT) AS rer,
                    CAST(SUM(CAST(round(CAST(cr AS DOUBLE) * sinv * 1e9)
                      AS BIGINT)) AS BIGINT) AS imr
                  FROM sp GROUP BY 1),
            f AS (SELECT t, na, nr,
                    CAST(rea AS DOUBLE) / 1e9 / CAST(na AS DOUBLE)
                      - CAST(rer AS DOUBLE) / 1e9 / CAST(nr AS DOUBLE)
                      AS dre,
                    CAST(ima AS DOUBLE) / 1e9 / CAST(na AS DOUBLE)
                      - CAST(imr AS DOUBLE) / 1e9 / CAST(nr AS DOUBLE)
                      AS dim
                  FROM agg)
         SELECT round(t, 6) AS t_val, na AS n_a, nr AS n_r,
                round(dre, 6) AS d_re, round(dim, 6) AS d_im,
                round(dre * dre + dim * dim, 6) AS ecf_dist2
         FROM f ORDER BY t_val"""
  )
}
