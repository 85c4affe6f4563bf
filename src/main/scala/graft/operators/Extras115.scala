package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 41: resampling + symbolization round-out
  * — a fully deterministic permutation test for the priority revenue
  * contrast (md5-bit label reassignment, the portable-hash
  * discipline), SAX symbolization of the daily revenue series (PAA
  * over 16 index segments, 4-symbol alphabet), and a
  * method-of-moments negative-binomial fit to per-user event counts.
  *
  * Scale shape: the permutation relation is fact × 50 broadcast perm
  * ids — one linear pass per permutation, all folds partial+final
  * aggregates (no resampled copies materialized); SAX rides the
  * bounded day spine; the NB fit is one user-grain fold.
  *
  * Determinism contract (SURVEY §2.13): permutation assignment is a
  * parity bit of md5(orderkey-permid) — identical collisions/bits on
  * both engines; per-perm mean differences and the observed contrast
  * share ONE IEEE chain; SAX breakpoints gate the one shared z chain;
  * NB moments are exact integers.
  */
object Extras115 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PERMUTATION TEST — observed contrast: mean revenue of priority
    // 1-2 orders vs the rest; 50 md5-bit pseudo-permutations;
    // p = (#{|Δ_p| ≥ |Δ_obs|} + 1)/51.
    "q_agg_permutation_test" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2)
            .cast("long").as("tr"),
          (dec(col("o_totalprice")) * 100).cast("long").as("y"))
        .duckCkpt()
      def meanDiff(t: Column, yc: Column): (Column, Column, Column, Column) =
        (sum(t * yc), sum(t), sum((lit(1) - t) * yc), sum(lit(1) - t))
      val obs = base.agg(sum(col("tr") * col("y")).as("s1"),
        sum(col("tr")).as("n1"),
        sum((lit(1) - col("tr")) * col("y")).as("s0"),
        sum(lit(1) - col("tr")).as("n0"))
        .select((col("s1").cast("double") / col("n1").cast("double") -
          col("s0").cast("double") / col("n0").cast("double"))
          .as("d_obs"))
      val perms = s.range(1, 51).toDF("p")
      val permAgg = base.crossJoin(broadcast(perms))
        .withColumn("b", expr(
          """cast(conv(substring(md5(concat_ws('-',
             cast(o_orderkey as string), cast(p as string))), 1, 1),
             16, 10) as bigint) % 2"""))
        .groupBy(col("p"))
        .agg(sum(col("b") * col("y")).as("s1"), sum(col("b")).as("n1"),
          sum((lit(1) - col("b")) * col("y")).as("s0"),
          sum(lit(1) - col("b")).as("n0"))
        .select(col("p"),
          (col("s1").cast("double") / col("n1").cast("double") -
            col("s0").cast("double") / col("n0").cast("double"))
            .as("d_p"))
      permAgg.crossJoin(broadcast(obs))
        .agg(count(lit(1)).as("n_perms"),
          sum((abs(col("d_p")) >= abs(col("d_obs"))).cast("long"))
            .as("n_extreme"),
          first(col("d_obs")).as("dobs"))
        .select(r6(col("dobs") / 100).as("delta_obs_dollars"),
          col("n_perms"), col("n_extreme"),
          r6((col("n_extreme") + 1).cast("double") /
            (col("n_perms") + 1).cast("double")).as("p_value"))
    }),

    // SAX — Piecewise Aggregate Approximation of the daily revenue
    // into 16 index segments, symbolized on the global z-scale with
    // breakpoints (−0.6745, 0, 0.6745) → {a, b, c, d}.
    "q_ts_sax_paa16" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val byday = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("t", (row_number().over(w) - 1).cast("long"))
      val tot = byday.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y").cast(Big) * col("y").cast(Big)).as("syy"))
      val seg = byday.crossJoin(broadcast(tot))
        .withColumn("seg", expr("t * 16 div n"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("c"), sum(col("y")).as("sg"),
          first(col("n")).as("n"), first(col("sy")).as("sy"),
          first(col("syy")).as("syy"))
      val nD = col("n").cast("double")
      val mu = col("sy").cast("double") / nD
      val sd = sqrt((col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / nD) / nD)
      val z = (col("sg").cast("double") / col("c").cast("double") - mu) / sd
      seg.select(col("seg").as("segment"), col("c").as("n_days"),
        r6(z).as("paa_z"),
        when(z < -0.6745, "a").when(z < 0.0, "b")
          .when(z < 0.6745, "c").otherwise("d").as("symbol"))
        .orderBy(col("segment"))
    }),

    // NEGATIVE BINOMIAL FIT — method of moments on per-user event
    // counts: r = μ²/(σ² − μ), p = μ/σ² (overdispersed counts).
    "q_agg_negbin_fit" -> ((s, d) => {
      val per = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("k"))
      val m = per.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
        sum(col("k").cast(Big) * col("k").cast(Big)).as("skk"))
      val nD = col("n").cast("double")
      val mu = col("sk").cast("double") / nD
      val vv = (col("skk").cast("double") -
        col("sk").cast("double") * col("sk").cast("double") / nD) /
        (nD - 1)
      m.select(col("n").as("n_users"), r6(mu).as("mean_events"),
        r6(vv).as("var_events"),
        r6(mu * mu / (vv - mu)).as("nb_r"), r6(mu / vv).as("nb_p"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_permutation_test" ->
      """WITH base AS (SELECT o_orderkey,
                    CASE WHEN CAST(substr(o_orderpriority, 1, 1)
                      AS BIGINT) <= 2 THEN 1 ELSE 0 END AS tr,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y
                 FROM orders),
            obs AS (SELECT
                    CAST(SUM(tr * y) AS DOUBLE)
                      / CAST(SUM(tr) AS DOUBLE)
                    - CAST(SUM((1 - tr) * y) AS DOUBLE)
                      / CAST(SUM(1 - tr) AS DOUBLE) AS d_obs
                  FROM base),
            perms AS (SELECT UNNEST(range(1, 51)) AS p),
            asg AS (SELECT p,
                    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                      || '-' || CAST(p AS VARCHAR)), 1, 1)) AS BIGINT)
                      % 2 AS b,
                    y
                  FROM base, perms),
            pa AS (SELECT p,
                    CAST(SUM(b * y) AS DOUBLE) / CAST(SUM(b) AS DOUBLE)
                    - CAST(SUM((1 - b) * y) AS DOUBLE)
                      / CAST(SUM(1 - b) AS DOUBLE) AS d_p
                  FROM asg GROUP BY 1)
         SELECT round(d_obs / 100, 6) AS delta_obs_dollars,
                CAST(COUNT(*) AS BIGINT) AS n_perms,
                CAST(SUM(CASE WHEN abs(d_p) >= abs(d_obs) THEN 1 ELSE 0
                  END) AS BIGINT) AS n_extreme,
                round(CAST(SUM(CASE WHEN abs(d_p) >= abs(d_obs) THEN 1
                    ELSE 0 END) + 1 AS DOUBLE)
                  / CAST(COUNT(*) + 1 AS DOUBLE), 6) AS p_value
         FROM pa, obs GROUP BY d_obs""",

    "q_ts_sax_paa16" ->
      """WITH byday AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            idx AS (SELECT y,
                      CAST(row_number() OVER (ORDER BY dt) - 1 AS BIGINT)
                        AS t
                    FROM byday),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
                  FROM byday),
            seg AS (SELECT t.n, t.sy, t.syy, idx.t * 16 // t.n AS seg,
                    idx.y
                  FROM idx, t),
            g AS (SELECT seg, n, sy, syy,
                    CAST(COUNT(*) AS BIGINT) AS c,
                    CAST(SUM(y) AS BIGINT) AS sg
                  FROM seg GROUP BY 1, 2, 3, 4),
            e AS (SELECT seg, c,
                    (CAST(sg AS DOUBLE) / CAST(c AS DOUBLE)
                      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)) AS z
                  FROM g)
         SELECT seg AS segment, c AS n_days, round(z, 6) AS paa_z,
                CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
                     WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol
         FROM e ORDER BY segment""",

    "q_agg_negbin_fit" ->
      """WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
                 FROM events GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(k) AS BIGINT) AS sk,
                    SUM(CAST(k AS HUGEINT) * CAST(k AS HUGEINT)) AS skk
                  FROM per),
            e AS (SELECT n,
                    CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                    (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)
                      * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1) AS vv
                  FROM m)
         SELECT n AS n_users, round(mu, 6) AS mean_events,
                round(vv, 6) AS var_events,
                round(mu * mu / (vv - mu), 6) AS nb_r,
                round(mu / vv, 6) AS nb_p
         FROM e"""
  )
}
