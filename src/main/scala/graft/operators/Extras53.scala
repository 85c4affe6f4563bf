package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 16: cross-table lead-lag regression,
  * rich-club coefficient, and the near-dup threshold sensitivity sweep.
  *
  * Determinism contract (SURVEY §2.13): regression moments are exact
  * BIGINT folds; rich-club membership and threshold memberships are
  * integer predicates; ratios are single shared IEEE tails.
  */
object Extras53 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LEAD-LAG REGRESSION — does today's TOTAL event volume predict
    // TOMORROW's purchase value? (the leading-indicator regression;
    // both spines live in the events table — the orders calendar is a
    // different epoch in this dataset, so a cross-table day join would
    // be vacuously empty.) Slope and R² from exact integer moments
    // (counts × purchase cents), each emitted value one shared chain.
    "q_ts_leadlag_regr" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val ex = ev.groupBy(to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("x"))
      val rev = ev.where(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("rdt"))
        .agg(sum((dec(col("value")) * 100).cast("long")).as("yv"))
      val m = ex.join(rev, date_add(col("dt"), 1) === col("rdt"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("yv")).as("sy"), sum(col("x") * col("yv")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"))
      val num = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double")
      val dx = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      val dy = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double")
      m.select(col("n").as("n_days"),
        r6(num / dx).as("slope_cents_per_event"),
        r6(num * num / (dx * dy)).as("r2"))
    }),

    // RICH-CLUB COEFFICIENT — φ = 2·E_R/(|R|·(|R|−1)) over the nodes
    // whose degree exceeds the (lower) median: do the hubs talk to
    // each other more than chance? Median degree via row_number
    // (engine-exact discrete quantile); membership and the rich-edge
    // filter are semi-joins — never |V|².
    "q_graph_rich_club" -> ((s, d) => {
      val und = Extras11.undirectedEdges(s, d)
      val deg = und.select(col("a").as("u"))
        .unionByName(und.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val kStar = deg
        .withColumn("rn", row_number().over(
          Window.orderBy(col("deg"), col("u"))))
        .crossJoin(broadcast(deg.agg(count(lit(1)).as("nn"))))
        .where(col("rn") === expr("(nn + 1) div 2"))
        .select(col("deg").as("k_star"))
      val rich = deg.crossJoin(broadcast(kStar))
        .where(col("deg") > col("k_star"))
        .select(col("u"))
      val eRich = und
        .join(rich.select(col("u").as("a")), Seq("a"), "left_semi")
        .join(rich.select(col("u").as("b")), Seq("b"), "left_semi")
        .agg(count(lit(1)).as("e_rich"))
      val nRich = rich.agg(count(lit(1)).as("n_rich"))
      kStar.crossJoin(broadcast(nRich)).crossJoin(broadcast(eRich))
        .select(col("k_star"), col("n_rich"), col("e_rich"),
          when(col("n_rich") >= 2,
            r6(col("e_rich").cast("double") * 2.0
              / (col("n_rich") * (col("n_rich") - 1)).cast("double")))
            .as("phi"))
    }),

    // THRESHOLD SWEEP — near-dup pair counts at Jaccard cutoffs
    // 0.5..0.9 (the sensitivity curve that picks a production
    // threshold: a plateau means the planted structure is well
    // separated from background). One pass over the posting-kernel
    // pair relation; each membership is the INTEGER predicate
    // inter·10 ≥ t·(na+nb−inter). The equi-join key is the PORTABLE
    // 60-bit md5 hash applied identically in BOTH engines (the
    // bloom-prefilter precedent): any hash collision produces the same
    // spurious pair on both sides, so engine parity holds AND the
    // shuffle key stays 8 bytes. (Round-10 shipped raw-string keys for
    // parity; the 8× probe hit 6.83× because the suffixed vocabulary
    // widened every shuffle row — the shared-hash form keeps parity at
    // fixed key width; round-10 verdict item 4.)
    "q_llm_dedup_threshold_sweep" -> ((s, d) => {
      val trips = LlmOps.shingleTrips(s, d)
        .select(col("doc_id"), md5long(col("s0")).as("hs"),
          col("nsh"))
      val pairs = LlmOps.postingPairs(s, trips)
      pairs
        .select(explode(sequence(lit(5), lit(9))).as("t"),
          col("inter"), col("na"), col("nb"))
        .where(col("inter") * 10 >=
          col("t") * (col("na") + col("nb") - col("inter")))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_pairs"))
        .select((col("t").cast("double") / 10.0).as("threshold"),
          col("t").cast("long").as("threshold_tenths"), col("n_pairs"))
        .orderBy("threshold_tenths")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_leadlag_regr" ->
      """WITH ex AS (SELECT CAST(ts AS DATE) AS dt,
                    CAST(COUNT(*) AS BIGINT) AS x
                 FROM events GROUP BY 1),
            rev AS (SELECT CAST(ts AS DATE) AS rdt,
                      CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS BIGINT) AS yv
                    FROM events WHERE event_type = 'purchase'
                    GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(yv) AS BIGINT) AS sy,
                    CAST(SUM(x * yv) AS BIGINT) AS sxy,
                    CAST(SUM(x * x) AS BIGINT) AS sxx,
                    CAST(SUM(yv * yv) AS BIGINT) AS syy
                  FROM ex JOIN rev ON ex.dt + 1 = rev.rdt)
         SELECT n AS n_days,
                round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                  AS slope_cents_per_event,
                round(CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
         FROM m""",

    "q_graph_rich_club" ->
      s"""WITH ${Extras11.GraphSql},
            deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                      SELECT a AS u FROM und
                      UNION ALL SELECT b FROM und) GROUP BY 1),
            ks AS (SELECT deg AS k_star FROM (
                     SELECT deg, row_number() OVER (ORDER BY deg, u)
                       AS rn, COUNT(*) OVER () AS nn
                     FROM deg)
                   WHERE rn = (nn + 1) // 2),
            rich AS (SELECT u FROM deg, ks WHERE deg > k_star),
            er AS (SELECT CAST(COUNT(*) AS BIGINT) AS e_rich
                   FROM und
                   WHERE EXISTS (SELECT 1 FROM rich WHERE rich.u = und.a)
                     AND EXISTS (SELECT 1 FROM rich WHERE rich.u = und.b)),
            nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rich FROM rich)
         SELECT k_star, n_rich, e_rich,
                CASE WHEN n_rich >= 2
                  THEN round(CAST(e_rich AS DOUBLE) * 2.0
                    / CAST(n_rich * (n_rich - 1) AS DOUBLE), 6)
                  END AS phi
         FROM ks, nr, er""",

    "q_llm_dedup_threshold_sweep" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh0 AS (SELECT DISTINCT doc_id,
                           array_to_string(ws[i:i+2], ' ') AS s FROM x),
            sh AS (SELECT doc_id,
                          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                            AS hs
                   FROM sh0),
            cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
                    FROM sh0 GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             CAST(COUNT(*) AS BIGINT) AS inter
                      FROM sh a JOIN sh b
                        ON a.hs = b.hs AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pj AS (SELECT inter, ca.nsh AS na, cb.nsh AS nb
                   FROM pairs
                   JOIN cnt ca ON ca.doc_id = doc_a
                   JOIN cnt cb ON cb.doc_id = doc_b),
            sw AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs
                   FROM pj, (SELECT unnest(generate_series(5, 9)) AS t)
                   WHERE inter * 10 >= t * (na + nb - inter)
                   GROUP BY t)
         SELECT CAST(t AS DOUBLE) / 10.0 AS threshold,
                CAST(t AS BIGINT) AS threshold_tenths, n_pairs
         FROM sw ORDER BY threshold_tenths"""
  )
}
