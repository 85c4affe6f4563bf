package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 additions: DIVERSIFIED-edge HNSW (round-14 verdict item 4
  * — the paper's Algorithm 4, heuristic neighbor selection).
  *
  * The plain in-cell 8-NN graph spends all of a hub node's edge slots
  * on near-duplicates of each other; the paper's heuristic keeps a
  * neighbor only if it opens a NEW direction (no already-kept closer
  * neighbor is nearer to it than the query node is), which is what
  * creates the long-range links greedy search needs. The round-14 8×
  * recall diagnosis was the textbook pathology: the one missed true
  * neighbor's nearest in-link ranked 168th by query distance —
  * reachable only through a diversified edge.
  *
  * Re-expression (both engines, order-free — Algorithm 4's sequential
  * selected-set scan becomes the classic RNG rule over the ranked
  * candidate pool; see Extras148.buildHnswIndex): from the 24-NN
  * in-cell pool of node q, candidate e (rank r_e by exact distance)
  * is PRUNED iff some closer-ranked candidate r has
  * d²(e,r) < d²(e,q); kept edges = first 8 by (pruned ASC, rank) —
  * the paper's keepPrunedConnections backfill keeps degree at 8.
  *
  * The graded key runs the SAME shared beam-16 search as
  * q_llm_ann_hnsw over the diversified fixture (one index recipe
  * change, identical search — the clean A/B); recall A/B rows at 1×
  * and 8× land in BASELINE.md (ScaleProbe), next to the plain-graph
  * and best-first variants.
  *
  * Scale: the prune pass adds ≤ 24·23/2 exact packed-array folds per
  * node — corpus-linear, ingest-charged (FixtureCache; Bench prewarm
  * builds it once). Search cost is unchanged: ≤ B·9 edges per round
  * per query.
  *
  * Determinism: pool ranks tie on (dd, dst); the prune test compares
  * exact BIGINT micro² sums; the backfill orders on (pruned, rank) —
  * every step integer-exact on both engines.
  */
object Extras162 {
  import graft.Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_ann_hnsw_div" -> ((s, d) =>
      Extras148.hnswBeamSearch(s,
        Extras148.buildHnswIndex(s, d, diversify = true)))
  )

  val oracle: Map[String, String] = Map(
    "q_llm_ann_hnsw_div" -> {
      // identical to the q_llm_ann_hnsw oracle except the knn CTE:
      // 24-NN pool → RNG prune (closer-ranked candidate nearer to the
      // candidate than the query node is) → keep-pruned backfill to
      // degree 8. 5 unrolled beam rounds; every multi-referenced CTE
      // MATERIALIZED (the playbook re-evaluation rule).
      val rounds = (1 to 5).map { t =>
        s"""v$t AS MATERIALIZED (
              SELECT qid, vec_id FROM v${t - 1}
              UNION SELECT qid, vec_id FROM f${t - 1}),
            c$t AS (SELECT DISTINCT f.qid, ed.dst AS vec_id
                    FROM f${t - 1} f JOIN edges ed ON ed.src = f.vec_id
                    WHERE NOT EXISTS (SELECT 1 FROM b${t - 1} b
                      WHERE b.qid = f.qid AND b.vec_id = ed.dst)),
            s$t AS (SELECT c.qid, c.vec_id,
                      CAST(SUM((qd.q6 - ev.q6) * (qd.q6 - ev.q6))
                        AS BIGINT) AS dd
                    FROM c$t c
                    JOIN e ev ON ev.vec_id = c.vec_id
                    JOIN qd ON qd.qid = c.qid AND qd.dim = ev.dim
                    GROUP BY 1, 2),
            b$t AS MATERIALIZED (
              SELECT qid, vec_id, dd FROM b${t - 1}
              UNION ALL SELECT qid, vec_id, dd FROM s$t),
            f$t AS MATERIALIZED (
              SELECT qid, vec_id FROM (
                SELECT b.qid, b.vec_id, row_number() OVER (
                  PARTITION BY b.qid ORDER BY b.dd, b.vec_id) AS rn
                FROM b$t b
                WHERE NOT EXISTS (SELECT 1 FROM v$t v
                  WHERE v.qid = b.qid AND v.vec_id = b.vec_id)) t
              WHERE rn <= 16)"""
      }.mkString(",\n")
      s"""WITH x AS (SELECT vec_id, embedding,
                      unnest(generate_series(1, len(embedding))) AS dim
                    FROM embeddings),
            e AS MATERIALIZED (
              SELECT vec_id, dim,
                CAST(CAST(round(CAST(embedding[dim] AS DOUBLE), 6)
                     AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q6
              FROM x),
            nc AS (SELECT CASE WHEN COUNT(*) <= 512 THEN 8
                        WHEN COUNT(*) <= 1024 THEN 16
                        WHEN COUNT(*) <= 2048 THEN 32
                        ELSE 64 END AS c
                   FROM embeddings),
            cent AS (SELECT vec_id AS ccid, dim, q6 AS c6
                     FROM e, nc WHERE vec_id < c),
            asg AS MATERIALIZED (
              SELECT vec_id, ccid AS cell FROM (
                SELECT e.vec_id, cent.ccid, row_number() OVER (
                  PARTITION BY e.vec_id
                  ORDER BY SUM(e.q6 * cent.c6) DESC, cent.ccid) AS rn
                FROM e JOIN cent ON e.dim = cent.dim
                GROUP BY e.vec_id, cent.ccid) t
              WHERE rn = 1),
            ee AS MATERIALIZED (
              SELECT e.vec_id, e.dim, e.q6, asg.cell
              FROM e JOIN asg USING (vec_id)),
            cn AS MATERIALIZED (
              SELECT cell, c2 FROM (
                SELECT a.ccid AS cell, b.ccid AS c2,
                  row_number() OVER (PARTITION BY a.ccid
                    ORDER BY SUM((a.c6 - b.c6) * (a.c6 - b.c6)),
                      b.ccid) AS rn
                FROM cent a JOIN cent b ON a.dim = b.dim
                GROUP BY a.ccid, b.ccid) t
              WHERE rn <= 4),
            pool AS MATERIALIZED (
              SELECT src, dst, dd, rn FROM (
                SELECT a.vec_id AS src, b.vec_id AS dst,
                  CAST(SUM((a.q6 - b.q6) * (a.q6 - b.q6)) AS BIGINT)
                    AS dd,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY SUM((a.q6 - b.q6) * (a.q6 - b.q6)),
                      b.vec_id) AS rn
                FROM ee a
                JOIN cn ON cn.cell = a.cell
                JOIN ee b ON b.cell = cn.c2
                  AND a.dim = b.dim AND a.vec_id <> b.vec_id
                GROUP BY a.vec_id, b.vec_id) t
              WHERE rn <= 24),
            pruned AS MATERIALIZED (
              SELECT DISTINCT p1.src, p1.dst FROM pool p1
              JOIN pool p2 ON p2.src = p1.src AND p2.rn < p1.rn
              JOIN e xx ON xx.vec_id = p1.dst
              JOIN e yy ON yy.vec_id = p2.dst AND yy.dim = xx.dim
              GROUP BY p1.src, p1.dst, p2.dst, p1.dd
              HAVING CAST(SUM((xx.q6 - yy.q6) * (xx.q6 - yy.q6))
                AS BIGINT) < p1.dd),
            knn AS (SELECT src, dst FROM (
                    SELECT p.src, p.dst, row_number() OVER (
                      PARTITION BY p.src ORDER BY
                        (CASE WHEN pr.dst IS NOT NULL THEN 1 ELSE 0
                         END), p.rn) AS rn2
                    FROM pool p LEFT JOIN pruned pr
                      ON pr.src = p.src AND pr.dst = p.dst) t
                  WHERE rn2 <= 8),
            hub AS MATERIALIZED (
              SELECT cell, MIN(vec_id) AS h FROM asg GROUP BY cell),
            edges AS MATERIALIZED (
              SELECT src, dst FROM knn
              UNION
              SELECT asg.vec_id, hub.h FROM asg JOIN hub USING (cell)
              WHERE asg.vec_id <> hub.h
              UNION
              SELECT a.h, b.h FROM hub a, hub b WHERE a.h <> b.h),
            qd AS MATERIALIZED (
              SELECT vec_id AS qid, dim, q6 FROM e
              WHERE vec_id BETWEEN 0 AND 3),
            up AS (SELECT vec_id FROM asg WHERE vec_id % 16 = 0),
            b0 AS MATERIALIZED (
              SELECT qid, vec_id, dd FROM (
                SELECT qid, vec_id, dd, row_number() OVER (
                  PARTITION BY qid ORDER BY dd, vec_id) AS rn
                FROM (SELECT qd.qid, up.vec_id,
                        CAST(SUM((qd.q6 - ev.q6) * (qd.q6 - ev.q6))
                          AS BIGINT) AS dd
                      FROM up
                      JOIN e ev ON ev.vec_id = up.vec_id
                      JOIN qd ON qd.dim = ev.dim
                      GROUP BY 1, 2) z) t
              WHERE rn = 1),
            f0 AS MATERIALIZED (SELECT qid, vec_id FROM b0),
            v0 AS (SELECT qid, vec_id FROM f0 WHERE 1 = 0),
            $rounds
         SELECT qid, rank, vec_id,
                round(CAST(dd AS DOUBLE) / 1e12, 6) AS dist
         FROM (SELECT qid, vec_id, dd,
                 CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY dd, vec_id) AS BIGINT) AS rank
               FROM b5 WHERE vec_id <> qid) rk
         WHERE rank <= 10 ORDER BY qid, rank"""
    }
  )
}
