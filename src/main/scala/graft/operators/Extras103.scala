package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 29: deeper lexical statistics for the LLM
  * corpus pipeline — MTLD (McCarthy-Jarvis measure of textual lexical
  * diversity, a per-document sequential factor count), the per-token
  * dispersion (Fano) index across documents, the Gini coefficient of
  * the token-frequency distribution, and the unbiased Simpson
  * diversity per source.
  *
  * Scale shape: MTLD is embarrassingly parallel — one bounded
  * sequential walk per document (the document is the natural unit of
  * locality; no cross-doc state); the other three ride the
  * vocabulary-bounded frequency table.
  *
  * Determinism contract (SURVEY §2.13): the MTLD factor gate is the
  * exact integer test distinct·25 < len·18 (= TTR < 0.72) and the
  * per-doc score is micro-quantized before the source fold; Gini
  * ranks the vocabulary with a deterministic (count, token) tiebreak;
  * dispersion and Simpson fold exact integer moments.
  */
object Extras103 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MTLD (forward) — factors complete when the running factor TTR
    // drops below 0.72; the remainder contributes the partial factor
    // (1 − ttr)/0.28; score = n/(factors + partial) (= n when the
    // text never leaves the all-distinct regime).
    "q_llm_mtld" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("ws"))
        .as[(String, Seq[String])]
        .map { case (src, ws) =>
          var fcnt = 0L
          val cur = scala.collection.mutable.HashMap.empty[String, Long]
          var curLen = 0L
          var curDist = 0L
          ws.foreach { w =>
            curLen += 1
            val seen = cur.getOrElse(w, 0L)
            cur(w) = seen + 1
            if (seen == 0L) curDist += 1
            if (curDist * 25 < curLen * 18) {
              fcnt += 1; cur.clear(); curLen = 0; curDist = 0
            }
          }
          val partial =
            if (curLen == 0) 0.0
            else (1.0 - curDist.toDouble / curLen.toDouble) / 0.28
          val denom = fcnt.toDouble + partial
          val mtld = if (denom == 0.0) ws.length.toDouble
            else ws.length.toDouble / denom
          (src, math.round(mtld * 1e6))
        }
        .toDF("source", "mtld_micro")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("mtld_micro")).as("sm"))
        .select(col("source"), col("n_docs"),
          r6(col("sm").cast("double") / col("n_docs").cast("double")
            / 1e6).as("avg_mtld"))
        .orderBy(col("source"))
    }),

    // TOKEN DISPERSION INDEX — Fano factor D = σ²/μ of each token's
    // per-document count (zero-inflated across all docs): D ≈ 1 is
    // Poisson scatter, D ≫ 1 bursty/topical.
    "q_llm_dispersion" -> ((s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("c"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("ndocs"))
      val per = perDoc.groupBy(col("w"))
        .agg(sum(col("c")).as("sc"),
          sum(col("c").cast(Big) * col("c").cast(Big)).as("sc2"))
        .crossJoin(broadcast(nd))
      val nD = col("ndocs").cast("double")
      val mu = col("sc").cast("double") / nD
      val varr = col("sc2").cast("double") / nD - mu * mu
      per.select(col("w"), col("sc").as("total"),
        r6(varr / mu).as("dispersion"))
        .orderBy(col("w"))
    }),

    // TOKEN-FREQUENCY GINI — inequality of the corpus frequency mass
    // across the vocabulary: G = Σ_r (2r − n − 1)·c_r / (n·Σc) with
    // ranks ascending by (count, token).
    "q_llm_token_gini" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("c"), col("w"))
      val ranked = wc.withColumn("r", row_number().over(w).cast("long"))
      val tot = wc.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      ranked.crossJoin(broadcast(tot))
        .agg(first(col("n")).as("vocab"), first(col("sc")).as("n_tokens"),
          sum(((col("r") * 2 - col("n") - 1).cast(Big)
            * col("c").cast(Big))).as("num"))
        .select(col("vocab"), col("n_tokens"),
          r6(col("num").cast("double") /
            (col("vocab").cast(Big) * col("n_tokens").cast(Big))
              .cast("double")).as("token_gini"))
    }),

    // SIMPSON DIVERSITY PER SOURCE — unbiased 1 − Σc(c−1)/(N(N−1)):
    // the probability two tokens drawn without replacement differ.
    "q_llm_simpson_diversity" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      wc.groupBy(col("source"))
        .agg(sum(col("c")).as("nn"),
          sum(col("c").cast(Big) * (col("c") - 1).cast(Big)).as("spp"))
        .select(col("source"), col("nn").as("n_tokens"),
          r6(lit(1.0) - col("spp").cast("double") /
            (col("nn").cast(Big) * (col("nn") - 1).cast(Big))
              .cast("double")).as("simpson_diversity"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_mtld" ->
      """WITH RECURSIVE docs AS (
              SELECT doc_id, source, string_split(text, ' ') AS ws,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents),
            r AS (
              SELECT doc_id, source, ws, n, CAST(0 AS BIGINT) AS k,
                     CAST(0 AS BIGINT) AS fcnt,
                     CAST([] AS VARCHAR[]) AS cur
              FROM docs
              UNION ALL
              SELECT doc_id, source, ws, n, k + 1,
                     CASE WHEN CAST(len(list_distinct(cur2)) AS BIGINT) * 25
                            < CAST(len(cur2) AS BIGINT) * 18
                          THEN fcnt + 1 ELSE fcnt END,
                     CASE WHEN CAST(len(list_distinct(cur2)) AS BIGINT) * 25
                            < CAST(len(cur2) AS BIGINT) * 18
                          THEN CAST([] AS VARCHAR[]) ELSE cur2 END
              FROM (SELECT doc_id, source, ws, n, k, fcnt,
                           cur || [ws[CAST(k + 1 AS INT)]] AS cur2
                    FROM r WHERE k < n) q),
            fin AS (SELECT doc_id, source, n, fcnt,
                      CAST(len(list_distinct(cur)) AS BIGINT) AS dcnt,
                      CAST(len(cur) AS BIGINT) AS clen
                    FROM r WHERE k = n),
            sc AS (SELECT source,
                     CAST(round(CASE
                       WHEN CAST(fcnt AS DOUBLE) + (CASE WHEN clen = 0
                           THEN 0.0
                           ELSE (1.0 - CAST(dcnt AS DOUBLE)
                             / CAST(clen AS DOUBLE)) / 0.28 END) = 0.0
                       THEN CAST(n AS DOUBLE)
                       ELSE CAST(n AS DOUBLE)
                         / (CAST(fcnt AS DOUBLE) + (CASE WHEN clen = 0
                             THEN 0.0
                             ELSE (1.0 - CAST(dcnt AS DOUBLE)
                               / CAST(clen AS DOUBLE)) / 0.28 END))
                       END * 1e6) AS BIGINT) AS mtld_micro
                   FROM fin)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                round(CAST(SUM(mtld_micro) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS avg_mtld
         FROM sc GROUP BY 1 ORDER BY 1""",

    "q_llm_dispersion" ->
      """WITH perdoc AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                       FROM documents) GROUP BY 1, 2),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs
                   FROM documents),
            per AS (SELECT w, CAST(SUM(c) AS BIGINT) AS sc,
                    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sc2
                  FROM perdoc GROUP BY 1)
         SELECT w, sc AS total,
                round((CAST(sc2 AS DOUBLE) / CAST(ndocs AS DOUBLE)
                  - (CAST(sc AS DOUBLE) / CAST(ndocs AS DOUBLE))
                    * (CAST(sc AS DOUBLE) / CAST(ndocs AS DOUBLE)))
                  / (CAST(sc AS DOUBLE) / CAST(ndocs AS DOUBLE)), 6)
                  AS dispersion
         FROM per, nd ORDER BY w""",

    "q_llm_token_gini" ->
      """WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT unnest(string_split(text, ' ')) AS w
                       FROM documents) GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(c) AS BIGINT) AS sc FROM wc),
            rk AS (SELECT c, n, sc,
                     CAST(row_number() OVER (ORDER BY c, w) AS BIGINT)
                       AS r
                   FROM wc, t)
         SELECT CAST(MAX(n) AS BIGINT) AS vocab,
                CAST(MAX(sc) AS BIGINT) AS n_tokens,
                round(CAST(SUM(CAST(r * 2 - n - 1 AS HUGEINT)
                    * CAST(c AS HUGEINT)) AS DOUBLE)
                  / CAST(CAST(MAX(n) AS HUGEINT) * CAST(MAX(sc) AS HUGEINT)
                    AS DOUBLE), 6) AS token_gini
         FROM rk""",

    "q_llm_simpson_diversity" ->
      """WITH wc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT source, unnest(string_split(text, ' ')) AS w
                       FROM documents) GROUP BY 1, 2),
            per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nn,
                    SUM(CAST(c AS HUGEINT) * CAST(c - 1 AS HUGEINT))
                      AS spp
                  FROM wc GROUP BY 1)
         SELECT source, nn AS n_tokens,
                round(1.0 - CAST(spp AS DOUBLE)
                  / CAST(CAST(nn AS HUGEINT) * CAST(nn - 1 AS HUGEINT)
                    AS DOUBLE), 6) AS simpson_diversity
         FROM per ORDER BY source"""
  )
}
