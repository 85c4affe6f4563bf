package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 additions, part 3: classifier evaluation, incremental
  * cross-corpus dedup, exact z-score outlier auditing, and IP-address
  * scalar functions.
  */
object Extras36 {
  import graft.Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LANG-ID EVALUATION — confusion matrix of the q_llm_lang_id
    // stopword heuristic against the labeled lang column: per (actual,
    // predicted) counts plus the within-actual share (one IEEE division
    // each). The fixture's lang label is independent filler, so this
    // grades the EVAL OPERATOR (confusion-matrix construction at corpus
    // scale — one pass, one dimension-sized aggregate), not classifier
    // quality.
    "q_llm_langid_eval" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val nStop = size(filter(ws, w => w === "the" || w === "and"
        || w === "of"))
      val pred = when(nStop.cast("double") / size(ws) > 0.02, "en")
        .otherwise("und")
      val cm = Tables.documents(s, d)
        .select(col("lang"), pred.as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val wa = Window.partitionBy(col("lang"))
      cm.withColumn("n_actual", sum(col("n")).over(wa))
        .select(col("lang"), col("pred_lang"), col("n"),
          (col("n").cast("double") / col("n_actual").cast("double"))
            .as("share_of_actual"))
        .orderBy("lang", "pred_lang")
    }),

    // INCREMENTAL CROSS-CORPUS DEDUP — the production ingest shape: an
    // INCOMING batch (odd doc_ids) deduped against the EXISTING corpus
    // (even doc_ids), never against itself. Shares the one-pass shingle
    // kernel; candidates come only from the incoming×existing posting
    // join (no incoming-incoming or existing-existing pairs are ever
    // generated), exactly how a daily crawl lands against a 100 TB
    // corpus. Per flagged incoming doc: match count and the best
    // existing match by (jaccard desc, doc asc) — jaccard is one IEEE
    // division of exactly-agreed integers.
    "q_llm_cross_dedup" -> ((s, d) => {
      // Round 16: the FixtureCache posting layout IS this relation
      // (doc_id, xxhash64 shingle, nsh) — the keep/clusters convention;
      // identical bytes (Extras10Spec pins cached == inline), and the
      // corpus re-shingle stays charged to the ingest artifact.
      val trips = LlmOps.shingleTripsCached(s, d)
      val inc = trips.where(col("doc_id") % 2 === 1)
      val corp = trips.where(col("doc_id") % 2 === 0)
      val j = inc.as("a").join(corp.as("b"), col("a.s") === col("b.s"))
        .groupBy(col("a.doc_id").as("in_doc"),
          col("b.doc_id").as("corp_doc"))
        .agg(count(lit(1)).as("inter"),
          min(col("a.nsh")).cast("long").as("na"),
          min(col("b.nsh")).cast("long").as("nb"))
        .withColumn("jac", col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")))
        .where(col("jac") >= 0.6)
      val best = Window.partitionBy(col("in_doc"))
        .orderBy(col("jac").desc, col("corp_doc"))
      j.withColumn("rk", row_number().over(best))
        .groupBy(col("in_doc"))
        .agg(count(lit(1)).as("n_matches"),
          min(when(col("rk") === 1, col("corp_doc"))).as("best_match"),
          max(when(col("rk") === 1, round(col("jac"), 6))).as("best_jaccard"))
        .orderBy("in_doc")
    }),

    // Z-SCORE OUTLIER AUDIT — per measure column, how many rows sit
    // beyond 3σ, decided in EXACT INTEGER arithmetic: |x−μ| > 3σ squares
    // to (n·x − S)² > 9·(n·S2 − S²), all DECIMAL(38,0) from integer
    // cents (the q_ts_bollinger rule — no IEEE op decides membership).
    // Two passes per column: one moment aggregate (broadcast), one
    // predicate count. The column-wise data-quality screen a pipeline
    // runs before training on a new drop.
    "q_dq_outlier_cols" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def audit(name: String, cents: Column): DataFrame = {
        val base = li.select(cents.cast("long").as("x"))
        val tot = base.agg(count(lit(1)).as("n"),
          sum(col("x")).as("s1"),
          sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
            .cast("decimal(38,0)").as("s2"))
        val dev = (col("n") * col("x") - col("s1")).cast("decimal(19,0)")
        val m2 = (col("n").cast("decimal(19,0)") * col("s2")
          - col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
          .cast("decimal(38,0)")
        base.crossJoin(broadcast(tot))
          .select(when(dev * dev > lit(9L) * m2, 1L).otherwise(0L).as("o"))
          .agg(count(lit(1)).as("n"), sum(col("o")).as("n_outliers"))
          .select(lit(name).as("col_name"), col("n"), col("n_outliers"),
            (col("n_outliers").cast("double") / col("n").cast("double"))
              .as("outlier_share"))
      }
      audit("l_extendedprice", dec(col("l_extendedprice")) * 100)
        .unionByName(audit("l_quantity", dec(col("l_quantity")) * 100))
        .orderBy("col_name")
    }),

    // IP-ADDRESS FUNCTIONS — parse/format/classify synthetic IPv4s
    // minted from the portable 60-bit hash (network analytics surface:
    // dotted formatting, /24 network extraction, RFC-1918 private-range
    // classification — all integer bit arithmetic, engine-neutral).
    "q_fn_ip" -> ((s, d) => {
      val ip = pmod(md5long(concat(col("c_custkey").cast("string"),
        lit(":ip"))), lit(4294967296L))
      def octet(c: Column, sh: Int): Column =
        pmod(floor(c / math.pow(2, sh).toLong), lit(256L)).cast("long")
      val o1 = octet(ip, 24); val o2 = octet(ip, 16)
      val o3 = octet(ip, 8); val o4 = octet(ip, 0)
      Tables.customer(s, d)
        .select(col("c_custkey"), ip.as("ip_int"),
          concat_ws(".", o1, o2, o3, o4).as("ip_str"),
          concat_ws(".", o1, o2, o3, lit(0)).as("net24"),
          (o1 === 10 || (o1 === 192 && o2 === 168)
            || (o1 === 172 && o2.between(16, 31))).as("is_private"))
        .orderBy("c_custkey")
    })
  )

  private val ShingleCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE len(string_split(text, ' ')) >= 3),
       xsh AS (SELECT doc_id, ws,
                      unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
       sh AS (SELECT DISTINCT doc_id,
                     array_to_string(ws[i:i+2], ' ') AS s FROM xsh),
       cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1)"""

  val oracle: Map[String, String] = Map(

    "q_llm_langid_eval" ->
      """WITH w AS (SELECT lang, string_split(text, ' ') AS ws
                    FROM documents),
            p AS (SELECT lang,
                    CASE WHEN CAST(len(list_filter(ws, x -> x = 'the'
                           OR x = 'and' OR x = 'of')) AS DOUBLE)
                           / len(ws) > 0.02
                         THEN 'en' ELSE 'und' END AS pred_lang
                  FROM w),
            cm AS (SELECT lang, pred_lang, COUNT(*) AS n
                   FROM p GROUP BY 1, 2)
         SELECT lang, pred_lang, n,
                CAST(n AS DOUBLE)
                  / CAST(CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                         AS DOUBLE) AS share_of_actual
         FROM cm ORDER BY lang, pred_lang""",

    "q_llm_cross_dedup" -> s"""
      WITH $ShingleCte,
        pairs AS (SELECT a.doc_id AS in_doc, b.doc_id AS corp_doc,
                         COUNT(*) AS inter
                  FROM sh a JOIN sh b ON a.s = b.s
                  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
                  GROUP BY 1, 2),
        j AS (SELECT in_doc, corp_doc, inter,
                     x.nsh AS na, y.nsh AS nb,
                     CAST(inter AS DOUBLE) / (x.nsh + y.nsh - inter) AS jac
              FROM pairs
              JOIN cnt x ON x.doc_id = in_doc
              JOIN cnt y ON y.doc_id = corp_doc
              WHERE CAST(inter AS DOUBLE) / (x.nsh + y.nsh - inter) >= 0.6),
        rk AS (SELECT in_doc, corp_doc, jac,
                      row_number() OVER (PARTITION BY in_doc
                        ORDER BY jac DESC, corp_doc) AS rk
               FROM j)
      SELECT in_doc, COUNT(*) AS n_matches,
             CAST(MIN(CASE WHEN rk = 1 THEN corp_doc END) AS BIGINT)
               AS best_match,
             MAX(CASE WHEN rk = 1 THEN round(jac, 6) END) AS best_jaccard
      FROM rk GROUP BY in_doc ORDER BY in_doc""",

    "q_dq_outlier_cols" ->
      """WITH px AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) AS x FROM lineitem),
            pt AS (SELECT COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2
                   FROM px),
            pc AS (SELECT 'l_extendedprice' AS col_name, MAX(t.n) AS n,
                     CAST(SUM(CASE WHEN (t.n * p.x - t.s1)
                                      * (t.n * p.x - t.s1)
                                    > 9 * (t.n * t.s2 - t.s1 * t.s1)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers
                   FROM px p CROSS JOIN pt t),
            qx AS (SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                            AS BIGINT) AS x FROM lineitem),
            qt AS (SELECT COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2
                   FROM qx),
            qc AS (SELECT 'l_quantity' AS col_name, MAX(t.n) AS n,
                     CAST(SUM(CASE WHEN (t.n * p.x - t.s1)
                                      * (t.n * p.x - t.s1)
                                    > 9 * (t.n * t.s2 - t.s1 * t.s1)
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers
                   FROM qx p CROSS JOIN qt t)
         SELECT col_name, n, n_outliers,
                CAST(n_outliers AS DOUBLE) / CAST(n AS DOUBLE)
                  AS outlier_share
         FROM (SELECT * FROM pc UNION ALL SELECT * FROM qc)
         ORDER BY col_name""",

    "q_fn_ip" ->
      """WITH c AS (SELECT c_custkey,
                      CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                           || ':ip'), 1, 15)) AS BIGINT) % 4294967296
                        AS ip_int
                    FROM customer),
            o AS (SELECT c_custkey, ip_int,
                    (ip_int // 16777216) % 256 AS o1,
                    (ip_int // 65536) % 256 AS o2,
                    (ip_int // 256) % 256 AS o3,
                    ip_int % 256 AS o4
                  FROM c)
         SELECT c_custkey, ip_int,
                o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str,
                o1 || '.' || o2 || '.' || o3 || '.0' AS net24,
                (o1 = 10 OR (o1 = 192 AND o2 = 168)
                  OR (o1 = 172 AND o2 BETWEEN 16 AND 31)) AS is_private
         FROM o ORDER BY c_custkey"""
  )
}
