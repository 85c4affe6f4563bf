package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 54: LLM watermark screening (greenlist
  * token-share z against the binomial null — the detector for
  * red/green-list decoding watermarks), per-source token-distribution
  * KL divergence against the corpus (the mixture-drift audit over the
  * global top-500 vocabulary, add-one smoothed), and candidate-key
  * discovery over the orders columns (which columns are unique? —
  * the schema-inference sibling of q_dq_uniqueness's single-column
  * check).
  *
  * Scale shape: watermark is one corpus token pass (the greenlist is
  * a hash predicate, not a table); source_kl folds the 500-row
  * broadcast vocabulary × sources grid after one corpus pass;
  * key_discovery is one pass with per-column distinct aggregates.
  *
  * Determinism contract (SURVEY §2.13): the greenlist is the portable
  * md5long parity (identical in both engines); the flag gate is the
  * exact integer cross-multiplication (2g−n)² > 16n ∧ 2g > n (z > 4
  * with no float). KL terms are computed from exact integer counts
  * with the shared (c+1)/(n+V) smoothing and nano-quantized before
  * the fold. key_discovery is exact counts.
  */
object Extras128 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WATERMARK SCREEN — share of "green" tokens (md5long parity) per
    // doc; docs with z > 4 vs Binomial(n, 1/2) are watermark-suspect.
    // Natural text sits at 1/2 by symmetry of the hash.
    "q_llm_watermark_screen" -> ((s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n"),
          sum((pmod(md5long(col("w")), lit(2L)) === 0L).cast("long"))
            .as("g"))
      val flagged = (col("g") * 2 - col("n")) *
        (col("g") * 2 - col("n")) > col("n") * 16 &&
        col("g") * 2 > col("n")
      perDoc
        .withColumn("flag", flagged.cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          sum(col("g")).as("n_green"), sum(col("flag")).as("n_flagged"))
        .select(col("source"), col("n_docs"), col("n_flagged"),
          r6(col("n_green").cast("double")
            / col("n_tokens").cast("double")).as("green_share"))
        .orderBy(col("source"))
    }),

    // SOURCE KL — KL(source ‖ corpus) over the global top-500 token
    // vocabulary with add-one smoothing: which slices drift from the
    // mixture?
    "q_llm_source_kl" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cg"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cg").desc, col("w"))))
        .where(col("rk") <= 500)
        .select(col("w"), col("cg"))
      val gtot = vocab.agg(sum(col("cg")).as("ng"),
        count(lit(1)).as("vv"))
      val perSrc = tok.join(broadcast(vocab.select(col("w"))), "w")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cs"))
      val stot = perSrc.groupBy(col("source"))
        .agg(sum(col("cs")).as("ns"))
      val grid = stot.crossJoin(broadcast(vocab))
        .join(perSrc, Seq("source", "w"), "left")
        .withColumn("cs", coalesce(col("cs"), lit(0L)))
        .crossJoin(broadcast(gtot))
      // smoothing constant = ACTUAL retained vocab size (≤ 500), so
      // both smoothed distributions sum to exactly 1 over the shared
      // support and Gibbs' inequality (KL ≥ 0) holds.
      val ps = (col("cs") + 1).cast("double") /
        (col("ns") + col("vv")).cast("double")
      val pg = (col("cg") + 1).cast("double") /
        (col("ng") + col("vv")).cast("double")
      grid
        .withColumn("t_nano", round(ps * log2(ps / pg) * lit(1e9))
          .cast("long"))
        .groupBy(col("source"))
        .agg(max(col("ns")).as("n_vocab_tokens"),
          sum(col("t_nano")).as("sum_nano"))
        .select(col("source"), col("n_vocab_tokens"),
          r6(col("sum_nano").cast("double") / lit(1e9)).as("kl_bits"))
        .orderBy(col("source"))
    }),

    // KEY DISCOVERY — which orders columns are candidate keys?
    // One pass, per-column exact distinct counts.
    "q_dq_key_discovery" -> ((s, d) => {
      val a = Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("d_orderkey"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_orderstatus"),
        countDistinct(col("o_totalprice")).as("d_totalprice"),
        countDistinct(col("o_orderdate")).as("d_orderdate"),
        countDistinct(col("o_orderpriority")).as("d_orderpriority"))
      a.selectExpr(
        """stack(6,
             'o_custkey', d_custkey,
             'o_orderdate', d_orderdate,
             'o_orderkey', d_orderkey,
             'o_orderpriority', d_orderpriority,
             'o_orderstatus', d_orderstatus,
             'o_totalprice', d_totalprice) AS (column_name, n_distinct)""",
        "n")
        .select(col("column_name"), col("n_distinct"),
          col("n").as("n_rows"),
          (col("n_distinct") === col("n")).cast("int").as("is_key"))
        .orderBy(col("column_name"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_watermark_screen" ->
      """WITH tok AS (SELECT doc_id, source,
                    unnest(string_split(text, ' ')) AS w
                 FROM documents),
            perdoc AS (SELECT doc_id, source,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN
                        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
                          % 2 = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS g
                  FROM tok GROUP BY 1, 2),
            f AS (SELECT source, n, g,
                    CASE WHEN (g * 2 - n) * (g * 2 - n) > n * 16
                          AND g * 2 > n
                         THEN 1 ELSE 0 END AS flag
                  FROM perdoc)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(flag) AS BIGINT) AS n_flagged,
                round(CAST(SUM(g) AS DOUBLE) / CAST(SUM(n) AS DOUBLE),
                  6) AS green_share
         FROM f GROUP BY source ORDER BY source""",

    "q_llm_source_kl" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' '))
                      AS w
                 FROM documents),
            vc AS (SELECT w, cg FROM (
                   SELECT w, CAST(COUNT(*) AS BIGINT) AS cg,
                     row_number() OVER (ORDER BY COUNT(*) DESC, w)
                       AS rk
                   FROM tok GROUP BY w) t WHERE rk <= 500),
            gt AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng,
                     CAST(COUNT(*) AS BIGINT) AS vv FROM vc),
            ps AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cs
                   FROM tok JOIN vc USING (w) GROUP BY 1, 2),
            st AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns
                   FROM ps GROUP BY 1),
            grid AS (SELECT st.source, st.ns, vc.w, vc.cg,
                      COALESCE(ps.cs, 0) AS cs, gt.ng, gt.vv
                    FROM st CROSS JOIN vc
                    LEFT JOIN ps ON ps.source = st.source
                      AND ps.w = vc.w
                    CROSS JOIN gt),
            q AS (SELECT source, ns,
                    CAST(round(
                      (CAST(cs + 1 AS DOUBLE) / CAST(ns + vv AS DOUBLE))
                      * log2((CAST(cs + 1 AS DOUBLE)
                          / CAST(ns + vv AS DOUBLE))
                        / (CAST(cg + 1 AS DOUBLE)
                          / CAST(ng + vv AS DOUBLE)))
                      * 1e9) AS BIGINT) AS t_nano
                  FROM grid)
         SELECT source, MAX(ns) AS n_vocab_tokens,
                round(CAST(SUM(t_nano) AS DOUBLE) / 1e9, 6) AS kl_bits
         FROM q GROUP BY source ORDER BY source""",

    "q_dq_key_discovery" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
                      AS d_orderkey,
                    CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                      AS d_custkey,
                    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
                      AS d_orderstatus,
                    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)
                      AS d_totalprice,
                    CAST(COUNT(DISTINCT o_orderdate) AS BIGINT)
                      AS d_orderdate,
                    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
                      AS d_orderpriority
                 FROM orders),
            u AS (SELECT 'o_custkey' AS column_name,
                    d_custkey AS n_distinct, n FROM a
                  UNION ALL SELECT 'o_orderdate', d_orderdate, n FROM a
                  UNION ALL SELECT 'o_orderkey', d_orderkey, n FROM a
                  UNION ALL SELECT 'o_orderpriority', d_orderpriority,
                    n FROM a
                  UNION ALL SELECT 'o_orderstatus', d_orderstatus, n
                    FROM a
                  UNION ALL SELECT 'o_totalprice', d_totalprice, n
                    FROM a)
         SELECT column_name, n_distinct, n AS n_rows,
                CAST(CASE WHEN n_distinct = n THEN 1 ELSE 0 END AS INT)
                  AS is_key
         FROM u ORDER BY column_name"""
  )
}
