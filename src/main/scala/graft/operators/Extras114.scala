package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 40: pipeline-composition round-out — the
  * cascading dedup funnel (exact-hash → band-bucket near-dup → length
  * floor, survivor counts per stage), the frequent-n-gram coverage
  * curve (what share of corpus 4-gram mass the top-k types carry),
  * and Kendall's tau-b for the quantity × discount dependence.
  *
  * Scale shape: the cascade's stages are hash-grouped dedups and a
  * band-bucket min-join — every shuffle keyed on portable md5 hashes
  * (the Extras48 parity discipline); coverage is a two-phase bounded
  * top-k over the gram-count relation; tau-b folds the fact table
  * into a ≤550-cell contingency table and walks its broadcast pair
  * relation.
  *
  * Determinism contract (SURVEY §2.13): dedup keeps the MIN doc_id
  * per key on both engines; coverage top-k orders by (count desc,
  * gram); tau-b's C/D/tie counts are exact DECIMAL(38,0).
  */
object Extras114 {
  import Det._

  private val Big = DecimalType(38, 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DEDUP CASCADE FUNNEL — stage 0: all docs; stage 1: exact dedup
    // on md5(text); stage 2: near-dup removal — survivors sharing a
    // (first-half, second-half) token-md5 band with a smaller
    // survivor are dropped; stage 3: ≥20-token floor.
    "q_llm_dedup_cascade" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("ntok"),
          md5(col("text")).as("h"))
        .duckCkpt()
      val s1 = docs.groupBy(col("h"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"),
          first(col("ntok")).as("ntok"))
        .duckCkpt()
      val ws = split(col("text"), " ")
      val banded = s1.select(col("doc_id"), col("ntok"),
        md5(concat_ws(" ",
          slice(ws, lit(1), greatest((size(ws) / 2).cast("int"), lit(1)))))
          .as("b1"),
        md5(concat_ws(" ",
          slice(ws, (size(ws) / 2 + 1).cast("int"), size(ws))))
          .as("b2"))
      val keepMin = banded.groupBy(col("b1"), col("b2"))
        .agg(min(col("doc_id")).as("keep"))
      val s2 = banded.join(keepMin, Seq("b1", "b2"))
        .where(col("doc_id") === col("keep"))
        .select(col("doc_id"), col("ntok")).distinct()
        .duckCkpt()
      val s3 = s2.where(col("ntok") >= 20)
      val c0 = docs.agg(count(lit(1)).as("n"))
        .select(lit(0L).as("stage"), lit("all_docs").as("name"), col("n"))
      val c1 = s1.agg(count(lit(1)).as("n"))
        .select(lit(1L).as("stage"), lit("exact_dedup").as("name"), col("n"))
      val c2 = s2.agg(count(lit(1)).as("n"))
        .select(lit(2L).as("stage"), lit("band_near_dedup").as("name"),
          col("n"))
      val c3 = s3.agg(count(lit(1)).as("n"))
        .select(lit(3L).as("stage"), lit("length_floor").as("name"),
          col("n"))
      c0.unionByName(c1).unionByName(c2).unionByName(c3)
        .orderBy(col("stage"))
    }),

    // N-GRAM COVERAGE — share of total 4-gram occurrences carried by
    // the top-k most frequent 4-gram types, k ∈ {10, 100, 1000}: the
    // dedup/compression-potential curve.
    "q_llm_ngram_coverage" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ws"))
        .select(explode(expr(
          """transform(sequence(1, greatest(size(ws) - 3, 0)),
             i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                  element_at(ws, i + 2), element_at(ws, i + 3)))"""))
          .as("g"))
      val gc = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
        .duckCkpt()
      val tot = gc.agg(sum(col("c")).as("n"), count(lit(1)).as("types"))
      val w = Window.orderBy(col("c").desc, col("g"))
      val ranked = gc.withColumn("r", row_number().over(w).cast("long"))
        .where(col("r") <= 1000)
      val ks = s.createDataFrame(Seq(Tuple1(10L), Tuple1(100L),
        Tuple1(1000L))).toDF("k")
      ranked.crossJoin(broadcast(ks))
        .where(col("r") <= col("k"))
        .groupBy(col("k")).agg(sum(col("c")).as("topk_mass"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("topk_mass"), col("types").as("n_types"),
          r6(col("topk_mass").cast("double") / col("n").cast("double"))
            .as("coverage"))
        .orderBy(col("k"))
    }),

    // KENDALL'S TAU-B — quantity × discount dependence with the full
    // tie correction: τ_b = (C−D)/√((W−T_x)(W−T_y)) over the bounded
    // contingency table (W = n(n−1)/2 total pairs).
    "q_agg_tau_b" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .groupBy(col("l_quantity").cast("long").as("xi"),
          (dec(col("l_discount")) * 100).cast("long").as("yi"))
        .agg(count(lit(1)).as("n"))
        .duckCkpt()
      val pairs = cells.as("a")
        .join(broadcast(cells.as("b")), col("b.xi") > col("a.xi"))
        .agg(
          sum(when(col("b.yi") > col("a.yi"),
            col("a.n").cast(Big) * col("b.n").cast(Big))
            .otherwise(lit(0).cast(Big))).as("cc"),
          sum(when(col("b.yi") < col("a.yi"),
            col("a.n").cast(Big) * col("b.n").cast(Big))
            .otherwise(lit(0).cast(Big))).as("dd"))
      val tot = cells.agg(sum(col("n")).as("nn"))
      val tx = cells.groupBy(col("xi")).agg(sum(col("n")).as("ri"))
        .agg(sum(col("ri").cast(Big) * (col("ri") - 1).cast(Big))
          .as("tx2"))
      val ty = cells.groupBy(col("yi")).agg(sum(col("n")).as("cj"))
        .agg(sum(col("cj").cast(Big) * (col("cj") - 1).cast(Big))
          .as("ty2"))
      val m = pairs.crossJoin(broadcast(tot))
        .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      val w2 = (col("nn").cast(Big) * (col("nn") - 1).cast(Big))
        .cast("double")
      m.select(col("nn").as("n_rows"),
        col("cc").cast("long").as("conc_pairs"),
        col("dd").cast("long").as("disc_pairs"),
        r6((col("cc") - col("dd")).cast("double") * 2 /
          sqrt((w2 - col("tx2").cast("double")) *
            (w2 - col("ty2").cast("double")))).as("tau_b"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_dedup_cascade" ->
      """WITH docs AS (SELECT doc_id, text,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                    md5(text) AS h
                 FROM documents),
            s1 AS (SELECT MIN(doc_id) AS doc_id,
                     arg_min(text, doc_id) AS text,
                     arg_min(ntok, doc_id) AS ntok
                   FROM docs GROUP BY h),
            banded AS (SELECT doc_id, ntok,
                    md5(array_to_string(ws[1:greatest(len(ws) // 2, 1)],
                      ' ')) AS b1,
                    md5(array_to_string(ws[(len(ws) // 2 + 1):len(ws)],
                      ' ')) AS b2
                  FROM (SELECT doc_id, ntok, string_split(text, ' ') AS ws
                        FROM s1)),
            km AS (SELECT b1, b2, MIN(doc_id) AS keep
                   FROM banded GROUP BY 1, 2),
            s2 AS (SELECT DISTINCT banded.doc_id, banded.ntok
                   FROM banded JOIN km USING (b1, b2)
                   WHERE banded.doc_id = km.keep),
            s3 AS (SELECT * FROM s2 WHERE ntok >= 20)
         SELECT * FROM (
           SELECT CAST(0 AS BIGINT) AS stage, 'all_docs' AS name,
                  CAST(COUNT(*) AS BIGINT) AS n FROM docs
           UNION ALL
           SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s1
           UNION ALL
           SELECT 2, 'band_near_dedup', CAST(COUNT(*) AS BIGINT) FROM s2
           UNION ALL
           SELECT 3, 'length_floor', CAST(COUNT(*) AS BIGINT) FROM s3)
         ORDER BY stage""",

    "q_llm_ngram_coverage" ->
      """WITH grams AS (SELECT ws[i] || ' ' || ws[i + 1] || ' '
                      || ws[i + 2] || ' ' || ws[i + 3] AS g
                 FROM (SELECT ws,
                         unnest(generate_series(1, len(ws) - 3)) AS i
                       FROM (SELECT string_split(text, ' ') AS ws
                             FROM documents) t0) t),
            gc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c
                   FROM grams GROUP BY 1),
            t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                    CAST(COUNT(*) AS BIGINT) AS types FROM gc),
            rk AS (SELECT c,
                     CAST(row_number() OVER (ORDER BY c DESC, g)
                       AS BIGINT) AS r
                   FROM gc),
            ks AS (SELECT UNNEST([10, 100, 1000]) AS k),
            m AS (SELECT CAST(k AS BIGINT) AS k,
                    CAST(SUM(c) AS BIGINT) AS topk_mass
                  FROM rk, ks WHERE r <= k GROUP BY 1)
         SELECT k, topk_mass, types AS n_types,
                round(CAST(topk_mass AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS coverage
         FROM m, t ORDER BY k""",

    "q_agg_tau_b" ->
      """WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS xi,
                    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS yi,
                    CAST(COUNT(*) AS BIGINT) AS n
                 FROM lineitem GROUP BY 1, 2),
            cd AS (SELECT
                     SUM(CASE WHEN b.yi > a.yi
                       THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                       ELSE 0 END) AS cc,
                     SUM(CASE WHEN b.yi < a.yi
                       THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                       ELSE 0 END) AS dd
                   FROM cells a JOIN cells b ON b.xi > a.xi),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
            tx AS (SELECT SUM(CAST(ri AS HUGEINT) * CAST(ri - 1
                      AS HUGEINT)) AS tx2
                   FROM (SELECT xi, CAST(SUM(n) AS BIGINT) AS ri
                         FROM cells GROUP BY 1)),
            ty AS (SELECT SUM(CAST(cj AS HUGEINT) * CAST(cj - 1
                      AS HUGEINT)) AS ty2
                   FROM (SELECT yi, CAST(SUM(n) AS BIGINT) AS cj
                         FROM cells GROUP BY 1))
         SELECT nn AS n_rows, CAST(cc AS BIGINT) AS conc_pairs,
                CAST(dd AS BIGINT) AS disc_pairs,
                round(CAST(cc - dd AS DOUBLE) * 2
                  / sqrt((CAST(CAST(nn AS HUGEINT) * CAST(nn - 1
                        AS HUGEINT) AS DOUBLE)
                      - CAST(tx2 AS DOUBLE))
                    * (CAST(CAST(nn AS HUGEINT) * CAST(nn - 1 AS HUGEINT)
                        AS DOUBLE)
                      - CAST(ty2 AS DOUBLE))), 6) AS tau_b
         FROM cd, t, tx, ty"""
  )
}
