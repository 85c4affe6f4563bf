package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 25: lexical-diversity round-out for the
  * LLM corpus pipeline — Yule's characteristic K, Good-Turing
  * smoothed counts, moving-average type-token ratio (MATTR, W=25)
  * via a closed-form per-occurrence window count, and the Heaps'-law
  * vocabulary-growth exponent from 20 deterministic corpus
  * checkpoints.
  *
  * Scale note: Yule/Good-Turing ride the vocabulary-bounded
  * frequency-of-frequency table; MATTR turns the naive
  * distinct-per-window scan into ONE closed-form count per token
  * occurrence (windows where that occurrence is the first of its type
  * — an O(corpus) pass, no window re-scan); Heaps joins the per-type
  * first-doc relation against 20 broadcast thresholds (20 linear
  * passes, no per-doc running distinct).
  *
  * Determinism contract (SURVEY §2.13): frequency folds are exact
  * integers; per-doc MATTR and per-checkpoint ln(V)/ln(N) are
  * micro-quantized before any cross-row fold; the Heaps OLS solves
  * exact integer normal equations off the quantized points.
  */
object Extras99 {
  import Det._

  private val Big = DecimalType(38, 0)

  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // YULE'S K — K = 10⁴·(Σ_w c(w)² − N)/N²: repeat-rate
    // characteristic, high for repetitive/templated corpora.
    "q_llm_yule_k" -> ((s, d) => {
      val wc = toks(s, d).groupBy(col("w")).agg(count(lit(1)).as("c"))
      wc.agg(sum(col("c")).as("nn"), count(lit(1)).as("vocab"),
        sum(col("c").cast(Big) * col("c").cast(Big)).as("sc2"))
        .select(col("nn").as("n_tokens"), col("vocab"),
          r6((col("sc2") - col("nn").cast(Big)).cast("double") * 1e4 /
            (col("nn").cast(Big) * col("nn").cast(Big)).cast("double"))
            .as("yule_k"))
    }),

    // GOOD-TURING — smoothed count r* = (r+1)·N_{r+1}/N_r for the low
    // frequencies r = 1..9 off the BIGRAM frequency-of-frequency table
    // (the unigram vocabulary is saturated; bigrams carry the unseen-
    // mass tail Good-Turing exists for).
    "q_llm_good_turing" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val wc = Tables.documents(s, d)
        .select(explode(zip_with(
          slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
          slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val ff = wc.groupBy(col("c")).agg(count(lit(1)).as("nr"))
        .duckCkpt()
      ff.as("a")
        .join(broadcast(ff.as("b")), col("b.c") === col("a.c") + 1)
        .where(col("a.c") <= 9)
        .select(col("a.c").as("r"), col("a.nr").as("n_r"),
          col("b.nr").as("n_r1"),
          r6((col("a.c") + 1).cast("double") * col("b.nr").cast("double")
            / col("a.nr").cast("double")).as("r_star"))
        .orderBy(col("r"))
    }),

    // MATTR (W=25) — mean type-token ratio over all full 25-token
    // windows, per source. Occurrence at position p (prev same-token
    // position q) is the window-distinct representative for exactly
    // the full windows ending in [max(p, 25, q+25), min(p+24, P)] —
    // summing that closed form over occurrences IS Σ_windows
    // distinct(window), with no per-window rescans.
    "q_llm_mattr" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .where(size(split(col("text"), " ")) >= 25)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("pp"),
          posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("source"), col("pp"),
          (col("pos") + 1).cast("long").as("p"), col("col").as("w"))
      val wPrev = Window.partitionBy(col("doc_id"), col("w"))
        .orderBy(col("p"))
      val cnt = base
        .withColumn("q", lag(col("p"), 1).over(wPrev))
        .withColumn("lo",
          greatest(col("p"), lit(25L),
            coalesce(col("q") + 25, lit(25L))))
        .withColumn("hi", least(col("p") + 24, col("pp")))
        .withColumn("cw",
          greatest(col("hi") - col("lo") + 1, lit(0L)))
      val perDoc = cnt.groupBy(col("doc_id"), col("source"), col("pp"))
        .agg(sum(col("cw")).as("sw"))
        .select(col("source"),
          round(col("sw").cast("double") /
            (col("pp") - 24).cast("double") / 25 * 1e6)
            .cast("long").as("mattr_micro"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("mattr_micro")).as("sm"))
        .select(col("source"), col("n_docs"),
          r6(col("sm").cast("double") / col("n_docs").cast("double")
            / 1e6).as("avg_mattr"))
        .orderBy(col("source"))
    }),

    // HEAPS' LAW — V ≈ k·N^β over TRIGRAM types (the unigram/bigram
    // vocabularies saturate in the first checkpoints): per-type
    // first-doc vs 20 deterministic doc-id thresholds; β is the ln-ln
    // OLS slope over the checkpoint points, solved from exact integer
    // normal equations on the micro-quantized logs.
    "q_llm_heaps_law" -> ((s, d) => {
      val dt = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, greatest(size(ws) - 2, 0)),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
                         ' ', element_at(ws, i + 2)))""")).as("w"))
      val types = dt.groupBy(col("w")).agg(min(col("doc_id")).as("md"))
      val perDoc = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("tc"))
      val bounds = Tables.documents(s, d)
        .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      val ks = s.range(1, 21).toDF("k")
      val thr = ks.crossJoin(broadcast(bounds))
        .select(col("k"),
          (col("lo") + expr("(hi - lo) * k div 20")).as("thr"))
        .duckCkpt()
      val vk = types.join(broadcast(thr), col("md") <= col("thr"))
        .groupBy(col("k")).agg(count(lit(1)).as("v"))
      val nk = perDoc.join(broadcast(thr), col("doc_id") <= col("thr"))
        .groupBy(col("k")).agg(sum(col("tc")).as("nt"))
      val pts = vk.join(nk, "k")
        .select(round(log(col("nt").cast("double")) * 1e6)
          .cast("long").as("x"),
          round(log(col("v").cast("double")) * 1e6).cast("long").as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"))
      val beta = (col("n").cast(Big) * col("sxy")
        - col("sx").cast(Big) * col("sy").cast(Big)).cast("double") /
        (col("n").cast(Big) * col("sxx")
          - col("sx").cast(Big) * col("sx").cast(Big)).cast("double")
      m.select(col("n").as("n_points"), r6(beta).as("heaps_beta"),
        r6((col("sy").cast("double") - beta * col("sx").cast("double"))
          / col("n").cast("double") / 1e6).as("heaps_lnk"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_yule_k" ->
      """WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT unnest(string_split(text, ' ')) AS w
                       FROM documents) GROUP BY 1),
            m AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
                    CAST(COUNT(*) AS BIGINT) AS vocab,
                    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sc2
                  FROM wc)
         SELECT nn AS n_tokens, vocab,
                round(CAST(sc2 - CAST(nn AS HUGEINT) AS DOUBLE) * 1e4
                  / CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)
                    AS DOUBLE), 6) AS yule_k
         FROM m""",

    "q_llm_good_turing" ->
      """WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT ws[i] || ' ' || ws[i + 1] AS w
                       FROM (SELECT ws,
                               unnest(generate_series(1, len(ws) - 1)) AS i
                             FROM (SELECT string_split(text, ' ') AS ws
                                   FROM documents) t0) t)
                 GROUP BY 1),
            ff AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nr
                   FROM wc GROUP BY 1)
         SELECT a.c AS r, a.nr AS n_r, b.nr AS n_r1,
                round(CAST(a.c + 1 AS DOUBLE) * CAST(b.nr AS DOUBLE)
                  / CAST(a.nr AS DOUBLE), 6) AS r_star
         FROM ff a JOIN ff b ON b.c = a.c + 1
         WHERE a.c <= 9 ORDER BY r""",

    "q_llm_mattr" ->
      """WITH base AS (SELECT doc_id, source,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS pp,
                    CAST(generate_subscripts(string_split(text, ' '), 1)
                      AS BIGINT) AS p,
                    unnest(string_split(text, ' ')) AS w
                 FROM documents
                WHERE len(string_split(text, ' ')) >= 25),
            pv AS (SELECT doc_id, source, pp, p, w,
                     lag(p, 1) OVER (PARTITION BY doc_id, w ORDER BY p)
                       AS q
                   FROM base),
            cw AS (SELECT doc_id, source, pp,
                     greatest(least(p + 24, pp)
                       - greatest(p, 25, coalesce(q + 25, 25)) + 1,
                       0) AS c
                   FROM pv),
            perdoc AS (SELECT source,
                     CAST(round(CAST(SUM(c) AS DOUBLE)
                       / CAST(pp - 24 AS DOUBLE) / 25 * 1e6) AS BIGINT)
                       AS mattr_micro
                   FROM cw GROUP BY doc_id, source, pp)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                round(CAST(SUM(mattr_micro) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS avg_mattr
         FROM perdoc GROUP BY 1 ORDER BY 1""",

    "q_llm_heaps_law" ->
      """WITH dt AS (SELECT doc_id,
                    ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS w
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i
                       FROM (SELECT doc_id, string_split(text, ' ') AS ws
                             FROM documents) t0)),
            types AS (SELECT w, CAST(MIN(doc_id) AS BIGINT) AS md
                      FROM dt GROUP BY 1),
            perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tc
                       FROM dt GROUP BY 1),
            b AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
                    CAST(MAX(doc_id) AS BIGINT) AS hi FROM documents),
            thr AS (SELECT k, lo + (hi - lo) * k // 20 AS thr
                    FROM range(1, 21) t(k), b),
            vk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS v
                   FROM types JOIN thr ON md <= thr GROUP BY 1),
            nk AS (SELECT k, CAST(SUM(tc) AS BIGINT) AS nt
                   FROM perdoc JOIN thr ON doc_id <= thr GROUP BY 1),
            pts AS (SELECT
                      CAST(round(ln(CAST(nt AS DOUBLE)) * 1e6) AS BIGINT)
                        AS x,
                      CAST(round(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT)
                        AS y
                    FROM vk JOIN nk USING (k)),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
                  FROM pts),
            e AS (SELECT n, sx, sy,
                    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT)
                      * CAST(sy AS HUGEINT) AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT)
                      * CAST(sx AS HUGEINT) AS DOUBLE) AS beta
                  FROM m)
         SELECT n AS n_points, round(beta, 6) AS heaps_beta,
                round((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) / 1e6, 6) AS heaps_lnk
         FROM e"""
  )
}
