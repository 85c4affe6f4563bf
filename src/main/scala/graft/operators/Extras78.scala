package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-11 additions, part 4: LLM-corpus quality screens — boilerplate
  * span detection (cross-source repeated 5-grams), a Flesch-Kincaid
  * readability profile with an EXACT-integer hardness predicate,
  * stopword-ratio profiling with an integer suspicion gate, and
  * word-level LCS similarity between source representatives (the
  * ROUGE-L core, second user of the anti-diagonal recursive-CTE oracle
  * pattern introduced for q_ts_dtw).
  *
  * Determinism contract (SURVEY §2.13): token/syllable/gram counts are
  * exact integers; cross-source gram keys are the PORTABLE 60-bit md5
  * hash applied in both engines (collision parity, 8-byte shuffle
  * keys — the threshold_sweep discipline); the readability hardness
  * gate is the cross-multiplied integer inequality
  * 39·W² + 1180·Y·S > 2559·W·S, never an IEEE compare; emitted ratios
  * are one shared IEEE chain over agreed integer sums.
  */
object Extras78 {
  import Det._

  /** Per-doc distinct 5-gram sets: (doc_id, source, gs). Computed as a
    * pure per-row projection (no shuffle) so consumers can derive both
    * the doc-grain relation (size only — never a distinct over the
    * exploded grams) and the posting relation from it. */
  private def gramSets5(s: SparkSession, d: String): DataFrame = {
    val ws = split(col("text"), " ")
    Tables.documents(s, d)
      .where(size(ws) >= 5)
      .select(col("doc_id"), col("source"),
        array_distinct(transform(sequence(lit(1), size(ws) - 4),
          i => concat_ws(" ", slice(ws, i, lit(5))))).as("gs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BOILERPLATE DETECTION — the cross-source repeated-span screen
    // (headers/footers/licenses repeat VERBATIM across unrelated
    // sources): a 5-gram is boilerplate iff it appears in >= 3 distinct
    // sources. Per source: docs, distinct gram volume, boilerplate-gram
    // volume, and the pooled ratio. One gram pass + one distinct-count
    // agg + one hash-key join back; keys are 8-byte portable hashes.
    "q_llm_boilerplate" -> ((s, d) => {
      val sets = gramSets5(s, d)
      val g = sets.select(col("doc_id"), col("source"),
          explode(col("gs")).as("g"))
        .select(col("doc_id"), col("source"), md5long(col("g")).as("hg"))
      val bp = g.groupBy(col("hg"))
        .agg(countDistinct(col("source")).as("n_src"))
        .where(col("n_src") >= 3)
        .select(col("hg"))
      g.join(bp.as("bp"), Seq("hg"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nbp"))
        .join(sets.select(col("doc_id"), col("source"),
          size(col("gs")).cast("long").as("ng")), Seq("doc_id"), "right")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ng")).as("n_grams"),
          sum(coalesce(col("nbp"), lit(0L))).as("n_bp_grams"))
        .select(col("source"), col("n_docs"), col("n_grams"),
          col("n_bp_grams"),
          r6(col("n_bp_grams").cast("double")
            / col("n_grams").cast("double")).as("bp_ratio"))
        .orderBy("source")
    }),

    // READABILITY PROFILE — Flesch-Kincaid grade with 15-word
    // pseudo-sentences (the corpus has no punctuation): per doc
    // W = tokens, Y = syllables (maximal vowel runs per word — the
    // classic heuristic), S = (W + 14) div 15. Per source the pooled
    // grade is ONE IEEE chain over the exact sums, and the hard-doc
    // count uses the cross-multiplied INTEGER inequality
    // 39·W² + 1180·Y·S > 2559·W·S ⟺ FK > 10 — no per-doc IEEE value
    // ever crosses the engine boundary.
    "q_llm_readability" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val perDoc = Tables.documents(s, d)
        .where(size(ws) >= 1)
        .select(col("doc_id"), col("source"),
          size(ws).cast("long").as("w"),
          aggregate(transform(ws, x =>
              size(filter(split(x, "[^aeiou]+"), p => p =!= ""))),
            lit(0), (acc, v) => acc + v).cast("long").as("y"))
        .withColumn("sen", expr("(w + 14) div 15"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w")).as("sum_words"),
          sum(col("y")).as("sum_syll"),
          sum(col("sen")).as("sum_sent"),
          sum(when(col("w") * col("w") * 39 + col("y") * col("sen") * 1180
              > col("w") * col("sen") * 2559, 1L).otherwise(0L))
            .as("n_hard"))
        .select(col("source"), col("n_docs"), col("sum_words"),
          col("sum_syll"), col("sum_sent"), col("n_hard"),
          r6(lit(0.39) * col("sum_words").cast("double")
              / col("sum_sent").cast("double")
            + lit(11.8) * col("sum_syll").cast("double")
              / col("sum_words").cast("double")
            - lit(15.59)).as("fk_pooled"))
        .orderBy("source")
    }),

    // STOPWORD PROFILE — the classic "too few stopwords = not natural
    // language" screen: per source, token volume, stopword volume, the
    // pooled ratio, and the count of SUSPICIOUS docs by the integer
    // gate n_stop·20 < n_tokens (stopword share < 5%).
    "q_llm_stopword_profile" -> ((s, d) => {
      val stops = Seq("a", "the", "and", "of", "to", "in", "is", "it")
      val ws = split(col("text"), " ")
      val perDoc = Tables.documents(s, d)
        .where(size(ws) >= 1)
        .select(col("doc_id"), col("source"),
          size(ws).cast("long").as("n_tok"),
          size(filter(ws, x => x.isin(stops.map(lit(_)): _*)))
            .cast("long").as("n_stop"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_stop")).as("n_stopwords"),
          sum(when(col("n_stop") * 20 < col("n_tok"), 1L).otherwise(0L))
            .as("n_suspicious"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_stopwords"), col("n_suspicious"),
          r6(col("n_stopwords").cast("double")
            / col("n_tokens").cast("double")).as("stop_ratio"))
        .orderBy("source")
    }),

    // LCS SIMILARITY BETWEEN SOURCE REPRESENTATIVES — word-level
    // longest common subsequence (the ROUGE-L core) between each
    // source's representative doc (smallest doc_id), truncated to the
    // first 80 tokens; pairs over the first 8 sources (bounded 28-pair
    // relation, broadcast). The DP is exact integers; F1 =
    // 2·LCS/(n_a+n_b) is the one IEEE tail. The oracle walks the SAME
    // DP by anti-diagonals in a recursive CTE (the q_ts_dtw pattern).
    "q_llm_lcs_pairs" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy(col("source"))
      val reps = Tables.documents(s, d)
        .where(col("source").isin((0 until 8).map("src" + _): _*))
        .withColumn("mid", min(col("doc_id")).over(w))
        .where(col("doc_id") === col("mid"))
        .select(col("source"), slice(split(col("text"), " "), 1, 80)
          .as("toks"))
      val pairs = reps.as("a").join(broadcast(reps.as("b")),
          col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.toks").as("xs"), col("b.toks").as("ys"))
      pairs.as[(String, String, Seq[String], Seq[String])]
        .map { case (sa, sb, xs, ys) =>
          val x = xs.toArray
          val y = ys.toArray
          val dp = Array.ofDim[Int](x.length + 1, y.length + 1)
          var i = 1
          while (i <= x.length) {
            var j = 1
            while (j <= y.length) {
              dp(i)(j) =
                if (x(i - 1) == y(j - 1)) dp(i - 1)(j - 1) + 1
                else math.max(dp(i - 1)(j), dp(i)(j - 1))
              j += 1
            }
            i += 1
          }
          (sa, sb, x.length.toLong, y.length.toLong,
            dp(x.length)(y.length).toLong)
        }
        .toDF("src_a", "src_b", "n_a", "n_b", "lcs_len")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("lcs_len"),
          r6(col("lcs_len").cast("double") * 2.0
            / (col("n_a") + col("n_b")).cast("double")).as("rouge_l_f1"))
        .orderBy("src_a", "src_b")
    })
  )

  private val gramsCte =
    """w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
             FROM documents WHERE len(string_split(text, ' ')) >= 5),
       x AS (SELECT doc_id, source, ws,
                    unnest(generate_series(1, len(ws) - 4)) AS i FROM w),
       gs AS (SELECT DISTINCT doc_id, source,
                     array_to_string(ws[i:i+4], ' ') AS g FROM x),
       gh AS (SELECT doc_id, source,
                     CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS hg
              FROM gs),
       ng AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS ng
              FROM gh GROUP BY 1, 2)"""

  val oracle: Map[String, String] = Map(

    "q_llm_boilerplate" ->
      s"""WITH $gramsCte,
            bp AS (SELECT hg FROM (SELECT hg,
                       COUNT(DISTINCT source) AS n_src
                     FROM gh GROUP BY hg)
                   WHERE n_src >= 3),
            nbp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nbp
                    FROM gh WHERE hg IN (SELECT hg FROM bp)
                    GROUP BY doc_id)
         SELECT ng.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(ng.ng) AS BIGINT) AS n_grams,
                CAST(SUM(COALESCE(nbp.nbp, 0)) AS BIGINT) AS n_bp_grams,
                round(CAST(SUM(COALESCE(nbp.nbp, 0)) AS DOUBLE)
                  / CAST(SUM(ng.ng) AS DOUBLE), 6) AS bp_ratio
         FROM ng LEFT JOIN nbp ON nbp.doc_id = ng.doc_id
         GROUP BY ng.source ORDER BY ng.source""",

    "q_llm_readability" ->
      """WITH perdoc AS (
           SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                  CAST(list_sum(list_transform(string_split(text, ' '),
                    t -> len(list_filter(
                      string_split_regex(t, '[^aeiou]+'),
                      p -> p <> '')))) AS BIGINT) AS y,
                  (CAST(len(string_split(text, ' ')) AS BIGINT) + 14)
                    // 15 AS sen
           FROM documents
           WHERE len(string_split(text, ' ')) >= 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(w) AS BIGINT) AS sum_words,
                CAST(SUM(y) AS BIGINT) AS sum_syll,
                CAST(SUM(sen) AS BIGINT) AS sum_sent,
                CAST(SUM(CASE WHEN w * w * 39 + y * sen * 1180
                               > w * sen * 2559 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hard,
                round(0.39 * CAST(SUM(w) AS DOUBLE)
                    / CAST(SUM(sen) AS DOUBLE)
                  + 11.8 * CAST(SUM(y) AS DOUBLE)
                    / CAST(SUM(w) AS DOUBLE)
                  - 15.59, 6) AS fk_pooled
         FROM perdoc GROUP BY source ORDER BY source""",

    "q_llm_stopword_profile" ->
      """WITH perdoc AS (
           SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('a', 'the', 'and', 'of', 'to', 'in',
                               'is', 'it'))) AS BIGINT) AS n_stop
           FROM documents
           WHERE len(string_split(text, ' ')) >= 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                CAST(SUM(n_stop) AS BIGINT) AS n_stopwords,
                CAST(SUM(CASE WHEN n_stop * 20 < n_tok THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_suspicious,
                round(CAST(SUM(n_stop) AS DOUBLE)
                  / CAST(SUM(n_tok) AS DOUBLE), 6) AS stop_ratio
         FROM perdoc GROUP BY source ORDER BY source""",

    // LCS by anti-diagonals (the q_ts_dtw oracle pattern): diag k+1
    // cell (i, k+1−i) reads (i−1, j) and (i, j−1) from diag k and
    // (i−1, j−1) from diag k−1; out-of-grid cells carry 0, which is
    // neutral under the max/+1 recurrence. Answer = cell (na, nb) on
    // diag na+nb.
    "q_llm_lcs_pairs" ->
      """WITH RECURSIVE reps AS (
           SELECT source,
                  (string_split(text, ' '))[1:80] AS toks
           FROM documents
           WHERE source IN ('src0','src1','src2','src3','src4','src5',
                            'src6','src7')
             AND doc_id = (SELECT MIN(d2.doc_id) FROM documents d2
                           WHERE d2.source = documents.source)),
            pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                             a.toks AS xs, b.toks AS ys,
                             CAST(len(a.toks) AS BIGINT) AS na,
                             CAST(len(b.toks) AS BIGINT) AS nb
                      FROM reps a JOIN reps b ON a.source < b.source),
            r AS (
              SELECT src_a, src_b, xs, ys, na, nb, CAST(2 AS BIGINT) AS k,
                     list_transform(range(1, CAST(na AS INT) + 1),
                       i -> CASE WHEN i = 1 AND xs[1] = ys[1]
                                 THEN CAST(1 AS BIGINT)
                                 ELSE CAST(0 AS BIGINT) END) AS d1,
                     list_transform(range(1, CAST(na AS INT) + 1),
                       i -> CAST(0 AS BIGINT)) AS d2
              FROM pairs
              UNION ALL
              SELECT src_a, src_b, xs, ys, na, nb, k + 1,
                     list_transform(range(1, CAST(na AS INT) + 1), i ->
                       CASE WHEN k + 1 - i BETWEEN 1 AND nb THEN
                         CASE WHEN xs[i] = ys[CAST(k + 1 - i AS INT)]
                           THEN COALESCE(
                             CASE WHEN i > 1 THEN d2[i - 1] END, 0) + 1
                           ELSE greatest(
                             COALESCE(CASE WHEN i > 1 THEN d1[i - 1] END,
                               0),
                             COALESCE(d1[i], 0))
                         END
                       ELSE CAST(0 AS BIGINT) END) AS d1,
                     d1 AS d2
              FROM r WHERE k < na + nb)
         SELECT src_a, src_b, na AS n_a, nb AS n_b,
                d1[CAST(na AS INT)] AS lcs_len,
                round(CAST(d1[CAST(na AS INT)] AS DOUBLE) * 2.0
                  / CAST(na + nb AS DOUBLE), 6) AS rouge_l_f1
         FROM r WHERE k = na + nb ORDER BY 1, 2"""
  )
}
