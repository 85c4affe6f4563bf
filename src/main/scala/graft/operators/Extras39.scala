package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 2: top-N concentration share, the
  * Wald–Wolfowitz runs test, per-document character-class profiling,
  * corpus character-bigram ranking, exact-log geometric means, and
  * cross-source vocabulary overlap.
  *
  * Determinism: counts/cents/quantized-log sums are exact integers; each
  * emitted float is ONE shared IEEE tail over those integers (§2.13).
  */
object Extras39 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TOP-N CONCENTRATION — per market segment: the revenue share of its
    // top-3 customers (the "how concentrated is this segment" OLAP
    // staple next to q_agg_abc_pareto's ABC classes). One fact shuffle
    // to the customer grain, broadcast dim join, then segment-window
    // rank over the customer-grain aggregate (dimension-sized); the
    // share is one IEEE division of exact cent sums.
    "q_agg_topn_share" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("cents").desc, col("o_custkey"))
      rev.withColumn("rk", row_number().over(w))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("cents")).as("total_cents"),
          sum(when(col("rk") <= 3, col("cents")).otherwise(0L))
            .as("top3_cents"))
        .select(col("c_mktsegment"), col("total_cents"), col("top3_cents"),
          (col("top3_cents").cast("double")
            / col("total_cents").cast("double")).as("top3_share"))
        .orderBy("c_mktsegment")
    }),

    // WALD–WOLFOWITZ RUNS TEST — is the daily revenue series random
    // around its median, or trending/mean-reverting? The median is the
    // exact LOWER median (the ⌈n/2⌉-th smallest cent value — engine
    // median() semantics differ on even n, row_number does not); days
    // equal to it are dropped (the classic tie rule); runs count via a
    // sign-change lag. All counts exact; z is the one IEEE tail of the
    // standard normal approximation.
    "q_ts_runs_test" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val byY = Window.orderBy(col("y"), col("dt"))
      val med = daily
        .withColumn("r", row_number().over(byY))
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("n"))))
        .where(col("r") === expr("(n + 1) div 2"))
        .select(col("y").as("med"))
      val ord = Window.orderBy(col("dt"))
      val signed = daily.crossJoin(broadcast(med))
        .where(col("y") =!= col("med"))
        .withColumn("above", (col("y") > col("med")).cast("int"))
        .withColumn("chg",
          when(lag(col("above"), 1).over(ord).isNull
            || lag(col("above"), 1).over(ord) =!= col("above"), 1L)
            .otherwise(0L))
      val agg = signed.agg(
        sum(col("above").cast("long")).as("n1"),
        sum(lit(1L) - col("above")).as("n2"),
        sum(col("chg")).as("runs"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val n = (col("n1") + col("n2")).cast("double")
      val mu = lit(1.0) + lit(2.0) * n1 * n2 / n
      val sig2 = (mu - lit(1.0)) * (mu - lit(2.0)) / (n - lit(1.0))
      agg.select(col("n1"), col("n2"), col("runs"),
        ((col("runs").cast("double") - mu) / sqrt(sig2)).as("z"))
    }),

    // CHARACTER-CLASS PROFILE — per-document composition (letters,
    // digits, spaces, other) with an alpha ratio: the OCR/boilerplate
    // quality signal beside q_llm_quality's word-level scores.
    // Embarrassingly parallel regex counting; exact integers + one
    // IEEE division.
    "q_llm_char_stats" -> ((s, d) => {
      def cnt(re: String) =
        length(regexp_replace(col("text"), re, ""))
      Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          (length(col("text")) - cnt("[a-zA-Z]")).as("n_alpha"),
          (length(col("text")) - cnt("[0-9]")).as("n_digit"),
          (length(col("text")) - cnt(" ")).as("n_space"))
        .select(col("doc_id"), col("n_chars"), col("n_alpha"),
          col("n_digit"), col("n_space"),
          (col("n_chars") - col("n_alpha") - col("n_digit")
            - col("n_space")).as("n_other"),
          (col("n_alpha").cast("double") / col("n_chars").cast("double"))
            .as("alpha_ratio"))
        .orderBy("doc_id")
    }),

    // CHARACTER-BIGRAM RANKING — the corpus's top-50 character 2-grams
    // (the language-ID / encoding-anomaly fingerprint at character
    // level). Bigram expansion is a pure per-row projection (sequence +
    // substring — no join); one count aggregate over a key space bounded
    // by the alphabet², then a top-k sort of that bounded relation.
    "q_llm_char_ngrams" -> ((s, d) => {
      import s.implicits._
      // Round 16 (the char_entropy treatment): the interpreted
      // transform(sequence)+substring HOF re-seeks the string per
      // index — O(n²) per document — and shuffles one row per bigram.
      // This per-partition kernel walks each document's CODE POINTS
      // once (the same unit substring(text, i, 2) slices — consecutive
      // code-point pairs, docs shorter than 2 code points contribute
      // nothing, the oracle's generate_series(1, len-1) semantics) and
      // pre-counts locally, so only (gram, cnt) partials reach the
      // exchange (key space alphabet²-bounded).
      Tables.documents(s, d)
        .select(col("text")).as[String]
        .mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { text =>
            var i = 0
            var prev = -1
            while (i < text.length) {
              val cp = text.codePointAt(i)
              if (prev >= 0) {
                val g = new String(Character.toChars(prev)) +
                  new String(Character.toChars(cp))
                m.update(g, m.getOrElse(g, 0L) + 1L)
              }
              prev = cp
              i += Character.charCount(cp)
            }
          }
          m.iterator.map { case (g, n) => (g, n) }
        }.toDF("gram", "cnt0")
        .groupBy(col("gram"))
        .agg(sum(col("cnt0")).as("cnt"))
        .orderBy(col("cnt").desc, col("gram"))
        .limit(50)
    }),

    // GEOMETRIC MEAN — per order status, the geometric mean of order
    // totals: exp2 of the mean log2. Each per-row log2 is 6-dp-quantized
    // to integer MICRO-LOG units before the sum (float sums are
    // order-dependent; integer sums are not — the q_llm_entropy
    // discipline), so both engines aggregate identical integers; the
    // emitted mean is one shared IEEE tail rounded to 6 dp.
    "q_agg_geomean" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"),
          (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(log2(col("cents").cast("double")) * lit(1000000.0), 0)
            .cast("long")).as("micro_log2"))
        .select(col("o_orderstatus"), col("n"), col("micro_log2"),
          r6(pow(lit(2.0), col("micro_log2").cast("double")
            / lit(1000000.0) / col("n").cast("double")) / lit(100.0))
            .as("geomean"))
        .orderBy("o_orderstatus")),

    // CROSS-SOURCE VOCABULARY OVERLAP — Jaccard similarity of the word
    // vocabularies of every source pair (the corpus-comparison matrix a
    // data-mixing decision starts from). Vocabulary relations are
    // (source, word) distinct sets — bounded by vocabulary size, not
    // corpus size; the pair join runs on the word key (posting-list
    // shaped), and per-source totals broadcast back in.
    "q_llm_source_overlap" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      vocab.as("a").join(vocab.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("nv").as("na"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("nv").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("uni"),
          (col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_agg_topn_share" ->
      """WITH rev AS (SELECT o_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
            j AS (SELECT r.o_custkey, r.cents, c.c_mktsegment,
                    row_number() OVER (PARTITION BY c.c_mktsegment
                      ORDER BY r.cents DESC, r.o_custkey) AS rk
                  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey)
         SELECT c_mktsegment,
                CAST(SUM(cents) AS BIGINT) AS total_cents,
                CAST(SUM(CASE WHEN rk <= 3 THEN cents ELSE 0 END) AS BIGINT)
                  AS top3_cents,
                CAST(SUM(CASE WHEN rk <= 3 THEN cents ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(cents) AS DOUBLE) AS top3_share
         FROM j GROUP BY 1 ORDER BY 1""",

    "q_ts_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            med AS (SELECT y AS med FROM
                      (SELECT y, row_number() OVER (ORDER BY y, dt) AS r,
                              COUNT(*) OVER () AS n
                       FROM daily) t
                    WHERE r = (n + 1) // 2),
            sgn AS (SELECT dt, CASE WHEN y > med THEN 1 ELSE 0 END AS above
                    FROM daily, med WHERE y <> med),
            chg AS (SELECT above,
                      CASE WHEN lag(above) OVER (ORDER BY dt) IS NULL
                             OR lag(above) OVER (ORDER BY dt) <> above
                           THEN 1 ELSE 0 END AS c
                    FROM sgn),
            agg AS (SELECT CAST(SUM(above) AS BIGINT) AS n1,
                      CAST(SUM(1 - above) AS BIGINT) AS n2,
                      CAST(SUM(c) AS BIGINT) AS runs
                    FROM chg),
            f AS (SELECT n1, n2, runs,
                    CAST(n1 AS DOUBLE) AS d1, CAST(n2 AS DOUBLE) AS d2,
                    CAST(n1 + n2 AS DOUBLE) AS dn,
                    CAST(runs AS DOUBLE) AS dr
                  FROM agg)
         SELECT n1, n2, runs,
                (dr - (1.0 + 2.0 * d1 * d2 / dn))
                  / sqrt((1.0 + 2.0 * d1 * d2 / dn - 1.0)
                       * (1.0 + 2.0 * d1 * d2 / dn - 2.0) / (dn - 1.0)) AS z
         FROM f""",

    "q_llm_char_stats" ->
      """WITH x AS (SELECT doc_id, CAST(len(text) AS INTEGER) AS n_chars,
                    CAST(len(text) - len(regexp_replace(text, '[a-zA-Z]',
                         '', 'g')) AS INTEGER) AS n_alpha,
                    CAST(len(text) - len(regexp_replace(text, '[0-9]',
                         '', 'g')) AS INTEGER) AS n_digit,
                    CAST(len(text) - len(replace(text, ' ', ''))
                         AS INTEGER) AS n_space
                 FROM documents)
         SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
                n_chars - n_alpha - n_digit - n_space AS n_other,
                CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE)
                  AS alpha_ratio
         FROM x ORDER BY doc_id""",

    "q_llm_char_ngrams" ->
      """SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM (SELECT substr(text, CAST(i AS INTEGER), 2) AS gram
               FROM (SELECT text,
                       unnest(generate_series(1, len(text) - 1)) AS i
                     FROM documents) t)
         GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""",

    "q_agg_geomean" ->
      """WITH x AS (SELECT o_orderstatus,
                    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) AS cents
                 FROM orders),
            g AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(round(log2(CAST(cents AS DOUBLE))
                         * 1000000, 0) AS BIGINT)) AS BIGINT) AS micro_log2
                  FROM x GROUP BY 1)
         SELECT o_orderstatus, n, micro_log2,
                round(pow(2.0, CAST(micro_log2 AS DOUBLE) / 1000000.0
                       / CAST(n AS DOUBLE)) / 100.0, 6) AS geomean
         FROM g ORDER BY o_orderstatus""",

    "q_llm_source_overlap" ->
      """WITH vocab AS (SELECT DISTINCT source,
                        unnest(string_split(text, ' ')) AS w
                      FROM documents),
            sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
                   FROM vocab GROUP BY 1),
            pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                        CAST(COUNT(*) AS BIGINT) AS inter
                      FROM vocab a JOIN vocab b
                        ON a.w = b.w AND a.source < b.source
                      GROUP BY 1, 2)
         SELECT p.src_a, p.src_b, p.inter,
                sa.nv + sb.nv - p.inter AS uni,
                CAST(p.inter AS DOUBLE)
                  / CAST(sa.nv + sb.nv - p.inter AS DOUBLE) AS jaccard
         FROM pairs p
         JOIN sz sa ON sa.source = p.src_a
         JOIN sz sb ON sb.source = p.src_b
         ORDER BY p.src_a, p.src_b"""
  )
}
