package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Tables}

/** Round-9 additions, part 3: decile (ntile) segmentation, vocabulary
  * pruning, skip-gram co-occurrence counting, and purchase-cycle gaps.
  *
  * Same determinism contract as every family: exact integers everywhere
  * an aggregate folds, one shared IEEE tail per emitted float, every
  * window ordered with a unique tie-breaker.
  */
object Extras40 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NTILE DECILES — customers split into 10 revenue deciles (the last
    // un-exercised SQL window function in the surface), then per-decile
    // size/total/floor. ntile's bucket arithmetic is part of the SQL
    // standard (both engines: floor semantics with the first n mod 10
    // buckets one larger), and the (cents desc, custkey) order is total,
    // so bucket membership is engine-exact. Customer-grain window —
    // dimension-sized at any fact volume.
    "q_win_ntile" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val w = Window.orderBy(col("cents").desc, col("o_custkey"))
      rev.withColumn("decile", ntile(10).over(w))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("cents")).as("total_cents"),
          min(col("cents")).as("floor_cents"),
          max(col("cents")).as("ceil_cents"))
        .orderBy("decile")
    }),

    // VOCABULARY PRUNING — the min-df/max-df token filter every bag-of-
    // words pipeline starts with: document frequency per token, keep
    // 5 ≤ df ≤ 0.9·n_docs (rare-word floor, 90% stopword ceiling),
    // report the survivors ranked by df. The df relation is
    // vocabulary-sized (not corpus-sized); the corpus pass is one
    // explode + distinct + count; the bound compare is pure integers.
    "q_llm_vocab_prune" -> ((s, d) => {
      val df = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      df.crossJoin(broadcast(n))
        .where(col("df") >= 5 && col("df") * 10 <= col("n_docs") * 9)
        .select(col("w"), col("df"), col("n_docs"))
        .orderBy(col("df").desc, col("w"))
        .limit(100)
    }),

    // SKIP-GRAM CO-OCCURRENCE — (center, context) pair counts at window
    // offsets 1..2, the word2vec/GloVe matrix builder. Pair generation
    // is a PURE per-row projection (two zipped slices of the token
    // array — no self-join, no explode-then-join); one aggregate over
    // the pair key space; top-100 of the bounded vocabulary² relation.
    "q_llm_skipgram" -> ((s, d) => {
      val ws = split(col("text"), " ")
      def pairsAt(k: Int) = zip_with(
        slice(ws, lit(1), greatest(size(ws) - k, lit(0))),
        slice(ws, lit(1 + k), greatest(size(ws) - k, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      Tables.documents(s, d)
        .select(explode(concat(pairsAt(1), pairsAt(2))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(100)
    }),

    // PURCHASE CYCLE — days between a customer's consecutive orders
    // (repeat-purchase cadence; the orders-table sibling of the events
    // inter-event gaps). Per-customer lag over one custkey shuffle;
    // integer day gaps summed exactly; the mean is one IEEE division.
    // Only repeat customers (>= 2 orders) emit.
    "q_evt_purchase_cycle" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("dt"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("dt"))
        .withColumn("gap", datediff(col("dt"),
          lag(col("dt"), 1).over(w)).cast("long"))
        .where(col("gap").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sum_gap_days"),
          max(col("gap")).as("max_gap_days"))
        .select(col("o_custkey"), col("n_gaps"), col("sum_gap_days"),
          col("max_gap_days"),
          (col("sum_gap_days").cast("double")
            / col("n_gaps").cast("double")).as("mean_gap_days"))
        .orderBy("o_custkey")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_win_ntile" ->
      """WITH rev AS (SELECT o_custkey,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
            t AS (SELECT cents,
                    ntile(10) OVER (ORDER BY cents DESC, o_custkey)
                      AS decile
                  FROM rev)
         SELECT CAST(decile AS INT) AS decile,
                CAST(COUNT(*) AS BIGINT) AS n_cust,
                CAST(SUM(cents) AS BIGINT) AS total_cents,
                MIN(cents) AS floor_cents, MAX(cents) AS ceil_cents
         FROM t GROUP BY 1 ORDER BY 1""",

    "q_llm_vocab_prune" ->
      """WITH df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df
                     FROM (SELECT DISTINCT doc_id,
                             unnest(string_split(text, ' ')) AS w
                           FROM documents) t
                     GROUP BY w),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         SELECT w, df, n_docs FROM df, n
         WHERE df >= 5 AND df * 10 <= n_docs * 9
         ORDER BY df DESC, w LIMIT 100""",

    "q_llm_skipgram" ->
      """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
            p AS (SELECT w[i] AS w1, w[i + k] AS w2
                  FROM (SELECT w, unnest(generate_series(1, len(w))) AS i
                        FROM ws) t,
                       (SELECT 1 AS k UNION ALL SELECT 2) ks
                  WHERE i + k <= len(w))
         SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM p GROUP BY 1, 2
         ORDER BY cnt DESC, w1, w2 LIMIT 100""",

    "q_evt_purchase_cycle" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
                      CAST(o_orderdate AS DATE) AS dt
                    FROM orders),
            g AS (SELECT o_custkey,
                    datediff('day',
                      lag(dt) OVER (PARTITION BY o_custkey
                                    ORDER BY dt, o_orderkey), dt) AS gap
                  FROM o),
            f AS (SELECT o_custkey, CAST(gap AS BIGINT) AS gap
                  FROM g WHERE gap IS NOT NULL)
         SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
                MAX(gap) AS max_gap_days,
                CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_days
         FROM f GROUP BY 1 ORDER BY 1"""
  )
}
