package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-13 additions, part 7: model-evaluation + SQL-surface
  * round-out — smoothed log loss, a fairness/parity audit (the
  * bias-audit readout a training-data pipeline runs per protected
  * cohort), per-fold cross-validated AUC, positional (zip) join,
  * DISTINCT ON, and a key-density audit.
  *
  * Scale shape: the three ML keys fold the fact table once into the
  * ≤11-value discount spine (per fold / per group — the Extras108
  * convention); the fairness groups arrive via BROADCAST dim joins
  * (supplier → nation); positional/distinct-on are one window pass
  * each; the density audit is three count/min/max folds (the
  * distinct-count is the only shuffle).
  *
  * Determinism contract (SURVEY §2.13): all counts exact BIGINT;
  * midranks doubled-integer (Extras98/108 discipline); the smoothed
  * log-loss per-bin term is ONE shared double tree nano-quantized
  * before the cross-bin sum; every emitted rate is one IEEE division
  * + r6 on both engines.
  */
object Extras153 {
  import graft.Det._

  private val Big = DecimalType(38, 0)

  /** (fold, score-bp, label) base for the CV spine. */
  private def cvBase(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_returnflag").isin("R", "N"))
      .select((col("l_orderkey") % 5).as("fold"),
        (dec(col("l_discount")) * 100).cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SMOOTHED LOG LOSS — binary cross-entropy of the Laplace-
    // smoothed per-bin empirical predictor p_v=(c1+1)/(n+2) (the
    // add-one prior keeps every ln argument in (0,1) even on a pure
    // bin, so the metric exists at every SF). Per-bin term is one
    // shared ln tree, nano-quantized before the ≤11-bin fold.
    "q_ml_log_loss" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .select((dec(col("l_discount")) * 100).cast("long").as("v"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("c1"))
      val p = (col("c1") + 1).cast("double") / (col("n") + 2).cast("double")
      per
        .select(col("n"), round((-(col("c1").cast("double") * log(p)
            + (col("n") - col("c1")).cast("double") * log(lit(1.0) - p)))
            * 1e9).cast("long").as("t_nano"))
        .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("bins"),
          sum(col("t_nano")).as("sn"))
        .select(col("n_rows"), col("bins"),
          r6(col("sn").cast("double") / 1e9
            / col("n_rows").cast("double")).as("log_loss"))
    }),

    // FAIRNESS / PARITY AUDIT — the classifier of q_ml_confusion
    // (predict "returned" when discount ≥ 6 bp) audited per supplier
    // nation: positive-prediction rate (demographic parity), TPR and
    // FPR (equalized odds), and each group's absolute gap to the
    // overall rate. Groups arrive via two broadcast dim joins.
    "q_ml_fairness_parity" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .where(col("l_returnflag").isin("R", "N"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("grp"),
          ((dec(col("l_discount")) * 100).cast("long") >= 6)
            .cast("long").as("yh"),
          (col("l_returnflag") === "R").cast("long").as("y"))
      def cells(df: org.apache.spark.sql.RelationalGroupedDataset) = df.agg(
        count(lit(1)).as("n"), sum(col("yh")).as("pp"),
        sum(col("yh") * col("y")).as("tp"),
        sum((lit(1) - col("yh")) * col("y")).as("fn"),
        sum(col("yh") * (lit(1) - col("y"))).as("fp"),
        sum((lit(1) - col("yh")) * (lit(1) - col("y"))).as("tn"))
      val g = cells(base.groupBy(col("grp")))
      val tot = cells(base.groupBy())
        .select(
          (col("pp").cast("double") / col("n").cast("double"))
            .as("all_ppr"),
          when(col("tp") + col("fn") > 0, col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double")).as("all_tpr"),
          when(col("fp") + col("tn") > 0, col("fp").cast("double")
            / (col("fp") + col("tn")).cast("double")).as("all_fpr"))
      // single-class guards (round-13 advice): a group with no actual
      // positives (tp+fn = 0) or no actual negatives (fp+tn = 0) emits
      // NULL on both engines (when() here, NULLIF in the oracle)
      // instead of the engine-dependent 0/0 — Spark NaN vs DuckDB's
      // ieee_floating_point_ops-dependent behavior.
      val ppr = col("pp").cast("double") / col("n").cast("double")
      val tpr = when(col("tp") + col("fn") > 0, col("tp").cast("double")
        / (col("tp") + col("fn")).cast("double"))
      val fpr = when(col("fp") + col("tn") > 0, col("fp").cast("double")
        / (col("fp") + col("tn")).cast("double"))
      g.crossJoin(broadcast(tot))
        .select(col("grp"), col("n"),
          r6(ppr).as("pos_rate"), r6(tpr).as("tpr"), r6(fpr).as("fpr"),
          r6(abs(ppr - col("all_ppr"))).as("dp_gap"),
          r6(abs(tpr - col("all_tpr"))).as("tpr_gap"),
          r6(abs(fpr - col("all_fpr"))).as("fpr_gap"))
        .orderBy(col("grp"))
    }),

    // PER-FOLD CV AUC — deterministic 5-fold split (orderkey mod 5),
    // tie-aware midrank ROC AUC inside each fold (the q_ml_roc_auc
    // identity with the spine PARTITIONED by fold).
    "q_ml_cv_auc" -> ((s, d) => {
      val per = cvBase(s, d).groupBy(col("fold"), col("v"))
        .agg(sum(col("y")).as("c1"), sum(lit(1) - col("y")).as("c0"))
      val w = Window.partitionBy(col("fold")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sp = per
        .withColumn("cb1", sum(col("c1")).over(w) - col("c1"))
        .withColumn("cb0", sum(col("c0")).over(w) - col("c0"))
        .withColumn("m2",
          lit(2) * (col("cb1") + col("cb0")) + col("c1") + col("c0") + 1)
      val m = sp.groupBy(col("fold"))
        .agg(sum(col("c1")).as("n_pos"), sum(col("c0")).as("n_neg"),
          sum(col("c1").cast(Big) * col("m2").cast(Big)).as("t1"))
      val n1 = col("n_pos").cast(Big)
      val num = (col("t1") - n1 * (col("n_pos") + 1).cast(Big))
        .cast("double")
      // single-class fold guard (round-13 advice): n_pos*n_neg = 0
      // emits NULL on both engines instead of divergent 0/0.
      m.select(col("fold"), col("n_pos"), col("n_neg"),
          r6(when(col("n_pos") > 0 && col("n_neg") > 0, num / 2 /
            (n1 * col("n_neg").cast(Big)).cast("double"))).as("auc"))
        .orderBy(col("fold"))
    }),

    // POSITIONAL (ZIP) JOIN — align two independently ordered
    // relations by row position (DuckDB's POSITIONAL JOIN surface):
    // top-10 customers by balance zipped against top-10 suppliers by
    // balance; emits the rank-aligned pair + combined balance cents.
    "q_join_positional" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_name"),
          (dec(col("c_acctbal")) * 100).cast("long").as("cc"))
        .withColumn("pos", row_number().over(
          Window.orderBy(col("cc").desc, col("c_name"))))
        .where(col("pos") <= 10)
      val sup = Tables.supplier(s, d)
        .select(col("s_name"),
          (dec(col("s_acctbal")) * 100).cast("long").as("sc"))
        .withColumn("pos", row_number().over(
          Window.orderBy(col("sc").desc, col("s_name"))))
        .where(col("pos") <= 10)
      c.join(sup, "pos")
        .select(col("pos").cast("long").as("pos"), col("c_name"),
          col("s_name"), (col("cc") + col("sc")).as("combined_cents"))
        .orderBy(col("pos"))
    }),

    // DISTINCT ON — each nation's top customer by balance (DuckDB's
    // DISTINCT ON (expr) … ORDER BY surface; Spark expresses it as
    // the row_number()=1 idiom the optimizer turns into a partial
    // top-1 per key).
    "q_sql_distinct_on" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_name"),
          (dec(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("c_nationkey"))
            .orderBy(col("bal_cents").desc, col("c_custkey"))))
        .where(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey"), col("c_name"),
          col("bal_cents"))
        .orderBy(col("c_nationkey"))
    }),

    // KEY-DENSITY AUDIT — completeness of three id spaces (orders,
    // events, part-references): n rows, distinct keys, min/max, and
    // the missing count (max−min+1−distinct). The distinct-count is
    // the only shuffle; everything else is a map-side fold.
    "q_dq_key_density" -> ((s, d) => {
      def audit(df: DataFrame, rel: String, key: String): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(key)).as("n_keys"),
            min(col(key)).cast("long").as("key_min"),
            max(col(key)).cast("long").as("key_max"))
          .select(lit(rel).as("relation"), lit(key).as("key_col"),
            col("n_rows"), col("n_keys"), col("key_min"), col("key_max"),
            (col("key_max") - col("key_min") + 1 - col("n_keys"))
              .as("missing"))
      audit(Tables.orders(s, d), "orders", "o_orderkey")
        .unionByName(audit(Tables.events(s, d), "events", "event_id"))
        .unionByName(audit(Tables.lineitem(s, d), "lineitem", "l_partkey"))
        .orderBy(col("relation"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ml_log_loss" ->
      """WITH per AS (SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v,
                      COUNT(*) AS n,
                      SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS c1
                    FROM lineitem WHERE l_returnflag IN ('R','N')
                    GROUP BY 1),
            t AS (SELECT n, CAST(round((-(CAST(c1 AS DOUBLE)
                      * ln((CAST(c1 AS DOUBLE) + 1) / (CAST(n AS DOUBLE) + 2))
                      + CAST(n - c1 AS DOUBLE)
                      * ln(1.0 - (CAST(c1 AS DOUBLE) + 1)
                           / (CAST(n AS DOUBLE) + 2)))) * 1e9)
                    AS BIGINT) AS t_nano
                  FROM per)
         SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                CAST(COUNT(*) AS BIGINT) AS bins,
                round(CAST(SUM(t_nano) AS DOUBLE) / 1e9
                      / CAST(SUM(n) AS DOUBLE), 6) AS log_loss
         FROM t""",

    "q_ml_fairness_parity" ->
      """WITH base AS (SELECT n.n_name AS grp,
                      CASE WHEN CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT) >= 6 THEN 1 ELSE 0 END AS yh,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                    FROM lineitem l
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    WHERE l_returnflag IN ('R','N')),
            g AS (SELECT grp, COUNT(*) AS n, SUM(yh) AS pp,
                    SUM(yh * y) AS tp, SUM((1 - yh) * y) AS fn,
                    SUM(yh * (1 - y)) AS fp,
                    SUM((1 - yh) * (1 - y)) AS tn
                  FROM base GROUP BY 1),
            tot AS (SELECT
                    CAST(SUM(yh) AS DOUBLE) / COUNT(*) AS all_ppr,
                    CAST(SUM(yh * y) AS DOUBLE)
                      / NULLIF(SUM(yh * y) + SUM((1 - yh) * y), 0)
                      AS all_tpr,
                    CAST(SUM(yh * (1 - y)) AS DOUBLE)
                      / NULLIF(SUM(yh * (1 - y)) + SUM((1 - yh) * (1 - y)),
                               0)
                      AS all_fpr
                  FROM base)
         SELECT grp, CAST(n AS BIGINT) AS n,
                round(CAST(pp AS DOUBLE) / n, 6) AS pos_rate,
                round(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS tpr,
                round(CAST(fp AS DOUBLE) / NULLIF(fp + tn, 0), 6) AS fpr,
                round(abs(CAST(pp AS DOUBLE) / n - all_ppr), 6) AS dp_gap,
                round(abs(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0)
                  - all_tpr), 6) AS tpr_gap,
                round(abs(CAST(fp AS DOUBLE) / NULLIF(fp + tn, 0)
                  - all_fpr), 6) AS fpr_gap
         FROM g, tot ORDER BY grp""",

    "q_ml_cv_auc" ->
      """WITH base AS (SELECT l_orderkey % 5 AS fold,
                      CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                    FROM lineitem WHERE l_returnflag IN ('R','N')),
            per AS (SELECT fold, v, SUM(y) AS c1, SUM(1 - y) AS c0
                    FROM base GROUP BY 1, 2),
            sp AS (SELECT fold, c1, c0,
                     SUM(c1) OVER (PARTITION BY fold ORDER BY v
                       ROWS UNBOUNDED PRECEDING) - c1 AS cb1,
                     SUM(c0) OVER (PARTITION BY fold ORDER BY v
                       ROWS UNBOUNDED PRECEDING) - c0 AS cb0
                   FROM per),
            m AS (SELECT fold, SUM(c1) AS n_pos, SUM(c0) AS n_neg,
                    SUM(CAST(c1 AS DECIMAL(38,0))
                      * CAST(2 * (cb1 + cb0) + c1 + c0 + 1
                             AS DECIMAL(38,0))) AS t1
                  FROM sp GROUP BY 1)
         SELECT CAST(fold AS BIGINT) AS fold,
                CAST(n_pos AS BIGINT) AS n_pos,
                CAST(n_neg AS BIGINT) AS n_neg,
                round(CAST(t1 - CAST(n_pos AS DECIMAL(38,0))
                    * CAST(n_pos + 1 AS DECIMAL(38,0)) AS DOUBLE) / 2
                  / CAST(NULLIF(CAST(n_pos AS DECIMAL(38,0))
                    * CAST(n_neg AS DECIMAL(38,0)), 0) AS DOUBLE), 6)
                  AS auc
         FROM m ORDER BY fold""",

    "q_join_positional" ->
      """WITH c AS (SELECT c_name,
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cc,
                      row_number() OVER (ORDER BY
                        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT) DESC, c_name) AS pos
                    FROM customer),
            s AS (SELECT s_name,
                      CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS sc,
                      row_number() OVER (ORDER BY
                        CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT) DESC, s_name) AS pos
                    FROM supplier)
         SELECT CAST(c.pos AS BIGINT) AS pos, c.c_name, s.s_name,
                c.cc + s.sc AS combined_cents
         FROM c JOIN s ON c.pos = s.pos
         WHERE c.pos <= 10 AND s.pos <= 10
         ORDER BY pos""",

    "q_sql_distinct_on" ->
      """SELECT DISTINCT ON (c_nationkey)
                c_nationkey, c_custkey, c_name,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS bal_cents
         FROM customer
         ORDER BY c_nationkey,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    DESC, c_custkey""",

    "q_dq_key_density" ->
      """SELECT * FROM (
           SELECT 'orders' AS relation, 'o_orderkey' AS key_col,
                  COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys,
                  CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
                  CAST(MAX(o_orderkey) AS BIGINT) AS key_max,
                  MAX(o_orderkey) - MIN(o_orderkey) + 1
                    - COUNT(DISTINCT o_orderkey) AS missing
           FROM orders
           UNION ALL
           SELECT 'events', 'event_id', COUNT(*),
                  COUNT(DISTINCT event_id),
                  CAST(MIN(event_id) AS BIGINT),
                  CAST(MAX(event_id) AS BIGINT),
                  MAX(event_id) - MIN(event_id) + 1
                    - COUNT(DISTINCT event_id)
           FROM events
           UNION ALL
           SELECT 'lineitem', 'l_partkey', COUNT(*),
                  COUNT(DISTINCT l_partkey),
                  CAST(MIN(l_partkey) AS BIGINT),
                  CAST(MAX(l_partkey) AS BIGINT),
                  MAX(l_partkey) - MIN(l_partkey) + 1
                    - COUNT(DISTINCT l_partkey)
           FROM lineitem) t ORDER BY relation"""
  )
}
