package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-11 additions, part 16: corpus + econometrics round-out —
  * RAKE keyword extraction over the documents corpus, Engle-Granger
  * cointegration between the order and shipment revenue series,
  * run-length distribution of daily up/down moves, a k-anonymity
  * profile of the customer quasi-identifier, and Jensen-Shannon
  * divergence between the two largest sources' unigram distributions.
  *
  * Determinism contract (SURVEY §2.13): RAKE word scores and the JSD
  * per-word terms are micro-quantized longs (the bigram_entropy
  * discipline) so cross-row sums stay exact; the cointegration
  * residuals quantize to milli-cents before the exact-integer DF fold;
  * run lengths and k-anonymity classes are pure integer combinatorics.
  */
object Extras90 {
  import Det._

  private val Big = DecimalType(38, 0)

  private val Stops = Seq("a", "the", "and", "of", "to", "in", "is", "it")

  /** Daily revenue spine from orders (cents). */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RAKE — phrases are maximal stopword-free token runs (capped at 4
    // words); word score = degree/frequency over kept-phrase members,
    // micro-quantized ×1e6; phrase score = exact Σ of member word
    // scores. Top-20 by (score DESC, phrase). Everything is one
    // explode + windows PARTITIONED BY doc + bounded grouping —
    // corpus-linear.
    "q_llm_rake" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("idx", "w")))
        .withColumn("brk",
          col("w").isin(Stops.map(lit(_)): _*) || col("w") === "")
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val members = tok
        .withColumn("pid", sum(col("brk").cast("long")).over(wd))
        .where(!col("brk"))
        .select(col("doc_id"), col("pid"), col("idx").cast("long").as("idx"),
          col("w"))
      val ph = members.groupBy(col("doc_id"), col("pid"))
        .agg(count(lit(1)).as("len"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("idx"), col("w")))),
            x => x.getField("w"))).as("phrase"))
        .where(col("len") <= 4)
      val memk = members.join(
        ph.select(col("doc_id"), col("pid"), col("len")),
        Seq("doc_id", "pid"))
      val wstat = memk.groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
        .select(col("w"), round(col("deg").cast("double")
          / col("freq").cast("double") * 1e6).cast("long").as("wscore"))
      val pscore = memk.join(wstat, Seq("w"))
        .groupBy(col("doc_id"), col("pid"))
        .agg(sum(col("wscore")).as("score"))
      ph.join(pscore, Seq("doc_id", "pid"))
        .groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occ"), max(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("phrase"))
        .limit(20)
    }),

    // ENGLE-GRANGER — cointegration of daily order revenue (y) vs
    // daily shipment revenue (x): OLS y = a + b·x from exact moments,
    // residuals micro-quantized to milli-cents, then the
    // Dickey-Fuller t on the residual series via the exact-integer
    // fold (the q_ts_dickey_fuller shape).
    "q_ts_engle_granger" -> ((s, d) => {
      val ship = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("dt"))
        .agg(sum((dec(col("l_extendedprice")) * 100).cast("long")).as("x"))
      val sp = daily(s, d).join(ship, Seq("dt"))
      val m = sp.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(Big) * col("x").cast(Big)).as("sxx"),
        sum(col("x").cast(Big) * col("y").cast(Big)).as("sxy"))
      val nD = col("n").cast("double")
      val b = (col("n").cast(Big) * col("sxy")
        - col("sx").cast(Big) * col("sy").cast(Big)).cast("double") /
        (col("n").cast(Big) * col("sxx")
          - col("sx").cast(Big) * col("sx").cast(Big)).cast("double")
      val aInt = (col("sy").cast("double") - b * col("sx").cast("double")) / nD
      val res = sp.crossJoin(broadcast(m.select(col("n"), b.as("beta"),
          aInt.as("alpha"))))
        .select(col("dt"), col("n"), col("beta"), col("alpha"),
          round((col("y").cast("double") - col("alpha")
            - col("beta") * col("x").cast("double")) * 1e3)
            .cast("long").as("q"))
      val w = Window.orderBy(col("dt"))
      val df = res
        .withColumn("q1", lag(col("q"), 1).over(w))
        .where(col("q1").isNotNull)
        .select((col("q") - col("q1")).as("dq"), col("q1"),
          col("n"), col("beta"), col("alpha"))
      val a2 = df.agg(max(col("n")).as("n_days"),
        max(col("beta")).as("beta"), max(col("alpha")).as("alpha"),
        count(lit(1)).as("m"),
        sum(col("dq").cast(Big)).cast("double").as("sdy"),
        sum(col("q1").cast(Big)).cast("double").as("s1"),
        sum(col("dq").cast(Big) * col("dq").cast(Big)).cast("double").as("sdd"),
        sum(col("q1").cast(Big) * col("q1").cast(Big)).cast("double").as("s11"),
        sum(col("dq").cast(Big) * col("q1").cast(Big)).cast("double").as("sd1"))
      val mD = col("m").cast("double")
      val sxx2 = col("s11") - col("s1") * col("s1") / mD
      val sxy2 = col("sd1") - col("sdy") * col("s1") / mD
      val syy2 = col("sdd") - col("sdy") * col("sdy") / mD
      val g = sxy2 / sxx2
      val ssr = syy2 - g * sxy2
      a2.select(col("n_days"), r6(col("beta")).as("beta"),
        r6(col("alpha") / 100).as("alpha_dollars"),
        r6(g).as("gamma"),
        r6(g / sqrt((ssr / (mD - lit(2.0))) / sxx2)).as("t_eg"))
    }),

    // RUN-LENGTH DISTRIBUTION — daily up/down moves (zero moves
    // dropped, sequence re-indexed), classic gaps-and-islands
    // (rn − rn-within-direction), runs grouped by (direction, length).
    "q_ts_run_length_dist" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val moves = daily(s, d)
        .withColumn("dy", col("y") - lag(col("y"), 1).over(w))
        .where(col("dy").isNotNull && col("dy") =!= 0)
        .withColumn("dir", when(col("dy") > 0, "up").otherwise("down"))
        .withColumn("rn", row_number().over(Window.orderBy(col("dt"))))
      val runs = moves
        .withColumn("grp", col("rn") - row_number().over(
          Window.partitionBy(col("dir")).orderBy(col("rn"))))
        .groupBy(col("dir"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
      runs.groupBy(col("dir"), col("run_len"))
        .agg(count(lit(1)).as("n_runs"))
        .orderBy(col("dir"), col("run_len"))
    }),

    // K-ANONYMITY PROFILE — quasi-identifier (mktsegment, nationkey,
    // acctbal-thousand-bucket) over customers: equivalence-class
    // sizes, the minimum k, and the population share living in
    // classes below k=5 — the privacy screen a training-data export
    // runs before release. Pure integer combinatorics.
    "q_dq_k_anonymity" -> ((s, d) => {
      val cls = Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 100000").as("bal_k"))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_k"))
        .agg(count(lit(1)).as("sz"))
      cls.agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          min(col("sz")).as("k_min"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("below5"))
        .select(col("n_classes"), col("n_rows"), col("k_min"),
          col("below5").as("n_below_k5"),
          r6(col("below5").cast("double") / col("n_rows").cast("double"))
            .as("share_below_k5"))
    }),

    // JENSEN-SHANNON DIVERGENCE — between the two largest sources'
    // unigram distributions: per-word terms from exact counts
    // (0·ln 0 = 0 by CASE), micro-quantized ×1e9 and summed as exact
    // longs (the bigram_entropy discipline); JSD = Σ/1e9.
    "q_llm_js_sources" -> ((s, d) => {
      val bySrc = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("nd"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("nd").desc, col("source"))))
      val top2 = bySrc.where(col("rk") <= 2)
        .agg(max(when(col("rk") === 1, col("source"))).as("s1"),
          max(when(col("rk") === 2, col("source"))).as("s2"))
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
      val cnt = tok.crossJoin(broadcast(top2))
        .where(col("source") === col("s1") || col("source") === col("s2"))
        .groupBy(col("w"))
        .agg(sum((col("source") === col("s1")).cast("long")).as("c1"),
          sum((col("source") === col("s2")).cast("long")).as("c2"))
      val tot = cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val p = col("c1").cast("double") / col("n1").cast("double")
      val q2 = col("c2").cast("double") / col("n2").cast("double")
      val mm = (p + q2) / 2
      val term = when(col("c1") > 0, p * log(p / mm)).otherwise(lit(0.0)) +
        when(col("c2") > 0, q2 * log(q2 / mm)).otherwise(lit(0.0))
      val agg2 = cnt.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          round(term * lit(0.5) * 1e9).cast("long").as("t_micro"))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          count(lit(1)).as("n_words"), sum(col("t_micro")).as("sm"))
      agg2.crossJoin(broadcast(top2))
        .select(col("s1").as("source1"), col("s2").as("source2"),
          col("n1").as("n_tokens1"), col("n2").as("n_tokens2"),
          col("n_words"),
          r6(col("sm").cast("double") / 1e9).as("jsd"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_llm_rake" -> {
      val stopsSql = Stops.map("'" + _ + "'").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, i AS idx, ws[i] AS w,
                    (ws[i] IN ($stopsSql) OR ws[i] = '') AS brk
                  FROM (SELECT doc_id, string_split(text, ' ') AS ws
                        FROM documents) t,
                    unnest(generate_series(1, len(ws))) u(i)),
            mem AS (SELECT doc_id, CAST(idx AS BIGINT) AS idx, w,
                      SUM(CASE WHEN brk THEN 1 ELSE 0 END) OVER
                        (PARTITION BY doc_id ORDER BY idx ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
                    FROM tok
                    QUALIFY NOT brk),
            ph AS (SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len,
                     string_agg(w, ' ' ORDER BY idx) AS phrase
                   FROM mem GROUP BY 1, 2 HAVING COUNT(*) <= 4),
            memk AS (SELECT mem.doc_id, mem.pid, mem.w, ph.len
                     FROM mem JOIN ph USING (doc_id, pid)),
            wstat AS (SELECT w,
                        CAST(round(CAST(SUM(len) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT)
                          AS wscore
                      FROM memk GROUP BY 1),
            ps AS (SELECT doc_id, pid,
                     CAST(SUM(wscore) AS BIGINT) AS score
                   FROM memk JOIN wstat USING (w) GROUP BY 1, 2)
         SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
                CAST(MAX(score) AS BIGINT) AS score_micro
         FROM ph JOIN ps USING (doc_id, pid)
         GROUP BY 1 ORDER BY score_micro DESC, phrase LIMIT 20"""
    },

    "q_ts_engle_granger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            ship AS (SELECT CAST(l_shipdate AS DATE) AS dt,
                       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * 100 AS BIGINT)) AS BIGINT) AS x
                     FROM lineitem GROUP BY 1),
            sp AS (SELECT daily.dt, y, x FROM daily JOIN ship USING (dt)),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(x) AS BIGINT) AS sx,
                    CAST(SUM(y) AS BIGINT) AS sy,
                    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
                  FROM sp),
            ab AS (SELECT n,
                     CAST(CAST(n AS HUGEINT) * sxy
                         - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
                       AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                       AS DOUBLE) AS beta,
                     sx, sy FROM m),
            ab2 AS (SELECT n, beta,
                      (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE) AS alpha
                    FROM ab),
            res AS (SELECT dt, n, beta, alpha,
                      CAST(round((CAST(y AS DOUBLE) - alpha
                        - beta * CAST(x AS DOUBLE)) * 1e3) AS BIGINT) AS q
                    FROM sp, ab2),
            df AS (SELECT q - q1 AS dq, q1, n, beta, alpha FROM (
                   SELECT q, lag(q, 1) OVER (ORDER BY dt) AS q1,
                          n, beta, alpha
                   FROM res) WHERE q1 IS NOT NULL),
            a2 AS (SELECT MAX(n) AS n_days, MAX(beta) AS beta,
                     MAX(alpha) AS alpha,
                     CAST(COUNT(*) AS BIGINT) AS m,
                     CAST(SUM(CAST(dq AS HUGEINT)) AS DOUBLE) AS sdy,
                     CAST(SUM(CAST(q1 AS HUGEINT)) AS DOUBLE) AS s1,
                     CAST(SUM(CAST(dq AS HUGEINT) * CAST(dq AS HUGEINT))
                       AS DOUBLE) AS sdd,
                     CAST(SUM(CAST(q1 AS HUGEINT) * CAST(q1 AS HUGEINT))
                       AS DOUBLE) AS s11,
                     CAST(SUM(CAST(dq AS HUGEINT) * CAST(q1 AS HUGEINT))
                       AS DOUBLE) AS sd1
                   FROM df),
            e AS (SELECT n_days, beta, alpha, m, sdy, s1, sdd, s11, sd1,
                    s11 - s1 * s1 / CAST(m AS DOUBLE) AS sxx2,
                    sd1 - sdy * s1 / CAST(m AS DOUBLE) AS sxy2,
                    sdd - sdy * sdy / CAST(m AS DOUBLE) AS syy2
                  FROM a2)
         SELECT n_days, round(beta, 6) AS beta,
                round(alpha / 100, 6) AS alpha_dollars,
                round(sxy2 / sxx2, 6) AS gamma,
                round((sxy2 / sxx2)
                  / sqrt(((syy2 - (sxy2 / sxx2) * sxy2)
                      / (CAST(m AS DOUBLE) - 2.0)) / sxx2), 6) AS t_eg
         FROM e""",

    "q_ts_run_length_dist" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            mv AS (SELECT dt, y - lag(y, 1) OVER (ORDER BY dt) AS dy
                   FROM daily),
            moves AS (SELECT dt,
                        CASE WHEN dy > 0 THEN 'up' ELSE 'down' END AS dir,
                        row_number() OVER (ORDER BY dt) AS rn
                      FROM mv WHERE dy IS NOT NULL AND dy <> 0),
            runs AS (SELECT dir, grp, CAST(COUNT(*) AS BIGINT) AS run_len
                     FROM (SELECT dir, rn,
                             rn - row_number() OVER (PARTITION BY dir
                               ORDER BY rn) AS grp
                           FROM moves)
                     GROUP BY 1, 2)
         SELECT dir, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
         FROM runs GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_dq_k_anonymity" ->
      """WITH cls AS (SELECT c_mktsegment, c_nationkey,
                    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                      // 100000 AS bal_k,
                    CAST(COUNT(*) AS BIGINT) AS sz
                 FROM customer GROUP BY 1, 2, 3)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
                CAST(SUM(sz) AS BIGINT) AS n_rows,
                CAST(MIN(sz) AS BIGINT) AS k_min,
                CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                  AS n_below_k5,
                round(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END)
                    AS DOUBLE) / CAST(SUM(sz) AS DOUBLE), 6)
                  AS share_below_k5
         FROM cls""",

    "q_llm_js_sources" ->
      """WITH bysrc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
                 FROM documents GROUP BY 1),
            rk AS (SELECT source, row_number() OVER
                     (ORDER BY nd DESC, source) AS rk FROM bysrc),
            top2 AS (SELECT
                       MAX(CASE WHEN rk = 1 THEN source END) AS s1,
                       MAX(CASE WHEN rk = 2 THEN source END) AS s2
                     FROM rk WHERE rk <= 2),
            tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                    FROM documents),
            cnt AS (SELECT w,
                      CAST(SUM(CASE WHEN source = s1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c1,
                      CAST(SUM(CASE WHEN source = s2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c2
                    FROM tok, top2
                    WHERE w <> '' AND (source = s1 OR source = s2)
                    GROUP BY 1),
            tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                      CAST(SUM(c2) AS BIGINT) AS n2 FROM cnt),
            terms AS (SELECT n1, n2,
                        CAST(round((
                          CASE WHEN c1 > 0 THEN
                            (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                            * ln((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                              / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                                / 2))
                          ELSE 0.0 END
                          + CASE WHEN c2 > 0 THEN
                            (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                            * ln((CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                              / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                                / 2))
                          ELSE 0.0 END) * 0.5 * 1e9) AS BIGINT) AS t_micro
                      FROM cnt, tot),
            agg2 AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
                       CAST(COUNT(*) AS BIGINT) AS n_words,
                       CAST(SUM(t_micro) AS BIGINT) AS sm
                     FROM terms)
         SELECT s1 AS source1, s2 AS source2, n1 AS n_tokens1,
                n2 AS n_tokens2, n_words,
                round(CAST(sm AS DOUBLE) / 1e9, 6) AS jsd
         FROM agg2, top2"""
  )
}
