package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, Tables}

/** Round-10 additions, part 9: unit-root and volatility-clustering
  * diagnostics (Dickey-Fuller, Engle's ARCH LM) and T5-style span
  * corruption — the masked-span pretraining-pair builder.
  *
  * Determinism contract (SURVEY §2.13): both regressions fold exact
  * DECIMAL(38,0) sums with one IEEE tail; span selection is a portable
  * md5 predicate per 3-word block, sentinel numbering is an exact
  * positional prefix count, and the emitted texts are hashed with the
  * shared md5long so rows stay narrow and hash-safe.
  */
object Extras71 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DICKEY-FULLER — unit-root test on daily revenue: Δy_t = α +
    // β·y_{t−1} + ε; β near 0 (t ≈ 0) means a random walk, strongly
    // negative t rejects the unit root (mean reversion). β̂ and its t
    // come closed-form from exact DECIMAL(38,0) sums over the spine.
    "q_ts_dickey_fuller" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val big = DecimalType(38, 0)
      val sp = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .where(col("y1").isNotNull)
        .select((col("y") - col("y1")).as("dy"), col("y1"))
      val dyd = col("dy").cast(big)
      val y1d = col("y1").cast(big)
      val a = sp.agg(count(lit(1)).as("n"),
        sum(dyd).cast("double").as("sdy"),
        sum(y1d).cast("double").as("s1"),
        sum(dyd * dyd).cast("double").as("sdd"),
        sum(y1d * y1d).cast("double").as("s11"),
        sum(dyd * y1d).cast("double").as("sd1"))
      val nD = col("n").cast("double")
      val sxx = col("s11") - col("s1") * col("s1") / nD
      val sxy = col("sd1") - col("sdy") * col("s1") / nD
      val syy = col("sdd") - col("sdy") * col("sdy") / nD
      val beta = sxy / sxx
      val ssr = syy - beta * sxy
      a.select(col("n").as("n_days"), r6(beta).as("beta"),
        r6(beta / sqrt((ssr / (nD - lit(2.0))) / sxx)).as("t_df"))
    }),

    // ARCH LM — volatility clustering: regress today's SQUARED micro
    // log return on yesterday's; LM = n·R² ~ χ²(1) under no-ARCH.
    // Micro returns make e² exact integers; the regression folds exact
    // DECIMAL(38,0) sums (e⁴ ≈ 6e26 per row needs the headroom).
    "q_ts_arch_lm" -> ((s, d) => {
      val w = Window.orderBy(col("dt"))
      val big = DecimalType(38, 0)
      val sp = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
        .withColumn("lr", round(log(col("y").cast("double")
          / lag(col("y"), 1).over(w).cast("double")) * 1e6).cast("long"))
        .withColumn("e2", col("lr") * col("lr"))
        .withColumn("e21", lag(col("e2"), 1).over(w))
        .where(col("e21").isNotNull)
      val yd = col("e2").cast(big)
      val xd = col("e21").cast(big)
      val a = sp.agg(count(lit(1)).as("n"),
        sum(yd).cast("double").as("sy"),
        sum(xd).cast("double").as("sx"),
        sum(yd * yd).cast("double").as("syy"),
        sum(xd * xd).cast("double").as("sxx"),
        sum(yd * xd).cast("double").as("sxy"))
      val nD = col("n").cast("double")
      val cxx = col("sxx") - col("sx") * col("sx") / nD
      val cyy = col("syy") - col("sy") * col("sy") / nD
      val cxy = col("sxy") - col("sx") * col("sy") / nD
      val r2 = cxy * cxy / (cxx * cyy)
      a.select(col("n").as("n_obs"), r6(r2).as("r2"),
        r6(nD * r2).as("lm_arch"))
    }),

    // SPAN CORRUPTION — the T5/UL2 pretraining-pair builder: mask
    // aligned 3-word blocks chosen by a portable md5 predicate (~20%
    // of blocks), replace each masked RUN with <extra_id_K> in the
    // input, and build the target as K-sentinel + the masked words.
    // Span choice, sentinel numbering (positional prefix count of run
    // starts) and both output strings are engine-exact; the graded row
    // carries counts + md5long text hashes so it stays narrow. One
    // explode + two per-doc windows — corpus-linear, the 100 TB shape.
    "q_llm_span_corrupt" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val marked = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(ws))
        .select(col("doc_id"), (col("pos") + 1).as("pos"),
          col("col").as("w"))
        .withColumn("masked",
          md5long(concat(col("doc_id").cast("string"), lit(":"),
            expr("(pos - 1) div 3").cast("string"))) % 5 === 0)
        .withColumn("prev_masked",
          coalesce(lag(col("masked"), 1).over(byPos), lit(false)))
        .withColumn("runstart", col("masked") && !col("prev_masked"))
        .withColumn("kk", sum(when(col("runstart"), 1L).otherwise(0L))
          .over(byPos.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      def assemble(df: DataFrame, out: String): DataFrame =
        df.groupBy(col("doc_id"))
          .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("p"), col("o")))),
            x => x.getField("o"))).as(out))
      val corr = assemble(
        marked.where(!col("masked") || col("runstart"))
          .select(col("doc_id"), col("pos").as("p"),
            when(col("runstart"), concat(lit("<extra_id_"),
              (col("kk") - 1).cast("string"), lit(">")))
              .otherwise(col("w")).as("o")),
        "corrupted")
      val tgt = assemble(
        marked.where(col("masked"))
          .select(col("doc_id"),
            explode(when(col("runstart"), array(
              struct((col("pos") * 2).as("p"),
                concat(lit("<extra_id_"), (col("kk") - 1).cast("string"),
                  lit(">")).as("o")),
              struct((col("pos") * 2 + 1).as("p"), col("w").as("o"))))
              .otherwise(array(
                struct((col("pos") * 2 + 1).as("p"), col("w").as("o")))))
              .as("e"))
          .select(col("doc_id"), col("e.p").as("p"), col("e.o").as("o")),
        "target")
      val stats = marked.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
          sum(when(col("runstart"), 1L).otherwise(0L)).as("n_spans"))
      stats.join(corr, "doc_id").join(tgt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"), col("n_masked"),
          col("n_spans"),
          md5long(col("corrupted")).as("corrupted_h"),
          md5long(coalesce(col("target"), lit(""))).as("target_h"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_ts_dickey_fuller" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            sp AS (SELECT y - y1 AS dy, y1 FROM (
                   SELECT y, lag(y, 1) OVER (ORDER BY dt) AS y1
                   FROM daily) WHERE y1 IS NOT NULL),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(dy AS DECIMAL(38,0))) AS DOUBLE) AS sdy,
                    CAST(SUM(CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
                    CAST(SUM(CAST(dy AS DECIMAL(38,0))
                      * CAST(dy AS DECIMAL(38,0))) AS DOUBLE) AS sdd,
                    CAST(SUM(CAST(y1 AS DECIMAL(38,0))
                      * CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
                    CAST(SUM(CAST(dy AS DECIMAL(38,0))
                      * CAST(y1 AS DECIMAL(38,0))) AS DOUBLE) AS sd1
                  FROM sp),
            c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                    s11 - s1 * s1 / CAST(n AS DOUBLE) AS sxx,
                    sd1 - sdy * s1 / CAST(n AS DOUBLE) AS sxy,
                    sdd - sdy * sdy / CAST(n AS DOUBLE) AS syy
                  FROM a)
         SELECT n AS n_days, round(sxy / sxx, 6) AS beta,
                round((sxy / sxx)
                  / sqrt(((syy - (sxy / sxx) * sxy) / (nd - 2.0)) / sxx),
                  6) AS t_df
         FROM c""",

    "q_ts_arch_lm" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            r AS (SELECT dt, CAST(round(ln(CAST(y AS DOUBLE)
                      / CAST(lag(y, 1) OVER (ORDER BY dt) AS DOUBLE))
                      * 1000000) AS BIGINT) AS lr
                  FROM daily),
            ee AS (SELECT e2, lag(e2, 1) OVER (ORDER BY dt) AS e21
                   FROM (SELECT dt, lr * lr AS e2 FROM r
                         WHERE lr IS NOT NULL)),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(e2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                    CAST(SUM(CAST(e21 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                    CAST(SUM(CAST(e2 AS DECIMAL(38,0))
                      * CAST(e2 AS DECIMAL(38,0))) AS DOUBLE) AS syy,
                    CAST(SUM(CAST(e21 AS DECIMAL(38,0))
                      * CAST(e21 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                    CAST(SUM(CAST(e2 AS DECIMAL(38,0))
                      * CAST(e21 AS DECIMAL(38,0))) AS DOUBLE) AS sxy
                  FROM ee WHERE e21 IS NOT NULL),
            c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                    sxx - sx * sx / CAST(n AS DOUBLE) AS cxx,
                    syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
                    sxy - sx * sy / CAST(n AS DOUBLE) AS cxy
                  FROM a)
         SELECT n AS n_obs,
                round(cxy * cxy / (cxx * cyy), 6) AS r2,
                round(nd * (cxy * cxy / (cxx * cyy)), 6) AS lm_arch
         FROM c""",

    "q_llm_span_corrupt" ->
      """WITH toks AS (SELECT doc_id, i AS pos, ws[i] AS w
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
                      unnest(generate_series(1, len(ws))) t(i)),
            mk AS (SELECT doc_id, pos, w,
                    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                      || CAST((pos - 1) // 3 AS VARCHAR)), 1, 15))
                      AS BIGINT) % 5 = 0 AS masked
                   FROM toks),
            rs AS (SELECT doc_id, pos, w, masked,
                    masked AND NOT COALESCE(lag(masked, 1)
                      OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
                      AS runstart
                  FROM mk),
            marked AS (SELECT doc_id, pos, w, masked, runstart,
                    SUM(CASE WHEN runstart THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS kk
                  FROM rs),
            corr AS (SELECT doc_id,
                    string_agg(CASE WHEN runstart
                      THEN '<extra_id_' || CAST(kk - 1 AS VARCHAR) || '>'
                      ELSE w END, ' ' ORDER BY pos) AS corrupted
                  FROM marked WHERE NOT masked OR runstart
                  GROUP BY doc_id),
            tgtt AS (SELECT doc_id, pos * 2 AS p,
                    '<extra_id_' || CAST(kk - 1 AS VARCHAR) || '>' AS o
                  FROM marked WHERE runstart
                  UNION ALL
                  SELECT doc_id, pos * 2 + 1 AS p, w AS o
                  FROM marked WHERE masked),
            tgt AS (SELECT doc_id, string_agg(o, ' ' ORDER BY p) AS target
                    FROM tgtt GROUP BY doc_id),
            stats AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                    CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_masked,
                    CAST(SUM(CASE WHEN runstart THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_spans
                  FROM marked GROUP BY doc_id)
         SELECT s.doc_id, s.n_words, s.n_masked, s.n_spans,
                CAST(('0x' || substr(md5(c.corrupted), 1, 15)) AS BIGINT)
                  AS corrupted_h,
                CAST(('0x' || substr(md5(COALESCE(t.target, '')), 1, 15))
                  AS BIGINT) AS target_h
         FROM stats s
         JOIN corr c ON s.doc_id = c.doc_id
         LEFT JOIN tgt t ON s.doc_id = t.doc_id
         ORDER BY s.doc_id"""
  )
}
