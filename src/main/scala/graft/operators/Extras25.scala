package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 15: fixed-size priority sampling, a MinHash
  * fidelity audit, event-rate burst detection, nested-JSON ingestion,
  * sequence pattern matching, and the corpus quality-gate funnel.
  */
object Extras25 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FIXED-SIZE PRIORITY SAMPLE — the k=100 orders with the smallest
    // portable hash (priority sampling): a uniform without-replacement
    // sample whose SIZE is exact at any data volume, unlike the ~10%
    // hash-filter (q_scan_sample_hash). Top-k by hash is a TakeOrdered
    // — per-partition heaps then one k-row merge, never a global sort;
    // the same rows are chosen at any cluster size or SF ordering.
    "q_scan_sample_fixed" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          md5long(col("o_orderkey").cast("string")).as("pri"))
        .orderBy(col("pri"), col("o_orderkey"))
        .limit(100)
    }),

    // MINHASH FIDELITY AUDIT — for every LSH candidate pair, the
    // 16-coordinate signature agreement (the Jaccard estimator) next
    // to the EXACT shingle Jaccard (the audit every dedup pipeline
    // owes its threshold to). est = k/16 and jaccard are each ONE
    // IEEE division of exact integers; err is their single
    // subtraction — engine-exact per pair, and per-pair rows mean no
    // order-dependent error aggregate exists.
    "q_llm_minhash_fidelity" -> ((s, d) => {
      val p = 2147483647L
      val rows = LlmOps.shingleTrips(s, d)
      val hm = rows.select(col("doc_id"), (md5long(col("s0")) % p).as("h"))
      val minCols = (0 until 16).map(j =>
        min((lit(2L * j + 1) * col("h") + lit(12345L * j)) % p).as(s"mh$j"))
      val sig = hm.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      val bandStructs = (0 until 4).map(b =>
        struct(lit(b).as("b"),
          concat_ws(",", (0 until 4).map(r => col(s"mh${b * 4 + r}").cast("string")): _*)
            .as("bk")))
      val bands = sig.select(col("doc_id"),
          explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("x.b").as("b"), col("x.bk").as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val matches = (0 until 16)
        .map(j => when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
        .reduce(_ + _)
      val est = cand
        .join(sig.as("a"), col("a.doc_id") === col("doc_a"))
        .join(sig.as("b"), col("b.doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          matches.cast("long").as("sig_match"))
      val ex = rows.select(col("doc_id"), xxhash64(col("s0")).as("sh"))
      val sizes = rows.groupBy(col("doc_id"))
        .agg(min(col("nsh")).cast("long").as("nsh"))
      val inter = cand
        .join(ex.as("ea"), col("ea.doc_id") === col("doc_a"))
        .join(ex.as("eb"), col("eb.doc_id") === col("doc_b")
          && col("ea.sh") === col("eb.sh"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      est
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .join(sizes.as("ca"), col("ca.doc_id") === col("doc_a"))
        .join(sizes.as("cb"), col("cb.doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("sig_match").cast("double") / lit(16.0)).as("est"),
          (coalesce(col("inter"), lit(0L)).cast("double")
            / (col("ca.nsh") + col("cb.nsh")
              - coalesce(col("inter"), lit(0L))).cast("double"))
            .as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // EVENT-RATE BURST DAYS — per event type, the days whose count
    // sits above mean + 2σ of that type's own daily series (the
    // operational anomaly detector next to q_ts_bollinger's rolling
    // bands — here the baseline is the full per-type series). The
    // breach predicate is EXACT INTEGER, the squared one-sided test:
    // D·c − S > 0 AND (D·c − S)² · (D−1) > 4 · D · (D·S2 − S²).
    "q_evt_burst" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("t"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("c"))
      val byT = Window.partitionBy(col("t"))
      val stats = daily
        .withColumn("dcount", count(lit(1)).over(byT))
        .withColumn("s1", sum(col("c")).over(byT))
        .withColumn("s2", sum(col("c") * col("c")).over(byT))
      val lhs = (col("dcount") * col("c") - col("s1")).cast("decimal(19,0)")
      val varNum = (col("dcount") * col("s2") - col("s1").cast("decimal(19,0)")
        * col("s1").cast("decimal(19,0)")).cast("decimal(38,0)")
      stats
        .where(col("dcount") > 1 && lhs > 0
          && lhs * lhs * (col("dcount") - 1)
            > lit(4L) * col("dcount") * varNum)
        .select(col("t"), col("dt"), col("c"),
          (col("s1").cast("double") / col("dcount").cast("double"))
            .as("mean_daily"))
        .orderBy("t", "dt")
    }),

    // NESTED-JSON INGESTION — an order feed where each line carries an
    // ARRAY of line items (the shape every API export lands in):
    // from_json with an explicit nested schema, explode back to the
    // item grain, audit the totals. The fixture (FixtureCache, built
    // once per snapshot) packs each order's lineitems into one JSON
    // line; the oracle recomputes the audit from the base tables — so
    // the check proves the nested round-trip lost nothing.
    "q_source_json_nested" -> ((s, d) => {
      val dir = FixtureCache.ensure("orders_json_nested",
        Seq(s"$d/orders.parquet", s"$d/lineitem.parquet"),
        "v1: one JSON line per order, items array") { dest =>
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            struct(col("l_linenumber").as("ln"),
              (dec(col("l_extendedprice")) * 100).cast("long").as("cents"),
              col("l_quantity").cast("long").as("qty")).as("item"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("item"))).as("items"))
        Tables.orders(s, d)
          .join(items, col("o_orderkey") === col("l_orderkey"))
          .select(to_json(struct(col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"), col("items"))).as("line"))
          .write.mode("overwrite").text(dest)
      }
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "okey LONG, status STRING, " +
          "items ARRAY<STRUCT<ln: INT, cents: LONG, qty: LONG>>")
      s.read.text(dir)
        .select(from_json(col("value"), schema).as("j"))
        .select(col("j.okey").as("okey"), col("j.status").as("status"),
          explode(col("j.items")).as("it"))
        .groupBy(col("status"))
        .agg(countDistinct(col("okey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          sum(col("it.cents")).as("cents"),
          sum(col("it.qty")).as("qty"))
        .orderBy("status")
    }),

    // SEQUENCE PATTERN MATCH — the MATCH_RECOGNIZE / CEP shape: find
    // every date where the daily revenue series completes a V
    // (two strict falls then two strict rises). Four lags in ONE
    // calendar window; strict comparisons on EXACT cents, so the match
    // set is engine-exact. At scale the pattern run is per-partition
    // sequential — the classic Flink-CEP-on-Spark formulation.
    "q_ts_pattern" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      val ord = Window.orderBy(col("dt"))
      daily
        .withColumn("y1", lag(col("y"), 1).over(ord))
        .withColumn("y2", lag(col("y"), 2).over(ord))
        .withColumn("y3", lag(col("y"), 3).over(ord))
        .withColumn("y4", lag(col("y"), 4).over(ord))
        .where(col("y4").isNotNull
          && col("y3") < col("y4") && col("y2") < col("y3")
          && col("y1") > col("y2") && col("y") > col("y1"))
        .select(col("dt"), col("y4").as("start_cents"),
          col("y2").as("trough_cents"), col("y").as("end_cents"))
        .orderBy("dt")
    }),

    // QUALITY-GATE FUNNEL — the corpus filter pipeline's headline
    // number: how many documents survive each successive gate (length,
    // language, alpha-ratio quality, exact-dup keep-first). ONE pass
    // over the corpus computes all stage flags; the dedup gate's
    // keep-first is a rank over the text-hash grain. Conjunctive
    // stages, exact integer counts — the funnel is engine-exact.
    "q_llm_filter_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("th")).orderBy(col("doc_id"))
      val flags = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          length(col("text")).as("len"),
          md5long(col("text")).as("th"))
        .withColumn("keep_first", row_number().over(w) === 1)
        .withColumn("g1", col("len") >= 200)
        .withColumn("g2", col("g1") && col("lang").isin("en", "de", "fr"))
        .withColumn("alpha",
          length(regexp_replace(col("text"), "[^a-zA-Z ]", "")))
        .withColumn("g3", col("g2")
          && col("alpha") * 100 >= col("len") * 90)
        .withColumn("g4", col("g3") && col("keep_first"))
      flags.agg(
          count(lit(1)).as("n_total"),
          sum(when(col("g1"), 1L).otherwise(0L)).as("n_length"),
          sum(when(col("g2"), 1L).otherwise(0L)).as("n_lang"),
          sum(when(col("g3"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("g4"), 1L).otherwise(0L)).as("n_dedup"))
    })
  )

  private val minhashSigCte: String = {
    val mins = (0 until 16).map(j =>
      s"MIN(((${2 * j + 1} * h) + ${12345 * j}) % 2147483647) AS mh$j")
      .mkString(",\n                           ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS b, " +
        (0 until 4).map(r => s"mh${b * 4 + r}::VARCHAR").mkString(" || ',' || ") +
        " AS bk FROM sig").mkString("\n                     UNION ALL ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE len(string_split(text, ' ')) >= 3),
        xsh AS (SELECT doc_id, ws,
                       unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(ws[i:i+2], ' ') AS s FROM xsh),
        hm AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                        % 2147483647 AS h
               FROM sh),
        sig AS (SELECT doc_id,
                       $mins
                FROM hm GROUP BY doc_id),
        band AS ($bandRows),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM band x JOIN band y
                   ON x.b = y.b AND x.bk = y.bk
                  AND x.doc_id < y.doc_id)"""
  }

  val oracle: Map[String, String] = Map(

    "q_scan_sample_fixed" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
                CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))
                     AS BIGINT) AS pri
         FROM orders
         ORDER BY pri, o_orderkey LIMIT 100""",

    "q_llm_minhash_fidelity" -> {
      val eq = (0 until 16)
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $minhashSigCte,
            est AS (SELECT doc_a, doc_b,
                      CAST($eq AS BIGINT) AS sig_match
                    FROM cand
                    JOIN sig sa ON sa.doc_id = doc_a
                    JOIN sig sb ON sb.doc_id = doc_b),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
                      FROM cand
                      JOIN sh a ON a.doc_id = doc_a
                      JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
                      GROUP BY doc_a, doc_b)
         SELECT e.doc_a, e.doc_b,
                CAST(e.sig_match AS DOUBLE) / CAST(16 AS DOUBLE) AS est,
                CAST(COALESCE(i.inter, 0) AS DOUBLE)
                  / CAST(ca.nsh + cb.nsh - COALESCE(i.inter, 0) AS DOUBLE)
                  AS jaccard
         FROM est e
         LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
         JOIN cnt ca ON ca.doc_id = e.doc_a
         JOIN cnt cb ON cb.doc_id = e.doc_b
         ORDER BY e.doc_a, e.doc_b"""
    },

    "q_evt_burst" ->
      """WITH daily AS (SELECT event_type AS t, CAST(ts AS DATE) AS dt,
                    COUNT(*) AS c
                 FROM events GROUP BY 1, 2),
            st AS (SELECT t, dt, c,
                     COUNT(*) OVER (PARTITION BY t) AS dcount,
                     SUM(c) OVER (PARTITION BY t) AS s1,
                     SUM(c * c) OVER (PARTITION BY t) AS s2
                   FROM daily),
            f AS (SELECT t, dt, c, dcount, s1,
                    CAST(dcount * c - s1 AS DECIMAL(19,0)) AS lhs,
                    CAST(dcount * s2 - CAST(s1 AS DECIMAL(19,0))
                         * CAST(s1 AS DECIMAL(19,0)) AS DECIMAL(38,0))
                      AS var_num
                  FROM st)
         SELECT t, dt, c,
                CAST(s1 AS DOUBLE) / CAST(dcount AS DOUBLE) AS mean_daily
         FROM f
         WHERE dcount > 1 AND lhs > 0
           AND lhs * lhs * (dcount - 1) > 4 * dcount * var_num
         ORDER BY t, dt""",

    "q_source_json_nested" ->
      """SELECT o_orderstatus AS status,
                CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
                COUNT(*) AS n_items,
                CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS cents,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",

    "q_ts_pattern" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
                    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS y
                 FROM orders GROUP BY 1),
            lg AS (SELECT dt, y,
                     lag(y, 1) OVER (ORDER BY dt) AS y1,
                     lag(y, 2) OVER (ORDER BY dt) AS y2,
                     lag(y, 3) OVER (ORDER BY dt) AS y3,
                     lag(y, 4) OVER (ORDER BY dt) AS y4
                   FROM daily)
         SELECT dt, y4 AS start_cents, y2 AS trough_cents, y AS end_cents
         FROM lg
         WHERE y4 IS NOT NULL
           AND y3 < y4 AND y2 < y3 AND y1 > y2 AND y > y1
         ORDER BY dt""",

    "q_llm_filter_funnel" ->
      """WITH flags AS (SELECT doc_id, lang, text,
                    len(text) AS l,
                    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS th,
                    row_number() OVER (PARTITION BY
                      CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
                      ORDER BY doc_id) = 1 AS keep_first,
                    len(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                      AS alpha
                 FROM documents),
            g AS (SELECT
                    l >= 200 AS g1,
                    l >= 200 AND lang IN ('en', 'de', 'fr') AS g2,
                    l >= 200 AND lang IN ('en', 'de', 'fr')
                      AND alpha * 100 >= l * 90 AS g3,
                    l >= 200 AND lang IN ('en', 'de', 'fr')
                      AND alpha * 100 >= l * 90 AND keep_first AS g4
                  FROM flags)
         SELECT COUNT(*) AS n_total,
                CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_length,
                CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_lang,
                CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality,
                CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dedup
         FROM g"""
  )
}
