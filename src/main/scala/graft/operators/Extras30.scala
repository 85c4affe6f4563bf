package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}

/** Round-7 additions, part 20: key-uniqueness and freshness audits,
  * corpus n-gram novelty, gzip CSV ingestion, vocabulary growth curve,
  * and peak-concurrency sweep.
  */
object Extras30 {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // KEY-UNIQUENESS AUDIT — is the declared key actually a key? Four
    // candidate keys, one row each: rows, distinct keys, duplicate
    // mass. The constraint-validation primitive next to q_dq_fd_check
    // (FDs) and q_dq_constraints (ranges). Exact integer counts; the
    // composite key is checked on its own two columns, not a concat
    // (concat can alias: "1"+"23" == "12"+"3").
    "q_dq_uniqueness" -> ((s, d) => {
      def audit(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(keys.head, keys.tail: _*).as("n_keys"))
          .select(lit(name).as("key"), col("n_rows"), col("n_keys"),
            (col("n_rows") - col("n_keys")).as("dup_rows"))
      Seq(
        audit("events.event_id", Tables.events(s, d), Seq("event_id")),
        audit("documents.doc_id", Tables.documents(s, d), Seq("doc_id")),
        audit("orders.o_orderkey", Tables.orders(s, d), Seq("o_orderkey")),
        audit("lineitem.(l_orderkey,l_linenumber)", Tables.lineitem(s, d),
          Seq("l_orderkey", "l_linenumber")))
        .reduce(_ unionAll _)
        .orderBy("key")
    }),

    // FRESHNESS AUDIT — how stale is each event stream vs the newest
    // event anywhere? Per type: last-seen epoch µs and the lag behind
    // the global max in EXACT integer seconds. The ingestion-lag
    // dashboard row; one tiny agg + a broadcast scalar.
    "q_dq_freshness" -> ((s, d) => {
      val perType = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts"))).as("last_us"))
      val globalMax = perType.agg(max(col("last_us")).as("g_us"))
      perType.crossJoin(broadcast(globalMax))
        .select(col("event_type"), col("last_us"),
          expr("(g_us - last_us) div 1000000").as("staleness_sec"))
        .orderBy("event_type")
    }),

    // N-GRAM NOVELTY — per doc: what fraction of its 3-gram shingles
    // has never appeared in any earlier doc (by doc_id order)? The
    // corpus-curation metric that finds boilerplate late in the feed
    // (novelty → 0) vs genuinely new text. first-occurrence = one
    // min-agg over the shingle postings; grams shuffle as 8-byte
    // xxhash64 keys (the documented fingerprint trade — LlmOps), one
    // IEEE ratio per doc.
    "q_llm_novelty" -> ((s, d) => {
      val trips = LlmOps.shingleTrips(s, d)
        .select(col("doc_id"), xxhash64(col("s0")).as("sh"), col("nsh"))
      val firstSeen = trips.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("first_doc"))
      trips.join(firstSeen, "sh")
        .groupBy(col("doc_id"), col("nsh"))
        .agg(sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
        .select(col("doc_id"), col("nsh").cast("long").as("nsh"),
          col("n_novel"),
          (col("n_novel").cast("double") / col("nsh").cast("double"))
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // GZIP CSV INGESTION — the compressed-drop shape: a .csv.gz feed
    // read back with an explicit schema. The scale note IS the
    // operator: gzip is NON-SPLITTABLE — one file = one task no matter
    // the cluster, which is why ingest pipelines re-chunk compressed
    // feeds into many files (here: the default shuffle fan-out) before
    // the heavy transforms.
    "q_source_csv_gzip" -> ((s, d) => {
      val dir = FixtureCache.ensure("part_csv_gzip",
        Seq(s"$d/part.parquet"), "v1: gzip csv") { dest =>
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"),
            (dec(col("p_retailprice")) * 100).cast("long").as("cents"))
          .write.option("compression", "gzip").mode("overwrite").csv(dest)
      }
      s.read.schema("p_partkey LONG, p_brand STRING, cents LONG").csv(dir)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .orderBy("p_brand")
    }),

    // VOCABULARY GROWTH — Heaps'-law curve: distinct token count after
    // 25/50/75/100% of the corpus (by doc_id). Each token's cost is
    // ONE min-agg row (first_doc), then a broadcast 4-row checkpoint
    // spine counts tokens whose first appearance falls inside each
    // prefix — never four separate distinct-scans. Exact integers.
    "q_llm_vocab_growth" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val firstDoc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
      val maxDoc = docs.agg(max(col("doc_id")).as("max_doc"))
      val spine = broadcast(
        s.createDataFrame(Seq(25, 50, 75, 100).map(Tuple1(_))).toDF("pct")
          .crossJoin(broadcast(maxDoc))
          .select(col("pct"), expr("max_doc * pct div 100").as("thr")))
      firstDoc.crossJoin(spine)
        .where(col("first_doc") <= col("thr"))
        .groupBy(col("pct"), col("thr"))
        .agg(count(lit(1)).as("vocab"))
        .orderBy("pct")
    }),

    // PEAK CONCURRENCY — max simultaneous 30-minute event sessions per
    // day, by sweep-line: +1 at start, −1 at end, running sum, max.
    // Implemented as the DISTRIBUTED prefix sum: a per-day running max
    // (partitioned window) plus a cumulative day-offset over the tiny
    // day spine — the global single-partition sort a naive sweep needs
    // never happens; midnight-spanning sessions are carried exactly by
    // the offset algebra. Ties break (t, delta) so ends precede starts
    // at the same instant. Exact integers end to end.
    "q_ts_concurrency" -> ((s, d) => {
      val ev = Tables.events(s, d).select(unix_micros(col("ts")).as("t0"))
      val pts = ev.select(col("t0").as("t"), lit(1L).as("delta"))
        .unionAll(ev.select((col("t0") + lit(1800000000L)).as("t"),
          lit(-1L).as("delta")))
        .withColumn("day", to_date(timestamp_micros(col("t"))))
      val byDay = Window.partitionBy(col("day"))
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val perDay = pts
        .withColumn("rel", sum(col("delta")).over(byDay))
        .groupBy(col("day"))
        .agg(max(col("rel")).as("rel_max"), sum(col("delta")).as("total"))
      val prior = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perDay
        .withColumn("offset", coalesce(sum(col("total")).over(prior), lit(0L)))
        .select(col("day"), (col("offset") + col("rel_max"))
          .as("peak_concurrent"))
        .orderBy("day")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_dq_uniqueness" ->
      """SELECT * FROM (
           SELECT 'events.event_id' AS key, COUNT(*) AS n_rows,
                  COUNT(DISTINCT event_id) AS n_keys,
                  COUNT(*) - COUNT(DISTINCT event_id) AS dup_rows
           FROM events
           UNION ALL
           SELECT 'documents.doc_id', COUNT(*), COUNT(DISTINCT doc_id),
                  COUNT(*) - COUNT(DISTINCT doc_id) FROM documents
           UNION ALL
           SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey),
                  COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
           UNION ALL
           SELECT 'lineitem.(l_orderkey,l_linenumber)', COUNT(*),
                  COUNT(DISTINCT (l_orderkey, l_linenumber)),
                  COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
           FROM lineitem)
         ORDER BY key""",

    "q_dq_freshness" ->
      """WITH p AS (SELECT event_type,
                    MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
                 FROM events GROUP BY 1),
            g AS (SELECT MAX(last_us) AS g_us FROM p)
         SELECT event_type, last_us,
                CAST((g_us - last_us) // 1000000 AS BIGINT) AS staleness_sec
         FROM p CROSS JOIN g ORDER BY event_type""",

    "q_llm_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            n AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
            f AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
            nv AS (SELECT sh.doc_id, COUNT(*) AS n_novel
                   FROM sh JOIN f ON sh.s = f.s
                   WHERE f.first_doc = sh.doc_id GROUP BY 1)
         SELECT n.doc_id, n.nsh,
                CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
                CAST(COALESCE(nv.n_novel, 0) AS DOUBLE)
                  / CAST(n.nsh AS DOUBLE) AS novelty
         FROM n LEFT JOIN nv ON n.doc_id = nv.doc_id
         ORDER BY n.doc_id""",

    "q_source_csv_gzip" ->
      """SELECT p_brand, COUNT(*) AS n,
                CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS BIGINT) AS cents
         FROM part GROUP BY 1 ORDER BY 1""",

    "q_llm_vocab_growth" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
            f AS (SELECT w, MIN(doc_id) AS first_doc FROM t GROUP BY 1),
            m AS (SELECT MAX(doc_id) AS max_doc FROM documents),
            spine AS (SELECT pct, CAST(max_doc * pct // 100 AS BIGINT) AS thr
                      FROM (SELECT UNNEST([25, 50, 75, 100]) AS pct)
                      CROSS JOIN m)
         SELECT pct, thr, COUNT(*) AS vocab
         FROM f CROSS JOIN spine
         WHERE f.first_doc <= spine.thr
         GROUP BY pct, thr ORDER BY pct""",

    "q_ts_concurrency" ->
      """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t0
                     FROM events),
            pts AS (SELECT t0 AS t, CAST(1 AS BIGINT) AS delta FROM ev
                    UNION ALL
                    SELECT t0 + 1800000000, CAST(-1 AS BIGINT) FROM ev),
            d AS (SELECT t, delta,
                    CAST(make_timestamp(t) AS DATE) AS day FROM pts),
            r AS (SELECT day, t, delta,
                    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS rel
                  FROM d),
            pd AS (SELECT day, MAX(rel) AS rel_max,
                          CAST(SUM(delta) AS BIGINT) AS total
                   FROM r GROUP BY 1),
            o AS (SELECT day, rel_max,
                    COALESCE(SUM(total) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS off
                  FROM pd)
         SELECT day, CAST(off + rel_max AS BIGINT) AS peak_concurrent
         FROM o ORDER BY day"""
  )
}
