package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, FixtureCache, Tables}
import graft.streaming.StreamOps

/** Round-4 operator additions beyond the TPC-H completion (Extras4):
  * storage-layout operators (Hive-partitioned layout + pruning, bucketed
  * co-located join, ORC interchange), the IGNORE NULLS window family, and
  * a third REAL streaming query (stateful session windows).
  *
  * These are the layout levers that matter most at 100 TB: partition
  * pruning turns a full-corpus scan into a directory listing; bucketing
  * removes the fact-fact shuffle entirely (the single biggest cost in a
  * repeated-join pipeline); both are asserted on the physical plan by
  * Extras5Spec, not just on row results.
  */
object Extras5 {
  import Det._

  /** Per-JVM catalog-name tag (valid identifier chars only), so queries
    * that must register tables never collide across concurrently running
    * JVMs sharing a metastore path. The layout FILES themselves live in
    * the cross-JVM FixtureCache — only the catalog entries are per-JVM. */
  private lazy val jvmTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hive-style partitioned layout + partition pruning: write orders
    // partitioned by status, read back with a partition predicate. At
    // 100 TB the pruned read never opens non-matching files — the scan's
    // PartitionFilters (asserted by Extras5Spec) eliminate them during
    // file listing, the storage analog of the reference store's
    // per-segment index skip.
    // The layout is built ONCE per testdata snapshot (FixtureCache) — at
    // 100 TB the partitioned copy is an ingest-time artifact, so the
    // benchmark measures the pruned read, not a rewrite of the layout.
    "q_source_partitioned" -> ((s, d) => {
      val tmp = FixtureCache.ensure("orders_by_status",
        Seq(s"$d/orders.parquet"), "partitionBy(o_orderstatus) v1") { dest =>
        Tables.orders(s, d).write.partitionBy("o_orderstatus").parquet(dest)
      }
      s.read.parquet(tmp)
        .where(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // Bucketed co-located join: both fact tables pre-bucketed (8 buckets,
    // sorted) on the join key as external parquet tables, then a
    // merge-join with ZERO exchanges — the shuffle happened once at write
    // time and is amortized over every subsequent join. Extras5Spec
    // asserts the executed plan contains no Exchange at all.
    "q_join_bucketed" -> ((s, d) => {
      // The bucketed FILES are built once per testdata snapshot
      // (FixtureCache): the one-time bucketing shuffle is the ingest-time
      // cost that bucketing exists to amortize, so the benchmark measures
      // the zero-exchange merge join, not the layout build. Each JVM then
      // registers its own catalog entry OVER the cached files (CREATE
      // TABLE ... CLUSTERED BY ... LOCATION) — catalog names carry the
      // per-JVM tag so concurrent JVMs sharing a metastore never race.
      def ensure(name: String, df: DataFrame, key: String): String = {
        val tagged = s"${name}_$jvmTag"
        if (!s.catalog.tableExists(tagged)) {
          val dir = FixtureCache.ensure(name,
            Seq(s"$d/lineitem.parquet", s"$d/orders.parquet"),
            s"bucketBy(8,$key) sortBy($key) ${df.schema.toDDL} v1") { dest =>
            // saveAsTable is the only public bucketed-write API; its
            // catalog entry is scratch — DROP TABLE on a path-based
            // (external) table keeps the files.
            val scratch = s"${name}_build_$jvmTag"
            df.write.format("parquet").bucketBy(8, key).sortBy(key)
              .option("path", dest).saveAsTable(scratch)
            s.sql(s"DROP TABLE `$scratch`")
          }
          s.sql(
            s"""CREATE TABLE `$tagged` (${df.schema.toDDL})
               |USING parquet
               |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
               |LOCATION '$dir'""".stripMargin)
        }
        tagged
      }
      val li = ensure("gb_lineitem", Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
        "l_orderkey")
      val ord = ensure("gb_orders", Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority"),
        "o_orderkey")
      // The bucketed HashPartitioning satisfies BOTH the join and the
      // per-order aggregation below — the only exchange in the whole plan
      // is the final presentation sort ((l_orderkey, l_linenumber) is not
      // unique in this fixture, so a bare LIMIT would be tie-broken
      // differently per engine; the aggregate is order-free).
      s.table(li).hint("merge")
        .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // ORC interchange: the second columnar format every Spark shop meets.
    // Round-trips a projection through ORC files; the oracle reads the
    // parquet original, so the check proves the ORC write+read is
    // value-exact.
    "q_source_orc" -> ((s, d) => {
      val tmp = FixtureCache.ensure("documents_orc",
        Seq(s"$d/documents.parquet"), "select(doc_id,lang,n_chars) v1") { dest =>
        Tables.documents(s, d).select("doc_id", "lang", "n_chars")
          .write.orc(dest)
      }
      s.read.orc(tmp).orderBy("doc_id")
    }),

    // IGNORE NULLS window family — lag/lead skip over null observations,
    // last() forward-fills, nth_value picks the n-th non-null. Nulls are
    // synthesized deterministically (event_id % 7) since the fixture's
    // value column is non-null; the same CASE runs in the oracle.
    "q_win_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
            .as("v"))
        .select(col("user_id"), col("event_id"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"),
          lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_v"),
          last(col("v"), ignoreNulls = true).over(cum).as("ff_v"),
          nth_value(col("v"), 2, ignoreNulls = true).over(cum).as("second_v"))
        .orderBy("user_id", "event_id")
    }),

    // Benchmark-contamination check — the decontamination pass every
    // training pipeline runs before a model sees the data: fraction of a
    // train-split doc's distinct 3-gram shingles that appear anywhere in
    // the held-out (test-split) benchmark. Splits derive from the SAME
    // portable md5 bucket as q_llm_split, so membership is a pure
    // function of doc_id. Scale shape: the benchmark shingle set is
    // small by construction (eval sets are) → BROADCAST semi-join; the
    // train corpus is never shuffled, and the shared shingleTrips kernel
    // reads the corpus once.
    "q_llm_contamination" -> ((s, d) => {
      val bucket = pmod(graft.Det.md5long(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100))
      // Joining on xxhash64(shingle) assumes no 64-bit collision between a
      // train and a bench shingle — the same fingerprint-not-string trade
      // the whole MinHash family makes (LlmOps), chosen so only 8-byte
      // keys shuffle at corpus scale. A collision would inflate n_hit
      // vs the raw-string oracle; P(any) ≈ n²/2⁶⁵, negligible even at
      // 100 TB shingle counts per band.
      val trips = LlmOps.shingleTrips(s, d)
        .select(col("doc_id"), xxhash64(col("s0")).as("sh"), col("nsh"),
          bucket.as("bucket"))
      val bench = trips.where(col("bucket") >= 90).select("sh").distinct()
      trips.where(col("bucket") < 80)
        .join(broadcast(bench), "sh")
        .groupBy(col("doc_id"), col("nsh"))
        .agg(count(lit(1)).as("n_hit"))
        .withColumn("ratio",
          round(col("n_hit").cast("double") / col("nsh"), 6))
        .where(col("ratio") >= 0.2)
        .select(col("doc_id"), col("nsh").cast("long").as("nsh"),
          col("n_hit"), col("ratio"))
        .orderBy("doc_id")
    }),

    // PII scrubbing — regex redaction with per-doc hit counts. The
    // fixture has no real PII, so addresses are synthesized from typed
    // columns (both engines build the same string); the redaction +
    // count must then agree. Pure row-local projection: no shuffle, runs
    // at scan speed at any corpus size.
    "q_llm_pii_scrub" -> ((s, d) => {
      val contact = concat(lit("reach u"), col("doc_id"), lit("@ex.org or 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" re: "), substring(col("text"), 1, 40))
      val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phone = "555-[0-9]{4}"
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(regexp_replace(contact, email, "<EMAIL>"),
            phone, "<PHONE>").as("scrubbed"),
          size(regexp_extract_all(contact, lit(email), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(contact, lit(phone), lit(0)))
            .cast("long").as("n_phone"))
        .orderBy("doc_id")
    }),

    // Within-doc repetition score (Gopher-style quality signal): the
    // fraction of a doc's 3-gram positions occupied by repeated shingles
    // — 1 − distinct/total. Shares the one-pass shingle kernel; docs
    // with < 3 words are excluded on both sides by construction.
    "q_llm_repetition" -> ((s, d) => {
      val nsh = LlmOps.shingleTrips(s, d)
        .groupBy(col("doc_id"))
        .agg(first(col("nsh")).cast("long").as("nsh"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 2).cast("long").as("total"))
        .where(col("total") > 0)
        .join(nsh, "doc_id")
        .select(col("doc_id"), col("total"), col("nsh"),
          round(lit(1.0) - col("nsh").cast("double") / col("total"), 6)
            .as("rep_ratio"))
        .orderBy("doc_id")
    }),

    // Mergeable HLL sketches (Datasketches via Spark 3.5+ built-ins):
    // per-status sketches BUILD once, UNION without touching raw data —
    // the 100 TB cardinality workflow (per-partition/per-day sketches
    // merged at query time). TOLERANCE oracle (round 8, advice #4):
    // estimates are engine-specific, so the graded emit is the EXACT
    // distinct count (cross-engine integer) plus an all-integer 5%-bound
    // verdict 20·|approx − exact| ≤ exact that DuckDB asserts as literal
    // TRUE — a sketch straying past 5% now fails the hash compare
    // (default lgK=12 ⇒ ~1.6% RSE, so the bound is real but not fragile).
    // The exact-distinct side is the VALIDATION harness, not the
    // production path — at 100 TB you'd run the sketch alone; Extras5Spec
    // additionally bounds the raw estimates in-process.
    "q_agg_hll_union" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val perStatus = orders
        .groupBy(col("o_orderstatus"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val per = perStatus.select(col("o_orderstatus"),
        hll_sketch_estimate(col("sk")).as("approx_custs"))
      val all = perStatus.agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit("ALL").as("o_orderstatus"),
          hll_sketch_estimate(col("sk")).as("approx_custs"))
      val exactPer = orders.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      val exactAll = orders
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
        .select(lit("ALL").as("o_orderstatus"), col("exact_custs"))
      per.unionByName(all)
        .join(exactPer.unionByName(exactAll), "o_orderstatus")
        .select(col("o_orderstatus"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")) * 20
            <= col("exact_custs")).as("within_5pct"))
        .orderBy("o_orderstatus")
    }),

    // Hourly OHLC bars per user — the event-store downsampling idiom
    // (candlesticks): open/close via min_by/max_by on the unique
    // ts-order rank (event_id — pinned by WritePathSpec), high/low as
    // raw extremes. One shuffle on (user, hour); partial aggregation
    // does the heavy lifting map-side at scale.
    "q_ts_ohlc" -> ((s, d) => {
      // Bucket by exact integer floor: us - pmod(us, h) == floor(us/h)*h
      // for ALL inputs (pmod is non-negative), matching DuckDB's `//`
      // even pre-epoch — Column `/` is double division and truncates.
      val us = tsUs(col("ts")).cast("long")
      Tables.events(s, d)
        .groupBy(col("user_id"), (us - pmod(us, lit(3600000000L))).as("hb_us"))
        .agg(min_by(col("value"), col("event_id")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("event_id")).as("close"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "hb_us")
    }),

    // Interval-typed RANGE window frame as SQL TEXT: trailing-1h sum
    // keyed on the timestamp itself (RANGE BETWEEN INTERVAL ... — the
    // frame q_win_frame_range expresses over epoch seconds, here in the
    // SQL-standard spelling both engines parse natively).
    "q_win_range_time" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("v_events")
      s.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                 (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS trailing_1h
        FROM v_events
        ORDER BY event_id""")
    }),

    // Spark 4 VARIANT ingestion: parse_json → typed variant_get paths
    // (array index, nested object, missing key). The binary variant
    // encoding is the 100 TB answer to schema-on-read JSON — parse once,
    // extract many times without re-tokenizing. The JSON is synthesized
    // from typed columns, so the oracle states the expected scalars
    // directly (same precedent as q_fn_json2: the round-trip must
    // reproduce the inputs).
    "q_fn_variant" -> ((s, d) => {
      val js = concat(lit("{\"id\":"), col("event_id"),
        lit(",\"tags\":[\""), col("event_type"), lit("\",\"x\"]"),
        lit(",\"meta\":{\"u\":"), col("user_id"), lit("}}"))
      val v = parse_json(js)
      Tables.events(s, d)
        .select(col("event_id"),
          variant_get(v, "$.id", "bigint").as("v_id"),
          variant_get(v, "$.tags[0]", "string").as("v_tag"),
          variant_get(v, "$.tags[1]", "string").as("v_tag2"),
          variant_get(v, "$.meta.u", "bigint").as("v_user"),
          variant_get(v, "$.absent", "string").as("v_missing"))
        .orderBy("event_id")
    }),

    // URL decomposition: parse_url over a synthesized URL — host, path,
    // full query, one query parameter, fragment, scheme. The oracle
    // reconstructs each component from the same typed inputs.
    "q_fn_url" -> ((s, d) => {
      val url = concat(lit("https://ex.org/"), col("event_type"),
        lit("/item?id="), col("event_id"), lit("&u="), col("user_id"),
        lit("#frag"))
      Tables.events(s, d)
        .select(col("event_id"),
          parse_url(url, lit("HOST")).as("u_host"),
          parse_url(url, lit("PATH")).as("u_path"),
          parse_url(url, lit("QUERY")).as("u_query"),
          parse_url(url, lit("QUERY"), lit("u")).as("u_param"),
          parse_url(url, lit("REF")).as("u_ref"),
          parse_url(url, lit("PROTOCOL")).as("u_scheme"))
        .orderBy("event_id")
    }),

    // Stratified deterministic sampling: a different rate per stratum
    // (order status), keyed by the portable md5 bucket of the unique key
    // — never rand()/TABLESAMPLE (engine- and partitioning-dependent).
    // The training-pipeline idiom for class rebalancing at corpus scale:
    // pure row-local filter, no shuffle beyond the final agg.
    "q_scan_sample_stratified" -> ((s, d) => {
      val bucket = pmod(md5long(
        concat(lit("strat:"), col("o_orderkey").cast("string"))), lit(100))
      val rate = when(col("o_orderstatus") === "F", 20)
        .when(col("o_orderstatus") === "O", 10).otherwise(50)
      Tables.orders(s, d)
        .where(bucket < rate)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Third REAL streaming query: stateful session windows running under
    // MicroBatchExecution (session-merge state store), not the batch
    // twin. session_window merges events closer than the 30-min gap; its
    // window end is last-event-ts + gap, so end_us subtracts the gap to
    // express "last event in session" — the same quantity as the
    // gaps-and-islands oracle's MAX(ts). The two definitions differ only
    // on an EXACTLY-1800s gap (session_window closes, > keeps open);
    // verified absent from the fixture at every sf.
    "q_stream_live_session" -> ((s, d) => {
      val sess = StreamOps.eventsFileStream(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("user_id"), col("n"), col("sum_v"))
      StreamOps.runToMemory(sess, "live_session")
        .select(col("user_id"), tsUs(col("ws")).as("start_us"),
          (tsUs(col("we")) - 1800000000L).as("end_us"),
          col("n"), col("sum_v"))
        .orderBy("user_id", "start_us")
    })
  )

  val oracle: Map[String, String] = Map(
    // Tolerance oracle: exact distincts reproduced in DuckDB; within_5pct
    // is the Spark-side sketch-vs-exact bound, asserted as literal TRUE.
    "q_agg_hll_union" ->
      """WITH per AS (SELECT o_orderstatus,
                             COUNT(DISTINCT o_custkey) AS exact_custs
                      FROM orders GROUP BY 1),
            al AS (SELECT 'ALL' AS o_orderstatus,
                          COUNT(DISTINCT o_custkey) AS exact_custs
                   FROM orders)
         SELECT o_orderstatus, exact_custs, TRUE AS within_5pct
         FROM (SELECT * FROM per UNION ALL SELECT * FROM al)
         ORDER BY o_orderstatus""",

    "q_source_partitioned" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM orders
         WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_join_bucketed" ->
      """SELECT l_orderkey, o_orderstatus, COUNT(*) AS n_lines,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY l_orderkey, o_orderstatus
         ORDER BY l_orderkey""",
    "q_source_orc" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
    "q_llm_contamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            b AS (SELECT doc_id,
                         CAST(('0x' || substr(md5('split:' || doc_id), 1, 15))
                              AS BIGINT) % 100 AS bucket
                  FROM documents),
            bench AS (SELECT DISTINCT s FROM sh JOIN b USING (doc_id)
                      WHERE bucket >= 90),
            train AS (SELECT sh.doc_id, sh.s FROM sh JOIN b USING (doc_id)
                      WHERE bucket < 80),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM train GROUP BY doc_id),
            hit AS (SELECT doc_id, COUNT(*) AS n_hit FROM train
                    WHERE s IN (SELECT s FROM bench) GROUP BY doc_id)
         SELECT c.doc_id, c.nsh, h.n_hit,
                round(CAST(h.n_hit AS DOUBLE) / c.nsh, 6) AS ratio
         FROM cnt c JOIN hit h ON c.doc_id = h.doc_id
         WHERE round(CAST(h.n_hit AS DOUBLE) / c.nsh, 6) >= 0.2
         ORDER BY c.doc_id""",
    "q_llm_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
                           'reach u' || doc_id || '@ex.org or 555-' ||
                           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                           ' re: ' || substr(text, 1, 40) AS contact
                    FROM documents)
         SELECT doc_id,
                regexp_replace(regexp_replace(contact,
                    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                  '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
                len(regexp_extract_all(contact,
                    '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_email,
                len(regexp_extract_all(contact, '555-[0-9]{4}')) AS n_phone
         FROM t ORDER BY doc_id""",
    "q_llm_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE len(string_split(text, ' ')) >= 3),
            x AS (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(ws[i:i+2], ' ') AS s FROM x),
            cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
            tot AS (SELECT doc_id, len(string_split(text, ' ')) - 2 AS total
                    FROM documents
                    WHERE len(string_split(text, ' ')) - 2 > 0)
         SELECT t.doc_id, t.total, c.nsh,
                round(1.0 - CAST(c.nsh AS DOUBLE) / t.total, 6) AS rep_ratio
         FROM tot t JOIN cnt c ON t.doc_id = c.doc_id
         ORDER BY t.doc_id""",
    "q_ts_ohlc" ->
      """SELECT user_id,
                (epoch_us(ts::TIMESTAMP) // 3600000000) * 3600000000 AS hb_us,
                min_by(value, event_id) AS open,
                MAX(value) AS high,
                MIN(value) AS low,
                max_by(value, event_id) AS close,
                COUNT(*) AS n
         FROM events
         GROUP BY user_id, epoch_us(ts::TIMESTAMP) // 3600000000
         ORDER BY user_id, hb_us""",
    "q_win_range_time" ->
      """SELECT event_id, user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                  (PARTITION BY user_id ORDER BY ts::TIMESTAMP
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS trailing_1h
         FROM events
         ORDER BY event_id""",
    // The variant round-trip must reproduce the typed inputs (and misses
    // stay NULL); the oracle states them directly.
    "q_fn_variant" ->
      """SELECT event_id,
                event_id AS v_id,
                event_type AS v_tag,
                'x' AS v_tag2,
                user_id AS v_user,
                CAST(NULL AS VARCHAR) AS v_missing
         FROM events ORDER BY event_id""",
    "q_fn_url" ->
      """SELECT event_id,
                'ex.org' AS u_host,
                '/' || event_type || '/item' AS u_path,
                'id=' || event_id || '&u=' || user_id AS u_query,
                CAST(user_id AS VARCHAR) AS u_param,
                'frag' AS u_ref,
                'https' AS u_scheme
         FROM events ORDER BY event_id""",
    "q_scan_sample_stratified" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_price
         FROM orders
         WHERE CAST(('0x' || substr(md5('strat:' || o_orderkey), 1, 15))
                    AS BIGINT) % 100
               < CASE o_orderstatus WHEN 'F' THEN 20
                                    WHEN 'O' THEN 10 ELSE 50 END
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus""",
    "q_win_ignore_nulls" ->
      """WITH t AS (SELECT user_id, event_id,
                           CASE WHEN event_id % 7 = 0 THEN NULL
                                ELSE value END AS v
                    FROM events)
         SELECT user_id, event_id,
                lag(v IGNORE NULLS) OVER w AS prev_v,
                lead(v IGNORE NULLS) OVER w AS next_v,
                last_value(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_v,
                nth_value(v, 2 IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_v
         FROM t
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY user_id, event_id""",
    "q_stream_live_session" ->
      """WITH e AS (SELECT event_id, user_id, CAST(value AS DECIMAL(18,2)) AS v,
                           ts::TIMESTAMP AS ts FROM events),
            l AS (SELECT *, lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM e),
            f AS (SELECT *, CASE WHEN pts IS NULL
                                   OR epoch_us(ts) - epoch_us(pts) > 1800000000
                                 THEN 1 ELSE 0 END AS nw FROM l),
            s AS (SELECT *, SUM(nw) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM f)
         SELECT user_id, epoch_us(MIN(ts)) AS start_us,
                epoch_us(MAX(ts)) AS end_us, COUNT(*) AS n,
                CAST(SUM(v) AS DOUBLE) AS sum_v
         FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""")
}
