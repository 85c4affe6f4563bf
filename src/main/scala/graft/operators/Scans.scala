package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Det, Tables}

/** §2.1 scans/sources + §2.2 projections/filters.
  *
  * The reference store's read path is "scan from an offset, applying int /
  * blob filters, skipping blocks via min-max stats and blooms". The Spark
  * realization is a parquet scan with pushed-down predicates: row-group
  * min/max pruning plays the role of block skipping, dictionary/bloom
  * filters that of the blob blooms. All queries below compile to a single
  * `FileScan parquet` with `PushedFilters` — verified via explain in tests.
  */
object Scans {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Full-table scan (the reference's SearchForward(0) with no filters).
    "q_scan_full" -> ((s, d) =>
      Tables.nation(s, d).orderBy("n_nationkey")),

    // Offset-range scan: rows with offset >= start. events.event_id IS the
    // lstore offset (contiguous, ts-ordered — FIXTURES.md). Row-group
    // min/max stats prune parquet blocks below the offset.
    "q_scan_offset" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("event_id") >= 500)
        .select(col("event_id"), tsUs(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")),

    // The reference's signature read: SearchForward(startOffset, filters)
    // — offset bound + int-range filter + blob-equality filter in one
    // scan. All three predicates push down to the parquet reader (the
    // row-group-stats + dictionary analog of lstore's block skipping).
    "q_scan_offset_filtered" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("event_id") >= 200 &&
          col("user_id").between(3, 11) &&
          col("event_type") === "click")
        .select(col("event_id"), tsUs(col("ts")).as("ts_us"),
          col("user_id"), col("value"))
        .orderBy("event_id")),

    // Batched read: first N rows from an offset (batch-size-hint read).
    "q_scan_batch" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("event_id") >= 500)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy("event_id")
        .limit(100)),

    // Semi-structured ingest: parse the JSON props column into typed fields.
    "q_source_json_lines" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .orderBy("event_id")),

    // Projection: select / rename / derive.
    "q_project" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_u"),
          (col("c_acctbal") * lit(2.0)).as("bal2x"),
          concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"))
        .orderBy("c_custkey")),

    // Int range predicate (lstore IntRangeFilter{min,max}).
    "q_filter_int_range" -> ((s, d) =>
      Tables.part(s, d)
        .where(col("p_size").between(10, 20))
        .select(col("p_partkey"), col("p_size"), col("p_brand"))
        .orderBy("p_partkey")),

    // Int equality (lstore IntValueFilter).
    "q_filter_int_value" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("user_id") === 7)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy("event_id")),

    // String/blob equality (lstore BlobValueFilter — bloom-accelerated
    // there, dictionary-filtered in parquet here).
    "q_filter_blob_value" -> ((s, d) =>
      Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")),

    // Composite predicates: AND / OR / NOT / IN / IS NULL.
    "q_filter_compound" -> ((s, d) =>
      Tables.orders(s, d)
        .where((col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
          || (col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              && !(col("o_orderstatus") === "F"))
          || col("o_custkey").isNull)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
        .orderBy("o_orderkey")),

    // Pattern match: LIKE + regexp.
    "q_filter_like" -> ((s, d) =>
      Tables.documents(s, d)
        .where(col("text").like("%scan%")
          && col("text").rlike("merge [a-z]+ sort"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_scan_full" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q_scan_offset" ->
      """SELECT event_id, epoch_us(ts::TIMESTAMP) AS ts_us, user_id,
         event_type, value FROM events WHERE event_id >= 500
         ORDER BY event_id""",
    "q_scan_offset_filtered" ->
      """SELECT event_id, epoch_us(ts::TIMESTAMP) AS ts_us, user_id, value
         FROM events
         WHERE event_id >= 200 AND user_id BETWEEN 3 AND 11
           AND event_type = 'click'
         ORDER BY event_id""",
    "q_scan_batch" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_id >= 500 ORDER BY event_id LIMIT 100""",
    "q_source_json_lines" ->
      """SELECT event_id,
         CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "q_project" ->
      """SELECT c_custkey, upper(c_name) AS name_u,
         c_acctbal * 2.0 AS bal2x,
         concat_ws('/', c_mktsegment, c_name) AS seg_name
         FROM customer ORDER BY c_custkey""",
    "q_filter_int_range" ->
      """SELECT p_partkey, p_size, p_brand FROM part
         WHERE p_size BETWEEN 10 AND 20 ORDER BY p_partkey""",
    "q_filter_int_value" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE user_id = 7 ORDER BY event_id""",
    "q_filter_blob_value" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "q_filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders
         WHERE (o_orderstatus = 'O' AND o_totalprice > 150000.0)
            OR (o_orderpriority IN ('1-URGENT','2-HIGH')
                AND NOT (o_orderstatus = 'F'))
            OR o_custkey IS NULL
         ORDER BY o_orderkey""",
    "q_filter_like" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE text LIKE '%scan%'
           AND regexp_matches(text, 'merge [a-z]+ sort')
         ORDER BY doc_id"""
  )
}
