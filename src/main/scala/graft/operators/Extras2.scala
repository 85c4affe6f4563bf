package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Round-2 coverage: argmax/argmin, boolean + bitwise aggregates, map
  * construction/transformation, unpivot (wide→long reshape), hash and
  * binary-encoding families, bounded cross join, approximate percentiles,
  * and the bucketized range join (the scale path for interval joins).
  *
  * Determinism decisions (SURVEY §2.13):
  *  - max_by/min_by ties are pinned by making the "by" value a struct that
  *    ends in the selected key itself — equal tuples then imply an equal
  *    result, so the query is total-order-safe in any engine.
  *  - hex output is lowercased on both sides (Spark hex() is uppercase,
  *    DuckDB's is lowercase).
  *  - the map/unpivot oracles compute the same SCALARS directly — DuckDB
  *    lacks transform_values/map_filter; the contract is value equality,
  *    not API mirroring.
  */
object Extras2 {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** One-hour bucket width in microseconds for the range-bucketed join. */
  private val HourUs = 3600000000L

  val queries: Map[String, Q] = Map(
    // argmax/argmin: per return flag, the orderkey of the most/least
    // expensive line item. Tie-pinning: the ordering tuple ends in
    // l_orderkey, so tied tuples select the same key by construction.
    "q_agg_argmax" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_orderkey"),
            struct(col("l_extendedprice"), col("l_orderkey"))).as("top_order"),
          min_by(col("l_orderkey"),
            struct(col("l_extendedprice"), col("l_orderkey"))).as("bottom_order"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_extendedprice")).as("min_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Boolean aggregates (every/any over grouped predicates).
    "q_agg_bool" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(bool_and(col("o_totalprice") > 10000).as("all_big"),
          bool_or(col("o_orderstatus") === "F").as("any_finished"),
          bool_and(col("o_custkey") >= 0).as("all_nonneg"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // Bitwise aggregates over integer keys (AND/OR/XOR fold — order-free).
    "q_agg_bitagg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(bit_and(col("user_id")).as("band"),
          bit_or(col("user_id")).as("bor"),
          bit_xor(col("event_id")).as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Map construction + transformation surface: map_from_arrays,
    // map_concat, transform_values, map_filter, map_keys — projected back
    // to scalars so the result hashes identically cross-engine.
    "q_fn_map2" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("ev"), lit("usr")),
        array(col("event_id"), col("user_id")))
      val mc = map_concat(m, map(lit("sum"), col("event_id") + col("user_id")))
      val doubled = transform_values(mc, (_, v) => v * 2)
      val evenKeys = map_filter(mc, (_, v) => v % 2 === 0)
      Tables.events(s, d)
        .select(col("event_id"),
          element_at(mc, "ev").as("m_ev"),
          element_at(mc, "usr").as("m_usr"),
          element_at(mc, "sum").as("m_sum"),
          element_at(doubled, "sum").as("m_sum2"),
          concat_ws(",", array_sort(map_keys(evenKeys))).as("even_keys"),
          size(mc).cast("int").as("m_size"))
        .orderBy("event_id")
    }),

    // Wide→long reshape: unpivot two part measures into (key, value) rows.
    "q_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
          "k", "v")
        .orderBy("p_partkey", "k")),

    // Hash-function family: md5, sha2-256, and the engine's portable
    // 60-bit text hash (first 15 md5 hex chars as an integer).
    "q_fn_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"),
          md5long(col("lang")).as("h_lang60"),
          length(sha2(col("text"), 256)).cast("int").as("hex_len"))
        .orderBy("doc_id")),

    // Binary encode/decode family: utf-8 encode, base64 round-trip, hex.
    // hex() case differs across engines — lowercased on both sides.
    "q_fn_encode" -> ((s, d) => {
      val head = encode(substring(col("text"), 1, 24), "utf-8")
      Tables.documents(s, d)
        .select(col("doc_id"),
          base64(head).as("b64"),
          decode(unbase64(base64(head)), "utf-8").as("roundtrip"),
          lower(hex(encode(col("lang"), "utf-8"))).as("lang_hex"),
          decode(unhex(lower(hex(encode(col("lang"), "utf-8")))), "utf-8")
            .as("lang_back"),
          lower(hex(col("doc_id"))).as("id_hex"))
        .orderBy("doc_id")
    }),

    // Bounded cross join (cartesian of the two smallest dims, 25×5 rows).
    // The region side carries an explicit broadcast: a cross join is only
    // scale-sane when one side is a bounded dimension, and the hint makes
    // that contract auditable (PlanAuditSpec's theta-join sweep).
    "q_join_cross" -> ((s, d) =>
      Tables.nation(s, d).crossJoin(broadcast(Tables.region(s, d)))
        .select(col("n_nationkey"), col("n_name"), col("r_regionkey"),
          col("r_name"))
        .orderBy("n_nationkey", "r_regionkey")),

    // Approximate percentiles (t-digest-style sketch) with a TOLERANCE
    // oracle (round 8, advice #4): the estimator itself is engine-
    // specific, so the graded emit is (a) the EXACT discrete percentile
    // — smallest value whose cumulative count reaches ceil(p·n), all
    // ranks in integer arithmetic ((n+1) div 2, (9n+9) div 10; 0.9·n in
    // IEEE would mis-ceil on exact multiples) over a per-(flag,value)
    // histogram, cross-engine reproducible — and (b) a boolean asserting
    // the sketch landed within max(1.0, 2%) of it, which DuckDB asserts
    // as literal TRUE. A drifting estimator now FAILS the hash compare
    // instead of hiding behind rows-only. The histogram path is also the
    // 100 TB shape: l_quantity has ~50 distinct values, so the exact
    // percentile reduces to a 50-row cumsum per group, not a data sort.
    "q_agg_percentile_approx" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val approx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("med_approx"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000))
            .as("p90_approx"))
      val hist = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      val exact = hist
        .withColumn("cum", sum(col("c")).over(wcum))
        .join(tot, "l_returnflag")
        .withColumn("r50", expr("(n + 1) div 2"))
        .withColumn("r90", expr("(9 * n + 9) div 10"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") >= col("r50"), col("l_quantity")))
            .as("med_exact"),
          min(when(col("cum") >= col("r90"), col("l_quantity")))
            .as("p90_exact"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          col("med_exact"), col("p90_exact"),
          (abs(col("med_approx") - col("med_exact"))
            <= greatest(lit(1.0), col("med_exact") * 0.02)).as("med_ok"),
          (abs(col("p90_approx") - col("p90_exact"))
            <= greatest(lit(1.0), col("p90_exact") * 0.02)).as("p90_ok"))
        .orderBy("l_returnflag")
    }),

    // Correlation / covariance from EXACT decimal moments (Σx, Σy, Σxy,
    // Σx², Σy²) with one shared double formula — same rationale as
    // q_agg_stats: the built-in corr/covar aggregates are merge-order-
    // dependent and not oracle-safe.
    "q_agg_corr" -> ((s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / (col("n") - 1), 6).as("covar_samp"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 6)
            .as("corr"))
        .orderBy("l_returnflag")
    }),

    // Linear-regression aggregates (slope/intercept of price over
    // quantity per flag) from the same exact-moment pattern as
    // q_agg_corr — the built-in regr_* functions are merge-order
    // dependent, the moment formula is not.
    "q_agg_regr" -> ((s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"))
        // Slope computed ONCE; the intercept derives from it (so the two
        // can never drift apart if the formula gains e.g. a zero-variance
        // guard). Rounding happens at the END on both — rounding the
        // slope before deriving the intercept would change the value.
        .withColumn("slope_raw",
          (col("sxy") - col("sx") * col("sy") / col("n"))
            / (col("sxx") - col("sx") * col("sx") / col("n")))
        .select(col("l_returnflag"), col("n"),
          round(col("slope_raw"), 6).as("slope"),
          round(col("sy") / col("n") - col("slope_raw") * (col("sx") / col("n")), 6)
            .as("intercept"))
        .orderBy("l_returnflag")
    }),

    // stack(): the generator form of unpivot — n literal (key, value)
    // tuples per input row.
    "q_fn_stack" -> ((s, d) =>
      Tables.part(s, d)
        .selectExpr("p_partkey",
          "stack(2, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice) AS (k, v)")
        .orderBy("p_partkey", "k")),

    // Per-label embedding centroid — the "average the vectors per class"
    // step of a training pipeline, as a DISTRIBUTED elementwise mean:
    // posexplode to (label, dim, component), exact integer sums of the
    // quantized components, one shared division at the end. No vector is
    // ever collected; the shuffle key is (label, dim) so a 100 TB corpus
    // aggregates with ordinary partial+final hash aggregation.
    "q_llm_centroid" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"),
          posexplode(transform(col("embedding"),
            x => round(x.cast("double") * 1e6).cast("long"))))
        .groupBy(col("label"), (col("pos") + 1).as("i"))
        // NO round() here: both engines compute this division with the
        // identical IEEE op sequence on identical integer sums, so the
        // raw double is bit-exact — while round(x, 6) implementations
        // BREAK TIES differently (Spark's exact-decimal HALF_UP vs
        // DuckDB's multiply-based rounding; diverged on 1 of 640 values
        // at sf0.1). Round only where op sequences differ.
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("col")).cast("double") / 1e6 / count(lit(1)))
            .as("centroid"))
        .orderBy("label", "i")),

    // Character/formatting family: ascii, chr, printf-style formatting,
    // left/right substrings.
    "q_fn_char" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          ascii(col("lang")).cast("int").as("lang_ascii"),
          chr((col("doc_id") % 26) + 97).as("id_chr"),
          format_string("%s-%05d", col("lang"), col("doc_id")).as("tag"),
          expr("left(text, 8)").as("l8"),
          expr("right(lang, 2)").as("r2"))
        .orderBy("doc_id")),

    // Error-safe function family (ANSI mode stays ON session-wide; these
    // are the per-expression opt-outs): failed casts and zero-division
    // yield NULL instead of raising.
    "q_fn_try" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("try_cast(lang AS INT)").as("lang_int"),
          expr("try_cast(cast(doc_id AS STRING) AS INT)").as("id_int"),
          try_divide(col("n_chars").cast("double"), col("doc_id").cast("double"))
            .as("chars_per_id"),
          // BIGINT, not the raw DECIMAL(6,0): a decimal-typed output column
          // is unique across the surface and hashes engine-dependently
          // (pyarrow Decimal object vs DuckDB df float) — cast both sides.
          expr("try_to_number(cast(n_chars AS STRING), '999999')")
            .cast("long").as("n_parsed"))
        .orderBy("doc_id")),

    // Trigonometric family on bounded inputs, rounded to 6 dp (both
    // engines compute on identical input doubles; libm vs java.lang.Math
    // agree within an ulp, far inside the rounding margin).
    "q_fn_trig" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          round(sin(col("value")), 6).as("s"),
          round(cos(col("value")), 6).as("c"),
          round(tan(col("value") / 10), 6).as("t"),
          round(atan2(col("value"), lit(2.0)), 6).as("a2"),
          round(degrees(col("value")), 6).as("deg"),
          round(radians(col("value")), 6).as("rad"))
        .orderBy("event_id")),

    // SQL-string entry point: the same Catalyst pipeline from the ANTLR
    // parser onward (§3.2 lifecycle 2) — a TPC-H Q3-shaped revenue query
    // submitted as TEXT over temp views, not the DataFrame DSL.
    "q_sql_q3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
               o_orderpriority
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")
    }),

    // TPC-H Q5 shape (local supplier volume): 6-table star join where the
    // customer and supplier must share a nation — the join-order stress
    // test; Catalyst/AQE pick the join order, broadcast the dims.
    "q_sql_q5" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(s"v_$t"))
      s.sql("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN v_nation ON s_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")
    }),

    // TPC-H Q10 shape (returned-item reporting): top 20 customers by
    // revenue lost to returns in a quarter-bounded window.
    "q_sql_q10" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "nation")
        .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(s"v_$t"))
      s.sql("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               n_name
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    }),

    // TPC-H Q18 shape (large-volume customer): IN-subquery with HAVING
    // over the fact table, then a 3-way join + top-k — the decorrelated
    // subquery-into-semi-join pattern, submitted as SQL text.
    "q_sql_q18" -> ((s, d) => {
      Seq("customer", "orders", "lineitem")
        .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(s"v_$t"))
      s.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
               o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM v_lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")
    }),

    // Correlated LATERAL derived table (top-2-per-outer-row as a lateral
    // subquery — the SQL-standard spelling of topk-per-group).
    "q_sql_lateral" -> ((s, d) => {
      Tables.load(s, d, "region").createOrReplaceTempView("v_region")
      Tables.load(s, d, "nation").createOrReplaceTempView("v_nation")
      s.sql("""
        SELECT r_name, n.n_name, n.n_nationkey
        FROM v_region r,
        LATERAL (SELECT n_name, n_nationkey FROM v_nation
                 WHERE n_regionkey = r.r_regionkey
                 ORDER BY n_nationkey LIMIT 2) n
        ORDER BY r_name, n_nationkey""")
    }),

    // to_json → get_json_object round-trip, projected back to scalars
    // (the JSON STRING itself is not compared — engines format
    // whitespace differently; the values must survive the round-trip).
    "q_fn_json2" -> ((s, d) => {
      val j = to_json(struct(col("event_id").as("id"),
        col("event_type").as("t"), col("user_id").as("u")))
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(j, "$.id").cast("long").as("rt_id"),
          get_json_object(j, "$.t").as("rt_type"),
          get_json_object(j, "$.u").cast("long").as("rt_user"))
        .orderBy("event_id")
    }),

    // Array set-operation family — scalarized for cross-engine hashing.
    "q_fn_array2" -> ((s, d) => {
      val a1 = array(col("user_id"), col("event_id") % 10, lit(7L))
      val a2 = array(lit(7L), col("user_id") + 1)
      Tables.events(s, d)
        .select(col("event_id"),
          concat_ws(",", array_sort(array_union(a1, a2))).as("a_union"),
          concat_ws(",", array_sort(array_intersect(a1, a2))).as("a_inter"),
          concat_ws(",", array_sort(array_except(a1, a2))).as("a_except"),
          array_position(a1, 7L).as("pos7"),
          size(flatten(array(a1, a2))).cast("int").as("n_flat"),
          array_max(a1).as("amax"),
          array_min(a1).as("amin"))
        .orderBy("event_id")
    }),

    // Manual skew salting: the fact side salts each row by a hash of its
    // full key, the build side replicates across all salts, and the join
    // key becomes (key, salt) — splitting one hot key over `salts`
    // reducers. AQE's skew-join split covers most batch cases; the manual
    // contract still matters where AQE can't re-plan (stream-stream
    // joins, fixed-partitioning pipelines), so it is declared with an
    // oracle proving the rewrite is semantics-preserving.
    "q_join_salted" -> ((s, d) => {
      val salts = 4
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts))
            .as("salt"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(sequence(lit(0), lit(salts - 1))).as("salt"))
      li.join(ord,
          col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("rev"))
        .orderBy("o_orderpriority")
    }),

    // Range join via time-bucketing — the 100 TB scale path for pure
    // range predicates: each probe interval [t, t+1h) covers at most two
    // 1h buckets, so exploding the probe side into its two candidate
    // buckets turns the O(n·m) nested loop into ONE equi-shuffle join,
    // with the exact range predicate re-checked on the candidates.
    // (q_join_interval keeps the declarative theta form; this is the
    // partitioning contract an interval index provides at scale.)
    "q_join_range_bucketed" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), tsUs(col("ts")).as("us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("us").as("pus"),
          explode(array(expr(s"us div $HourUs"),
            expr(s"us div $HourUs") + 1)).as("bkt"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("eid"), col("us").as("eus"),
          expr(s"us div $HourUs").as("bkt"))
      purchases.join(errors, Seq("bkt"))
        .where(col("eus") >= col("pus") && col("eus") < col("pus") + HourUs)
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_errors"), min(col("eid")).as("first_error"))
        .orderBy("pid")
    })
  )

  val oracle: Map[String, String] = Map(
    // Tolerance oracle: exact discrete percentiles are reproduced in
    // DuckDB (same integer-rank histogram walk); the _ok booleans are the
    // Spark-side sketch-vs-exact bound, asserted here as literal TRUE —
    // an out-of-tolerance estimate flips the cell and fails the hash.
    "q_agg_percentile_approx" ->
      """WITH hist AS (SELECT l_returnflag, l_quantity, COUNT(*) AS c
                       FROM lineitem GROUP BY 1, 2),
            tot AS (SELECT l_returnflag, CAST(SUM(c) AS BIGINT) AS n
                    FROM hist GROUP BY 1),
            cum AS (SELECT h.l_returnflag, h.l_quantity, t.n,
                      CAST(SUM(h.c) OVER (PARTITION BY h.l_returnflag
                        ORDER BY h.l_quantity
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
                    FROM hist h JOIN tot t USING (l_returnflag))
         SELECT l_returnflag, MAX(n) AS n,
                MIN(CASE WHEN cum >= (n + 1) // 2 THEN l_quantity END)
                  AS med_exact,
                MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN l_quantity END)
                  AS p90_exact,
                TRUE AS med_ok, TRUE AS p90_ok
         FROM cum GROUP BY 1 ORDER BY 1""",

    // max_by((price, key)) == "price DESC, key DESC, take first";
    // min_by == "price ASC, key ASC, take first".
    "q_agg_argmax" ->
      """WITH mx AS (SELECT l_returnflag, l_orderkey,
                            row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn
                     FROM lineitem),
            mn AS (SELECT l_returnflag, l_orderkey,
                          row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice ASC, l_orderkey ASC) AS rn
                   FROM lineitem),
            agg AS (SELECT l_returnflag, MAX(l_extendedprice) AS max_price,
                           MIN(l_extendedprice) AS min_price, COUNT(*) AS n
                    FROM lineitem GROUP BY l_returnflag)
         SELECT agg.l_returnflag,
                mx.l_orderkey AS top_order,
                mn.l_orderkey AS bottom_order,
                agg.max_price, agg.min_price, agg.n
         FROM agg
         JOIN mx ON mx.l_returnflag = agg.l_returnflag AND mx.rn = 1
         JOIN mn ON mn.l_returnflag = agg.l_returnflag AND mn.rn = 1
         ORDER BY agg.l_returnflag""",
    "q_agg_bool" ->
      """SELECT o_orderpriority,
                bool_and(o_totalprice > 10000) AS all_big,
                bool_or(o_orderstatus = 'F') AS any_finished,
                bool_and(o_custkey >= 0) AS all_nonneg,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_agg_bitagg" ->
      """SELECT event_type,
                bit_and(user_id) AS band,
                bit_or(user_id) AS bor,
                bit_xor(event_id) AS bxor,
                COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    // Scalar-equivalent oracle (DuckDB has no transform_values/map_filter;
    // the contract is value equality).
    "q_fn_map2" ->
      """SELECT event_id,
                event_id AS m_ev,
                user_id AS m_usr,
                event_id + user_id AS m_sum,
                (event_id + user_id) * 2 AS m_sum2,
                array_to_string(list_sort(
                  list_filter(['ev', 'usr', 'sum'], k ->
                    CASE k WHEN 'ev' THEN event_id
                           WHEN 'usr' THEN user_id
                           ELSE event_id + user_id END % 2 = 0)), ',')
                  AS even_keys,
                3 AS m_size
         FROM events ORDER BY event_id""",
    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS k, CAST(p_size AS DOUBLE) AS v FROM part
         UNION ALL
         SELECT p_partkey, 'retail' AS k, p_retailprice AS v FROM part
         ORDER BY p_partkey, k""",
    "q_fn_hash" ->
      """SELECT doc_id,
                md5(text) AS h_md5,
                sha256(text) AS h_sha256,
                CAST(('0x' || substr(md5(lang), 1, 15)) AS BIGINT) AS h_lang60,
                CAST(length(sha256(text)) AS INT) AS hex_len
         FROM documents ORDER BY doc_id""",
    "q_fn_encode" ->
      """SELECT doc_id,
                base64(encode(substr(text, 1, 24))) AS b64,
                decode(from_base64(base64(encode(substr(text, 1, 24)))))
                  AS roundtrip,
                lower(hex(lang)) AS lang_hex,
                decode(unhex(lower(hex(lang)))) AS lang_back,
                lower(to_hex(doc_id)) AS id_hex
         FROM documents ORDER BY doc_id""",
    "q_join_cross" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
         FROM nation CROSS JOIN region
         ORDER BY n_nationkey, r_regionkey""",
    "q_agg_corr" ->
      """WITH t AS (SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
                round((sxy - sx * sy / n)
                      / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr
         FROM t ORDER BY l_returnflag""",
    "q_agg_regr" ->
      """WITH t AS (SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
         FROM lineitem GROUP BY l_returnflag),
            sl AS (SELECT *, (sxy - sx * sy / n) / (sxx - sx * sx / n)
                             AS slope_raw FROM t)
         SELECT l_returnflag, n,
                round(slope_raw, 6) AS slope,
                round(sy / n - slope_raw * (sx / n), 6) AS intercept
         FROM sl ORDER BY l_returnflag""",
    "q_fn_stack" ->
      """SELECT p_partkey, 'size' AS k, CAST(p_size AS DOUBLE) AS v FROM part
         UNION ALL
         SELECT p_partkey, 'retail' AS k, p_retailprice AS v FROM part
         ORDER BY p_partkey, k""",
    "q_llm_centroid" ->
      """WITH q AS (SELECT label,
                           list_transform(embedding, x ->
                             CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
                    FROM embeddings),
            u AS (SELECT label, qe,
                         unnest(generate_series(1, len(qe))) AS i FROM q)
         SELECT label, CAST(i AS INT) AS i, COUNT(*) AS n_vecs,
                CAST(SUM(qe[i]) AS DOUBLE) / 1e6 / COUNT(*) AS centroid
         FROM u GROUP BY label, i ORDER BY label, i""",
    "q_fn_char" ->
      """SELECT doc_id,
                ascii(lang) AS lang_ascii,
                chr(CAST(doc_id % 26 + 97 AS INT)) AS id_chr,
                printf('%s-%05d', lang, doc_id) AS tag,
                left(text, 8) AS l8,
                right(lang, 2) AS r2
         FROM documents ORDER BY doc_id""",
    "q_fn_try" ->
      """SELECT doc_id,
                TRY_CAST(lang AS INT) AS lang_int,
                TRY_CAST(CAST(doc_id AS VARCHAR) AS INT) AS id_int,
                CAST(n_chars AS DOUBLE) / nullif(CAST(doc_id AS DOUBLE), 0)
                  AS chars_per_id,
                CAST(TRY_CAST(CAST(n_chars AS VARCHAR) AS DECIMAL(6,0)) AS BIGINT)
                  AS n_parsed
         FROM documents ORDER BY doc_id""",
    "q_fn_trig" ->
      """SELECT event_id,
                round(sin(value), 6) AS s,
                round(cos(value), 6) AS c,
                round(tan(value / 10), 6) AS t,
                round(atan2(value, 2.0), 6) AS a2,
                round(degrees(value), 6) AS deg,
                round(radians(value), 6) AS rad
         FROM events ORDER BY event_id""",
    "q_sql_q3" ->
      """SELECT l_orderkey,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue,
                epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
                o_orderpriority
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q_sql_q5" ->
      """SELECT n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_sql_q10" ->
      """SELECT c_custkey, c_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue,
                n_name
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",
    "q_sql_lateral" ->
      """SELECT r_name, n.n_name, n.n_nationkey
         FROM region r,
         LATERAL (SELECT n_name, n_nationkey FROM nation
                  WHERE n_regionkey = r.r_regionkey
                  ORDER BY n_nationkey LIMIT 2) n
         ORDER BY r_name, n_nationkey""",
    // Values must survive the to_json round-trip; the oracle states them
    // directly (cross-engine JSON text formatting differs by design).
    "q_fn_json2" ->
      """SELECT event_id,
                event_id AS rt_id,
                event_type AS rt_type,
                user_id AS rt_user
         FROM events ORDER BY event_id""",
    "q_sql_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
                epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
                o_totalprice,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_qty
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 100""",
    "q_fn_array2" ->
      """WITH t AS (SELECT event_id,
                           [user_id, event_id % 10, 7] AS a1,
                           [7, user_id + 1] AS a2
                    FROM events)
         SELECT event_id,
                coalesce(array_to_string(list_sort(list_distinct(
                    list_concat(a1, a2))), ','), '') AS a_union,
                coalesce(array_to_string(list_sort(list_filter(list_distinct(a1),
                  x -> list_contains(a2, x))), ','), '') AS a_inter,
                coalesce(array_to_string(list_sort(list_filter(list_distinct(a1),
                  x -> NOT list_contains(a2, x))), ','), '') AS a_except,
                CAST(list_position(a1, 7) AS BIGINT) AS pos7,
                CAST(len(flatten([a1, a2])) AS INT) AS n_flat,
                list_max(a1) AS amax,
                list_min(a1) AS amin
         FROM t ORDER BY event_id""",
    // The oracle states the PLAIN join — salting is an execution strategy.
    "q_join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // The oracle states the PLAIN range join — the bucketing is an
    // execution strategy, not a semantic change.
    "q_join_range_bucketed" ->
      """WITH e AS (SELECT event_id, event_type,
                           epoch_us(ts::TIMESTAMP) AS us FROM events),
            p AS (SELECT event_id AS pid, us AS pus FROM e
                  WHERE event_type = 'purchase'),
            x AS (SELECT event_id AS eid, us AS eus FROM e
                  WHERE event_type = 'error')
         SELECT pid, COUNT(*) AS n_errors, MIN(eid) AS first_error
         FROM p JOIN x ON eus >= pus AND eus < pus + 3600000000
         GROUP BY pid ORDER BY pid"""
  )
}
