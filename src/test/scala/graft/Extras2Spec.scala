package graft

import org.apache.spark.sql.functions._

class Extras2Spec extends QuerySuiteBase {
  Seq("q_agg_argmax", "q_agg_bool", "q_agg_bitagg", "q_fn_map2",
    "q_unpivot", "q_fn_hash", "q_fn_encode", "q_join_cross",
    "q_agg_percentile_approx", "q_join_range_bucketed", "q_llm_ann_lsh",
    "q_agg_corr", "q_llm_centroid", "q_fn_char", "q_join_salted",
    "q_sql_q3", "q_fn_array2", "q_fn_trig", "q_win_analytic2",
    "q_llm_frames", "q_sql_q5", "q_sql_q10", "q_fn_try", "q_sql_q18",
    "q_agg_regr", "q_fn_stack", "q_sql_lateral", "q_fn_json2")
    .foreach(checkDeclared(_))

  test("regression slope equals covariance / variance across queries") {
    // Cross-query identity: q_agg_regr.slope == q_agg_corr.covar_samp /
    // q_agg_stats.var_qty per group (the (n-1) normalizations cancel).
    val slope = q("q_agg_regr").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("slope")).toMap
    val covar = q("q_agg_corr").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("covar_samp")).toMap
    val varq = q("q_agg_stats").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("var_qty")).toMap
    slope.foreach { case (flag, s) =>
      val expected = covar(flag) / varq(flag)
      assert(math.abs(s - expected) < 1e-4,
        s"$flag: slope $s != covar/var $expected")
    }
  }

  test("frame sampling keeps every 4th frame with correct offsets") {
    val fr = q("q_llm_frames")
    assert(fr.where(col("frame_idx") % 4 =!= 0).count() == 0)
    assert(fr.where(col("frame_off") =!= col("frame_idx") * 64).count() == 0)
    assert(fr.where(col("frame_len") < 1 || col("frame_len") > 64).count() == 0)
  }

  test("SQL-text Q3 equals the same query built with the DataFrame DSL") {
    val dsl = Tables.customer(spark, sf)
      .where(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(Det.dec(col("l_extendedprice"))
        * (lit(1).cast(Det.D2) - Det.dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        Det.tsUs(col("o_orderdate")).as("odate_us"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    assert(q("q_sql_q3").collect().map(_.toString).toSeq
      == dsl.collect().map(_.toString).toSeq)
  }

  test("salted join equals the plain join (salting is semantics-free)") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice")).as("rev"))
      .orderBy("o_orderpriority")
    assert(q("q_join_salted").collect().map(_.toString).toSeq
      == plain.collect().map(_.toString).toSeq)
  }

  test("centroid: every label yields exactly dim=64 components") {
    val perLabel = q("q_llm_centroid").groupBy("label").count().collect()
    assert(perLabel.nonEmpty)
    assert(perLabel.forall(_.getAs[Long]("count") == 64))
  }

  test("corr is within [-1, 1] and covar matches corr's sign") {
    val rows = q("q_agg_corr").collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("corr")) <= 1.000001))
    assert(rows.forall(r =>
      r.getAs[Double]("corr").sign == r.getAs[Double]("covar_samp").sign))
  }

  test("argmax: the selected orderkey really carries the group max price") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag").as("flag"),
        col("l_extendedprice"))
    val am = q("q_agg_argmax")
    val bad = am.join(li,
        am("top_order") === li("l_orderkey") && am("l_returnflag") === li("flag"))
      .groupBy(col("top_order"), col("max_price"))
      .agg(max(col("l_extendedprice")).as("seen"))
      .where(col("seen") =!= col("max_price")).count()
    assert(bad == 0)
  }

  test("unpivot doubles the row count and loses no keys") {
    val parts = Tables.part(spark, sf).count()
    val up = q("q_unpivot")
    assert(up.count() == 2 * parts)
    assert(up.select("p_partkey").distinct().count() == parts)
  }

  test("encode: base64/hex round-trips reproduce the source text") {
    val bad = q("q_fn_encode").join(
        Tables.documents(spark, sf)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("head"),
            col("lang")),
        "doc_id")
      .where(col("roundtrip") =!= col("head")
        || col("lang_back") =!= col("lang")).count()
    assert(bad == 0)
  }

  test("range-bucketed join equals the plain theta-range join") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), Det.tsUs(col("ts")).as("us"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("us").as("pus"))
    val e = ev.where(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("us").as("eus"))
    val theta = p.join(e,
        col("eus") >= col("pus") && col("eus") < col("pus") + 3600000000L)
      .groupBy("pid")
      .agg(count(lit(1)).as("n_errors"), min(col("eid")).as("first_error"))
    val got = fingerprintOf(q("q_join_range_bucketed"))
    val want = fingerprintOf(theta.orderBy("pid"))
    assert(got == want, "bucketized plan must not change join semantics")
  }

  test("LSH ANN: 5 rows, descending scores, query's own vector excluded") {
    val rows = q("q_llm_ann_lsh").collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L))
  }

  test("LSH ANN results are a subset of the exact top-k candidate scores") {
    // Every LSH hit must appear in the exact brute-force ranking with the
    // SAME score (the sketch prunes candidates; it must not alter scores).
    val exact = q("q_llm_sim_topk").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    q("q_llm_ann_lsh").collect().foreach { r =>
      val v = r.getAs[Long]("vec_id")
      exact.get(v).foreach(s => assert(s == r.getAs[Double]("score")))
    }
  }

  private def fingerprintOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq
}
