package graft

import org.apache.spark.sql.functions._

class Extras3Spec extends QuerySuiteBase {
  Seq("q_fn_date3", "q_fn_strmap", "q_agg_mode", "q_agg_listagg",
    "q_scan_tail", "q_sql_q6", "q_sql_q14", "q_fn_string3",
    "q_agg_moments", "q_sql_cte", "q_llm_split", "q_llm_pack",
    "q_llm_resize", "q_sql_recursive")
    .foreach(checkDeclared(_))

  test("recursive sessionization equals the gaps-and-islands twin") {
    // Same 30-min gap definition ⇒ same session count, and each
    // recursive session's size distribution matches q_stream_session's.
    val rec = q("q_sql_recursive")
    val gai = q("q_stream_session")
    assert(rec.count() == gai.count())
    val recSizes = rec.groupBy("n_events").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gaiSizes = gai.groupBy("n").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recSizes == gaiSizes)
  }

  test("resize: 8-char thumbnail whose ends are the payload's ends") {
    val bad = q("q_llm_resize")
      .join(Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")), "doc_id")
      .where(length(col("thumb")) =!= 8
        || substring(col("thumb"), 1, 1) =!= substring(col("text"), 1, 1)
        || substring(col("thumb"), 8, 1) =!=
           substring(col("text"), -1, 1))
      .count()
    assert(bad == 0)
  }

  test("split: partitions the corpus, ~80/10/10, and is rerun-stable") {
    val total = Tables.documents(spark, sf).count()
    val rows = q("q_llm_split").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("n_docs")).sum }
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // Deterministic: a second evaluation is bit-identical.
    assert(q("q_llm_split").collect().map(_.toString).toSeq
      == rows.map(_.toString).toSeq)
  }

  test("pack: shards cover every doc and respect the token budget") {
    val packed = q("q_llm_pack").collect()
    val total = Tables.documents(spark, sf).count()
    assert(packed.map(_.getAs[Long]("n_docs")).sum == total)
    // Every shard except possibly a language's last starts because the
    // previous one crossed the 20k budget: all non-final shards of a lang
    // must hold >= 20000 - (max doc token len) tokens. Weak-form check:
    // per lang, shard ids are contiguous from 0.
    packed.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("shard")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
    }
  }

  test("moments: exact mean/variance agree with built-in avg/var_pop") {
    // The exact-decimal derivation must land within float tolerance of
    // the streaming built-ins (which are not hash-safe but are accurate).
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity") * 100).as("a"),
        var_pop(col("l_quantity") * 100).as("vp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    q("q_agg_moments").collect().foreach { r =>
      val (a, vp) = builtin(r.getString(0))
      assert(math.abs(r.getAs[Double]("mean") - a) < 1e-6)
      assert(math.abs(r.getAs[Double]("v") - vp) < 1e-3)
    }
  }

  test("moments: skewness/kurtosis agree with the streaming built-ins") {
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    q("q_agg_moments").collect().foreach { r =>
      val (sk, ku) = builtin(r.getString(0))
      assert(math.abs(r.getAs[Double]("skew") - sk) < 1e-6)
      assert(math.abs(r.getAs[Double]("kurt") - ku) < 1e-6)
    }
  }

  test("CTE SQL text: at most 2 rows per customer, rank-1 price >= rank-2") {
    val rows = q("q_sql_cte").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(rows.values.forall(_.length <= 2))
    rows.values.filter(_.length == 2).foreach { g =>
      val byRn = g.sortBy(_.getAs[Int]("rn"))
      assert(byRn(0).getAs[Double]("price") >= byRn(1).getAs[Double]("price"))
    }
  }

  test("date3: every derived date respects its contract") {
    val rows = q("q_fn_date3")
    // end-of-month is never before the date's own day, and always in the
    // same month; next_mon is 1..7 days ahead and always a Monday.
    val bad = rows
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("d")), "o_orderkey")
      .where(col("eom") < date_format(col("d"), "yyyy-MM-dd")
        || month(to_date(col("eom"))) =!= month(col("d"))
        || datediff(to_date(col("next_mon")), col("d")) < 1
        || datediff(to_date(col("next_mon")), col("d")) > 7
        || dayofweek(to_date(col("next_mon"))) =!= 2)
      .count()
    assert(bad == 0)
  }

  test("strmap parses back exactly the fields it was built from") {
    val bad = q("q_fn_strmap")
      .join(Tables.documents(spark, sf), "doc_id")
      .where(col("v_lang") =!= col("lang")
        || col("v_src") =!= col("source")
        || col("v_n") =!= col("n_chars"))
      .count()
    assert(bad == 0)
  }

  test("mode really is the most frequent quantity per flag") {
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    val maxN = counts.groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("max_n"))
    val bad = q("q_agg_mode").join(maxN, "l_returnflag")
      .where(col("n_mode") =!= col("max_n")).count()
    assert(bad == 0)
  }

  test("listagg output is ordered and complete per region") {
    q("q_agg_listagg").collect().foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts == parts.sorted, "WITHIN GROUP ordering must hold")
      assert(parts.length == r.getAs[Long]("n"))
    }
  }

  test("tail read returns exactly the 100 highest offsets, ascending") {
    val maxId = Tables.events(spark, sf)
      .agg(max(col("event_id"))).head().getLong(0)
    val ids = q("q_scan_tail").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (maxId - 99 to maxId).toSeq)
  }

  test("SQL-text Q6 equals the DSL formulation") {
    val dsl = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg((sum(Det.dec(col("l_extendedprice")) * Det.dec(col("l_discount"))))
        .cast("double").as("revenue"), count(lit(1)).as("n"))
    assert(q("q_sql_q6").collect().map(_.toString).toSeq
      == dsl.collect().map(_.toString).toSeq)
  }

  test("Q14 promo share sits strictly between 0 and 100") {
    val v = q("q_sql_q14").head().getAs[Double]("promo_revenue")
    assert(v > 0.0 && v < 100.0)
  }
}
