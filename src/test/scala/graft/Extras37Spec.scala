package graft

import org.apache.spark.sql.functions._

class Extras37Spec extends QuerySuiteBase {
  Seq("q_llm_sig_store", "q_agg_histogram_eqdepth", "q_join_asof_fwd")
    .foreach(checkDeclared(_))

  test("sig store matches an inline recomputation of the signatures") {
    // the store is a FixtureCache artifact; a stale/corrupt store must
    // not match a fresh in-process build of the same universal family
    val p = 2147483647L
    val store = q("q_llm_sig_store")
    val ws = split(col("text"), " ")
    val hm = Tables.documents(spark, sf)
      .where(size(ws) >= 3)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", slice(ws, i + 1, lit(3)))))).as("s0"))
      .select(col("doc_id"),
        (conv(substring(md5(col("s0")), 1, 15), 16, 10).cast("long") % p)
          .as("h"))
    val minCols = (0 until 16).map(j =>
      min((lit(2L * j + 1) * col("h") + lit(12345L * j)) % p).as(s"mh$j"))
    val fresh = hm.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    assert(store.exceptAll(fresh).count() == 0
      && fresh.exceptAll(store).count() == 0)
  }

  test("equi-depth histogram: monotone boundaries, final decile is max") {
    val rows = q("q_agg_histogram_eqdepth").collect()
    assert(rows.length == 10)
    val bounds = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    bounds.zip(bounds.tail).foreach { case (a, b) => assert(a <= b) }
    val mx = Tables.lineitem(spark, sf)
      .agg(max((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long"))).head().getLong(0)
    assert(bounds.last == mx)
  }

  test("forward as-of: next click is at/after the purchase, earliest such") {
    val rows = q("q_join_asof_fwd").collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(4) >= 0, "next click must not precede the purchase")
      assert(r.getLong(3) == r.getLong(2) + r.getLong(4))
    }
    // spot-check one purchase against a brute-force recompute
    val sample = rows.filter(!_.isNullAt(3)).head
    val uid = sample.getLong(1); val ts = sample.getLong(2)
    val brute = Tables.events(spark, sf)
      .where(col("event_type") === "click" && col("user_id") === uid)
      .select(expr("unix_micros(cast(ts as timestamp))").as("us"))
      .where(col("us") >= ts)
      .agg(min(col("us"))).head().getLong(0)
    assert(brute == sample.getLong(3))
  }
}
