package graft

import org.apache.spark.sql.functions._

class Extras27Spec extends QuerySuiteBase {
  Seq("q_graph_hits", "q_sql_grouping_id", "q_evt_burst_dow",
    "q_agg_winsorized_mean", "q_source_csv_quoted", "q_scan_keyset")
    .foreach(checkDeclared(_))

  test("hits: five authorities, shares in (0,1] with exactly one 1") {
    val rows = q("q_graph_hits").collect()
    assert(rows.length == 5)
    val shares = rows.map(_.getDouble(3))
    assert(shares.forall(s => s > 0 && s <= 1.0))
    assert(shares.count(_ == 1.0) >= 1)
    // 2-hop mass dominates raw degree mass
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("grouping id: flags separate data NULLs from rollup NULLs") {
    val rows = q("q_sql_grouping_id").collect()
    // the grand total row: everything grouped away
    val grand = rows.filter(_.getInt(4) == 3)
    assert(grand.length == 1)
    assert(grand.head.getLong(5) == Tables.orders(spark, sf).count())
    // data-NULL rows at detail level: prio null but GROUPING(prio)=0
    val dataNull = rows.filter(r =>
      r.getInt(4) == 0 && r.isNullAt(0))
    assert(dataNull.nonEmpty) // the 3-MEDIUM class we nulled
    // rollup rows: GROUPING(status)=1, status null by construction
    rows.filter(_.getInt(4) == 1).foreach(r => assert(r.isNullAt(1)))
  }

  test("burst dow: flagged counts above their own weekday mean") {
    val rows = q("q_evt_burst_dow").collect()
    rows.foreach { r =>
      assert(r.getLong(3).toDouble > r.getDouble(4))
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 7)
    }
  }

  test("winsorized mean: between trimmed-tail bounds and plain mean sanity") {
    val rows = q("q_agg_winsorized_mean").collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("A", "N", "R"))
    val plain = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg((sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("double")
        / count(lit(1)).cast("double") / lit(100.0)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val w = r.getDouble(2)
      // clamping the upper tail of a right-skewed price distribution
      // cannot raise the mean above 2x or below half the plain mean
      assert(w > plain(r.getString(0)) / 2 && w < plain(r.getString(0)) * 2)
    }
  }

  test("csv quoted: embedded delimiters and quotes round-trip exactly") {
    val rows = q("q_source_csv_quoted").collect()
    val segs = Tables.customer(spark, sf)
      .select(countDistinct(col("c_mktsegment"))).head.getLong(0)
    assert(rows.length == segs)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(s.startsWith("SEG, ") && s.endsWith(" \"Q\""))
    }
    assert(rows.map(_.getLong(1)).sum
      == Tables.customer(spark, sf).count())
  }

  test("keyset: page 3 = rows 101..150 of the keyset order") {
    val rows = q("q_scan_keyset").collect()
    assert(rows.length == 50)
    val truth = Tables.orders(spark, sf)
      .select(col("o_orderkey")).orderBy("o_orderkey")
      .limit(150).collect().map(_.getLong(0)).slice(100, 150)
    assert(rows.map(_.getLong(0)).sameElements(truth))
  }
}
