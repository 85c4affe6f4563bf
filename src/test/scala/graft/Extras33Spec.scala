package graft

import org.apache.spark.sql.functions._

class Extras33Spec extends QuerySuiteBase {
  Seq("q_evt_churn", "q_snapshot_diff", "q_ts_theil_sen",
    "q_dq_referential", "q_llm_dup_ngrams")
    .foreach(checkDeclared(_))

  test("churn: retained bounded by active, rates consistent") {
    val rows = q("q_evt_churn").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (active, retained, churned) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(retained <= active)
      assert(churned == active - retained)
      assert(r.getDouble(4) == churned.toDouble / active.toDouble)
    }
    // the last week must be excluded (no successor week to retain into)
    val lastWeekStart = Tables.events(spark, sf)
      .select(expr("date_add(DATE '2020-01-06', " +
        "cast((datediff(to_date(ts), DATE '2020-01-06') div 7) * 7 as int))")
        .as("w"))
      .agg(max(col("w"))).collect()(0).getDate(0)
    assert(!rows.map(_.getDate(0)).contains(lastWeekStart))
  }

  test("snapshot diff: classes reconcile against the base table") {
    val m = q("q_snapshot_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = Tables.orders(spark, sf)
    val nAdded = base.where(col("o_orderkey") % 101 === 0).count()
    val nRemoved = base.where(col("o_orderstatus") === "F" &&
      col("o_orderkey") % 97 === 0).count()
    val nChanged = base.where(col("o_orderstatus") === "P").count()
    assert(m("added")._1 == nAdded)
    assert(m("removed")._1 == nRemoved)
    assert(m("changed")._1 == nChanged)
    assert(m("unchanged")._1 ==
      base.count() - nRemoved - nChanged)
    // unchanged rows contribute zero delta; removed contribute negative
    assert(m("unchanged")._2 == 0L)
    assert(m("removed")._2 < 0L)
    // changed delta equals the P-partition base cents (x2 - x1 = x1)
    val pCents = base.where(col("o_orderstatus") === "P")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).collect()(0).getLong(0)
    assert(m("changed")._2 == pCents)
  }

  test("theil-sen: pair counts are n*(n-1)/2 of the day grain") {
    val rows = q("q_ts_theil_sen").collect()
    assert(rows.nonEmpty)
    val dayCounts = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = dayCounts(r.getString(0))
      assert(r.getLong(1) == n * (n - 1) / 2)
    }
  }

  test("referential audit: clean star schema has zero orphans") {
    val rows = q("q_dq_referential").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) == 0L, s"${r.getString(0)} has orphans")
      assert(r.getDouble(3) == 0.0)
    }
  }

  test("dup ngrams: every hit repeats, rank order strict") {
    val rows = q("q_llm_dup_ngrams").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    rows.foreach { r =>
      assert(r.getLong(2) > 1)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(2))
      assert(r.getString(1).split(" ", -1).length == 5)
    }
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
  }
}
