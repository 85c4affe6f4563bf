package graft

import org.apache.spark.sql.functions._

class Extras161Spec extends QuerySuiteBase {
  Seq("q_graph_triad_census_man", "q_stream_live_semi")
    .foreach(checkDeclared(_))

  test("man census: 16 complete classes, totals cross-check the census") {
    val man = q("q_graph_triad_census_man").collect()
    assert(man.length == 16)
    assert(man.map(_.getString(0)).toSet == Set("003", "012", "102",
      "021D", "021U", "021C", "111D", "111U", "030T", "030C", "201",
      "120D", "120U", "120C", "210", "300"))
    val census = q("q_graph_triad_census").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val byClass = man.map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-class counts equal the base census rows under the mapping
    graft.operators.Extras161.manClasses.foreach { case (code, cls) =>
      assert(byClass(cls) == census.getOrElse(code, 0L),
        s"$cls (code $code)")
    }
    // totals: sum over classes == C(n,3) for SOME integer n (the
    // census's node universe) — recover n from the total and require
    // an exact fit
    val total = man.map(_.getLong(1)).sum
    val n = (3 to 100000).find(m =>
      m.toLong * (m - 1) * (m - 2) / 6 == total)
    assert(n.isDefined, s"census total $total is not a C(n,3)")
  }

  test("semi join: matches the batch EXISTS on the decided region") {
    val got = q("q_stream_live_semi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent batch recomputation (no streaming path)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        Det.tsUs(col("ts")).as("us"), col("event_type"))
    val wm = ev.agg(least(
      max(when(col("event_type") === "purchase", col("us")))
        - lit(600000000L),
      max(when(col("event_type") === "click", col("us")))
        - lit(4200000000L))).head().getLong(0)
    val p = ev.where(col("event_type") === "purchase").collect()
    val c = ev.where(col("event_type") === "click")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val expect = p.filter { r =>
      r.getLong(2) < wm - 1200000000L &&
        c.exists { case (u, cu) => u == r.getLong(1) &&
          cu >= r.getLong(2) - 3600000000L && cu <= r.getLong(2) }
    }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    assert(got.nonEmpty)
  }
}
