package graft

import org.apache.spark.sql.functions._

class Extras147Spec extends QuerySuiteBase {
  Seq("q_stream_live_router", "q_evt_match_recognize",
    "q_graph_densest", "q_sql_unpivot_multi").foreach(checkDeclared(_))

  test("match_recognize agrees with a brute-force sequence scanner") {
    // Independent ground truth: rebuild every per-user sequence, scan
    // it with a hand-rolled non-overlapping matcher (AFTER MATCH SKIP
    // PAST LAST ROW), and compare count + first-match bounds per user.
    val seqs = Tables.events(spark, sf)
      .withColumn("ch",
        when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(Det.tsUs(col("ts")).as("t"),
          col("event_id").as("i"), col("ch").as("ch")))),
        x => x.getField("ch")), "").as("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute force: at each i, match v+ (maximal run) then literal cp
    def scan(s: String): (Long, Long, Long) = {
      var i = 0; var n = 0L; var fs = 0L; var fl = 0L
      while (i < s.length) {
        if (s(i) == 'v') {
          var j = i
          while (j < s.length && s(j) == 'v') j += 1
          if (j + 1 < s.length && s(j) == 'c' && s(j + 1) == 'p') {
            n += 1
            if (n == 1) { fs = i + 1; fl = (j + 2 - i).toLong }
            i = j + 2 // skip past last row
          } else i = j // no match can start inside the v-run
        } else i += 1
      }
      (n, fs, fl)
    }
    val got = q("q_evt_match_recognize").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = seqs.view.mapValues(scan).filter(_._2._1 >= 1).toMap
    assert(got == want,
      s"scanner mismatch: extra=${got.keySet -- want.keySet} " +
        s"missing=${want.keySet -- got.keySet} " +
        s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) => (k, v, want(k)) }.take(3)}")
  }

  test("densest: nodes strictly shrink per peel round, density tracked") {
    val rows = q("q_graph_densest").collect()
    assert(rows.nonEmpty && rows.head.getLong(0) == 0)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) < a.getLong(1), "peel must remove nodes")
        assert(b.getLong(2) <= a.getLong(2))
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(3) >= 0.5 - 1e-9,
      "connected surviving nodes have degree >= 1 => density >= 1/2"))
  }

  test("router: matched rows inside the 1h window, unmatched decided") {
    val rows = q("q_stream_live_router").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(0)) {
        val (pUs, cUs) = (r.getLong(3), r.getLong(4))
        assert(cUs <= pUs && pUs - cUs <= 3600000000L)
      } else assert(r.isNullAt(3), "null purchase must null p_us")
    }
  }

  test("unpivot multi: both measure pairs melt to equal-count groups") {
    val rows = q("q_sql_unpivot_multi").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("base", "rates"))
    assert(rows(0).getLong(1) == rows(1).getLong(1),
      "both groups melt one row per lineitem")
    val qtyCents = Tables.lineitem(spark, sf)
      .agg(sum((Det.dec(col("l_quantity")) * 100).cast("long")))
      .head().getLong(0)
    assert(rows(0).getLong(2) == qtyCents, "lane a of 'base' = quantity")
  }
}
