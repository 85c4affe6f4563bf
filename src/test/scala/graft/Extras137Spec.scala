package graft

import org.apache.spark.sql.functions._

class Extras137Spec extends QuerySuiteBase {
  Seq("q_llm_ann_ivfpq", "q_llm_dedup_incremental", "q_sql_lateral_view",
    "q_win_listagg").foreach(checkDeclared(_))

  test("ivfpq: per-query ranks are 1..k by true distance, ADC nonneg") {
    val rows = q("q_llm_ann_ivfpq").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to ranked.length))
      val dists = ranked.map(_.getDouble(4))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      assert(rs.forall(_.getDouble(3) >= 0.0))
    }
  }

  test("incremental dedup == batch-global near-dup restricted to batch×store") {
    // The verdict-item-4 equivalence: deduping the new batch against the
    // persisted store must find EXACTLY the batch-store pairs the
    // batch-global minhash dedup finds (same bands, same verify).
    val global = q("q_llm_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 4 == 0) != (b % 4 == 0) }
      .map { case (a, b) => if (a % 4 == 0) (a, b) else (b, a) }
    val expected = global.groupBy(_._1).map { case (bd, ps) =>
      bd -> (ps.map(_._2).min, ps.length.toLong) }
    val inc = q("q_llm_dedup_incremental").collect()
    val found = inc.filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(found == expected,
      s"incremental $found != batch-global-restricted $expected")
    // keep flag is the complement of a found duplicate
    inc.foreach(r => assert(r.getBoolean(3) == r.isNullAt(1)))
  }

  test("lateral view: every word >= 3 chars with n >= 50, at most 40 rows") {
    val rows = q("q_sql_lateral_view").collect()
    assert(rows.length <= 40)
    assert(rows.forall(r => r.getString(0).length >= 3 && r.getLong(1) >= 50))
  }

  test("windowed listagg: path grows by one segment per row, ends at pr") {
    val rows = q("q_win_listagg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      // re-sort by the window's (dt, orderkey) order proxy: path length
      val sorted = rs.sortBy(_._4.length)
      sorted.zipWithIndex.foreach { case ((_, _, pr, path), i) =>
        val segs = path.split(">")
        assert(segs.length == i + 1, s"row $i path $path")
        assert(segs.last == pr)
      }
    }
  }
}
