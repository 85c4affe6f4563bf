package graft

import org.apache.spark.sql.functions._

class Extras43Spec extends QuerySuiteBase {
  Seq("q_layout_manifest", "q_layout_compaction", "q_evt_decay_score",
    "q_llm_ppl_buckets", "q_ts_calendar_adjust", "q_evt_user_diversity")
    .foreach(checkDeclared(_))

  test("manifest: one file per partition, stats cover every order") {
    val rows = q("q_layout_manifest").collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    assert(rows.forall(_.getLong(1) == 1L)) // pinned layout invariant
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("compaction: 64 -> 4 files, rows and cents preserved") {
    val r = q("q_layout_compaction").head()
    assert(r.getLong(0) == 64 && r.getLong(3) == 4)
    assert(r.getLong(1) == r.getLong(4)) // rows survive
    assert(r.getLong(2) == r.getLong(5)) // revenue survives
  }

  test("decay score: bounded by n_events * 2^32; anchored at max day") {
    val rows = q("q_evt_decay_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      assert(s >= 1L && s <= n * 4294967296L)
      assert(math.abs(r.getDouble(3) - s / 4294967296.0) < 1e-9)
    }
    // descending by exact integer score
    val ss = rows.map(_.getLong(2))
    ss.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }

  test("ppl buckets: terciles partition the corpus within 1 doc") {
    val rows = q("q_llm_ppl_buckets").collect()
    val byBucket = rows.groupBy(_.getInt(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byBucket.keySet == Set(1, 2, 3))
    val sizes = byBucket.values.toSeq
    assert(sizes.max - sizes.min <= 1) // ntile(3) balance
    val nDocs = Tables.documents(spark, sf).count()
    assert(sizes.sum == nDocs)
    // head bucket reads lower avg bits than tail bucket
    val avg = (b: Int) => {
      val rs = rows.filter(_.getInt(1) == b)
      rs.map(_.getLong(3)).sum.toDouble / rs.map(_.getLong(4)).sum
    }
    assert(avg(1) <= avg(3))
  }

  test("calendar adjust: weekday mix deflates/inflates around 1") {
    val rows = q("q_ts_calendar_adjust").collect()
    assert(rows.nonEmpty)
    val rawSum = rows.map(_.getLong(2)).sum
    val adjSum = rows.map(_.getLong(3)).sum
    // adjustment redistributes mass, totals agree within rounding noise
    assert(math.abs(adjSum - rawSum).toDouble / rawSum < 0.01)
    rows.foreach(r => assert(r.getDouble(4) > 0.5 && r.getDouble(4) < 2.0))
  }

  test("user diversity: entropy bounded by log2(n_types)") {
    val rows = q("q_evt_user_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, e) = (r.getLong(0), r.getDouble(3))
      assert(e >= -1e-9 &&
        e <= math.log(t.toDouble) / math.log(2.0) + 1e-9)
    }
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
  }
}
