package graft

import org.apache.spark.sql.functions._

class Extras80Spec extends QuerySuiteBase {
  Seq("q_llm_frame_dedup", "q_llm_modality_router", "q_llm_dedup_prefix",
    "q_llm_length_outliers").foreach(checkDeclared(_))

  test("frame dedup: histogram accounts for every frame of every doc") {
    val rows = q("q_llm_frame_dedup").collect()
    val totFrames = Tables.documents(spark, sf)
      .select(expr("(length(text) + 63) div 64").cast("long").as("f"))
      .agg(sum(col("f"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == totFrames)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
  }

  test("modality router: three routes partition the corpus; batch " +
      "count >= doc count") {
    val rows = q("q_llm_modality_router").collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("image", "audio", "video")))
    val totDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == totDocs)
    rows.foreach { r =>
      assert(r.getLong(4) >= r.getLong(1)) // >= 1 batch per doc
      assert(r.getLong(3) <= r.getLong(2)) // max <= total
    }
  }

  test("prefix dedup: groups have >= 2 members; keepers are real docs") {
    val rows = q("q_llm_dedup_prefix").collect()
    rows.foreach(r => assert(r.getLong(1) >= 2))
    val keepers = rows.map(_.getLong(0)).toSet
    if (keepers.nonEmpty) {
      val present = Tables.documents(spark, sf)
        .where(col("doc_id").isin(keepers.toSeq: _*)).count()
      assert(present == keepers.size)
    }
  }

  test("length outliers: outliers bounded by docs; MAD gate sanity " +
      "against a recomputed source") {
    val rows = q("q_llm_length_outliers").collect()
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))
      assert(r.getLong(3) >= 0)
    }
    // recompute one source by hand
    val src = rows.head.getString(0)
    val lens = Tables.documents(spark, sf)
      .where(col("source") === src)
      .orderBy(col("n_chars"), col("doc_id"))
      .select(col("n_chars")).collect().map(_.getLong(0))
    val med = lens((lens.length + 1) / 2 - 1)
    val devs = lens.map(x => math.abs(x - med)).sorted
    val mad = devs((devs.length + 1) / 2 - 1)
    val out = lens.count(x => math.abs(x - med) * 10 > mad * 25)
    val row = rows.find(_.getString(0) == src).get
    assert(row.getLong(2) == med && row.getLong(3) == mad
      && row.getLong(4) == out)
  }
}
