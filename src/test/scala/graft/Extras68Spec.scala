package graft

class Extras68Spec extends QuerySuiteBase {
  Seq("q_stream_live_mor", "q_llm_ann_ivf_label").foreach(checkDeclared(_))

  test("streaming MoR: merged totals equal the whole-table aggregate") {
    val rows = q("q_stream_live_mor").collect()
    val totalN = rows.map(_.getLong(1)).sum
    val allEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(totalN == allEvents)
    // provenance flags: every row is in at least one side
    assert(rows.forall(r => r.getBoolean(3) || r.getBoolean(4)))
  }

  test("per-label IVF: 5 neighbors, none the query itself, scores ordered") {
    val rows = q("q_llm_ann_ivf_label").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) != 0L))
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
