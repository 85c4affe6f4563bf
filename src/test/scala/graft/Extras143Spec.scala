package graft

import org.apache.spark.sql.functions._

class Extras143Spec extends QuerySuiteBase {
  Seq("q_ts_circular_hour", "q_llm_sentences", "q_evt_velocity_max",
    "q_agg_benford_mad").foreach(checkDeclared(_))

  test("circular hour: r in [0,1], mean_hour consistent with mean_angle") {
    val r = q("q_ts_circular_hour").head()
    val (ang, res, mh) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(res >= 0.0 && res <= 1.0)
    val expected = ((ang / (2 * math.Pi) * 24.0) + 24.0) % 24.0
    assert(math.abs(mh - expected) < 1e-4)
    assert(mh >= 0.0 && mh < 24.0)
  }

  test("sentences: doc counts cover the corpus, words positive") {
    val rows = q("q_llm_sentences").collect()
    val nDocs = rows.map(_.getLong(1)).sum
    val corpus = Tables.documents(spark, sf)
      .where(length(trim(col("text"))) > 0).count()
    assert(nDocs == corpus)
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(2) > 0))
  }

  test("velocity: peak bounded by total events, sorted desc") {
    val rows = q("q_evt_velocity_max").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (peak, n) => assert(peak >= 1 && peak <= n) }
    assert(rows.map(_._1).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)))
  }

  test("benford mad: recomputable from the digit table") {
    val digits = q("q_ts_benford").collect()
      .map(r => (r.getInt(0), r.getDouble(2)))
    val mad = digits.map { case (d, share) =>
      math.round(math.abs(share - math.log10(1.0 + 1.0 / d)) * 1e9) / 1e9
    }.sum / digits.length
    val r = q("q_agg_benford_mad").head()
    assert(r.getLong(0) == digits.length)
    assert(math.abs(r.getDouble(2) - mad) < 1e-5)
  }
}
