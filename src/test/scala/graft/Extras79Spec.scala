package graft

import org.apache.spark.sql.functions._

class Extras79Spec extends QuerySuiteBase {
  Seq("q_evt_sprt", "q_evt_path_trigram", "q_evt_session_entropy",
    "q_evt_markov_absorb", "q_evt_conversion_window")
    .foreach(checkDeclared(_))

  test("sprt: successes bounded by trials; crossing days consistent " +
      "with the final llr sign") {
    val r = q("q_evt_sprt").head()
    val (n, sSucc) = (r.getLong(1), r.getLong(2))
    assert(sSucc >= 0 && sSucc <= n)
    assert(!r.getDouble(3).isNaN)
  }

  test("trigram paths: counts positive and ranked; paths well-formed") {
    val rows = q("q_evt_path_trigram").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
  }

  test("session entropy: entropy within [0, ln(types)]; buckets " +
      "cover all sessions") {
    val rows = q("q_evt_session_entropy").collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    rows.foreach { r =>
      val e = r.getDouble(2)
      assert(e >= -1e-6 && e <= math.log(types.toDouble) + 1e-3)
    }
    // single-event sessions have zero entropy by definition
    rows.find(_.getString(0) == "1").foreach { r =>
      assert(math.abs(r.getDouble(2)) < 1e-9)
    }
  }

  test("markov absorb: every non-purchase state present; expected " +
      "steps >= 1 (one step minimum to absorb)") {
    val rows = q("q_evt_markov_absorb").collect()
    assert(rows.forall(_.getString(0) != "purchase"))
    rows.foreach { r =>
      assert(r.getDouble(2) >= 1.0 - 1e-6)
      // 30-term truncation keeps it finite and below the horizon
      assert(r.getDouble(2) <= 31.0)
    }
  }

  test("conversion window: monotone non-decreasing in the window; " +
      "viewer count constant") {
    val rows = q("q_evt_conversion_window").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 7L, 14L))
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    val conv = rows.map(_.getLong(2))
    assert(conv.zip(conv.tail).forall { case (a, b) => a <= b })
  }
}
