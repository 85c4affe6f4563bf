package graft

import org.apache.spark.sql.functions._

class Extras34Spec extends QuerySuiteBase {
  Seq("q_llm_pii_audit", "q_agg_entropy", "q_source_bloom",
    "q_evt_streak_weekly", "q_ts_wma", "q_win_reset_cumsum")
    .foreach(checkDeclared(_))

  test("pii scrub: injected PII is found and fully redacted") {
    val rows = q("q_llm_pii_audit").collect()
    val (docs, de, dp, he, hp, delta) = rows.foldLeft((0L, 0L, 0L, 0L, 0L, 0L)) {
      case ((a, b, c, x, y, z), r) =>
        (a + r.getLong(1), b + r.getLong(2), c + r.getLong(3),
          x + r.getLong(4), y + r.getLong(5), z + r.getLong(6))
    }
    // every doc_id % 7 == 0 carries exactly one injected email, every
    // % 11 == 0 exactly one phone — the detector must find exactly those
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(docs == ids.length)
    assert(he == ids.count(_ % 7 == 0), s"email hits $he")
    assert(hp == ids.count(_ % 11 == 0), s"phone hits $hp")
    assert(de == he && dp == hp) // one hit per flagged doc
    // redaction shrinks: every email is longer than "<EMAIL>", every
    // phone (12 chars) exactly matches its "<PHONE>" (7) + 5
    assert(delta > 0)
  }

  test("entropy: bounds 0 <= H <= log2(k), zero for single-lang sources") {
    q("q_agg_entropy").collect().foreach { r =>
      val (k, hnb) = (r.getLong(2), r.getLong(3))
      assert(hnb >= 0)
      val maxNb = math.ceil(math.log(k.toDouble) / math.log(2.0) * 1e9).toLong
      assert(hnb <= maxNb + k, s"H=$hnb nb exceeds log2($k)") // +k: per-term rounding slack
      if (k == 1) assert(hnb == 0)
    }
  }

  test("bloom probe returns exactly the min-custkey orders") {
    val k = Tables.orders(spark, sf).agg(min(col("o_custkey")))
      .head().getLong(0)
    val expected = Tables.orders(spark, sf)
      .where(col("o_custkey") === k).count()
    val got = q("q_source_bloom")
    assert(got.count() == expected)
    assert(got.where(col("o_custkey") =!= k).count() == 0)
  }

  test("weekly streaks reconcile with raw (user, week) grain") {
    val rows = q("q_evt_streak_weekly").collect()
    val raw = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '2020-01-06') div 7").as("wk"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.length == raw.size)
    rows.foreach { r =>
      assert(r.getLong(1) == raw(r.getLong(0))) // n_weeks == distinct weeks
      assert(r.getLong(3) <= r.getLong(1))      // max_streak <= n_weeks
      assert(r.getLong(2) >= 1)
    }
  }

  test("wma: numerator reconciles with 28x the mean; flat series fixpoint") {
    val rows = q("q_ts_wma").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / 28.0)
      assert(r.getLong(2) >= 0)
    }
  }

  test("reset cumsum: session-final running sum equals the session total") {
    val df = q("q_win_reset_cumsum")
    // value >= 0 in the testdata, so run_cents is non-decreasing within
    // a session and its MAX is the session-final cumulative — which must
    // equal the independent sum of that session's event cents
    val ev = Tables.events(spark, sf).select(col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val bad = df.join(ev, "event_id")
      .groupBy(col("user_id"), col("sess"))
      .agg(max(col("run_cents")).as("fin"), sum(col("cents")).as("tot"))
      .where(col("fin") =!= col("tot")).count()
    assert(bad == 0)
    assert(df.count() == Tables.events(spark, sf).count())
  }
}
