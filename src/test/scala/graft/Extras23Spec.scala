package graft

import org.apache.spark.sql.functions._

class Extras23Spec extends QuerySuiteBase {
  Seq("q_agg_ks_test", "q_agg_mannwhitney", "q_join_fuzzy",
    "q_ts_bollinger", "q_ts_islands", "q_evt_cohort")
    .foreach(checkDeclared(_))

  test("ks: d in (0,1], argmax location carries a real sample value") {
    val r = q("q_agg_ks_test").head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val d = r.getDouble(3)
    assert(d > 0 && d <= 1.0)
    val exists = Tables.lineitem(spark, sf)
      .where((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long") === r.getLong(2)).count()
    assert(exists > 0)
  }

  test("mann-whitney: u within [0, n1*n2], z consistent with u sign") {
    val r = q("q_agg_mannwhitney").head
    val n1 = r.getLong(0)
    val n2 = r.getLong(1)
    val u = r.getDouble(2)
    assert(u >= 0 && u <= n1.toDouble * n2)
    val z = r.getDouble(3)
    assert(!z.isNaN && !z.isInfinite)
    assert((u - n1.toDouble * n2 / 2.0).signum == z.signum || z == 0.0)
  }

  test("fuzzy join: ordered pairs, dist bound honored, counts real") {
    val rows = q("q_join_fuzzy").collect()
    assert(rows.nonEmpty)
    val total = Tables.part(spark, sf).count()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 4)
      assert(r.getLong(3) >= 1 && r.getLong(4) >= 1)
      assert(r.getLong(3) + r.getLong(4) <= total)
    }
  }

  test("bollinger: every emitted day truly breaches its own band") {
    val rows = q("q_ts_bollinger").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = BigDecimal(r.getLong(1))
      val s1 = BigDecimal(r.getLong(2)) // exact 20-day window sum, cents
      val dev = 20 * y - s1
      // m2 ships split into two <2^53 halves (hash-portable); recombine
      val m2 = BigDecimal(r.getLong(3)) * 1000000000L + r.getLong(4)
      assert(r.getLong(4) >= 0 && r.getLong(4) < 1000000000L)
      assert(m2 >= 0)
      assert(19 * dev * dev > 80 * m2) // |y-mean| > 2 sigma, squared
      assert(r.getString(5) == (if (dev > 0) "hi" else "lo"))
    }
  }

  test("islands: per-user accounting reconciles with raw active days") {
    val rows = q("q_ts_islands").collect()
    val truth = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == truth.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == truth(r.getLong(0))) // active_days
      assert(r.getLong(3) <= r.getLong(2))        // max_len <= active
      assert(r.getLong(1) >= 1)                   // >=1 island
      // islands * 1 <= active_days; max_len*islands >= active_days is NOT
      // an invariant, but len>=1 per island gives n_islands <= active_days
      assert(r.getLong(1) <= r.getLong(2))
    }
  }

  test("cohort: offset-0 retention is exactly 1, others within (0,1]") {
    val rows = q("q_evt_cohort").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getLong(1)
      val ret = r.getDouble(4)
      if (off == 0) assert(ret == 1.0)
      assert(ret > 0 && ret <= 1.0)
      assert(r.getLong(2) <= r.getLong(3)) // n_active <= cohort_size
    }
    // retention monotone is not an invariant, but each cohort must
    // include its own offset-0 row
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.exists(_.getLong(1) == 0L))
    }
  }
}
