package graft

import org.apache.spark.sql.functions._

class Extras75Spec extends QuerySuiteBase {
  Seq("q_ts_holt_winters", "q_ts_dtw").foreach(checkDeclared(_))

  test("holt winters: one 7-row forecast curve per type; forecast " +
      "within a sane band of the daily level") {
    val rows = q("q_ts_holt_winters").collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(rows.length == types * 7)
    // horizons 1..7 once per type, in order
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSeq == (1L to 7L))
    }
    // level_micro should sit inside the observed daily-count range ×1e6
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")))
      .agg(count(lit(1)).as("y"))
    val mx = daily.agg(max(col("y"))).head().getLong(0) * 1000000L
    rows.foreach { r =>
      val level = r.getLong(3)
      assert(level > 0 && level <= mx,
        s"level $level outside (0, $mx]")
    }
  }

  test("holt winters: constant series smooths to zero trend and " +
      "season, forecast = level") {
    // A constant series y=c has S1=S2=7c·1e6 ⇒ l=c·1e6, b=0, s_i=0, and
    // every update is a fixed point — forecasts all equal c·1e6.
    import spark.implicits._
    val c = 42L
    val y = Array.fill(30)(c * 1000000L)
    val s1 = y.slice(0, 7).sum; val s2 = y.slice(7, 14).sum
    var l = s2 / 7; var b = (s2 - s1) / 49
    val seas = Array.tabulate(7)(i => y(7 + i) - s2 / 7)
    var t = 14
    while (t < y.length) {
      val sOld = seas(0)
      val lNew = ((y(t) - sOld) + (l + b)) / 2
      val bNew = ((lNew - l) + 4 * b) / 5
      val sNew = ((y(t) - lNew) + 9 * sOld) / 10
      System.arraycopy(seas, 1, seas, 0, 6); seas(6) = sNew
      l = lNew; b = bNew; t += 1
    }
    assert(l == c * 1000000L && b == 0L && seas.forall(_ == 0L))
  }

  test("dtw: pair per unordered type pair; identical series distance 0; " +
      "symmetric in series order") {
    val rows = q("q_ts_dtw").collect()
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 0)
    }
    // DTW lower bound: |Σx − Σy| cannot exceed n·max|x−y| path sum; the
    // cheapest any warped path can do is still ≥ |x_n − y_n| at the
    // corner cell, so distance is at least |last-day diff|.
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("y"))
    val last = daily.orderBy(col("dt").desc).limit(200).collect()
      .groupBy(_.getString(0)).view.mapValues(_.maxBy(_.getDate(1).getTime))
    for (r <- rows) {
      (last.get(r.getString(0)), last.get(r.getString(1))) match {
        case (Some(a), Some(b))
            if a.getDate(1).getTime == b.getDate(1).getTime =>
          assert(r.getLong(2) >= math.abs(a.getLong(2) - b.getLong(2)))
        case _ => ()
      }
    }
  }
}
