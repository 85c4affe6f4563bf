package graft

import org.apache.spark.sql.functions._

class Extras102Spec extends QuerySuiteBase {
  Seq("q_ts_croston", "q_agg_fleiss_kappa", "q_ts_theil_u2",
    "q_evt_bass_diffusion").foreach(checkDeclared(_))

  test("croston: rate positive and replays the recurrence for one part") {
    val rows = q("q_ts_croston").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) > 0))
    // replay for the first part
    val part = rows.head.getLong(0)
    val dmin = Tables.lineitem(spark, sf)
      .agg(min(to_date(col("l_shipdate")))).head().getDate(0)
    val series = Tables.lineitem(spark, sf)
      .where(col("l_partkey") === part)
      .groupBy(to_date(col("l_shipdate")).as("dt"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .select((datediff(col("dt"), lit(dmin)) + 1).cast("long"), col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var z = series.head._2 * 1000000L
    var p = series.head._1 * 1000000L
    var prev = series.head._1
    series.tail.foreach { case (t, qv) =>
      z = (qv * 1000000L + 4 * z) / 5
      p = ((t - prev) * 1000000L + 4 * p) / 5
      prev = t
    }
    assert(rows.head.getLong(2) == z && rows.head.getLong(3) == p)
  }

  test("fleiss kappa: in [-1, 1] and consistent with p_bar/p_e") {
    val r = q("q_agg_fleiss_kappa").head()
    val (pb, pe, k) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(k >= -1 && k <= 1)
    assert(math.abs(k - (pb - pe) / (1 - pe)) < 1e-4)
  }

  test("theil u2: positive; seasonal-naive roughly comparable to naive") {
    val r = q("q_ts_theil_u2").head()
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 10)
  }

  test("bass: m_hat on the order of the observed adopter count") {
    val r = q("q_evt_bass_diffusion").head()
    val custs = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(r.getDouble(4) > custs * 0.5)
    assert(r.getDouble(4) < custs * 10.0)
  }
}
