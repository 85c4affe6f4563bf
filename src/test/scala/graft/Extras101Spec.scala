package graft

class Extras101Spec extends QuerySuiteBase {
  Seq("q_agg_atkinson", "q_agg_hoover", "q_agg_palma",
    "q_agg_xyz_analysis").foreach(checkDeclared(_))

  test("atkinson: in [0, 1)") {
    val r = q("q_agg_atkinson").head()
    assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1)
  }

  test("hoover: in [0, 1) and agrees with a driver-side recompute") {
    val r = q("q_agg_hoover").head()
    assert(r.getDouble(1) >= 0 && r.getDouble(1) < 1)
    val xs = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).as("x"))
      .collect().map(_.getLong(1))
    val n = xs.length.toDouble
    val s = xs.sum.toDouble
    val h = xs.map(x => math.abs(x * n - s)).sum / (2 * n * s)
    assert(math.abs(r.getDouble(1) - h) < 1e-5)
  }

  test("palma: top decile outearns proportionally (ratio > 10/40 base)") {
    val r = q("q_agg_palma").head()
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    // top-10% mean day >= bottom-40% mean day always
    assert(r.getDouble(3) >= (r.getLong(0) / 10).toDouble /
      (r.getLong(0) * 4 / 10).toDouble - 1e-9)
  }

  test("xyz: classes partition all parts with demand accounted") {
    val rows = q("q_agg_xyz_analysis").collect()
    val totalParts = rows.map(_.getLong(1)).sum
    val parts = Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(totalParts == parts)
    rows.foreach(r => assert(Set("X", "Y", "Z")(r.getString(0))))
  }
}
