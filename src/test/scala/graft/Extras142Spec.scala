package graft

import org.apache.spark.sql.functions._

class Extras142Spec extends QuerySuiteBase {
  Seq("q_agg_shrunk_mean", "q_evt_activation", "q_source_decimal128",
    "q_graph_core_density").foreach(checkDeclared(_))

  test("shrunk mean sits strictly between group mean and grand mean") {
    val rows = q("q_agg_shrunk_mean").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val grand = rows.map { case (n, m, _) => n * m }.sum /
      rows.map(_._1).sum
    rows.foreach { case (_, mean, shrunk) =>
      val lo = math.min(mean, grand) - 1e-6
      val hi = math.max(mean, grand) + 1e-6
      assert(shrunk >= lo && shrunk <= hi,
        s"shrunk $shrunk outside [$lo, $hi]")
    }
  }

  test("activation shares sum to 1, users partition the signup set") {
    val rows = q("q_evt_activation").collect()
    val totalShare = rows.map(_.getDouble(2)).sum
    assert(math.abs(totalShare - 1.0) < 1e-4)
    val nUsers = rows.map(_.getLong(1)).sum
    val nSignup = Tables.events(spark, sf)
      .where(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(nUsers == nSignup)
  }

  test("decimal128 sums equal the source-side exact fold") {
    val r = q("q_source_decimal128").head()
    val src = Tables.orders(spark, sf)
      .agg(count(lit(1)),
        sum((Det.dec(col("o_totalprice"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 10)) * 12345)
          .cast(org.apache.spark.sql.types.DecimalType(38, 10))))
      .head()
    assert(r.getLong(0) == src.getLong(0))
    // units + 1e-10 remainder reconstructs the exact decimal sum
    val rebuilt = BigDecimal(r.getLong(2)) +
      BigDecimal(r.getLong(3)) / BigDecimal(10000000000L)
    assert(rebuilt == BigDecimal(src.getDecimal(1)),
      s"units/rem split $rebuilt != exact fold ${src.getDecimal(1)}")
    assert(r.getLong(3) >= 0 && r.getLong(3) < 10000000000L)
  }

  test("core density: every surviving node has degree >= 2") {
    val r = q("q_graph_core_density").head()
    if (r.getLong(0) > 0) {
      // density = edges/nodes >= min_degree/2 >= 1 for a 2-core
      assert(r.getDouble(2) >= 1.0 - 1e-9)
    }
  }
}
