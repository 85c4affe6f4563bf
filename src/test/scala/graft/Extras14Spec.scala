package graft

import org.apache.spark.sql.functions._

class Extras14Spec extends QuerySuiteBase {
  Seq("q_graph_components", "q_ts_mom", "q_stream_live_cdc")
    .foreach(checkDeclared(_))

  test("components: labels are fixpoints (no edge crosses two labels)") {
    val comp = q("q_graph_components")
    // rebuild the edge relation the query defines and assert both ends
    // of every edge share a component
    val v = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val und = v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct()
    val crossing = und
      .join(comp.select(col("u").as("a"), col("component").as("ca")), "a")
      .join(comp.select(col("u").as("b"), col("component").as("cb")), "b")
      .where(col("ca") =!= col("cb")).count()
    assert(crossing == 0, s"$crossing edges cross component labels")
    // every component's label is a member of the component
    val badLbl = comp.as("c").join(
        comp.select(col("u").as("m")).distinct(),
        col("c.component") === col("m"), "left_anti").count()
    assert(badLbl == 0, s"$badLbl labels are not member node ids")
  }

  test("mom: percent change recomputes from consecutive revenues") {
    val r = q("q_ts_mom").orderBy("m_us").collect()
    assert(r.length >= 12)
    assert(r.head.isNullAt(2), "first month must have NULL mom_pct")
    for (i <- 1 until r.length) {
      val expect = BigDecimal((r(i).getDouble(1) - r(i - 1).getDouble(1))
        / r(i - 1).getDouble(1) * 100)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r(i).getDouble(2) - expect) < 1e-4,
        s"month $i mom ${r(i).getDouble(2)} != $expect")
    }
  }

  test("cdc: final state equals the batch latest-wins apply") {
    val cdc = q("q_stream_live_cdc").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("event_type") =!= "error")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"),
        (Det.dec(col("value")) * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))).toMap
    assert(cdc == batch, "streaming CDC state diverges from batch apply")
  }
}
