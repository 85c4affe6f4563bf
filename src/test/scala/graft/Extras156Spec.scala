package graft

import org.apache.spark.sql.functions._

class Extras156Spec extends QuerySuiteBase {
  Seq("q_graph_triad_census", "q_ml_ap_11point", "q_agg_tail_dependence")
    .foreach(checkDeclared(_))

  test("triad census: totals C(n,3), codes canonical, 16-class bound") {
    val rs = q("q_graph_triad_census").collect()
    assert(rs.length <= 16, s"${rs.length} classes — a code is non-canonical")
    // total triads must equal C(n,3) over the graph's node set
    val e = spark.read.parquet(s"$sf/events.parquet")
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .groupBy(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("t0"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"), col("t")).orderBy(col("t0"), col("u"))
    val edges = e.withColumn("nxt", lead(col("u"), 1).over(w))
      .where(col("nxt").isNotNull && col("nxt") =!= col("u"))
      .select(col("u").as("src"), col("nxt").as("dst")).distinct()
    val n = edges.select(col("src").as("u"))
      .unionByName(edges.select(col("dst").as("u")))
      .distinct().count()
    val expect = n * (n - 1) * (n - 2) / 6
    assert(rs.map(_.getLong(3)).sum == expect,
      s"census sums to ${rs.map(_.getLong(3)).sum}, C($n,3)=$expect")
    // m/a signatures are consistent with each code's bit pattern
    rs.foreach { r =>
      val code = r.getLong(0)
      val b = (0 to 5).map(i => (code >> i) & 1L)
      assert(r.getLong(1) == b(0) * b(1) + b(2) * b(3) + b(4) * b(5),
        s"mutual mismatch for code $code")
    }
  }

  test("ap11: 11 grid points, value within [0,1] and >= prevalence") {
    val r = q("q_ml_ap_11point").collect().head
    assert(r.getLong(0) == 11)
    val ap = r.getDouble(1)
    assert(ap >= 0.0 && ap <= 1.0)
  }

  test("tail dependence: lambdas in [0,1], upper tail joint <= marginal") {
    val r = q("q_agg_tail_dependence").collect().head
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }
}
