package graft

import org.apache.spark.sql.functions._

class Extras89Spec extends QuerySuiteBase {
  Seq("q_ts_sample_entropy", "q_ts_spectral_entropy", "q_graph_4cycles",
    "q_graph_closeness").foreach(checkDeclared(_))

  test("sample entropy: A <= B and sampen recomputed from counts") {
    val r = q("q_ts_sample_entropy").head()
    val (b, a) = (r.getLong(2), r.getLong(3))
    assert(a <= b && a > 0)
    assert(math.abs(r.getDouble(4) + math.log(a.toDouble / b)) < 1e-6)
  }

  test("sample entropy: B matches a scratch quadratic scan") {
    val y = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .orderBy("dt").collect().map(_.getLong(1))
    val n = y.length
    val mu = y.map(BigInt(_)).sum.toDouble / n
    val sig = math.sqrt(y.map(v => (v - mu) * (v - mu)).sum / n)
    val rTol = math.floor(0.2 * sig).toLong
    var b = 0L
    for (i <- 0 until n - 1; j <- i + 1 until n - 1)
      if (math.abs(y(i) - y(j)) <= rTol &&
        math.abs(y(i + 1) - y(j + 1)) <= rTol) b += 1
    val row = q("q_ts_sample_entropy").head()
    assert(row.getLong(1) == rTol)
    assert(row.getLong(2) == b)
  }

  test("spectral entropy: shares sum to 1; entropy within [0, ln 4]") {
    val r = q("q_ts_spectral_entropy").head()
    val shares = (0 to 3).map(r.getDouble)
    assert(math.abs(shares.sum - 1.0) < 1e-5)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= math.log(4.0) + 1e-9)
  }

  test("4cycles: rectangle count matches scratch enumeration") {
    val edges = Extras11Probe.edges(spark, sf)
    val nbr = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val verts = nbr.keys.toSeq.sorted
    var rect = 0L
    for (ui <- verts.indices; vi <- ui + 1 until verts.length) {
      val c = (nbr(verts(ui)) & nbr(verts(vi))).size
      rect += c.toLong * (c - 1) / 2
    }
    val r = q("q_graph_4cycles").head()
    assert(r.getLong(1) == rect / 2)
  }

  test("closeness: every value in (0, 1]; n1 > 0") {
    val rows = q("q_graph_closeness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val c = r.getDouble(4)
      assert(c > 0 && c <= 1.0)
    }
  }
}

object Extras11Probe {
  /** Undirected co-occurrence edges rebuilt from first principles
    * (test only — mirrors Extras11.undirectedEdges). */
  def edges(spark: org.apache.spark.sql.SparkSession,
      sf: String): Seq[(Long, Long)] = {
    val v = Tables.events(spark, sf)
      .where(pmod(col("user_id"), lit(7L)) === 0)
      .select(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    v.as("x").join(v.as("y"),
        col("x.h") === col("y.h") && col("x.t") === col("y.t")
          && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }
}
