package graft

import scala.collection.mutable

class Extras139Spec extends QuerySuiteBase {
  Seq("q_agg_kendall_w", "q_agg_sign_test", "q_ts_sen_seasonal")
    .foreach(checkDeclared(_))
  checkDeclared("q_graph_scc_dag", minRows = 0)

  test("kendall w: in [0,1], chi2 = k(n-1)W") {
    val r = q("q_agg_kendall_w").head()
    val (k, n, w, chi2) =
      (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
    assert(n == 7)
    assert(w >= 0.0 && w <= 1.0)
    assert(math.abs(chi2 - k * (n - 1) * w) < 1e-3)
  }

  test("sign test: counts partition the pairs, z sign tracks n+ - n-") {
    val r = q("q_agg_sign_test").head()
    val (np0, npl, nmi, nze, z) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(np0 == npl + nmi + nze)
    assert(z * (npl - nmi) >= 0.0)
  }

  test("sen seasonal: the reported slope is the lower median of the multiset") {
    import org.apache.spark.sql.functions._
    val monthly = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(sum((Det.dec(col("o_totalprice")) * 100).cast("long")).as("y"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val slopes = for {
      ((ya, m), v1) <- monthly.toSeq
      ((yb, m2), v2) <- monthly.toSeq
      if m == m2 && ya < yb
    } yield (v2 - v1) * 1000000L / (yb - ya)
    val expected = slopes.sorted.apply(((slopes.size + 1) / 2 - 1).max(0))
    val r = q("q_ts_sen_seasonal").head()
    assert(r.getLong(0) == slopes.size)
    assert(r.getLong(1) == expected,
      s"sen ${r.getLong(1)} != local lower median $expected")
  }

  test("scc dag: condensation is acyclic and labels match q_graph_scc") {
    val lbl = q("q_graph_scc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dag = q("q_graph_scc_dag").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every dag endpoint is a component label from the scc key
    val labels = lbl.values.toSet
    dag.foreach { case (a, b) =>
      assert(labels(a) && labels(b) && a != b)
    }
    // acyclicity by Kahn's algorithm
    val nodes = dag.flatMap(e => Seq(e._1, e._2)).distinct
    val indeg = mutable.Map(nodes.map(_ -> 0): _*)
    dag.foreach { case (_, b) => indeg(b) += 1 }
    val queue = mutable.Queue(nodes.filter(indeg(_) == 0): _*)
    var seen = 0
    val out = dag.groupBy(_._1)
    while (queue.nonEmpty) {
      val u = queue.dequeue(); seen += 1
      out.getOrElse(u, Array.empty).foreach { case (_, b) =>
        indeg(b) -= 1
        if (indeg(b) == 0) queue.enqueue(b)
      }
    }
    assert(seen == nodes.size, "condensation graph contains a cycle")
  }
}
