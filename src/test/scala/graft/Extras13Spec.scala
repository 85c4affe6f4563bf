package graft

import org.apache.spark.sql.functions._

class Extras13Spec extends QuerySuiteBase {
  Seq("q_join_spatial_grid", "q_fn_geo", "q_ts_seasonal",
    "q_ts_cusum").foreach(checkDeclared(_))

  test("spatial grid join == brute-force theta join (ground truth)") {
    // the grid join must produce the exact pair set the O(n²) theta join
    // defines — no duplicates (a pair found via two neighbor cells would
    // double), no misses (a pair straddling a cell boundary)
    val grid = q("q_join_spatial_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p = Tables.customer(spark, sf).select(col("c_custkey").as("id"),
      pmod(Det.md5long(concat(col("c_custkey"), lit(":x"))), lit(1000L))
        .as("px"),
      pmod(Det.md5long(concat(col("c_custkey"), lit(":y"))), lit(1000L))
        .as("py"))
    val brute = p.as("p").join(p.as("q"),
        col("p.id") < col("q.id")
          && abs(col("p.px") - col("q.px")) <= 25
          && abs(col("p.py") - col("q.py")) <= 25)
      .select(col("p.id"), col("q.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(grid.size == brute.size,
      s"grid ${grid.size} pairs vs brute ${brute.size}")
    assert(grid.toSet == brute.toSet, "grid join pair set != brute force")
  }

  test("haversine: distances within [0, half circumference], origin sane") {
    val r = q("q_fn_geo")
    val max = math.Pi * 6371.0 + 0.01
    assert(r.where(col("d_origin") < 0 || col("d_origin") > max
      || col("d_paris") < 0 || col("d_paris") > max).count() == 0)
    // triangle inequality against the origin-Paris leg (~5837 km)
    val viol = r.where(abs(col("d_origin") - col("d_paris")) > 5838).count()
    assert(viol == 0, s"$viol rows violate the triangle inequality")
  }

  test("seasonal indices average to 1 weighted by day counts") {
    val r = q("q_ts_seasonal").collect()
    assert(r.length == 7)
    val tot = r.map(_.getLong(1)).sum.toDouble
    val wavg = r.map(x => x.getDouble(3) * x.getLong(1)).sum / tot
    assert(math.abs(wavg - 1.0) < 1e-4,
      s"weighted seasonal index mean $wavg != 1")
  }

  test("cusum numerator telescopes to EXACTLY zero on the final row") {
    val r = q("q_ts_cusum").orderBy("dt").collect()
    // cusum_num_N = tn*S_N - N*T = tn*T - tn*T = 0, exact integers
    assert(r.last.getLong(2) == 0L,
      s"final cusum_num ${r.last.getLong(2)} != 0")
    // first row: tn*v1 - T, reconstructable from the emitted columns
    val tn = r.head.getLong(3)
    val t = r.map(_.getLong(1)).sum
    assert(r.head.getLong(2) == tn * r.head.getLong(1) - t)
  }
}
