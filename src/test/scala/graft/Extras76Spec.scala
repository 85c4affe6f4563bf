package graft

import org.apache.spark.sql.functions._

class Extras76Spec extends QuerySuiteBase {
  Seq("q_agg_cochran_q", "q_ts_mk_seasonal_breakdown", "q_fn_geohash")
    .foreach(checkDeclared(_))

  test("cochran q: k = type alphabet; statistic finite and >= 0") {
    val r = q("q_agg_cochran_q").head()
    val k = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(r.getLong(0) == k)
    assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
    val qStat = r.getDouble(3)
    assert(!qStat.isNaN && qStat >= 0.0)
  }

  test("mk seasonal breakdown: months partition the aggregate test's " +
      "pair count and S") {
    val rows = q("q_ts_mk_seasonal_breakdown").collect()
    assert(rows.length == 12)
    val agg = q("q_ts_mann_kendall_seasonal").head()
    assert(rows.map(_.getLong(2)).sum == agg.getLong(1)) // n_pairs
    assert(rows.map(_.getLong(3)).sum == agg.getLong(2)) // S
    assert(rows.map(_.getLong(4)).sum == agg.getLong(3)) // tie pairs
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 12)
      assert(r.getLong(5) >= 0) // var18 never negative
    }
  }

  test("geohash: prefix groups partition the orders; interleave is " +
      "consistent with the jvm reference on the floor cell") {
    val rows = q("q_fn_geohash").collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    def decode(gh: String): Long =
      gh.foldLeft(0L)((acc, c) => acc * 32 + alphabet.indexOf(c))
    def interleave(x: Long, y: Long): Long =
      (0 until 20).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i)))
    rows.foreach { r =>
      val gh8 = r.getString(2)
      assert(gh8.length == 8 && gh8.startsWith(r.getString(0)))
      val v = decode(gh8)
      // de-interleave the floor cell and check it round-trips
      var x = 0L; var y = 0L
      for (i <- 0 until 20) {
        x |= ((v >> (2 * i + 1)) & 1L) << i
        y |= ((v >> (2 * i)) & 1L) << i
      }
      assert(interleave(x, y) == v)
      assert(x >= r.getLong(3) && x <= r.getLong(4))
      assert(y >= r.getLong(5) && y <= r.getLong(6))
    }
  }
}
