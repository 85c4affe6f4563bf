package graft

import org.apache.spark.sql.functions._

class Extras153Spec extends QuerySuiteBase {
  Seq("q_ml_log_loss", "q_ml_fairness_parity", "q_ml_cv_auc",
    "q_join_positional", "q_sql_distinct_on", "q_dq_key_density")
    .foreach(checkDeclared(_))

  test("log_loss: matches a brute-force recompute of the smoothed bins") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_returnflag").isin("R", "N"))
      .select((col("l_discount").cast("decimal(18,2)") * 100)
        .cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bins = rows.groupBy(_._1).map { case (_, rs) =>
      (rs.length.toLong, rs.map(_._2).sum) }
    val n = rows.length.toLong
    val sn = bins.map { case (nb, c1) =>
      val p = (c1 + 1).toDouble / (nb + 2).toDouble
      math.round((-(c1 * math.log(p) + (nb - c1) * math.log(1 - p))) * 1e9)
    }.sum
    val expect = BigDecimal(sn / 1e9 / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = q("q_ml_log_loss").collect().head
    assert(got.getLong(0) == n)
    assert(math.abs(got.getDouble(2) - expect) < 1e-9)
    assert(got.getDouble(2) > 0.0, "cross-entropy must be positive")
  }

  test("fairness: gaps are |group − overall| and rates are in [0,1]") {
    val rs = q("q_ml_fairness_parity").collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      Seq(2, 3, 4, 5, 6, 7).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"col $i out of range: $v")
      }
    }
    // weighted mean of group pos_rates must reproduce the overall rate,
    // so at least one group must sit on each side of (or on) it —
    // i.e. dp_gap cannot be bounded away from 0 for every group unless
    // rates differ, and signs must straddle. Check via reconstruction.
    val n = rs.map(_.getLong(1)).sum.toDouble
    val overall = rs.map(r => r.getDouble(2) * r.getLong(1)).sum / n
    rs.foreach { r =>
      val lo = math.abs(r.getDouble(2) - overall)
      assert(math.abs(r.getDouble(5) - lo) < 1e-5,
        s"dp_gap mismatch for ${r.getString(0)}")
    }
  }

  test("cv_auc: five folds, each a valid tie-aware AUC") {
    val rs = q("q_ml_cv_auc").collect()
    assert(rs.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    rs.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      val auc = r.getDouble(3)
      assert(auc >= 0.0 && auc <= 1.0, s"fold ${r.getLong(0)} auc=$auc")
    }
  }

  test("positional: aligned ranks descend both balances") {
    val rs = q("q_join_positional").collect().sortBy(_.getLong(0))
    assert(rs.map(_.getLong(0)).toSeq == (1L to rs.length))
    assert(rs.length == 10)
  }

  test("distinct_on: picks each nation's max balance") {
    def nk(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue // c_nationkey ships as int32
    val got = q("q_sql_distinct_on").collect()
      .map(r => (nk(r, 0), r.getLong(3))).toMap
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy(col("c_nationkey"))
      .agg(max((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")).as("mx"))
      .collect().map(r => (nk(r, 0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("key_density: all three audited id spaces are dense in testdata") {
    val rs = q("q_dq_key_density").collect()
    assert(rs.length == 3)
    rs.foreach { r =>
      assert(r.getLong(6) == 0L,
        s"${r.getString(0)}.${r.getString(1)} has ${r.getLong(6)} missing")
    }
  }
}
