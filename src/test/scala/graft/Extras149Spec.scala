package graft

import org.apache.spark.sql.functions._

class Extras149Spec extends QuerySuiteBase {
  Seq("q_ts_matrix_profile", "q_ts_discord", "q_ml_qini", "q_agg_pca2",
    "q_llm_mix_temperature", "q_llm_quality_logit")
    .foreach(checkDeclared(_))

  test("matrix profile: exclusion zone honored, nn is the true argmin") {
    val rows = q("q_ts_matrix_profile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (pos, nn, _) =>
      assert(math.abs(pos - nn) >= 4, s"pos=$pos nn=$nn inside zone")
    }
    // recompute the profile brute-force from the daily series
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).as("vc"))
      .select(col("dt"), expr("vc div 100").as("v"))
      .orderBy("dt").collect().map(_.getLong(1))
    val subs = daily.sliding(7).toArray
    def d2(i: Int, j: Int): Long =
      subs(i).zip(subs(j)).map { case (a, b) => (a - b) * (a - b) }.sum
    rows.foreach { case (pos, nn, dd) =>
      val i = pos.toInt - 1
      val best = subs.indices.filter(j => math.abs(j - (pos - 1)) >= 4)
        .map(j => (d2(i, j), j + 1L)).min
      assert(best == ((dd, nn)), s"pos=$pos got ($dd,$nn) want $best")
    }
  }

  test("discord: top-3 by profile distance, consistent with the profile") {
    val prof = q("q_ts_matrix_profile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = prof.sortBy { case (pos, _, dd) => (-dd, pos) }.take(3)
    val got = q("q_ts_discord").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("qini: deciles partition all users, counts are consistent") {
    val rows = q("q_ml_qini").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().count()
    val total = rows.map(r => r.getLong(1) + r.getLong(3)).sum
    assert(total == users, s"decile sizes sum $total != $users users")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
    }
  }

  test("pca2: eigen identities (trace and positive semidefinite order)") {
    val r = q("q_agg_pca2").collect().head
    val (l1, l2) = (r.getDouble(1), r.getDouble(2))
    assert(l1 >= l2, s"lambda1 $l1 < lambda2 $l2")
    assert(l2 >= -1e-6, s"covariance eigenvalue negative: $l2")
    assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0)
  }

  test("mix temperature: weights sum to ~1 and flatten the mixture") {
    val rows = q("q_llm_mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val wsum = rows.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum $wsum")
    val n = rows.map(_._2).sum.toDouble
    // temperature flattening identity: every source's weight sits
    // between its raw share and the uniform share (sqrt compresses)
    rows.foreach { case (src, ni, w) =>
      val raw = ni / n
      val uni = 1.0 / rows.length
      val lo = math.min(raw, uni) - 1e-6
      val hi = math.max(raw, uni) + 1e-6
      assert(w >= lo && w <= hi, s"$src w=$w raw=$raw uniform=$uni")
    }
  }

  test("quality logit: verdict split matches the sign of the mean") {
    val rows = q("q_llm_quality_logit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (verdict, mean) = (r.getString(1), r.getDouble(3))
      if (verdict == "keep") assert(mean >= 0.0)
      else assert(mean < 0.0)
    }
  }
}
