package graft

import org.apache.spark.sql.functions._

class Extras41Spec extends QuerySuiteBase {
  Seq("q_agg_spearman", "q_agg_cramers_v", "q_agg_theil",
    "q_layout_zonemap", "q_llm_hapax", "q_evt_basket_pairs", "q_ts_macd")
    .foreach(checkDeclared(_))

  test("spearman: rho in [-1, 1]; moments identity on the rank sums") {
    val r = q("q_agg_spearman").head()
    val n = r.getLong(0)
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    // Σ(2·avgRank) over all rows is exactly n(n+1) regardless of ties
    val cust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(n == cust)
  }

  test("cramers v: bounded [0,1]; chi2 micro-fold matches a double recompute") {
    val r = q("q_agg_cramers_v").head()
    val (n, chi2m, dof, v) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(v >= 0.0 && v <= 1.0 && dof >= 1)
    val cells = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(n == cells.map(_._3).sum)
    val chi2 = cells.map { case (rf, ls, o) =>
      val e = rt(rf).toDouble * ct(ls) / n
      (o - e) * (o - e) / e
    }.sum
    // integer micro-fold truncates per cell: within 6 micro-units/cell
    assert(math.abs(chi2m / 1e6 - chi2) < 1e-3,
      s"chi2 micro ${chi2m / 1e6} vs recompute $chi2")
  }

  test("theil: non-negative, bounded by ln(n), groups cover all priorities") {
    val rows = q("q_agg_theil").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nG, theil) = (r.getLong(1), r.getDouble(3))
      assert(theil >= -1e-6 && theil <= math.log(nG.toDouble))
    }
  }

  test("zonemap: clustered layout prunes, random layout cannot; " +
    "row accounting is consistent") {
    val r = q("q_layout_zonemap").head()
    val (nzr, szr, srr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nzc, szc, src) = (r.getLong(3), r.getLong(4), r.getLong(5))
    val matched = r.getLong(6)
    assert(szr <= nzr && szc <= nzc)
    // every matching row lives in a scanned zone, under both layouts
    assert(srr >= matched && src >= matched)
    // the 3-month predicate scans exactly 3 clustered (month) zones
    assert(szc == 3)
    // random (orderkey-ranged) zones have ~full date span: no pruning
    assert(szr == nzr)
    // clustered scan reads exactly the matching rows (months align)
    assert(src == matched)
  }

  test("hapax: each hapax word counted once corpus-wide; rate = ratio") {
    val rows = q("q_llm_hapax").collect()
    assert(rows.nonEmpty)
    val totalHapax = rows.map(_.getLong(2)).sum
    val recount = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().where(col("count") === 1).count()
    assert(totalHapax == recount)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)
        - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("basket pairs: lift_micro is the exact integer ratio; " +
    "counts reconcile on the top pair") {
    val rows = q("q_evt_basket_pairs").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      val (nAb, na, nb, lm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nAb >= 20 && lm == nAb * rowsN * 1000000L / (na * nb))
    }
    // recount the top pair's support directly
    val top = rows.head
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .join(Tables.part(spark, sf).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b")).distinct()
    val n1 = li.where(col("b") === top.getAs[String]("b1"))
      .select("ok").distinct()
    val n2 = li.where(col("b") === top.getAs[String]("b2"))
      .select("ok").distinct()
    val both = n1.join(n2, "ok").count()
    assert(both == top.getAs[Long]("n_ab"))
  }

  private lazy val rowsN: Long = {
    val li = Tables.lineitem(spark, sf).select("l_orderkey").distinct()
    li.count()
  }

  test("macd: integer micro emits are internally consistent") {
    val rows = q("q_ts_macd").limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f, s, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(m == f - s)                       // macd_micro exact difference
      assert(f > 0 && s > 0)
      assert(math.abs(r.getDouble(4) - m / 1e6) < 1e-9)
    }
  }
}
