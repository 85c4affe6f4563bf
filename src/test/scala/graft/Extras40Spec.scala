package graft

import org.apache.spark.sql.functions._

class Extras40Spec extends QuerySuiteBase {
  Seq("q_win_ntile", "q_llm_vocab_prune", "q_llm_skipgram",
    "q_evt_purchase_cycle")
    .foreach(checkDeclared(_))

  test("ntile: 10 deciles partition all customers, sizes within 1") {
    val rows = q("q_win_ntile").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(sizes.sum == nCust)
    // deciles are revenue-ordered: each floor >= the next decile's ceil
    rows.sortBy(_.getInt(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) >= b.getLong(4))
      case _ =>
    }
  }

  test("vocab prune: df bounds honored against a recount") {
    val rows = q("q_llm_vocab_prune").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val n = rows.head.getLong(2)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5 && r.getLong(1) * 10 <= n * 9)
    }
    // spot-check one token's df against a direct recount
    val w0 = rows.head.getString(0)
    val df0 = Tables.documents(spark, sf)
      .where(array_contains(split(col("text"), " "), w0)).count()
    assert(df0 == rows.head.getLong(1))
  }

  test("skipgram: pair counts match a brute-force recount on one pair") {
    val rows = q("q_llm_skipgram").collect()
    assert(rows.length == 100)
    val cs = rows.map(_.getLong(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val (w1, w2, cnt) =
      (rows.head.getString(0), rows.head.getString(1), rows.head.getLong(2))
    val brute = Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("ws"))
      .select(explode(expr(
        s"""filter(transform(sequence(1, size(ws)),
             i -> CASE WHEN (i + 1 <= size(ws) AND ws[i-1] = '$w1'
                             AND ws[i] = '$w2')
                       THEN 1 ELSE 0 END
                  + CASE WHEN (i + 2 <= size(ws) AND ws[i-1] = '$w1'
                               AND ws[i+1] = '$w2')
                         THEN 1 ELSE 0 END), x -> x > 0)""")).as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(brute == cnt, s"skipgram($w1,$w2): brute $brute != $cnt")
  }

  test("purchase cycle: repeat customers only, gaps reconcile with spans") {
    val rows = q("q_evt_purchase_cycle").collect()
    assert(rows.nonEmpty)
    val spans = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        datediff(max(to_date(col("o_orderdate"))),
          min(to_date(col("o_orderdate")))).as("span"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (n, span) = spans(r.getLong(0))
      assert(n >= 2)                       // repeat customers only
      assert(r.getLong(1) == n - 1)        // n_gaps = orders - 1
      assert(r.getLong(2) == span)         // gaps telescope to the span
      assert(r.getLong(3) <= span)
    }
    assert(rows.length == spans.count(_._2._1 >= 2))
  }
}
