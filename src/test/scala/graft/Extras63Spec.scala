package graft

class Extras63Spec extends QuerySuiteBase {
  Seq("q_agg_jarque_bera", "q_agg_cohens_d", "q_agg_levene")
    .foreach(checkDeclared(_))

  test("jarque bera: JB non-negative, consistent with skew/kurt") {
    val r = q("q_agg_jarque_bera").head()
    val (n, sk, ku, jb) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(jb >= 0.0)
    val expect = n / 6.0 * (sk * sk + ku * ku / 4.0)
    assert(math.abs(jb - expect) < 1e-4)
  }

  test("cohens d: group counts partition the table") {
    val r = q("q_agg_cohens_d").head()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.getLong(0) + r.getLong(1) == total)
    // urgent vs rest on a symmetric synthetic price: small effect
    assert(math.abs(r.getDouble(3)) < 1.0)
  }

  test("levene: five groups cover all orders; F non-negative") {
    val r = q("q_agg_levene").head()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert((0 to 4).map(r.getLong).sum == total)
    assert(r.getDouble(5) >= 0.0)
  }
}
