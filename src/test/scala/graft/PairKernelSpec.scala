package graft

import org.apache.spark.sql.functions._

/** Round-16 focused tests for the shared in-group pair kernel
  * (operators.PairKernel) — the rewrite that replaced the
  * distinct + self-equi-join formulation in the basket keys. The
  * equivalence claim ("identical (lo, hi) pair multiset") is asserted
  * here against the join formulation itself on inputs that exercise
  * the fused dedup (duplicate (key, value) rows), multi-value groups,
  * singleton groups, and the both-directions variant.
  */
class PairKernelSpec extends QuerySuiteBase {

  private def rel = {
    import spark.implicits._
    // duplicate (1, 10) rows exercise the fused dedup; key 3 is a
    // singleton group (no pairs); key 4 has 4 values (6 pairs).
    Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 10L),
      (3L, 99L),
      (4L, 1L), (4L, 2L), (4L, 3L), (4L, 4L)
    ).toDF("k", "v")
  }

  private def joinPairs(both: Boolean) = {
    val items = rel.distinct()
    val cond = if (both) col("a.v") =!= col("b.v") else col("a.v") < col("b.v")
    items.as("a").join(items.as("b"), col("a.k") === col("b.k") && cond)
      .select(col("a.v").as("a"), col("b.v").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
  }

  private def kernelPairs(both: Boolean) =
    operators.PairKernel.groupedPairs(rel, both = both)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))

  test("groupedPairs == distinct + a<b self-join (pair multiset)") {
    val j = joinPairs(both = false).collect().map(_.toSeq).toSet
    val k = kernelPairs(both = false).collect().map(_.toSeq).toSet
    assert(k == j)
    assert(k.nonEmpty)
  }

  test("groupedPairs(both) == distinct + a=!=b self-join") {
    val j = joinPairs(both = true).collect().map(_.toSeq).toSet
    val k = kernelPairs(both = true).collect().map(_.toSeq).toSet
    assert(k == j)
  }

  test("string variant matches the join formulation on ASCII labels") {
    import spark.implicits._
    val srel = Seq((1L, "b"), (1L, "a"), (1L, "a"), (1L, "c"), (2L, "z"))
      .toDF("k", "v")
    val items = srel.distinct()
    val j = items.as("a")
      .join(items.as("b"), col("a.k") === col("b.k")
        && col("a.v") < col("b.v"))
      .select(col("a.v").as("a"), col("b.v").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val k = operators.PairKernel.groupedPairsStr(srel)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(k == j)
  }

  test("pairs emit (lo, hi)-normalized") {
    val rows = operators.PairKernel.groupedPairs(rel).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
