package graft

/** Guards on the driver contract itself — a key typo between `queries`
  * and `oracleSql` would silently zero that query's correctness score
  * (the driver compares by key), so the mapping is asserted here. */
class ContractSpec extends QuerySuiteBase {

  test("every oracle key names a declared query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL for undeclared queries: $dangling")
  }

  test("exactly the approximate sketches are rows-only (no oracle)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_agg_approx_distinct", "q_agg_percentile_approx",
      "q_agg_hll_union"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("declared keys are unique across operator families") {
    // SparkEntry merges family maps with ++ — a duplicated key would
    // silently shadow one family's query with another's.
    val families = Seq(
      operators.Scans.queries, operators.Aggregates.queries,
      operators.Joins.queries, operators.Windows.queries,
      operators.SetOps.queries, operators.ScalarFns.queries,
      operators.EventOps.queries, operators.LlmOps.queries,
      operators.LlmSketches.queries, operators.Misc.queries,
      operators.Multimodal.queries, operators.Extras.queries,
      operators.Extras2.queries, operators.Extras3.queries,
      operators.Extras4.queries, operators.Extras5.queries,
      operators.Extras6.queries, operators.Extras7.queries,
      operators.Extras8.queries)
    val all = families.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query keys across families: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }
}
