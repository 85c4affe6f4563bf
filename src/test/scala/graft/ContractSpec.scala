package graft

/** Guards on the driver contract itself — a key typo between `queries`
  * and `oracleSql` would silently zero that query's correctness score
  * (the driver compares by key), so the mapping is asserted here. */
class ContractSpec extends QuerySuiteBase {

  test("every oracle key names a declared query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL for undeclared queries: $dangling")
  }

  test("every declared query has an oracle (tolerance oracles included)") {
    // Round 8: the three approximate sketches gained tolerance oracles
    // (exact companion values + bound-verdict booleans asserted TRUE by
    // DuckDB), so the rows-only set is now empty — and must stay empty.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  test("declared keys are unique across operator families") {
    // SparkEntry merges family maps with ++ — a duplicated key would
    // silently shadow one family's query with another's. Iterate
    // SparkEntry.families itself (the single source of truth) so a newly
    // registered family can never be missing from this check.
    val all = SparkEntry.families.flatMap(_._1.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query keys across families: $dupes")
    assert(all.size == SparkEntry.queries.size)

    val allOracle = SparkEntry.families.flatMap(_._2.keys)
    val oracleDupes = allOracle.groupBy(identity).filter(_._2.size > 1).keys
    assert(oracleDupes.isEmpty, s"duplicate oracle keys: $oracleDupes")
    assert(allOracle.size == SparkEntry.oracleSql.size)
  }
}
