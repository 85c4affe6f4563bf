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

  test("orderedKeys is a permutation of the graded key set") {
    assert(SparkEntry.orderedKeys.size == SparkEntry.queries.size)
    assert(SparkEntry.orderedKeys.toSet == SparkEntry.queries.keySet)
  }

  /** Round-15 verdict item 1: the bench iteration order must be STABLE
    * under surface growth — adding a key must not permute the sequence
    * the way the old HashMap order did (which re-charged cold JIT to
    * different graded samples every round and produced the r14
    * quantile_sketch ghost). orderedKeys is families-in-declared-order,
    * sorted within family; this test simulates both growth modes
    * against that construction. */
  test("orderedKeys is append/shift-stable under surface growth") {
    def orderOf(fams: Seq[Map[String, Int]]): Seq[String] =
      fams.iterator.flatMap(_.keys.toSeq.sorted).toSeq
    val fams = SparkEntry.families.map(_._1.map { case (k, _) => k -> 0 })
    val base = orderOf(fams)
    assert(base == SparkEntry.orderedKeys)
    // growth mode 1: a NEW family appends — every existing prefix intact
    val appended = orderOf(fams :+ Map("q_zzz_scratch" -> 0))
    assert(appended == base :+ "q_zzz_scratch")
    // growth mode 2: a key added to an EXISTING family inserts at one
    // slot; every other key keeps its exact predecessor set (only the
    // inserted key's immediate successor gains one new predecessor)
    val grown = orderOf(fams.updated(0, fams.head + ("q_scratch_mid" -> 0)))
    assert(grown.filterNot(_ == "q_scratch_mid") == base)
    def predecessors(order: Seq[String]): Map[String, Set[String]] =
      order.zipWithIndex.map { case (k, i) =>
        k -> order.slice(math.max(0, i - 6), i).toSet }.toMap
    val pBase = predecessors(base)
    val pGrown = predecessors(grown)
    val changed = base.filter(k => {
      val diff = pGrown(k) -- pBase(k) - "q_scratch_mid"
      diff.nonEmpty
    })
    assert(changed.isEmpty,
      s"keys whose warm-context predecessors changed beyond the insert: $changed")
  }
}
