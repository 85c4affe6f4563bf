package graft

/** Recursive-CTE capability contract for Spark 4.1.2 (UnionLoop): what
  * q_sql_recursive is allowed to rely on. */
class RecursiveCteProbe extends QuerySuiteBase {
  test("recursive CTE executes (UNION ALL)") {
    val out = spark.sql(
      """WITH RECURSIVE r(n) AS (
           SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5)
         SELECT CAST(SUM(n) AS BIGINT) AS s FROM r""").head().getLong(0)
    assert(out == 15L)
  }

  test("UNION-dedup recursion is NOT supported — cyclic closures must stay DSL") {
    // Documented limitation: connected components over a cyclic graph
    // (q_llm_dedup_clusters) cannot move to a recursive CTE until Spark
    // supports UNION inside recursion; UNION ALL would never terminate
    // on a cycle.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE
              e(a, b) AS (SELECT * FROM VALUES (0,1),(1,0) AS t(a, b)),
              reach(n, l) AS (
                SELECT DISTINCT a, a FROM e
                UNION
                SELECT e.b, r.l FROM reach r JOIN e ON e.a = r.n)
           SELECT COUNT(*) FROM reach""").collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }
}
