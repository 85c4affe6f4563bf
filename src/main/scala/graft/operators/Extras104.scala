package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-11 additions, part 30: the four TPC-H query shapes the SQL
  * family still lacked (Q2/Q9/Q16/Q20), adapted to this schema's
  * partsupp-free catalog — the lineitem (partkey, suppkey) link plays
  * the partsupp role, so each keeps its defining plan shape:
  * Q2's correlated-min subquery, Q9's multi-dim star profit rollup,
  * Q16's filtered distinct-count rollup, Q20's exists-with-aggregate
  * semi-join.
  *
  * Scale note: all four are declarative SQL — Catalyst broadcasts
  * part/supplier/nation/region dims, keeps lineitem the probe side,
  * and the correlated subqueries decorrelate into aggregate joins
  * (the q2a min and q20a half-total both become one grouped
  * aggregation over lineitem, never per-row subquery execution).
  *
  * Determinism contract (SURVEY §2.13): money math stays in
  * DECIMAL(18,2) (exact) until a final CAST AS DOUBLE (the q_sql_q3
  * idiom); the q2a unit price and q20a dominance gate are exact
  * integer forms (cents·1000 div qty; 2·qty > total).
  */
object Extras104 {

  private def views(s: SparkSession, d: String, ts: Seq[String]): Unit =
    ts.foreach(t => Tables.load(s, d, t).createOrReplaceTempView(s"v_$t"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q2 shape — cheapest-source selection: for every size-25
    // part, the EUROPE suppliers whose minimum historical unit price
    // (cents·1000 div qty, exact integer) equals the part's global
    // minimum; classic correlated scalar subquery, decorrelated by
    // Catalyst into a grouped min + join.
    "q_sql_q2a" -> ((s, d) => {
      views(s, d, Seq("part", "supplier", "lineitem", "nation", "region"))
      s.sql("""
        WITH unit AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) * 1000 div CAST(l_quantity AS BIGINT))
                   AS min_up
          FROM v_lineitem GROUP BY 1, 2)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, u.min_up
        FROM v_part, unit u, v_supplier, v_nation, v_region
        WHERE p_partkey = u.l_partkey AND s_suppkey = u.l_suppkey
          AND p_size = 25
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND u.min_up = (SELECT MIN(u2.min_up) FROM unit u2
                          WHERE u2.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20""")
    }),

    // TPC-H Q9 shape — product-line profit by (nation, year):
    // profit = Σ price·(1−disc) − retailprice·qty over 'red' parts,
    // exact DECIMAL throughout.
    "q_sql_q9a" -> ((s, d) => {
      views(s, d, Seq("part", "supplier", "lineitem", "orders", "nation"))
      s.sql("""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(18,2)))
                 - CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_profit
        FROM v_lineitem
        JOIN v_part ON p_partkey = l_partkey
        JOIN v_supplier ON s_suppkey = l_suppkey
        JOIN v_orders ON o_orderkey = l_orderkey
        JOIN v_nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2""")
    }),

    // TPC-H Q16 shape — supplier-relationship count per part
    // attribute triple, excluding one brand and the PROMO type family.
    "q_sql_q16a" -> ((s, d) => {
      views(s, d, Seq("part", "lineitem"))
      s.sql("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 20""")
    }),

    // TPC-H Q20 shape — dominant suppliers of 'small' parts: the
    // EXISTS semi-join keeps suppliers whose shipped quantity of some
    // small part exceeds TWICE the part's fair share
    // (qty·n_suppliers > 2·total, exact integers — with ~100 equal
    // suppliers nobody clears an absolute 50% gate).
    "q_sql_q20a" -> ((s, d) => {
      views(s, d, Seq("part", "supplier", "lineitem", "nation"))
      s.sql("""
        WITH sp AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          FROM v_lineitem GROUP BY 1, 2),
        tot AS (
          SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS ns
          FROM sp GROUP BY 1)
        SELECT s_name, n_name,
               COUNT(*) AS n_dominated_parts
        FROM v_supplier
        JOIN v_nation ON n_nationkey = s_nationkey
        JOIN sp ON sp.l_suppkey = s_suppkey
        JOIN tot ON tot.l_partkey = sp.l_partkey
        JOIN v_part ON p_partkey = sp.l_partkey
        WHERE p_name LIKE 'small%'
          AND sp.qty * tot.ns > tot.total * 2
        GROUP BY 1, 2
        ORDER BY n_dominated_parts DESC, s_name
        LIMIT 25""")
    })
  )

  val oracle: Map[String, String] = Map(

    "q_sql_q2a" ->
      """WITH unit AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) * 1000 // CAST(l_quantity AS BIGINT))
                   AS min_up
          FROM lineitem GROUP BY 1, 2)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, u.min_up
        FROM part, unit u, supplier, nation, region
        WHERE p_partkey = u.l_partkey AND s_suppkey = u.l_suppkey
          AND p_size = 25
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND u.min_up = (SELECT MIN(u2.min_up) FROM unit u2
                          WHERE u2.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 20""",

    "q_sql_q9a" ->
      """SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(18,2)))
                 - CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2""",

    "q_sql_q16a" ->
      """SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 20""",

    "q_sql_q20a" ->
      """WITH sp AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          FROM lineitem GROUP BY 1, 2),
        tot AS (
          SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS ns
          FROM sp GROUP BY 1)
        SELECT s_name, n_name,
               CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN sp ON sp.l_suppkey = s_suppkey
        JOIN tot ON tot.l_partkey = sp.l_partkey
        JOIN part ON p_partkey = sp.l_partkey
        WHERE p_name LIKE 'small%'
          AND sp.qty * tot.ns > tot.total * 2
        GROUP BY 1, 2
        ORDER BY n_dominated_parts DESC, s_name
        LIMIT 25"""
  )
}
