package graft.entries

import EntryCtx.sqlEntry

/**
 * The TPC-H query shapes not already covered by CoreEntries (q3-q7, q10,
 * q12-q14, q22 live there) — q2, q8, q9, q11, q15-q21 re-expressed over the
 * driver testdata. The schema has no `partsupp` table, so the shapes that
 * need a part-supplier bridge (q2, q11, q16, q20) route it through
 * `lineitem` (l_partkey, l_suppkey) — same plan skeleton (correlated
 * subquery / HAVING-threshold / nested IN), different bridge relation.
 *
 * The identical SQL runs on Spark (over graft-delta views) and DuckDB, so
 * every shape is hash-checked end to end. Cross-engine parity rules (see
 * SURVEY.md round-3 appendix): money sums go through integer cents
 * (round(x*100) then BIGINT — IEEE-identical in both engines), quantities
 * are integral doubles (exact under sum at any order), counts cast to
 * BIGINT, and ORDER BY ... LIMIT tiebreaks are unique.
 */
object TpchEntries {

  private val centsRev =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
  private val centsPrice = "CAST(round(l_extendedprice * 100) AS BIGINT)"

  val entries: Seq[Entry] = Seq(

    // Q2 shape: correlated MIN over a join chain (min-cost supplier per
    // part within a region); lineitem is the part-supplier bridge
    sqlEntry("tpch_q2_shape",
      Seq("part", "lineitem", "supplier", "nation", "region"),
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_size < 10
        |  AND l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin),

    // Q8 shape: market share — one nation's fraction of regional revenue
    // per year (two nation roles, conditional aggregation)
    sqlEntry("tpch_q8_shape",
      Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
      s"""SELECT o_year,
         |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
         |       CAST(sum(cents) AS BIGINT) AS total_cents
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |         n2.n_name AS supp_nation, $centsRev AS cents
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') t
         |GROUP BY o_year""".stripMargin),

    // Q9 shape: profit by supplier nation and order year
    sqlEntry("tpch_q9_shape",
      Seq("part", "lineitem", "supplier", "orders", "nation"),
      s"""SELECT n_name, o_year, CAST(sum(cents) AS BIGINT) AS profit_cents
         |FROM (
         |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |         $centsRev AS cents
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%') t
         |GROUP BY n_name, o_year""".stripMargin),

    // Q11 shape: per-part value against a threshold derived from the SAME
    // aggregation via scalar subqueries (parts worth >2x the mean — the
    // real q11's fixed fraction scales with 1/SF, a mean-relative cut is
    // meaningful at every scale). Multiply-compare, no division.
    sqlEntry("tpch_q11_shape", Seq("lineitem", "supplier", "nation"),
      s"""WITH v AS (
         |  SELECT l_partkey, CAST(sum($centsPrice) AS BIGINT) AS value_cents
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7'
         |  GROUP BY l_partkey)
         |SELECT l_partkey, value_cents FROM v
         |WHERE value_cents * (SELECT count(*) FROM v) >
         |      2 * (SELECT sum(value_cents) FROM v)""".stripMargin),

    // Q15 shape: CTE revenue view + WHERE = (SELECT max(...)) over it
    sqlEntry("tpch_q15_shape", Seq("lineitem", "supplier"),
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         CAST(sum($centsRev) AS BIGINT) AS total_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_cents
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_cents = (SELECT max(total_cents) FROM revenue)""".stripMargin),

    // Q16 shape: distinct-supplier counts per part attribute with a
    // NOT IN exclusion subquery; lineitem as the bridge
    sqlEntry("tpch_q16_shape", Seq("lineitem", "part", "supplier"),
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin),

    // Q17 shape: small-quantity revenue against a correlated per-part
    // average (quantities are integral doubles — exact at any sum order;
    // the avg is one exact division, identical in both engines)
    sqlEntry("tpch_q17_shape", Seq("lineitem", "part"),
      s"""SELECT CAST(sum($centsPrice) AS BIGINT) AS total_cents
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#2'
         |  AND l_quantity * 5 < (
         |    SELECT sum(l2.l_quantity) FROM lineitem l2
         |    WHERE l2.l_partkey = p_partkey)""".stripMargin),

    // Q18 shape: large orders via IN (GROUP BY ... HAVING) semi-join
    sqlEntry("tpch_q18_shape", Seq("customer", "orders", "lineitem"),
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate""".stripMargin),

    // Q19 shape: disjunction of conjunctive band predicates (OR of ANDs —
    // the planner must not turn it into a conjunctive prune)
    sqlEntry("tpch_q19_shape", Seq("lineitem", "part"),
      s"""SELECT CAST(sum($centsRev) AS BIGINT) AS revenue_cents
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin),

    // Q20 shape: nested IN chain (suppliers shipping enough of the named
    // parts); lineitem as the stock bridge
    sqlEntry("tpch_q20_shape", Seq("supplier", "nation", "lineitem", "part"),
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_2', 'NATION_12')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    GROUP BY l_suppkey
        |    HAVING sum(l_quantity) > 50)""".stripMargin),

    // Q21 shape: EXISTS plus NOT EXISTS against the same fact under
    // different correlations (the only returned-flag supplier on
    // a multi-supplier finished order)
    sqlEntry("tpch_q21_shape", Seq("supplier", "lineitem", "orders", "nation"),
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin))
}
