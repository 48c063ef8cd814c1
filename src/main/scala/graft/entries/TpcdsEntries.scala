package graft.entries

import EntryCtx._

/**
 * Hard-SQL breadth entries: TPC-DS query *shapes* (correlated scalar
 * subqueries, EXISTS/NOT EXISTS combinations, ROLLUP/CUBE, multi-CTE,
 * INTERSECT, window deviation, top/bottom-N) adapted from the reference's
 * vendored benchmark suite (crates/benchmarks/queries/tpcds/q*.sql) to the
 * driver's TPC-H-ish testdata. One SQL text runs over our Delta-backed temp
 * views in Spark AND verbatim in the DuckDB oracle.
 *
 * Oracle-parity rules (see SURVEY verification notes): money aggregates go
 * through integer cents (`round(x*100)` → BIGINT — exact and
 * summation-order-independent in both engines), counts are CAST to BIGINT,
 * thresholds multiply exact integers or dyadic constants (1.5) so
 * borderline-row selection cannot diverge between engines.
 */
object TpcdsEntries {

  val entries: Seq[Entry] = Seq(

    // q1 shape: aggregate CTE + correlated scalar subquery threshold
    // (spend > 1.2 * the priority-group average)
    sqlEntry("tpcds_q1_shape", Seq("orders", "customer"),
      """WITH customer_total AS (
        |  SELECT o_custkey AS ct_custkey, o_orderpriority AS ct_prio,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS ct_cents
        |  FROM orders GROUP BY o_custkey, o_orderpriority)
        |SELECT c_name, ct_prio, ct_cents
        |FROM customer_total ct1 JOIN customer ON ct1.ct_custkey = c_custkey
        |WHERE ct1.ct_cents > (SELECT avg(ct_cents) * 1.2 FROM customer_total ct2
        |                      WHERE ct2.ct_prio = ct1.ct_prio)""".stripMargin),

    // q2/q11 shape: two aggregate CTEs joined with an exact integer
    // growth-ratio comparison (year-over-year spend up by >20%)
    sqlEntry("tpcds_q11_shape", Seq("orders", "customer"),
      """WITH y1996 AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey),
        |y1997 AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey)
        |SELECT c_name, y1996.cents AS cents_1996, y1997.cents AS cents_1997
        |FROM y1996 JOIN y1997 ON y1996.o_custkey = y1997.o_custkey
        |JOIN customer ON c_custkey = y1996.o_custkey
        |WHERE y1997.cents * 10 > y1996.cents * 12""".stripMargin),

    // q18/q22 shape: ROLLUP with the NULL super-aggregate rows
    sqlEntry("tpcds_rollup", Seq("customer", "nation"),
      """SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin),

    // q67 shape: CUBE over two dimensions
    sqlEntry("tpcds_cube", Seq("orders"),
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),

    // q10 shape: EXISTS conjunct with a disjunction of two more correlated
    // EXISTS over different tables
    sqlEntry("tpcds_q10_shape", Seq("customer", "orders", "lineitem"),
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |  AND (EXISTS (SELECT 1 FROM orders o2
        |               WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 250000)
        |    OR EXISTS (SELECT 1 FROM orders o3 JOIN lineitem l ON l.l_orderkey = o3.o_orderkey
        |               WHERE o3.o_custkey = c.c_custkey AND l.l_returnflag = 'R'))
        |GROUP BY c_mktsegment""".stripMargin),

    // q23 shape: HAVING-filtered CTE feeding an IN subquery
    sqlEntry("tpcds_q23_shape", Seq("lineitem"),
      """WITH frequent_parts AS (
        |  SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING count(*) > 30)
        |SELECT l_returnflag,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
        |GROUP BY l_returnflag""".stripMargin),

    // q44 shape: best-5 and worst-5 by ranked aggregate, unioned, with
    // unique tiebreaks so the rank sets are deterministic
    sqlEntry("tpcds_q44_shape", Seq("lineitem", "supplier"),
      """WITH perf AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY l_suppkey),
        |ranked AS (
        |  SELECT l_suppkey, rev,
        |         rank() OVER (ORDER BY rev DESC, l_suppkey ASC) AS best,
        |         rank() OVER (ORDER BY rev ASC, l_suppkey ASC) AS worst
        |  FROM perf)
        |SELECT s_name, CAST(best AS BIGINT) AS rnk, 'top' AS side
        |FROM ranked JOIN supplier ON s_suppkey = l_suppkey WHERE best <= 5
        |UNION ALL
        |SELECT s_name, CAST(worst AS BIGINT) AS rnk, 'bottom' AS side
        |FROM ranked JOIN supplier ON s_suppkey = l_suppkey WHERE worst <= 5""".stripMargin),

    // q34/q73 shape: inner per-key count with HAVING band, joined back out
    sqlEntry("tpcds_q34_shape", Seq("orders", "customer"),
      """WITH busy AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY o_custkey HAVING count(*) BETWEEN 15 AND 20)
        |SELECT c_name, cnt FROM busy JOIN customer ON o_custkey = c_custkey""".stripMargin),

    // q5/q77 shape: per-channel UNION ALL re-aggregated with ROLLUP
    sqlEntry("tpcds_q5_shape", Seq("orders"),
      """WITH channels AS (
        |  SELECT 'high' AS channel, o_orderpriority AS prio,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice >= 150000
        |  UNION ALL
        |  SELECT 'low' AS channel, o_orderpriority AS prio,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice < 150000)
        |SELECT channel, prio, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(cents) AS BIGINT) AS cents
        |FROM channels GROUP BY ROLLUP(channel, prio)""".stripMargin),

    // q35 shape: IN-subquery gate + conditional aggregation
    sqlEntry("tpcds_q35_shape", Seq("customer", "nation", "orders"),
      """SELECT n_name, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS rich
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY n_name""".stripMargin),

    // q47/q57 shape: per-group window average, keep months that deviate
    // >1.5x (a dyadic constant — the comparison is IEEE-identical)
    sqlEntry("tpcds_q47_shape", Seq("lineitem"),
      """WITH monthly AS (
        |  SELECT l_suppkey, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |  FROM lineitem GROUP BY l_suppkey, year(l_shipdate), month(l_shipdate))
        |SELECT l_suppkey, CAST(yr AS BIGINT) AS yr, CAST(mo AS BIGINT) AS mo, qty_cents
        |FROM (SELECT l_suppkey, yr, mo, qty_cents,
        |             avg(qty_cents) OVER (PARTITION BY l_suppkey) AS avg_cents
        |      FROM monthly) t
        |WHERE qty_cents > avg_cents * 1.5""".stripMargin),

    // q16 shape: NOT EXISTS + count(DISTINCT)
    sqlEntry("tpcds_q16_shape", Seq("orders", "lineitem"),
      """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS custs
        |FROM orders o
        |WHERE o_totalprice > 100000 AND NOT EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin),

    // q8/q14 shape: INTERSECT feeding an IN gate
    sqlEntry("tpcds_intersect", Seq("customer", "orders"),
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY c_mktsegment""".stripMargin),

    // q6 shape: uncorrelated scalar-subquery threshold in the WHERE clause
    // (the threshold double is computed from exact integers identically in
    // both engines)
    sqlEntry("tpcds_q6_shape", Seq("customer", "nation"),
      """SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0
        |                   FROM customer)
        |GROUP BY n_name""".stripMargin),

    // EXCEPT set difference feeding an IN gate
    sqlEntry("tpcds_except", Seq("customer", "orders"),
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY c_mktsegment""".stripMargin),

    // GROUPING() labels distinguishing super-aggregate NULLs from data NULLs
    sqlEntry("tpcds_grouping_fn", Seq("customer", "nation"),
      """SELECT n_name, c_mktsegment,
        |       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        |       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin),

    // numeric RANGE window frame (value-based, not row-based)
    sqlEntry("tpcds_window_range", Seq("orders"),
      """SELECT o_orderkey,
        |       CAST(count(*) OVER (PARTITION BY o_orderpriority
        |                           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
        |                           RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS near_cheaper
        |FROM orders""".stripMargin),

    // ntile quintiles over per-customer spend (unique tiebreak → stable)
    sqlEntry("tpcds_ntile", Seq("orders"),
      """WITH spend AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
        |FROM (SELECT cents,
        |             CAST(ntile(5) OVER (ORDER BY cents, o_custkey) AS BIGINT) AS bucket
        |      FROM spend) t
        |GROUP BY bucket""".stripMargin),

    // NOT IN subquery (non-null key domain — both engines' 3VL agrees)
    sqlEntry("tpcds_not_in", Seq("customer", "orders"),
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin),

    // chained CTEs: each referencing the previous (q4/q74 multi-stage shape)
    sqlEntry("tpcds_chained_cte", Seq("orders", "customer"),
      """WITH spend AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, cents,
        |         rank() OVER (ORDER BY cents DESC, o_custkey ASC) AS rnk
        |  FROM spend),
        |top AS (SELECT o_custkey, cents, CAST(rnk AS BIGINT) AS rnk
        |        FROM ranked WHERE rnk <= 50)
        |SELECT c_name, cents, rnk
        |FROM top JOIN customer ON c_custkey = o_custkey""".stripMargin),

    // exact per-group median over integer cents: the even-count midpoint is
    // the average of two BIGINTs — a dyadic-exact double in both engines
    sqlEntry("tpcds_median", Seq("orders"),
      """SELECT o_orderpriority,
        |       CAST(median(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS med_cents,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    // q51/q64 shape: lag/lead over a named WINDOW clause with an explicit
    // lag default — per-customer order sequence deltas in exact cents
    sqlEntry("tpcds_lag_lead", Seq("orders"),
      """SELECT o_custkey, o_orderkey,
        |       lag(o_orderkey) OVER w AS prev_ok,
        |       lead(o_orderkey) OVER w AS next_ok,
        |       CAST(round(o_totalprice * 100) AS BIGINT) -
        |         lag(CAST(round(o_totalprice * 100) AS BIGINT), 1, 0) OVER w AS delta_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin),

    // correlated LATERAL subquery in FROM (scalar aggregate per outer row).
    // The IS NOT NULL filter is LOAD-BEARING for parity: for a customer
    // with no orders, Spark emits a (c, NULL) row from the scalar
    // aggregate while DuckDB's comma-LATERAL drops the outer row entirely
    // — the filter is what makes both engines agree. Do not remove it as
    // "redundant".
    sqlEntry("tpcds_lateral", Seq("customer", "orders"),
      """SELECT c_custkey, c_name, t.max_cents
        |FROM customer, LATERAL (
        |  SELECT CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
        |  FROM orders WHERE o_custkey = c_custkey) t
        |WHERE t.max_cents IS NOT NULL""".stripMargin),

    // q88 shape: one row assembled from independent scalar-aggregate
    // derived tables via comma cross join — each subquery is its own scan
    // bucket, the planner must recognize all are single-row
    sqlEntry("tpcds_q88_shape", Seq("lineitem"),
      """SELECT b1, b2, b3, b4 FROM
        |  (SELECT CAST(count(*) AS BIGINT) AS b1 FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) s1,
        |  (SELECT CAST(count(*) AS BIGINT) AS b2 FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) s2,
        |  (SELECT CAST(count(*) AS BIGINT) AS b3 FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) s3,
        |  (SELECT CAST(count(*) AS BIGINT) AS b4 FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) s4""".stripMargin),

    // q90 shape: ratio of two filtered counts (BIGINT / BIGINT widened to
    // DOUBLE — a single IEEE division is bit-identical across engines; the
    // denominator bucket is never empty in this data)
    sqlEntry("tpcds_q90_shape", Seq("lineitem"),
      """SELECT CAST(lo AS DOUBLE) / hi AS qty_ratio, lo, hi FROM
        |  (SELECT CAST(count(*) AS BIGINT) AS lo FROM lineitem WHERE l_quantity <= 25) a,
        |  (SELECT CAST(count(*) AS BIGINT) AS hi FROM lineitem WHERE l_quantity > 25) b""".stripMargin),

    // q51 shape: two per-customer daily cumulative-revenue channels FULL
    // OUTER joined on (customer, day), then running maxima OVER the joined
    // frame and a cross-channel dominance filter — windows stacked on an
    // outer join, the hardest shape in the reference's window family.
    // Daily pre-aggregation makes the cumulative sums tie-free; max()
    // ignores the NULLs the outer join introduces in both engines. The
    // output day is emitted as a BIGINT yyyymmdd key, not a DATE/TIMESTAMP:
    // the testdata ships o_orderdate as TIMESTAMP, and two consecutive
    // driver rounds proved that BOTH raw timestamp cells (r7) and DATE
    // cells (r8) normalize differently between the engines in the driver's
    // compare harness even when the values are bit-identical — all-numeric
    // output is the only environment-proof encoding.
    sqlEntry("tpcds_q51_shape", Seq("orders"),
      """WITH o1 AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS dt,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1, 2),
        |f1 AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS dt,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        |o2 AS (SELECT k, dt, sum(c) OVER (PARTITION BY k ORDER BY dt
        |                                  ROWS UNBOUNDED PRECEDING) AS cum_o FROM o1),
        |f2 AS (SELECT k, dt, sum(c) OVER (PARTITION BY k ORDER BY dt
        |                                  ROWS UNBOUNDED PRECEDING) AS cum_f FROM f1),
        |j AS (
        |  SELECT coalesce(o2.k, f2.k) AS k, coalesce(o2.dt, f2.dt) AS dt,
        |         cum_o, cum_f
        |  FROM o2 FULL OUTER JOIN f2 ON o2.k = f2.k AND o2.dt = f2.dt)
        |SELECT k, CAST(year(dt) * 10000 + month(dt) * 100 + day(dt) AS BIGINT) AS dt_key,
        |       CAST(mx_o AS BIGINT) AS mx_o, CAST(mx_f AS BIGINT) AS mx_f FROM (
        |  SELECT k, dt,
        |         max(cum_o) OVER (PARTITION BY k ORDER BY dt
        |                          ROWS UNBOUNDED PRECEDING) AS mx_o,
        |         max(cum_f) OVER (PARTITION BY k ORDER BY dt
        |                          ROWS UNBOUNDED PRECEDING) AS mx_f
        |  FROM j) t
        |WHERE mx_o > mx_f""".stripMargin),

    // q67 shape: ROLLUP feeding a partitioned rank with an explicit
    // NULLS FIRST tiebreak (Spark's ASC default is NULLS FIRST, DuckDB's
    // is NULLS LAST — the explicit clause is what makes them agree on the
    // rollup's NULL subtotal rows)
    sqlEntry("tpcds_q67_shape", Seq("orders"),
      """SELECT o_orderpriority, o_orderstatus, cents, rk FROM (
        |  SELECT o_orderpriority, o_orderstatus, cents,
        |         rank() OVER (PARTITION BY o_orderpriority
        |                      ORDER BY cents DESC, o_orderstatus ASC NULLS FIRST) AS rk
        |  FROM (
        |    SELECT o_orderpriority, o_orderstatus,
        |           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)) agg) r
        |WHERE rk <= 2""".stripMargin),

    // q97 shape: channel-overlap census — two DISTINCT key sets FULL OUTER
    // joined, categorized by null pattern into both/left-only/right-only
    sqlEntry("tpcds_q97_shape", Seq("orders"),
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
        |b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        |SELECT CAST(sum(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_ch,
        |       CAST(sum(CASE WHEN a.k IS NOT NULL AND b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
        |       CAST(sum(CASE WHEN a.k IS NULL AND b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_b
        |FROM a FULL OUTER JOIN b ON a.k = b.k""".stripMargin),

    // q78 shape: anti-join expressed as LEFT JOIN … IS NULL (the classic
    // hand-written anti form — the planner must recognize it; distinct from
    // the NOT IN / NOT EXISTS entries which parse to anti joins directly)
    sqlEntry("tpcds_q78_shape", Seq("orders"),
      """WITH a AS (SELECT o_custkey AS k,
        |                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_a
        |           FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
        |b AS (SELECT o_custkey AS k,
        |             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_b
        |      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT a.k, a.cents_a
        |FROM a LEFT JOIN b ON a.k = b.k
        |WHERE b.k IS NULL""".stripMargin),

    // q75 shape: year-over-year decline — one aggregated CTE self-joined on
    // consecutive years (prev.yr + 1), filtered to shrinking cells
    sqlEntry("tpcds_q75_shape", Seq("orders"),
      """WITH y AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |         o_orderpriority AS p,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT cur.p, cur.yr, prev.cents AS prev_cents, cur.cents AS cur_cents
        |FROM y cur JOIN y prev ON cur.p = prev.p AND cur.yr = prev.yr + 1
        |WHERE cur.cents < prev.cents""".stripMargin),

    // q38 shape: three-way INTERSECT (set semantics chained twice) reduced
    // to a single count
    sqlEntry("tpcds_q38_shape", Seq("orders"),
      """SELECT CAST(count(*) AS BIGINT) AS hot
        |FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t""".stripMargin),

    // scalar subqueries inside HAVING: customers ordering more often than
    // the global mean — the threshold is computed by two uncorrelated
    // scalar subqueries right in the HAVING clause (one exact IEEE division
    // of two integer counts, so the cutoff is bit-identical cross-engine)
    sqlEntry("tpcds_having_subquery", Seq("orders"),
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) > (SELECT count(*) FROM orders) /
        |                  (SELECT count(DISTINCT o_custkey) FROM orders)""".stripMargin),

    // distribution windows: percent_rank/cume_dist over a tie-free global
    // order — both are single exact IEEE divisions of rank integers
    sqlEntry("tpcds_percentile", Seq("orders"),
      """SELECT o_orderkey, cents, pr, cd FROM (
        |  SELECT o_orderkey, cents,
        |         percent_rank() OVER (ORDER BY cents, o_orderkey) AS pr,
        |         cume_dist() OVER (ORDER BY cents, o_orderkey) AS cd
        |  FROM (SELECT o_orderkey,
        |               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |        FROM orders) t) w
        |WHERE pr <= 0.01""".stripMargin),

    // recursive CTE (Spark 4 + DuckDB share the WITH RECURSIVE syntax):
    // a generated month spine LEFT JOINed to the fact table — months with
    // no orders still appear with cnt = 0
    sqlEntry("sql_recursive_cte", Seq("orders"),
      """WITH RECURSIVE m(x) AS (
        |  SELECT 1 UNION ALL SELECT x + 1 FROM m WHERE x < 12)
        |SELECT CAST(m.x AS BIGINT) AS mon, CAST(count(o_orderkey) AS BIGINT) AS cnt
        |FROM m LEFT JOIN orders ON EXTRACT(month FROM o_orderdate) = m.x
        |GROUP BY m.x""".stripMargin),

    // gap-fill via LAST_VALUE ... IGNORE NULLS (the classic forward-fill):
    // dialects place the modifier differently (Spark: after the call;
    // DuckDB: inside the argument list), so this is a dual-text entry
    Entry("sql_ignore_nulls_fill", (s, d) => {
      deltaView(s, d, "orders")
      s.sql(
        """SELECT o_orderkey,
          |       last_value(v) IGNORE NULLS OVER (
          |         PARTITION BY o_custkey ORDER BY o_orderkey
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
          |FROM (SELECT o_orderkey, o_custkey,
          |             CASE WHEN o_orderstatus = 'O' THEN NULL
          |                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
          |      FROM orders) t""".stripMargin)
    }, Some(
      """SELECT o_orderkey,
        |       last_value(v IGNORE NULLS) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM (SELECT o_orderkey, o_custkey,
        |             CASE WHEN o_orderstatus = 'O' THEN NULL
        |                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
        |      FROM orders) t""".stripMargin)),

    // sample standard deviation via EXPLICIT exact sums (never the
    // engines' stddev aggregate — their streaming algorithms differ in
    // rounding): n·Σx² − (Σx)² over DECIMAL sums (exact to 38 digits in
    // BOTH engines — BIGINT sums would make Spark's s·s overflow around
    // SF 240 while DuckDB silently promotes to HUGEINT), one division,
    // one correctly-rounded sqrt ⇒ bit-identical cross-engine
    sqlEntry("tpcds_stddev_exact", Seq("lineitem"),
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |       sqrt(CAST(n * sq - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS sd
        |FROM (SELECT l_returnflag, count(*) AS n,
        |             sum(CAST(q AS DECIMAL(18, 0))) AS s,
        |             sum(CAST(q * q AS DECIMAL(18, 0))) AS sq
        |      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |            FROM lineitem) t
        |      GROUP BY l_returnflag) g""".stripMargin),

    // NTH_VALUE over a full-frame window: each customer's third-largest
    // order (NULL when fewer than three — both engines agree)
    sqlEntry("tpcds_nth_value", Seq("orders"),
      """SELECT DISTINCT o_custkey,
        |       nth_value(cents, 3) OVER (
        |         PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_cents
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders) t""".stripMargin),

    // correlated scalar COUNT subqueries in the SELECT list (the classic
    // per-row lookup shape Catalyst decorrelates into left joins)
    sqlEntry("sql_correlated_count", Seq("customer", "orders"),
      """SELECT c_custkey,
        |       CAST((SELECT count(*) FROM orders
        |             WHERE o_custkey = c_custkey) AS BIGINT) AS n_orders,
        |       CAST((SELECT count(*) FROM orders
        |             WHERE o_custkey = c_custkey
        |               AND o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
        |FROM customer
        |WHERE c_custkey <= 300""".stripMargin),

    // inline VALUES derived table joined to a fact scan (shared dialect)
    sqlEntry("sql_values_join", Seq("orders"),
      """SELECT t.label, CAST(count(*) AS BIGINT) AS cnt
        |FROM orders JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
        |                         ('5-LOW', 'cold')) AS t(prio, label)
        |  ON o_orderpriority = t.prio
        |GROUP BY t.label""".stripMargin))
}
