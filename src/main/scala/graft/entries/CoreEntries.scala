package graft.entries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel._
import graft.ops.ConstraintViolationException
import graft.table.{DeltaTable, DeltaWriter}
import EntryCtx._

/**
 * Driver-contract entries for the SURVEY §2 operator inventory: each builds
 * the operator's scenario on the driver's parquet testdata, runs it through
 * the Delta engine, and returns a DataFrame whose content a DuckDB oracle
 * reproduces over the same parquet. Read-path entries share cached Delta
 * copies; mutating entries build throwaway tables.
 */
object CoreEntries {

  // ---------------------------------------------------------------- scans

  private val scanEntries = Seq(
    // open_table + full load (SURVEY §2.1 rows 1,4)
    Entry("delta_scan_full", (s, d) =>
      DeltaTable.forPath(s, sharedDelta(s, d, "lineitem")).toDF,
      Some("SELECT * FROM lineitem")),

    // stats-based file skipping + exact re-filter (§2.2 rows 16,17).
    // Range-layout copy (repartitionByRange on l_shipdate → disjoint
    // per-file shipdate intervals) so FILE SKIPPING is provable in-entry:
    // on the shared unsorted copy every file spanned the full shipdate
    // range, and a keep-everything pruning regression was invisible to
    // the oracle (the post-scan filter still fixed the rows) — the r14
    // vacuous-claims audit's main find.
    Entry("delta_scan_pruned", (s, d) => {
      val dir = shared2.getOrElseUpdate(s"$d#lineitem#shipdate-range", {
        val dd = tempDir("prscan")
        DeltaTable.write(s, pq(s, d, "lineitem")
          .repartitionByRange(8, col("l_shipdate")), dd)
        dd
      })
      val t = DeltaTable.forPath(s, dir)
      // cutoff chosen mid-domain (shipdate spans 1995-01..2001-11 at every
      // SF) so several of the 8 range files lie PROVABLY below it
      val pred = "l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity < 10"
      val cands = graft.table.Scan.prunedFiles(t.snapshot,
        Seq(graft.table.Scan.parsePredicate(s, pred)), Some(s))
      require(cands.nonEmpty && cands.size < t.snapshot.allFiles.size,
        s"delta_scan_pruned: stats pruning kept ${cands.size} of " +
          s"${t.snapshot.allFiles.size} range-partitioned files — file " +
          "skipping is not engaging")
      t.scanWhere(pred)
    },
      Some("SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity < 10")),

    // partition pruning on a hive-partitioned Delta table (§2.2 row 18)
    Entry("delta_partition_pruning", (s, d) =>
      DeltaTable.forPath(s, sharedDelta(s, d, "orders", partitionBy = Seq("o_orderstatus")))
        .scanWhere("o_orderstatus = 'F' AND o_totalprice > 50000"),
      Some("SELECT * FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 50000")),

    // time travel by version (§2.1 row 2)
    Entry("time_travel", (s, d) => {
      val dir = tempDir("tt")
      val o = pq(s, d, "orders")
      DeltaTable.write(s, o.filter("o_orderkey % 3 = 0"), dir)
      DeltaTable.write(s, o.filter("o_orderkey % 3 <> 0"), dir, mode = "append")
      DeltaTable.forPath(s, dir).asOfVersion(0)
    }, Some("SELECT * FROM orders WHERE o_orderkey % 3 = 0")),

    // stats-only count, no scan (§2.4 row 26)
    Entry("stats_only_count", (s, d) => {
      val cnt = DeltaTable.forPath(s, sharedDelta(s, d, "lineitem")).approxCount.get
      import s.implicits._
      Seq(cnt).toDF("cnt")
    }, Some("SELECT count(*) AS cnt FROM lineitem")),

    // convert-to-delta over a plain parquet dir (§2.1 row 11)
    Entry("convert_to_delta", (s, d) => {
      val dir = tempDir("conv")
      pq(s, d, "region").write.parquet(dir)
      DeltaTable.convertToDelta(s, dir).toDF
    }, Some("SELECT * FROM region")),

    // checkpoint write + replay from _last_checkpoint (§2.7 row 43)
    Entry("checkpoint_replay", (s, d) => {
      val dir = tempDir("ckpt")
      val n = pq(s, d, "nation")
      (0 until 13).foreach { k =>
        DeltaTable.write(s, n.filter(s"n_nationkey % 13 = $k"), dir, mode = "append")
      }
      // the entry's NAME is "replay from a checkpoint": pin that one was
      // actually written (13 appends cross the interval-10 auto-checkpoint)
      // — without this, an auto-checkpointing regression leaves a pure-JSON
      // replay that returns identical rows and passes silently
      val fs = new org.apache.hadoop.fs.Path(dir, "_delta_log/_last_checkpoint")
        .getFileSystem(s.sessionState.newHadoopConf())
      require(fs.exists(new org.apache.hadoop.fs.Path(dir, "_delta_log/_last_checkpoint")),
        s"checkpoint_replay: no _last_checkpoint after 13 appends in $dir")
      DeltaTable.forPath(s, dir).toDF // fresh handle: checkpoint + tail replay
    }, Some("SELECT * FROM nation")),

    // crates/mount passthrough (§2 storage-backend row): a dbfs:/ table
    // path resolves through a local mount root for write, log replay, scan
    // AND a DV-less delete; commits go through MountLogStore's gated
    // unsafe-rename. The require() pins the named behavior the output hash
    // cannot see: the bytes physically live under the mount root and the
    // snapshot's files carry the dbfs scheme.
    Entry("mount_scan", (s, d) => {
      // the scheme name is PER-sfDir (mount registration is global Hadoop
      // state): a shared "dbfs" would let a concurrent invocation on
      // another sfDir swap the mount root mid-flight of this one's IO —
      // per-sfDir schemes make the global registry entries disjoint. The
      // builder runs through once() (exactly-once), not getOrElseUpdate
      // (which may evaluate racing builders twice against the SAME fixed
      // table path).
      val scheme = "dbfs" + java.lang.Integer.toHexString(d.hashCode & 0x7fffffff)
      val root = EntryCtx.once(s"$d#mountRoot") {
        val r = java.nio.file.Files.createTempDirectory("graft_mount").toString
        Mount.register(s, scheme, r, allowUnsafeRename = true)
        DeltaTable.write(s, pq(s, d, "nation"), s"$scheme:/wh/nation")
        DeltaTable.forPath(s, s"$scheme:/wh/nation").delete(Some("n_nationkey >= 20"))
        r
      }
      // idempotent re-pin: a later entry invocation on a fresh session must
      // still resolve the scheme (registration is session/global state)
      Mount.register(s, scheme, root, allowUnsafeRename = true)
      require(new java.io.File(s"$root/wh/nation/_delta_log").isDirectory,
        s"mount_scan: table bytes did not land under the mount root $root")
      // the handle itself resolves via the mount scheme (log replay + the
      // delete's commit both already went through MountFileSystem /
      // MountLogStore — no other FileSystem serves it)
      val t = DeltaTable.forPath(s, s"$scheme:/wh/nation")
      require(t.tablePath.toString.startsWith(s"$scheme:"),
        s"mount_scan: handle path ${t.tablePath}")
      t.toDF
    }, Some("SELECT * FROM nation WHERE n_nationkey < 20")))

  // ------------------------------------------------- SQL surface over Delta
  // One SQL text, two engines: Spark runs it over Delta-backed temp views
  // named like the parquet tables; DuckDB runs the identical text (§2.3-2.5).

  private val sqlEntries = Seq(
    sqlEntry("sql_join_agg", Seq("orders", "customer"),
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(27,2)) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    sqlEntry("sql_multi_join", Seq("supplier", "nation", "region"),
      """SELECT s_suppkey, s_name, n_name, r_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin),

    sqlEntry("sql_semi_join", Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""".stripMargin),

    sqlEntry("sql_anti_join", Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""".stripMargin),

    // Sums go through integer cents (round(x*100) is IEEE-identical in Spark
    // and DuckDB) rather than double→DECIMAL casts, whose half-cent tie
    // rounding diverges between the engines (Spark rounds the shortest
    // decimal repr HALF_UP; DuckDB rounds the exact binary value).
    sqlEntry("agg_q1", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),

    sqlEntry("agg_grouping_sets", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin),

    sqlEntry("window_topk", Seq("orders"),
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin),

    sqlEntry("window_running", Seq("orders"),
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS run_total
        |FROM orders""".stripMargin),

    sqlEntry("set_ops", Seq("customer", "supplier"),
      """SELECT 'only_customers' AS tag, k FROM (
        |  SELECT DISTINCT c_nationkey AS k FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey AS k FROM supplier) t1
        |UNION ALL
        |SELECT 'both' AS tag, k FROM (
        |  SELECT DISTINCT c_nationkey AS k FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey AS k FROM supplier) t2""".stripMargin),

    // SQL PIVOT (Spark PIVOT clause; the oracle replays it as conditional
    // aggregation — same relational content, dialect-independent). count()
    // over an absent (status, priority) combination is NULL under PIVOT
    // but 0 under sum(CASE…), so the Spark side coalesces.
    Entry("sql_pivot", (s, d) => {
      deltaView(s, d, "orders")
      s.sql(
        """SELECT status, coalesce(urgent, 0L) AS urgent,
          |       coalesce(high, 0L) AS high, coalesce(medium, 0L) AS medium
          |FROM (SELECT o_orderstatus AS status, o_orderpriority AS prio FROM orders)
          |PIVOT (CAST(count(*) AS BIGINT)
          |       FOR prio IN ('1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium))""".stripMargin)
    }, Some(
      """SELECT o_orderstatus AS status,
        |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ordered string aggregation: deterministic per-group concatenation
    // (Spark array_sort+array_join ≡ DuckDB string_agg ORDER BY — ASCII
    // names, binary collation both sides)
    Entry("sql_string_agg", (s, d) => {
      Seq("nation", "region").foreach(deltaView(s, d, _))
      s.sql(
        """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
          |       array_join(array_sort(collect_list(n_name)), ',') AS nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name""".stripMargin)
    }, Some(
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)),

    sqlEntry("scalar_fns", Seq("part"),
      """SELECT p_partkey, upper(p_name) AS uname,
        |       CAST(length(p_name) AS INT) AS len, p_size % 7 AS size_mod,
        |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |       substr(p_brand, 1, 5) AS brand5,
        |       concat(p_type, '#', p_brand) AS typebrand
        |FROM part""".stripMargin),

    sqlEntry("date_fns", Seq("orders"),
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(day(o_orderdate) AS INT) AS dy
        |FROM orders""".stripMargin),

    sqlEntry("limit_sort", Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin),

    // TPC-H-shaped classics over Delta views (decimal-cast per row so both
    // engines sum exactly)
    sqlEntry("tpch_q3_shape", Seq("customer", "orders", "lineitem"),
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(27,4)) AS revenue,
        |       o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin),

    sqlEntry("tpch_q5_shape", Seq("customer", "orders", "lineitem", "supplier", "nation", "region"),
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(27,4)) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),

    sqlEntry("tpch_q6_shape", Seq("lineitem"),
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DECIMAL(27,4)) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    sqlEntry("tpch_q10_shape", Seq("customer", "orders", "lineitem", "nation"),
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(27,4)) AS revenue,
        |       c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    // Q12 shape: join + conditional counts by priority class
    sqlEntry("tpch_q12_shape", Seq("orders", "lineitem"),
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin),

    // Q14 shape: promo revenue via integer cents (engine-identical rounding)
    sqlEntry("tpch_q14_shape", Seq("lineitem", "part"),
      """SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS promo_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin),

    // Q4 shape: correlated EXISTS (plans as a left-semi join)
    sqlEntry("tpch_q4_shape", Seq("orders", "lineitem"),
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin),

    // Q7 shape: the same dimension joined twice under different roles
    sqlEntry("tpch_q7_shape", Seq("lineitem", "supplier", "orders", "customer", "nation"),
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
        |  AND n1.n_nationkey <> n2.n_nationkey
        |GROUP BY n1.n_name, n2.n_name""".stripMargin),

    // Q13 shape: outer-join distribution (customers with zero orders count)
    sqlEntry("tpch_q13_shape", Seq("customer", "orders"),
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin),

    // Q22 shape: NOT EXISTS anti-join + scalar-subquery threshold; the
    // threshold is an avg over integer cents (exact integer sum / count →
    // one IEEE division, identical in both engines — a raw avg(double)
    // would be summation-order-dependent)
    sqlEntry("tpch_q22_shape", Seq("customer", "orders"),
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM (
        |  SELECT substring(c_name, length(c_name) - 1, 2) AS cntrycode,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
        |        (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
        |         FROM customer WHERE c_acctbal > 0.0)
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |) t
        |GROUP BY cntrycode""".stripMargin))

  // ---------------------------------------------------------------- writes

  private val writeEntries = Seq(
    // append mode (§2.1 row 6)
    Entry("write_append", (s, d) => {
      val dir = tempDir("wa")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n.filter("n_nationkey < 10"), dir)
      DeltaTable.write(s, n.filter("n_nationkey >= 10"), dir, mode = "append")
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM nation")),

    // overwrite mode (§2.1 row 6)
    Entry("write_overwrite", (s, d) => {
      val dir = tempDir("wo")
      val r = pq(s, d, "region")
      DeltaTable.write(s, r, dir)
      DeltaTable.write(s, r.filter("r_regionkey < 3"), dir, mode = "overwrite")
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM region WHERE r_regionkey < 3")),

    // replaceWhere: delete-matching + append in one commit (§2.1 row 7)
    Entry("replace_where", (s, d) => {
      val dir = tempDir("rw")
      val li = pq(s, d, "lineitem")
      DeltaTable.write(s, li, dir, partitionBy = Seq("l_returnflag"))
      val repl = li.filter("l_returnflag = 'A'")
        .withColumn("l_quantity", col("l_quantity") + 1000)
      DeltaTable.write(s, repl, dir, mode = "overwrite",
        replaceWhere = Some("l_returnflag = 'A'"))
      DeltaTable.forPath(s, dir).toDF
    }, Some(
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       CASE WHEN l_returnflag = 'A' THEN l_quantity + 1000 ELSE l_quantity END AS l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem""".stripMargin)),

    // schema evolution on append (§2.1 row 8)
    Entry("schema_evolution", (s, d) => {
      val dir = tempDir("se")
      val sup = pq(s, d, "supplier")
      DeltaTable.write(s, sup.filter("s_suppkey <= 50"), dir)
      DeltaTable.write(s,
        sup.filter("s_suppkey > 50").withColumn("bonus", col("s_suppkey") * 2),
        dir, mode = "append", mergeSchema = true)
      DeltaTable.forPath(s, dir).toDF
    }, Some(
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
        |       CASE WHEN s_suppkey > 50 THEN s_suppkey * 2 ELSE NULL END AS bonus
        |FROM supplier""".stripMargin)),

    // MERGE schema evolution (§2.6 row 30 / merge/mod.rs:1047-1077)
    Entry("merge_schema_evolution", (s, d) => {
      val dir = tempDir("mse")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n, dir)
      val src = n.filter("n_nationkey >= 20")
        .withColumn("n_note", concat(lit("note-"), col("n_nationkey")))
      val t = DeltaTable.forPath(s, dir)
      t.merge(src, "target.n_nationkey = source.n_nationkey")
        .whenMatchedUpdateAll()
        .withSchemaEvolution()
        .execute()
      t.toDF
    }, Some(
      """SELECT n_nationkey, n_name, n_regionkey,
        |       CASE WHEN n_nationkey >= 20 THEN concat('note-', n_nationkey) ELSE NULL END AS n_note
        |FROM nation""".stripMargin)),

    // delta.dataSkippingStatsColumns: stats restricted to a named column
    // list (operations/mod.rs:556-592); pruning on a listed column still
    // skips files, predicates on unlisted columns fail open to a full scan —
    // results identical either way (§2.2 row 17 variant)
    Entry("stats_columns", (s, d) => {
      val dir = tempDir("statscols")
      val o = pq(s, d, "orders").repartitionByRange(8, col("o_orderkey"))
      DeltaTable.write(s, o, dir,
        configuration = Map("delta.dataSkippingStatsColumns" -> "o_orderkey"))
      // prove the restriction actually bit: every file's stats maps carry
      // EXACTLY the listed column (results alone are identical whether the
      // config is honored, over-collected, or dropped)
      val statKeys = DeltaTable.forPath(s, dir).getAddActions(flatten = true)
        .select(map_keys(col("min_values")).as("mk"), map_keys(col("max_values")).as("xk"))
        .collect()
      require(statKeys.nonEmpty && statKeys.forall { r =>
        // null-safe: stats dropped entirely must hit THIS diagnostic, not
        // an NPE inside the forall
        Option(r.getSeq[String](0)).exists(_.toSet == Set("o_orderkey")) &&
          Option(r.getSeq[String](1)).exists(_.toSet == Set("o_orderkey"))
      }, "stats_columns: per-file stats must restrict to o_orderkey")
      DeltaTable.forPath(s, dir)
        .scanWhere("o_orderkey <= 7500 AND o_totalprice > 100000")
    }, Some("SELECT * FROM orders WHERE o_orderkey <= 7500 AND o_totalprice > 100000")),

    // add-action introspection (python get_add_actions, python/src/lib.rs):
    // the flattened per-file action frame — partition values, decoded stats
    // JSON — rolled up by partition must equal the data itself, proving the
    // listing against ground truth the oracle can recompute (file counts
    // are layout-dependent and stay out of the comparison).
    Entry("add_actions_stats", (s, d) => {
      val dir = sharedDelta(s, d, "orders", partitionBy = Seq("o_orderstatus"))
      DeltaTable.forPath(s, dir).getAddActions(flatten = true)
        .groupBy(col("partition_values")("o_orderstatus").as("o_orderstatus"))
        .agg(sum("num_records").cast("long").as("n_rows"),
          min(element_at(col("min_values"), "o_orderkey").cast("long"))
            .as("min_orderkey"),
          max(element_at(col("max_values"), "o_orderkey").cast("long"))
            .as("max_orderkey"))
    }, Some(
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(o_orderkey) AS min_orderkey, max(o_orderkey) AS max_orderkey
        |FROM orders GROUP BY 1""".stripMargin)),

    // blind append fast path (§2.1 row 10, table/blind.rs)
    Entry("blind_append", (s, d) => {
      val dir = tempDir("blind")
      val r = pq(s, d, "region")
      DeltaTable.write(s, r.filter("r_regionkey < 2"), dir)
      val blind = graft.table.BlindDeltaTable.forPath(s, dir)
      blind.append(r.filter("r_regionkey >= 2"), Some("loader"), Some(7L))
      blind.append(r.filter("r_regionkey >= 2"), Some("loader"), Some(7L)) // replay → skipped
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM region")),

    // structured-streaming sink semantics (§2.10): exactly-once microbatches
    Entry("streaming_sink", (s, d) => {
      val dir = tempDir("stream")
      val n = pq(s, d, "nation")
      val sink = graft.streaming.DeltaStreaming.sinkCreating(dir, "entry-app")
      sink(n.filter("n_nationkey < 10"), 0L)
      sink(n.filter("n_nationkey >= 10"), 1L)
      sink(n.filter("n_nationkey < 10"), 0L) // batch-0 replay → skipped
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM nation")),

    // batch format("graft-delta") read/write: DataFrameWriter partitionBy +
    // reader pushdown through the same stats/partition pruning as the
    // library scan (python/src/lib.rs open_table/write_deltalake parity)
    Entry("format_batch", (s, d) => {
      val dir = tempDir("fmt")
      pq(s, d, "customer").write.format("graft-delta")
        .partitionBy("c_mktsegment").save(dir)
      s.read.format("graft-delta").load(dir)
        .where("c_mktsegment = 'BUILDING' AND c_acctbal > 1000")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }, Some(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000""".stripMargin)),

    // history() (table/mod.rs history; python table.py history): version +
    // operation name over a table with a known op sequence — the
    // deterministic projection of CommitInfo, VALUES-literal oracle.
    Entry("history_op", (s, d) => {
      import s.implicits._
      val dir = shared2.getOrElseUpdate(s"$d#history", {
        val p = tempDir("hist")
        DeltaTable.write(s, pq(s, d, "nation"), p)
        val t = DeltaTable.forPath(s, p)
        t.delete(Some("n_nationkey = 1"))
        t.optimizeCompact()
        p
      })
      DeltaTable.forPath(s, dir).history()
        .map { case (v, _, ci) => (v, ci.map(_.operation).getOrElse("?")) }
        .toDF("version", "operation")
    }, Some(
      """SELECT CAST(v AS BIGINT) AS version, op AS operation FROM (VALUES
        |  (0, 'CREATE TABLE AS SELECT'), (1, 'DELETE'), (2, 'OPTIMIZE')) t(v, op)""".stripMargin)),

    // per-commit custom metadata (reference CommitProperties /
    // commitInfo.userMetadata + flattened extras): the session-conf surface
    // carries provenance through a plain write, the transaction-level
    // fields through a DML op; history replays all of it
    Entry("commit_metadata", (s, d) => {
      import s.implicits._
      val dir = tempDir("umeta")
      // session-conf provenance is set on a CHILD session (same context,
      // separate conf): a set/unset window on the shared session would let
      // a CONCURRENT entry's commit silently record this entry's
      // userMetadata as its own audit trail
      val s2 = s.newSession()
      s2.conf.set("spark.graft.commitInfo.userMetadata", "ingest-batch-0")
      DeltaTable.write(s2, pq(s2, d, "nation"), dir)
      val t = DeltaTable.forPath(s, dir)
      val txn = t.startTransaction()
      txn.commitUserMetadata = Some("manual-fixup")
      txn.commitAppMetadata = Map("pipelineRun" -> "r7", "team" -> "data-eng")
      txn.readWholeTable()
      val snap = t.snapshot
      val rm = snap.allFiles.head
      txn.commit(
        Seq(rm.copy(dataChange = false)), // no-op re-add, metadata-only
        graft.kernel.Operation("COMPUTE STATS", Map.empty, Map.empty))
      DeltaTable.forPath(s, dir).history()
        .map { case (v, _, ci) =>
          (v, ci.map(_.operation).getOrElse("?"),
            ci.flatMap(_.userMetadata).getOrElse(""),
            ci.map(_.info.toSeq.sorted.map { case (k, x) => s"$k=$x" }
              .mkString(";")).getOrElse(""))
        }
        .toDF("version", "operation", "user_metadata", "extra")
    }, Some(
      """SELECT CAST(v AS BIGINT) AS version, op AS operation, um AS user_metadata, ex AS extra FROM (VALUES
        |  (0, 'CREATE TABLE AS SELECT', 'ingest-batch-0', ''),
        |  (1, 'COMPUTE STATS', 'manual-fixup', 'pipelineRun=r7;team=data-eng')) t(v, op, um, ex)""".stripMargin)),

    // SQL catalog plugin (§2.1 catalogs, Spark-idiomatic): the entire
    // lifecycle — namespace, CTAS, INSERT, DELETE, SELECT — through
    // spark.sql over a GraftCatalog, zero library API calls.
    Entry("catalog_sql", (s, d) => {
      // the catalog NAME is per-sfDir: Spark's CatalogManager caches the
      // plugin instance, which captures its warehouse once at initialize()
      // — re-pointing the conf for a second sfDir on the same session would
      // be a silent no-op and the CREATE would collide with the first
      // sfDir's table. Distinct names give distinct cached instances. The
      // DDL builder runs through once() (catalog DDL on a fixed identifier
      // must not race itself). Source view name is also per-sfDir — a
      // concurrent invocation on another sfDir must not swap it mid-CTAS.
      val cat = "graft" + java.lang.Integer.toHexString(d.hashCode & 0x7fffffff)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      val wh = shared2.getOrElseUpdate(s"$d#catalog_wh", tempDir("catwh"))
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      EntryCtx.once(s"$d#catalog_built") {
        val srcView = s"__nation_src_$cat"
        pq(s, d, "nation").createOrReplaceTempView(srcView)
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.core")
        s.sql(s"""CREATE TABLE $cat.core.nation AS
                 SELECT n_nationkey, n_name, n_regionkey FROM $srcView""")
        s.sql(s"""INSERT INTO $cat.core.nation
                 SELECT n_nationkey + 100, n_name || '_X', n_regionkey
                 FROM $srcView WHERE n_regionkey = 0""")
        s.sql(s"DELETE FROM $cat.core.nation WHERE n_regionkey = 2 AND n_nationkey < 100")
        s.catalog.dropTempView(srcView)
        "built"
      }
      s.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM $cat.core.nation")
    }, Some(
      """SELECT n_nationkey, n_name, n_regionkey FROM (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name || '_X', n_regionkey FROM nation WHERE n_regionkey = 0
        |) t WHERE NOT (n_regionkey = 2 AND n_nationkey < 100)""".stripMargin)),

    // structured-streaming SOURCE (§2.10): format("graft-delta") readStream —
    // initial snapshot + a commit landing mid-stream, piped through the
    // exactly-once graft-delta sink into a second table.
    Entry("streaming_source", (s, d) => {
      val src = tempDir("stsrc"); val dst = tempDir("stdst")
      val ckpt = tempDir("stckpt")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n.filter("n_nationkey < 10"), src)
      DeltaTable.write(s, n.filter("n_nationkey >= 20"), src)
      val q = s.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", 1).load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", ckpt)
        .start(dst)
      try {
        q.processAllAvailable()
        // a commit after stream start flows incrementally
        DeltaTable.write(s, n.filter("n_nationkey >= 10 AND n_nationkey < 20"), src)
        q.processAllAvailable()
      } finally q.stop()
      DeltaTable.forPath(s, dst).toDF
    }, Some("SELECT * FROM nation")),

    // streaming CDF source (§2.10 extension): the feed streamed through a
    // memory sink equals the batch change feed, CDC legs included
    Entry("streaming_cdf", (s, d) => {
      val src = tempDir("cdfsrc")
      DeltaTable.write(s, pq(s, d, "nation"), src,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(s, src)
      t.delete(Some("n_nationkey >= 20"))
      val view = s"graft_cdf_stream_${EntryCtx.uniqueSuffix()}"
      val q = s.readStream.format("graft-delta")
        .option("readChangeFeed", "true").option("startingVersion", 0)
        .load(src)
        .writeStream.format("memory").queryName(view).start()
      try {
        q.processAllAvailable()
        t.update(Map("n_name" -> expr("concat(n_name, '!')")), Some("n_nationkey < 3"))
        q.processAllAvailable()
      } finally q.stop()
      EntryCtx.memoryTable(s, view).drop("_commit_timestamp")
    }, Some(
      """SELECT n_nationkey, n_name, n_regionkey, 'insert' AS _change_type,
        |       CAST(0 AS BIGINT) AS _commit_version
        |FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'delete', 1 FROM nation WHERE n_nationkey >= 20
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', 2 FROM nation WHERE n_nationkey < 3
        |UNION ALL
        |SELECT n_nationkey, concat(n_name, '!'), n_regionkey, 'update_postimage', 2
        |FROM nation WHERE n_nationkey < 3""".stripMargin)),

    // column mapping: physical-name files, logical-name results (§2.9 row 47)
    Entry("column_mapping", (s, d) => {
      val dir = tempDir("cm")
      DeltaTable.write(s, pq(s, d, "supplier"), dir,
        partitionBy = Seq("s_nationkey"),
        configuration = Map("delta.columnMapping.mode" -> "name"))
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("s_acctbal < 0"))
      t.scanWhere("s_nationkey >= 10")
    }, Some(
      """SELECT * FROM supplier
        |WHERE NOT (s_acctbal < 0) AND s_nationkey >= 10""".stripMargin)),

    // idempotent app transactions (§2.7 row 44)
    Entry("app_txn", (s, d) => {
      val dir = tempDir("txn")
      val r = pq(s, d, "region")
      DeltaTable.write(s, r.limit(0), dir) // create empty v0
      val t = DeltaTable.forPath(s, dir)
      def appendIdempotent(appVer: Long): Unit = {
        t.refresh()
        if (t.txnVersion("loader").exists(_ >= appVer)) return
        val adds = DeltaWriter.writeFiles(s, t.tablePath, r, Nil, 32)
        val txn = t.startTransaction()
        t.commitAndRefresh(txn,
          adds :+ SetTransaction("loader", appVer, Some(System.currentTimeMillis())),
          Operation("WRITE", Map("mode" -> "Append")))
      }
      appendIdempotent(1L)
      appendIdempotent(1L) // duplicate delivery — must be skipped
      t.toDF
    }, Some("SELECT * FROM region")),

    // MERGE run-level idempotent replay (§2.7 row 44 extension): the
    // builder's withAppTransaction is not just recorded — MergeOp.run
    // itself skips an already-applied (appId, version) with zeroed
    // metrics, so a replayed batch cannot double-apply even when the
    // caller forgot its own txnVersion pre-check (delta-spark
    // txnAppId/txnVersion semantics).
    Entry("merge_idempotent_replay", (s, d) => {
      val dir = tempDir("mir")
      DeltaTable.write(s, pq(s, d, "region"), dir)
      val t = DeltaTable.forPath(s, dir)
      def upsert(ver: Long, suffix: String): Map[String, String] =
        t.merge(pq(s, d, "region"), "target.r_regionkey = source.r_regionkey")
          .whenMatchedUpdate(Map("r_name" -> s"concat(target.r_name, '$suffix')"))
          .withAppTransaction("replayer", ver)
          .execute()
      val first = upsert(7L, "_a")
      require(first.get("replay_skipped").isEmpty &&
        first("num_target_rows_updated").toLong > 0,
        s"merge_idempotent_replay: first delivery must apply, got $first")
      // duplicate delivery of the SAME version: must no-op with zeroed,
      // marked metrics — a regression that re-applies appends '_a' twice
      // and the oracle hash below fails
      val replay = upsert(7L, "_a")
      require(replay.get("replay_skipped").contains("true") &&
        replay("num_target_rows_updated") == "0",
        s"merge_idempotent_replay: replay of (replayer, 7) must skip, got $replay")
      // a HIGHER version still applies (the skip is positional, not sticky)
      val next = upsert(8L, "_b")
      require(next.get("replay_skipped").isEmpty &&
        next("num_target_rows_updated").toLong > 0,
        s"merge_idempotent_replay: version 8 after 7 must apply, got $next")
      require(t.txnVersion("replayer").contains(8L),
        "merge_idempotent_replay: table must record the latest applied version")
      t.toDF
    }, Some(
      """SELECT r_regionkey, concat(r_name, '_a_b') AS r_name
        |FROM region""".stripMargin)))

  // ------------------------------------------------------------------- DML

  /** "Mask instead of rewrite" must be observable: at least one live file
    * carries a DV after the DML (identical rows come back either way) —
    * ONE definition for the three *_via_dv entries. */
  private def requireDvMask(t: DeltaTable, entry: String): Unit =
    require(t.deletionVectors.limit(1).count() > 0,
      s"$entry: DML on a DV-enabled table must mask via deletion vectors")

  private val dmlEntries = Seq(
    // DELETE with rewrite of partially-matching files (§2.6 row 28)
    Entry("delete_partial", (s, d) => {
      val dir = tempDir("del")
      DeltaTable.write(s, pq(s, d, "orders"), dir)
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("o_orderstatus = 'F' AND o_totalprice < 100000"))
      t.toDF
    }, Some("SELECT * FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)")),

    // DELETE metadata-only whole-partition path (§2.6 row 28)
    Entry("delete_partition", (s, d) => {
      val dir = tempDir("delp")
      DeltaTable.write(s, pq(s, d, "orders"), dir, partitionBy = Seq("o_orderstatus"))
      val t = DeltaTable.forPath(s, dir)
      // the claim is the METADATA-ONLY path: whole files removed, nothing
      // rewritten — a regression to copy-on-write returns identical rows
      val m = t.delete(Some("o_orderstatus = 'O'"))
      require(m("num_added_files") == "0" && m("num_removed_files").toLong > 0,
        s"delete_partition: expected metadata-only delete, got $m")
      t.toDF
    }, Some("SELECT * FROM orders WHERE o_orderstatus <> 'O'")),

    // DELETE via deletion vectors: mask instead of rewrite (§2.9 row 46 +
    // write-side extension beyond the reference)
    Entry("delete_via_dv", (s, d) => {
      val dir = tempDir("dvdel")
      DeltaTable.write(s, pq(s, d, "part"), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("p_size > 25"))
      requireDvMask(t, "delete_via_dv")
      t.toDF
    }, Some("SELECT * FROM part WHERE NOT (p_size > 25)")),

    // UPDATE with CASE-per-SET rewrite (§2.6 row 29)
    Entry("update_op", (s, d) => {
      val dir = tempDir("upd")
      DeltaTable.write(s, pq(s, d, "part"), dir)
      val t = DeltaTable.forPath(s, dir)
      t.update(Map("p_retailprice" -> expr("p_retailprice * 2")), Some("p_size > 40"))
      t.toDF
    }, Some(
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |       CASE WHEN p_size > 40 THEN p_retailprice * 2 ELSE p_retailprice END AS p_retailprice
        |FROM part""".stripMargin)),

    // UPDATE via deletion vectors: mask + append (§2.9 row 46 extension)
    Entry("update_via_dv", (s, d) => {
      val dir = tempDir("dvupd")
      DeltaTable.write(s, pq(s, d, "supplier"), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t = DeltaTable.forPath(s, dir)
      t.update(Map("s_acctbal" -> expr("s_acctbal + 100")), Some("s_suppkey <= 20"))
      requireDvMask(t, "update_via_dv")
      t.toDF
    }, Some(
      """SELECT s_suppkey, s_name, s_nationkey,
        |       CASE WHEN s_suppkey <= 20 THEN s_acctbal + 100 ELSE s_acctbal END AS s_acctbal
        |FROM supplier""".stripMargin)),

    // MERGE upsert: update-all + insert-all (§2.6 row 30, §2.3 join)
    Entry("merge_upsert", (s, d) => {
      val dir = tempDir("mrg")
      val o = pq(s, d, "orders")
      DeltaTable.write(s, o, dir)
      // insert keys offset past the ACTUAL key domain (max+1), replayed
      // identically by the oracle's scalar subquery — a fixed literal
      // collided with real keys at sf1 (max o_orderkey 1.5M > 1M), turning
      // the dup-free source into a duplicate-match error by construction
      val offset = o.agg(max("o_orderkey")).head().getLong(0) + 1
      val updates = o.filter("o_orderkey % 2 = 0")
      val inserts = o.filter("o_orderkey % 100 = 0")
        .withColumn("o_orderkey", col("o_orderkey") + offset)
      val src = updates.unionByName(inserts)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      val t = DeltaTable.forPath(s, dir)
      t.merge(src, "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
      t.toDF
    }, Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
        |       o_custkey, o_orderstatus, o_totalprice + 1,
        |       o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin)),

    // MERGE on a DV-enabled table: masks + appends, no copies (row 46 ext.)
    Entry("merge_via_dv", (s, d) => {
      val dir = tempDir("mrgdv")
      val sup = pq(s, d, "supplier")
      DeltaTable.write(s, sup, dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val src = sup.filter("s_suppkey % 2 = 0")
        .withColumn("s_acctbal", col("s_acctbal") + 5)
      val t = DeltaTable.forPath(s, dir)
      t.merge(src, "target.s_suppkey = source.s_suppkey")
        .whenMatchedUpdateAll().execute()
      requireDvMask(t, "merge_via_dv")
      t.toDF
    }, Some(
      """SELECT s_suppkey, s_name, s_nationkey,
        |       CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal + 5 ELSE s_acctbal END AS s_acctbal
        |FROM supplier""".stripMargin)),

    // MERGE with conditional update/delete clauses + insert (§2.6 row 30)
    Entry("merge_mixed", (s, d) => {
      val dir = tempDir("mrgm")
      val sup = pq(s, d, "supplier")
      DeltaTable.write(s, sup, dir)
      val src = sup.filter("s_suppkey <= 60")
        .unionByName(sup.filter("s_suppkey <= 5")
          .withColumn("s_suppkey", col("s_suppkey") + 1000))
      val t = DeltaTable.forPath(s, dir)
      t.merge(src, "target.s_suppkey = source.s_suppkey")
        .whenMatchedUpdate(Map("s_acctbal" -> "source.s_acctbal + 10"),
          Some("source.s_suppkey <= 30"))
        .whenMatchedDelete(Some("source.s_suppkey > 30"))
        .whenNotMatchedInsertAll()
        .execute()
      t.toDF
    }, Some(
      """SELECT s_suppkey, s_name, s_nationkey,
        |       CASE WHEN s_suppkey <= 30 THEN s_acctbal + 10 ELSE s_acctbal END AS s_acctbal
        |FROM supplier WHERE NOT (s_suppkey > 30 AND s_suppkey <= 60)
        |UNION ALL
        |SELECT s_suppkey + 1000, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_suppkey <= 5""".stripMargin)),

    // MERGE not-matched-by-source clauses (§2.6 row 30)
    Entry("merge_by_source", (s, d) => {
      val dir = tempDir("mrgs")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n, dir)
      val t = DeltaTable.forPath(s, dir)
      t.merge(n.filter("n_nationkey < 10"), "target.n_nationkey = source.n_nationkey")
        .whenMatchedUpdate(Map("n_name" -> "concat(target.n_name, '!')"))
        .whenNotMatchedBySourceDelete()
        .execute()
      t.toDF
    }, Some(
      """SELECT n_nationkey, concat(n_name, '!') AS n_name, n_regionkey
        |FROM nation WHERE n_nationkey < 10""".stripMargin)))

  // ---------------------------------------------------------- maintenance

  private val maintenanceEntries = Seq(
    // OPTIMIZE compact: many small files → few, data unchanged (§2.6 row 31)
    Entry("optimize_compact", (s, d) => {
      val dir = tempDir("opt")
      val li = pq(s, d, "lineitem")
      DeltaTable.write(s, li.filter("l_orderkey % 2 = 0").repartition(16), dir)
      DeltaTable.write(s, li.filter("l_orderkey % 2 <> 0").repartition(16), dir, mode = "append")
      val t = DeltaTable.forPath(s, dir)
      val m = t.optimizeCompact()
      // "many small files → few" must be observable: a no-op bin-packer
      // returns identical data (the optimize_incremental pattern)
      require(m("num_files_removed").toInt > m("num_files_added").toInt &&
        m("num_files_added").toInt > 0,
        s"optimize_compact: expected a compacting rewrite of 32 small files, got $m")
      t.toDF
    }, Some("SELECT * FROM lineitem")),

    // incremental-commit OPTIMIZE (optimize.rs min_commit_interval): the
    // compaction banks progress across MULTIPLE commits (interval 0 ⇒ a
    // commit per completed-bin batch); data must be byte-identical and the
    // log must show >1 OPTIMIZE commit (asserted here — the oracle proves
    // the data plane)
    Entry("optimize_incremental", (s, d) => {
      val dir = tempDir("opti")
      val ord = pq(s, d, "orders")
      DeltaTable.write(s, ord.repartition(12), dir,
        partitionBy = Seq("o_orderpriority"))
      val t = DeltaTable.forPath(s, dir)
      val v0 = t.version
      val m = t.optimizeCompact(minCommitInterval = Some(0L))
      require(m("num_commits").toInt >= 2 && t.version == v0 + m("num_commits").toInt,
        s"expected multiple incremental OPTIMIZE commits, got $m")
      t.toDF
    }, Some("SELECT * FROM orders")),

    // OPTIMIZE Z-ORDER: clustering rewrite, data unchanged (§2.6 row 32)
    Entry("optimize_zorder", (s, d) => {
      val dir = tempDir("zo")
      DeltaTable.write(s, pq(s, d, "lineitem").repartition(8), dir)
      val t = DeltaTable.forPath(s, dir)
      val m = t.optimizeZOrder(Seq("l_partkey", "l_suppkey"))
      // the clustering REWRITE must actually happen — a Z-ORDER that skips
      // every file returns identical data and would pass silently
      require(m("num_files_removed").toInt > 0 && m("num_files_added").toInt > 0,
        s"optimize_zorder: expected a clustering rewrite, got $m")
      t.toDF
    }, Some("SELECT * FROM lineitem")),

    // VACUUM: physically drops tombstoned files, live data intact (§2.6 row 33)
    Entry("vacuum_op", (s, d) => {
      val dir = tempDir("vac")
      DeltaTable.write(s, pq(s, d, "orders").repartition(8), dir)
      val t = DeltaTable.forPath(s, dir)
      // "physically drops tombstoned files" needs physical proof: the files
      // the delete tombstones (pre-delete live set minus post-delete live
      // set) must be GONE afterwards — a no-op vacuum leaves live data
      // intact and would pass the oracle
      val before = t.snapshot.allFiles.map(_.path).toSet
      t.delete(Some("o_totalprice < 50000"))
      val tombstoned = (before -- t.snapshot.allFiles.map(_.path).toSet)
        .toSeq.map(t.snapshot.absolutePath)
      val fs = t.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      require(tombstoned.nonEmpty && tombstoned.forall(fs.exists),
        "vacuum_op: the delete rewrite left no on-disk debris?")
      t.vacuum(retentionHours = 0, dryRun = false, enforceRetention = false)
      require(tombstoned.forall(p => !fs.exists(p)),
        s"vacuum_op: tombstoned files survived VACUUM: ${tombstoned.filter(fs.exists).take(3).mkString(",")}")
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM orders WHERE NOT (o_totalprice < 50000)")),

    // VACUUM live-set boundary (§2.6 extension; vacuum.rs:652
    // is_tombstone_expired + this engine's DV protection): a RETAINED
    // tombstone protects BOTH its data file and its DV blob even when the
    // bytes' mtimes are ancient — protection comes from the tombstone's
    // deletionTimestamp, never the file clock — while untracked aged
    // debris is reclaimed; once the tombstone ages out, parquet AND blob
    // are released. The tombstone set is asserted through a CHECKPOINT
    // replay (the retention-filtered survivors), and time travel into the
    // retention window must still decode the mask after the first VACUUM.
    Entry("vacuum_liveset", (s, d) => {
      val dir = tempDir("vls")
      DeltaTable.write(s, pq(s, d, "nation").repartition(4), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("n_nationkey >= 20")) // v1: masks in place via DVs
      require(t.snapshot.allFiles.exists(_.deletionVector.exists(_.cardinality > 0)),
        "vacuum_liveset: the delete must mask via deletion vectors")
      t.optimizeCompact() // v2: rewrites the files; removes CARRY the DVs
      t.createCheckpoint()
      val t2 = DeltaTable.forPath(s, dir) // replay through the checkpoint
      val dvTombs = t2.snapshot.tombstones.filter(_.deletionVector.isDefined)
      require(dvTombs.nonEmpty,
        "vacuum_liveset: checkpoint replay lost the DV-carrying tombstones")
      val fs = t2.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      val tombParquets = dvTombs.map(r =>
        new Path(dir, PathCodec.decode(r.path)))
      val tombBlobs = dvTombs.flatMap(r =>
        DeletionVectors.dvPath(t2.tablePath, r.deletionVector.get))
      require(tombBlobs.nonEmpty, "vacuum_liveset: tombstone DVs have no on-disk blobs")
      // age EVERY data byte far outside any retention window
      val aged = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
      def ageAll(p: Path): Unit = fs.listStatus(p).foreach { st =>
        if (st.isDirectory) {
          if (!st.getPath.getName.startsWith("_")) ageAll(st.getPath)
        } else fs.setTimes(st.getPath, aged, -1)
      }
      ageAll(t2.tablePath)
      // plant untracked aged debris — what VACUUM exists to reclaim
      val orphan = new Path(dir, "part-orphan-vls.parquet")
      locally { val o = fs.create(orphan); o.write(1); o.close() }
      fs.setTimes(orphan, aged, -1)
      // default 7-day retention: the fresh tombstones win over mtimes
      t2.vacuum(dryRun = false)
      require(!fs.exists(orphan),
        "vacuum_liveset: aged untracked debris must be reclaimed")
      (tombParquets ++ tombBlobs).foreach(p => require(fs.exists(p),
        s"vacuum_liveset: $p is protected by a retained tombstone but was deleted"))
      require(t2.asOfVersion(1).count() == 20,
        "vacuum_liveset: time travel to the DV version must still decode the mask")
      // collapse the window: expired tombstones release parquet AND blob
      t2.vacuum(retentionHours = 0, dryRun = false, enforceRetention = false)
      (tombParquets ++ tombBlobs).foreach(p => require(!fs.exists(p),
        s"vacuum_liveset: $p outlived its expired tombstone"))
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT * FROM nation WHERE NOT (n_nationkey >= 20)")),

    // explicit checkpoint + expired-log cleanup (python create_checkpoint /
    // cleanup_metadata): after aging every pre-checkpoint commit past the
    // 1ms retention and cleaning, replay reconstructs the FULL table from
    // the checkpoint alone
    Entry("checkpoint_cleanup", (s, d) => {
      val dir = tempDir("ckclean")
      val ord = pq(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 0"), dir,
        configuration = Map(
          "delta.logRetentionDuration" -> "interval 1 millisecond",
          "delta.checkpointInterval" -> "1000"))
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 1"), dir, mode = "append")
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 2"), dir, mode = "append")
      val t = DeltaTable.forPath(s, dir)
      t.createCheckpoint()
      val fs = t.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
      fs.listStatus(logDir).foreach(f => fs.setTimes(f.getPath, 1000L, 1000L))
      t.cleanupMetadata()
      // "replay reconstructs from the checkpoint ALONE" requires the aged
      // commits to be gone — a no-op cleanup replays the intact JSON log
      // to the same rows and would pass silently
      val leftover = fs.listStatus(logDir).map(_.getPath.getName)
        .filter(n => n.matches("\\d{20}\\.json") &&
          n.stripSuffix(".json").toLong < t.version)
      require(leftover.isEmpty,
        s"checkpoint_cleanup: aged pre-checkpoint commits survived: ${leftover.mkString(",")}")
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders")),

    // RESTORE to an earlier version (§2.6 row 34)
    Entry("restore_op", (s, d) => {
      val dir = tempDir("rst")
      DeltaTable.write(s, pq(s, d, "nation"), dir)
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("n_nationkey >= 10"))
      t.restore(0)
      t.toDF
    }, Some("SELECT * FROM nation")),

    // FSCK: drop Adds whose files vanished (§2.6 row 35)
    Entry("fsck_op", (s, d) => {
      val dir = tempDir("fsck")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n.filter("n_nationkey < 15"), dir)
      val t0 = DeltaTable.forPath(s, dir)
      val before = t0.snapshot.allFiles.map(_.path).toSet
      DeltaTable.write(s, n.filter("n_nationkey >= 15"), dir, mode = "append")
      val t = DeltaTable.forPath(s, dir)
      val snap = t.snapshot
      val fs = t.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      snap.allFiles.filterNot(f => before.contains(f.path))
        .foreach(f => fs.delete(snap.absolutePath(f.path), false))
      t.fsck()
      t.toDF
    }, Some("SELECT * FROM nation WHERE n_nationkey < 15")),

    // CHECK constraint DDL + write-path enforcement (§2.2 row 21, §2.6 row 38)
    Entry("constraints_ddl", (s, d) => {
      val dir = tempDir("con")
      val r = pq(s, d, "region")
      DeltaTable.write(s, r, dir)
      val t = DeltaTable.forPath(s, dir)
      t.addConstraint("r_nonneg", "r_regionkey >= 0")
      val bad = r.limit(1).withColumn("r_regionkey", lit(-1))
      try {
        DeltaTable.write(s, bad, dir, mode = "append")
        throw new IllegalStateException("constraint not enforced")
      } catch { case _: ConstraintViolationException => () }
      t.refresh()
      t.toDF
    }, Some("SELECT * FROM region")),

    // generated columns computed on write (§2.2 row 21 / generated_columns.rs)
    Entry("generated_columns", (s, d) => {
      import org.apache.spark.sql.types._
      val dir = tempDir("gen")
      val part = pq(s, d, "part")
      val genMeta = new MetadataBuilder()
        .putString("delta.generationExpression", "p_retailprice * 2").build()
      val schema = StructType(part.schema.fields :+
        StructField("double_price", DoubleType, nullable = true, genMeta))
      DeltaTable.create(s, dir, schema)
      DeltaTable.write(s, part, dir, mode = "append") // no double_price given
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT *, p_retailprice * 2 AS double_price FROM part")),

    // CDF write path + read assembly (§2.6 rows 36,37)
    Entry("cdf_read", (s, d) => {
      val dir = tempDir("cdf")
      DeltaTable.write(s, pq(s, d, "nation"), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val t = DeltaTable.forPath(s, dir)
      t.delete(Some("n_nationkey >= 20"))
      t.update(Map("n_name" -> expr("concat(n_name, '?')")), Some("n_nationkey < 3"))
      t.loadCdf(0).drop("_commit_timestamp")
    }, Some(
      """SELECT n_nationkey, n_name, n_regionkey, 'insert' AS _change_type,
        |       CAST(0 AS BIGINT) AS _commit_version
        |FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'delete', 1 FROM nation WHERE n_nationkey >= 20
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', 2 FROM nation WHERE n_nationkey < 3
        |UNION ALL
        |SELECT n_nationkey, concat(n_name, '?'), n_regionkey, 'update_postimage', 2
        |FROM nation WHERE n_nationkey < 3""".stripMargin)),

    // the same maintenance under CONTINUOUS ingestion: a stream of order
    // batches lands in a CDF-enabled upstream (append per micro-batch) and
    // every batch refreshes the rollup through the change feed — the
    // streaming-ETL + materialized-view pipeline as one composition. The
    // rollup after the stream drains must equal the full aggregation
    // whatever the batch split was.
    Entry("streaming_incremental_agg", (s, d) => {
      val srcDir = EntryCtx.sharedDelta(s, d, "orders")
      val up = tempDir("stincr_up"); val tgt = tempDir("stincr_tgt")
      val keys = Seq("o_orderstatus", "o_orderpriority")
      val q = s.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", 1).option("startingVersion", "0")
        .load(srcDir)
        .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val slim = batch.select(col("o_orderstatus"), col("o_orderpriority"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          DeltaTable.write(s, slim, up, mode = "append",
            configuration = Map("delta.enableChangeDataFeed" -> "true"))
          graft.ops.IncrementalAgg.refresh(
            DeltaTable.forPath(s, up), tgt, keys, Seq("cents"))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      DeltaTable.forPath(s, tgt).toDF
    }, Some(
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(count(round(o_totalprice * 100)) AS BIGINT) AS nn_cents
        |FROM orders GROUP BY 1, 2""".stripMargin)),

    // incremental aggregate maintenance (CDF × app-txn × MERGE — the
    // materialized-view composition, ops/IncrementalAgg.scala): target
    // rollup built by a snapshot refresh, then maintained through delete/
    // update/append upstream commits via the change feed only; a third
    // refresh proves idempotent no-op bookkeeping. Oracle = full
    // aggregation of the FINAL upstream state.
    Entry("cdf_incremental_agg", (s, d) => {
      val dir = tempDir("incragg_up"); val tgt = tempDir("incragg_tgt")
      val keys = Seq("o_orderstatus", "o_orderpriority")
      val base = pq(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      DeltaTable.write(s, base.repartition(4), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val up = DeltaTable.forPath(s, dir)
      graft.ops.IncrementalAgg.refresh(up, tgt, keys, Seq("cents"))
      up.delete(Some("cents < 5000000"))
      up.update(Map("cents" -> expr("cents + 7")), Some("o_orderkey % 7 = 0"))
      // appended keys past the real domain (output-invisible — o_orderkey
      // is aggregated away — but data-derived anyway: no fixed-offset
      // literals survive in entries, grep-verifiable)
      val okOff = base.agg(max("o_orderkey")).head().getLong(0) + 1
      DeltaTable.write(s, base.filter("o_orderkey % 1000 = 1")
        .withColumn("o_orderkey", col("o_orderkey") + okOff), dir,
        mode = "append")
      graft.ops.IncrementalAgg.refresh(up, tgt, keys, Seq("cents"))
      val m3 = graft.ops.IncrementalAgg.refresh(up, tgt, keys, Seq("cents"))
      require(m3.get("no_op").contains("true"),
        s"third refresh must be a no-op, got $m3")
      DeltaTable.forPath(s, tgt).toDF
    }, Some(
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |         CASE WHEN o_orderkey % 7 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE cents >= 5000000),
        |appended AS (
        |  SELECT o_orderstatus, o_orderpriority, cents
        |  FROM base WHERE o_orderkey % 1000 = 1),
        |allr AS (SELECT * FROM kept UNION ALL SELECT * FROM appended)
        |SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(count(cents) AS BIGINT) AS nn_cents
        |FROM allr GROUP BY 1, 2""".stripMargin)))

  // ------------------------------------------- round-3 driver-proof entries
  // Operators previously covered only by sbt suites (VERDICT r2 rows 12,
  // 39, 41, 48) now carry oracle-checked entries.

  private val round3Entries = Seq(
    // symlink manifest (§2.1 row 12): prove it by reading the table back
    // EXCLUSIVELY through the manifest-listed files (what Presto/Trino do)
    Entry("generate_manifest", (s, d) => {
      val dir = tempDir("mangen")
      DeltaTable.write(s, pq(s, d, "orders"), dir, partitionBy = Seq("o_orderstatus"))
      val t = DeltaTable.forPath(s, dir)
      t.generateSymlinkManifest()
      val fs = t.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      def manifests(p: Path): Seq[Path] =
        fs.listStatus(p).toSeq.flatMap { st =>
          if (st.isDirectory) manifests(st.getPath)
          else if (st.getPath.getName == "manifest") Seq(st.getPath) else Nil
        }
      val listed = manifests(new Path(dir, "_symlink_format_manifest")).flatMap { p =>
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      }.filter(_.nonEmpty)
      require(listed.nonEmpty, "manifest listed no files")
      s.read.option("basePath", dir).parquet(listed: _*)
    }, Some("SELECT * FROM orders")),

    // add_feature / update_table_metadata / update_field_metadata (row 39):
    // apply the DDL trio, reload from the log, emit the resulting protocol +
    // metadata as rows a constant oracle reproduces
    Entry("ddl_features", (s, d) => {
      val dir = tempDir("feat")
      DeltaTable.write(s, pq(s, d, "region"), dir)
      val t = DeltaTable.forPath(s, dir)
      t.addFeature("deletionVectors")
      t.addFeature("changeDataFeed")
      t.updateTableMetadata(name = Some("bench_region"), description = Some("round3"))
      t.updateFieldMetadata("r_name", Map("comment" -> "region name"))
      val snap = DeltaTable.forPath(s, dir).snapshot // fresh log reload
      val p = snap.protocol
      import s.implicits._
      Seq(
        "minReaderVersion" -> p.minReaderVersion.toString,
        "minWriterVersion" -> p.minWriterVersion.toString,
        "readerFeatures" -> p.readerFeatures.getOrElse(Nil).sorted.mkString(","),
        "hasDvWriter" -> p.writerFeatures.exists(_.contains("deletionVectors")).toString,
        "hasCdfWriter" -> p.writerFeatures.exists(_.contains("changeDataFeed")).toString,
        "name" -> snap.metadata.name.getOrElse(""),
        "description" -> snap.metadata.description.getOrElse(""),
        "r_name_comment" -> snap.schema("r_name").metadata.getString("comment")
      ).toDF("k", "v")
    }, Some(
      """SELECT 'minReaderVersion' AS k, '3' AS v
        |UNION ALL SELECT 'minWriterVersion', '7'
        |UNION ALL SELECT 'readerFeatures', 'deletionVectors'
        |UNION ALL SELECT 'hasDvWriter', 'true'
        |UNION ALL SELECT 'hasCdfWriter', 'true'
        |UNION ALL SELECT 'name', 'bench_region'
        |UNION ALL SELECT 'description', 'round3'
        |UNION ALL SELECT 'r_name_comment', 'region name'""".stripMargin)),

    // optimistic commit + conflict checker under real contention (rows 40,41):
    // 8 writers race disjoint appends; every one must land via the retry loop
    Entry("concurrent_appends", (s, d) => {
      val dir = tempDir("conc")
      val n = pq(s, d, "nation")
      DeltaTable.write(s, n.limit(0), dir)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val fs = (0 until 8).map { k =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit =
              DeltaTable.write(s, n.filter(s"n_nationkey % 8 = $k"), dir, mode = "append")
          })
        }
        fs.foreach(_.get())
      } finally pool.shutdown()
      val t = DeltaTable.forPath(s, dir)
      require(t.version == 8L, s"expected 9 commits, got ${t.version + 1}")
      t.toDF
    }, Some("SELECT * FROM nation")),

    // incremental snapshot refresh (row 48): cached snapshot + tail replay
    Entry("incremental_refresh", (s, d) => {
      val dir = tempDir("incr")
      val r = pq(s, d, "region")
      DeltaTable.write(s, r, dir)
      val t = DeltaTable.forPath(s, dir)
      t.snapshot // cache v0
      DeltaTable.write(s,
        r.withColumn("r_regionkey", col("r_regionkey") + 100), dir, mode = "append")
      t.refresh() // incremental: replays only commit 1 on the cached state
      // a silent fall-back to full replay returns the same rows — require
      // the update actually took the incremental path
      require(t.deltaLog.lastUpdateIncremental,
        "incremental_refresh: update(prev) fell back to a full replay")
      t.toDF
    }, Some(
      """SELECT * FROM region
        |UNION ALL SELECT r_regionkey + 100, r_name FROM region""".stripMargin)))

  // -------------------------------------------------------- events / time

  /** Per-event-type z-scores from exact integer-cents sums — one text for
    * the Spark view and the DuckDB oracle (only the table name varies). */
  private def anomalySql(table: String) =
    s"""WITH c AS (SELECT event_id, event_type,
       |             CAST(round(value * 100) AS BIGINT) AS cents
       |           FROM $table),
       |g AS (SELECT event_type, count(*) AS n,
       |             sum(CAST(cents AS DECIMAL(18, 0))) AS sm,
       |             sum(CAST(cents * cents AS DECIMAL(18, 0))) AS sq
       |      FROM c GROUP BY event_type),
       |st AS (SELECT event_type,
       |              CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       |              sqrt(CAST(n * sq - sm * sm AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS sd
       |       FROM g)
       |SELECT c.event_id, c.event_type,
       |       (CAST(c.cents AS DOUBLE) - st.mean) / st.sd AS z
       |FROM c JOIN st ON c.event_type = st.event_type
       |WHERE abs((CAST(c.cents AS DOUBLE) - st.mean) / st.sd) > 3.0""".stripMargin

  private val eventEntries = Seq(
    Entry("events_hourly", (s, d) => {
      eventsDeltaView(s, d)
      // TIMESTAMP_NTZ so the parquet output is tz-naive like DuckDB's
      s.sql(
        """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS hr, event_type, count(*) AS cnt,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
          |FROM events_delta GROUP BY 1, 2""".stripMargin)
    }, Some(
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type, count(*) AS cnt,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
        |FROM events GROUP BY 1, 2""".stripMargin)),

    Entry("events_sessions", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(
        """SELECT user_id, CAST(1 + sum(newsess) AS BIGINT) AS n_sessions FROM (
          |  SELECT user_id,
          |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS newsess
          |  FROM events_delta) g GROUP BY user_id""".stripMargin)
    }, Some(
      """SELECT user_id, CAST(1 + sum(newsess) AS BIGINT) AS n_sessions FROM (
        |  SELECT user_id,
        |         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
        |                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS newsess
        |  FROM events) g GROUP BY user_id""".stripMargin)),

    // full session assembly via the Sessionize operator (bounds + sizes,
    // not just counts): one shuffle on user_id, the (user, session) rollup
    // reuses the window's hash partitioning (prefix satisfies clustering)
    Entry("events_session_bounds", (s, d) => {
      eventsDeltaView(s, d)
      graft.streaming.Sessionize.sessions(
          s.table("events_delta"), "user_id", "ts", Seq("event_id"), gapMinutes = 30)
        .select(col("user_id"), col("session_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
    }, Some(
      """WITH g AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
        |                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS newsess
        |  FROM events),
        |se AS (
        |  SELECT user_id, t,
        |         sum(newsess) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g)
        |SELECT user_id, CAST(sess + 1 AS BIGINT) AS session_id,
        |       min(t) AS session_start, max(t) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM se GROUP BY user_id, sess""".stripMargin)),

    // semi-structured query over the JSON props column through Spark 4's
    // VARIANT type (parse_json + variant_get — the same decode path the
    // variant golden tables exercise), aggregated per event_type; DuckDB
    // replays via its JSON extraction
    Entry("events_json_props", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(
        """SELECT event_type,
          |       CAST(sum(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS k_sum,
          |       CAST(count(CASE WHEN variant_get(parse_json(props), '$.k', 'bigint') > 50 THEN 1 END) AS BIGINT) AS k_hi
          |FROM events_delta GROUP BY 1""".stripMargin)
    }, Some(
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS BIGINT) AS k_hi
        |FROM events GROUP BY 1""".stripMargin)),

    // funnel analysis (ordered-step conversion): first view → first click
    // at-or-after it → first purchase at-or-after that, per user; the
    // classic product-analytics shape (each stage is one aggregate + one
    // equi-join with a time bound — no window over the whole event stream)
    Entry("events_funnel", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(
        """WITH v AS (SELECT user_id, min(ts) AS v_ts
          |           FROM events_delta WHERE event_type = 'view' GROUP BY 1),
          |c AS (SELECT e.user_id, min(e.ts) AS c_ts
          |      FROM events_delta e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
          |      WHERE e.event_type = 'click' GROUP BY 1),
          |p AS (SELECT e.user_id, min(e.ts) AS p_ts
          |      FROM events_delta e JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
          |      WHERE e.event_type = 'purchase' GROUP BY 1),
          |u AS (SELECT DISTINCT user_id FROM events_delta)
          |SELECT u.user_id,
          |       CAST(v.v_ts AS TIMESTAMP_NTZ) AS view_ts,
          |       CAST(c.c_ts AS TIMESTAMP_NTZ) AS click_ts,
          |       CAST(p.p_ts AS TIMESTAMP_NTZ) AS purchase_ts,
          |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
          |                 WHEN c.user_id IS NOT NULL THEN 2
          |                 WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps
          |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
          |       LEFT JOIN p USING (user_id)""".stripMargin)
    }, Some(
      """WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS v_ts
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id AND CAST(e.ts AS TIMESTAMP) >= v.v_ts
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id AND CAST(e.ts AS TIMESTAMP) >= c.c_ts
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, v.v_ts AS view_ts, c.c_ts AS click_ts, p.p_ts AS purchase_ts,
        |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |                 WHEN c.user_id IS NOT NULL THEN 2
        |                 WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)""".stripMargin)),

    // cohort retention matrix: users bucketed by first-active week ×
    // week offset of each later active week (both engines' date_trunc
    // 'week' is Monday-start; offsets are exact day-diff div 7 since both
    // ends are week starts)
    Entry("events_cohort_retention", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(
        """WITH wk AS (SELECT DISTINCT user_id,
          |                   CAST(date_trunc('week', ts) AS DATE) AS w
          |            FROM events_delta),
          |coh AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY 1)
          |SELECT coh.cw AS cohort_week,
          |       CAST((datediff(wk.w, coh.cw) div 7) AS BIGINT) AS week_offset,
          |       CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
          |FROM wk JOIN coh ON wk.user_id = coh.user_id
          |GROUP BY 1, 2""".stripMargin)
    }, Some(
      """WITH wk AS (SELECT DISTINCT user_id,
        |                   CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS w
        |            FROM events),
        |coh AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY 1)
        |SELECT coh.cw AS cohort_week,
        |       CAST(date_diff('day', coh.cw, wk.w) // 7 AS BIGINT) AS week_offset,
        |       CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        |FROM wk JOIN coh ON wk.user_id = coh.user_id
        |GROUP BY 1, 2""".stripMargin)),

    // DAU/WAU engagement: daily actives joined to their week's actives,
    // stickiness = one IEEE division of exact distinct counts (DATE-typed
    // day/week per the date_trunc parity lesson)
    Entry("events_dau_wau", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(
        """WITH dau AS (
          |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          |  FROM events_delta GROUP BY 1),
          |wau AS (
          |  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
          |  FROM events_delta GROUP BY 1)
          |SELECT dau.day, dau.dau, wau.wau,
          |       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
          |FROM dau JOIN wau
          |  ON CAST(date_trunc('week', CAST(dau.day AS TIMESTAMP)) AS DATE) = wau.week""".stripMargin)
    }, Some(
      """WITH dau AS (
        |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM events GROUP BY 1),
        |wau AS (
        |  SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM events GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau
        |  ON CAST(date_trunc('week', CAST(dau.day AS TIMESTAMP)) AS DATE) = wau.week""".stripMargin)),

    // z-score anomaly detection per event type: mean/σ from EXPLICIT exact
    // integer-cents sums (the tpcds_stddev_exact recipe — native stddev
    // aggregates round differently across engines), every z one chain of
    // identical IEEE ops ⇒ the flagged set and the z doubles replay exactly.
    // ONE SQL builder serves both engines (the texts differed only in the
    // table name; two pasted copies could drift on a future threshold edit)
    Entry("events_anomaly", (s, d) => {
      eventsDeltaView(s, d)
      s.sql(anomalySql("events_delta"))
    }, Some(anomalySql("events"))),

    // Structured Streaming watermark + event-time windowed aggregation over
    // the graft-delta source (§2.10): append mode emits each hourly window
    // exactly once when the watermark closes it; far-future sentinel commits
    // advance the watermark past every real window, making the final memory
    // sink equal the batch aggregation regardless of batch splits
    Entry("streaming_windowed_agg", (s, d) => {
      val dir = eventsCopy(s, d, "stwin")
      val view = s"graft_win_stream_${EntryCtx.uniqueSuffix()}"
      val q = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("double") / 100)
            .as("total"))
        .select(col("window.start").cast("timestamp_ntz").as("hr"),
          col("event_type"), col("cnt"), col("total"))
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try {
        q.processAllAvailable()
        advanceWatermark(s, q, dir)
      } finally q.stop()
      EntryCtx.memoryTable(s, view).filter(col("hr") < lit("2030-01-01"))
    }, Some(
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
        |FROM events GROUP BY 1, 2""".stripMargin)),

    // stream-static join (§2.10): streaming events joined to the static
    // customer dimension — the static side is a bounded Delta scan, so
    // Spark broadcasts it into every microbatch (no stream-side shuffle;
    // at scale the dimension is re-read per batch but never re-shuffled) —
    // then event-time windowed aggregation closed out by the sentinels.
    // Sentinel rows (user_id = -1) advance the watermark at the watermark
    // node and are dropped by the inner join afterwards, so they never
    // surface a window.
    Entry("streaming_join_agg", (s, d) => {
      val dir = eventsCopy(s, d, "stjoin")
      val cust = DeltaTable.forPath(s, EntryCtx.sharedDelta(s, d, "customer"))
        .toDF.select(col("c_custkey"), col("c_mktsegment"))
      val view = s"graft_join_stream_${EntryCtx.uniqueSuffix()}"
      val q = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 day"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        // DATE on both sides: DuckDB's date_trunc('day') yields a DATE
        .select(col("window.start").cast("date").as("day"),
          col("c_mktsegment"), col("cnt"))
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try {
        q.processAllAvailable()
        advanceWatermark(s, q, dir)
      } finally q.stop()
      EntryCtx.memoryTable(s, view).filter(col("day") < lit("2030-01-01"))
    }, Some(
      """SELECT CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS DATE) AS day,
        |       c.c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin)),

    // Structured Streaming gap sessionization (§2.10 custom state):
    // flatMapGroupsWithState + event-time timeout through the graft-delta
    // source; sentinel commits advance the watermark so every real session
    // closes via the timeout path — the streamed result then equals batch
    // sessionization exactly
    Entry("streaming_sessions", (s, d) => {
      val dir = eventsCopy(s, d, "stsess")
      val view = s"graft_sess_stream_${EntryCtx.uniqueSuffix()}"
      val q = graft.streaming.Sessionize.sessionsStream(
          eventsStream(s, dir), "user_id", "ts", gapMinutes = 30)
        .toDF()
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try {
        q.processAllAvailable()
        advanceWatermark(s, q, dir)
      } finally q.stop()
      EntryCtx.memoryTable(s, view).filter("user_id >= 0")
    }, Some(
      """WITH g AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
        |                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS newsess
        |  FROM events),
        |se AS (
        |  SELECT user_id, t,
        |         sum(newsess) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g)
        |SELECT user_id, min(t) AS session_start, max(t) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM se GROUP BY user_id, sess""".stripMargin)),

    // Spark 4 transformWithState (arbitrary typed state, RocksDB-backed):
    // per-user running count emitting a row at every 5th event. Milestone
    // emission is batch-split-invariant (each crossing fires exactly once
    // whichever microbatch it lands in), so the oracle is the milestones
    // of the final per-user totals.
    Entry("streaming_transform_state", (s, d) => {
      // appends nothing (TimeMode.None, no sentinels) → the shared
      // read-only events table serves every invocation
      val dir = eventsDeltaView(s, d)
      val view = s"graft_tws_${EntryCtx.uniqueSuffix()}"
      // the RocksDB provider requirement is scoped to a CHILD session
      // (same context, separate conf): a set/restore window on the shared
      // session would silently run any CONCURRENT streaming entry on
      // RocksDB too. Memory-sink views register on the child's catalog,
      // so the result is read there as well.
      val s2 = s.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import s2.implicits._
      // ONE FILE PER BATCH (not the single-batch eventsStream): typed
      // state must survive ACROSS microbatches for the milestone counts
      // to come out right — a single batch cannot catch state-store
      // loss/double-count between batches. TimeMode.None needs no
      // watermark, so the single-batch constraint documented on
      // eventsStream does not apply here.
      val q = s2.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "1").load(dir)
        .select(col("user_id").cast("long")).as[Long]
        .groupByKey(identity)
        .transformWithState(new graft.streaming.MilestoneProcessor(5L),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "milestone")
        .writeStream.format("memory").outputMode("append")
        .queryName(view).start()
      try {
        q.processAllAvailable()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "streaming_transform_state: the 4-file snapshot must arrive in " +
            "multiple batches to exercise cross-batch state")
      } finally q.stop()
      EntryCtx.memoryTable(s2, view)
    }, Some(
      """SELECT user_id, CAST(unnest(range(5, cnt + 1, 5)) AS BIGINT) AS milestone
        |FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id) t""".stripMargin)),

    // streaming exact dedup: dropDuplicatesWithinWatermark over the
    // graft-delta source — the table carries every event twice (a replayed
    // ingest commit), the stream emits each exactly once. The 90-day delay
    // covers the whole 30-day event span, so no duplicate can outlive its
    // state and the result equals batch DISTINCT.
    Entry("streaming_dedup", (s, d) => {
      val dir = tempDir("stdedup")
      val ev = tsToTimestamp(pq(s, d, "events"))
        .select("event_id", "ts", "user_id", "event_type")
      DeltaTable.write(s, ev.repartition(4), dir)
      DeltaTable.write(s, ev.repartition(2), dir, mode = "append") // replay
      val view = s"graft_dedup_stream_${EntryCtx.uniqueSuffix()}"
      val q = eventsStream(s, dir)
        .withWatermark("ts", "90 days")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try q.processAllAvailable() finally q.stop()
      EntryCtx.memoryTable(s, view).select("event_id", "user_id", "event_type")
    }, Some("SELECT event_id, user_id, event_type FROM events")),

    // stream-stream inner join (§2.10): click events joined to purchase
    // events of the same user within one hour — BOTH sides are unbounded
    // streams over the graft-delta source, so Spark keeps watermark-bounded
    // join state for each; the time-range condition is what lets that state
    // age out (without it, stream-stream state grows forever). Inner joins
    // emit eagerly per microbatch, so no sentinel commits are needed —
    // watermarks here only bound state. Filters sit AFTER withWatermark so
    // the event-time column is anchored on the raw source.
    Entry("streaming_stream_join", (s, d) => {
      val dir = eventsCopy(s, d, "ststj")
      val view = s"graft_stjoin2_${EntryCtx.uniqueSuffix()}"
      val clicks = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val purchases = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val q = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try q.processAllAvailable() finally q.stop()
      EntryCtx.memoryTable(s, view)
    }, Some(
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |       CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS lag_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR""".stripMargin)),

    // stream-stream LEFT OUTER join: unmatched clicks must be emitted with
    // a NULL purchase — but only once the watermark proves no future
    // purchase can still match, so the sentinel commits that advance the
    // watermark are what flush them (a pure inner join needs no flush; this
    // entry pins the harder outer-emission semantics)
    Entry("streaming_stream_outer", (s, d) => {
      val dir = eventsCopy(s, d, "ststo")
      val view = s"graft_stouter_${EntryCtx.uniqueSuffix()}"
      // the per-side event_type filters MUST let the sentinel rows through:
      // Catalyst pushes deterministic filters BELOW the EventTimeWatermark
      // node, so a side whose filter drops the sentinels never advances its
      // watermark — and the global watermark (min across both sides) then
      // freezes at that side's last real event, permanently holding back
      // the null-emission of every click whose join window closes later.
      // (Diagnosed live: the watermark stuck at the last PURCHASE ts.)
      // Sentinel rows (user_id = -1) are dropped after the join instead.
      val clicks = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .filter(col("event_type") === "click" || col("user_id") < 0)
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val purchases = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .filter(col("event_type") === "purchase" || col("user_id") < 0)
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val q = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
          "left_outer")
        .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try {
        q.processAllAvailable()
        advanceWatermark(s, q, dir)
      } finally q.stop()
      EntryCtx.memoryTable(s, view).filter("user_id >= 0")
    }, Some(
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR""".stripMargin)),

    // streaming upsert (CDC apply): readStream over a change table,
    // foreachBatch reduces each microbatch to latest-per-key (max_by on a
    // monotonic seq) and MERGEs it into the target — the canonical
    // "apply a change stream to a Delta table" pattern. startingVersion=0
    // is load-bearing: it tails the log in COMMIT order, so a key's later
    // change is always applied at-or-after its earlier one no matter how
    // admission slices batches (within a batch max_by picks the newest,
    // across batches the later merge overwrites). The initial-snapshot path
    // serves files in PATH order — fine for the stateless entries above,
    // wrong for order-sensitive application like this.
    Entry("streaming_upsert", (s, d) => {
      val ord = pq(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val src = tempDir("stups_src")
      DeltaTable.write(s, ord.withColumn("seq", lit(0L)), src)
      // insert keys offset past the ACTUAL key domain (max+1, the
      // merge_upsert sf1 lesson — a fixed literal collides once a larger
      // SF's keys cross it); the oracle replays it as a scalar subquery
      val okOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
      val changes = ord.filter("o_orderkey % 2 = 0")
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .unionByName(ord.filter("o_orderkey % 100 = 0")
          .withColumn("o_orderkey", col("o_orderkey") + okOff))
        .withColumn("seq", lit(1L))
      DeltaTable.write(s, changes, src, mode = "append")
      val tgt = tempDir("stups_tgt")
      DeltaTable.write(s, ord.withColumn("seq", lit(0L)), tgt)
      val q = s.readStream.format("graft-delta")
        .option("startingVersion", "0").load(src)
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          val cols = batch.columns.toSeq
          val latest = batch.groupBy("o_orderkey")
            .agg(max_by(struct(cols.map(col): _*), col("seq")).as("__r"))
            .select(cols.map(c => col("__r")(c).as(c)): _*)
          DeltaTable.forPath(s, tgt)
            .merge(latest, "target.o_orderkey = source.o_orderkey")
            .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      DeltaTable.forPath(s, tgt).toDF
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }, Some(
      """WITH changes AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders), o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
        |       COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM orders b FULL JOIN changes c ON b.o_orderkey = c.o_orderkey""".stripMargin)))

  /** As-of join (an extension op the reference lacks, SURVEY §2.3): each
    * event matched to the latest order of its user at-or-before the
    * event's as-of cutoff, composed from a range join + per-event top-1
    * window. The cutoff is a deterministic per-event date INSIDE the order
    * range (1995-06 .. 2001-12): the raw `e.ts` values (2024) all
    * postdate every order (1995-2001), which made the temporal bound
    * vacuously true — the as-of cut must actually discard late orders, and
    * events whose cutoff precedes a user's first order must drop out. */
  private val asofEntry = Entry("asof_join", (s, d) => {
    eventsDeltaView(s, d)
    deltaView(s, d, "orders")
    s.sql(
      """SELECT event_id, o_orderkey FROM (
        |  SELECT e.event_id, o.o_orderkey,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events_delta e JOIN orders o
        |    ON o.o_custkey = e.user_id
        |   AND o.o_orderdate <= date_add(DATE '1995-06-01', CAST(e.event_id % 2400 AS INT))) t
        |WHERE rn = 1""".stripMargin)
  }, Some(
    """SELECT event_id, o_orderkey FROM (
      |  SELECT e.event_id, o.o_orderkey,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id
      |   AND o.o_orderdate <= (DATE '1995-06-01' + CAST(e.event_id % 2400 AS INTEGER))) t
      |WHERE rn = 1""".stripMargin))

  /** Normalize `events.ts` to a session-tz (UTC) TIMESTAMP across testdata
    * generations: earlier drops carried int64 epoch NANOS (read as LONG via
    * nanosAsLong), current drops carry parquet TIMESTAMP(MICROS, tz-naive)
    * which Spark reads as TIMESTAMP_NTZ. DuckDB reads both as a naive
    * TIMESTAMP, so the UTC-session cast keeps oracle parity in either case. */
  private def tsToTimestamp(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    ev.schema("ts").dataType match {
      case LongType => ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => ev.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => ev
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  /** Private Delta copy of `events` (micros ts) for streaming entries that
    * append sentinel commits to it. */
  private def eventsCopy(s: SparkSession, d: String, tag: String): String = {
    val dir = tempDir(tag)
    val ev = tsToTimestamp(pq(s, d, "events"))
    DeltaTable.write(s, ev.repartition(4), dir)
    dir
  }

  /** readStream over an events copy. The explicit file cap keeps the whole
    * initial snapshot in ONE batch: with a 0s watermark, a snapshot served
    * in slices would treat slice-2 rows older than slice-1's max event time
    * as late and DROP them (file order is not time order). */
  private def eventsStream(s: SparkSession, dir: String) =
    s.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", "1000000").load(dir)

  /** Advance the stream's event-time watermark past every real event: two
    * far-future sentinel commits, each followed by processAllAvailable —
    * the first carries the watermark forward, the second guarantees a
    * subsequent batch runs WITH it in effect (state eviction/timeouts use
    * the PREVIOUS batch's watermark). */
  private def advanceWatermark(s: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery, dir: String): Unit =
    Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
      import s.implicits._
      val sent = Seq((-1L, java.sql.Timestamp.valueOf(t), -1L,
        "__sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      DeltaTable.write(s, sent, dir, mode = "append")
      q.processAllAvailable()
    }

  /** Delta copy of `events` with `ts` normalized to a session-tz TIMESTAMP
    * (see [[tsToTimestamp]]), registered as the `events_delta` temp view.
    * Returns the shared table dir (read-only — entries that APPEND, e.g.
    * sentinel commits, must use [[eventsCopy]] instead). */
  private def eventsDeltaView(s: SparkSession, d: String): String = {
    val dir = EntryCtx.shared2.getOrElseUpdate(s"$d#events_delta", {
      val dd = tempDir("events")
      val ev = tsToTimestamp(pq(s, d, "events"))
      DeltaTable.write(s, ev.repartition(4), dd)
      dd
    })
    DeltaTable.forPath(s, dir).toDF.createOrReplaceTempView("events_delta")
    dir
  }

  // corpus-level column profiling (ops/Profile.scala): one wide
  // aggregation unpivoted to a row per column; exact distinct counts so
  // the numbers are decision-grade and engine-independent. Columns chosen
  // integral/string — float min/max render engine-dependently by design.
  private val profileEntry = Entry("corpus_profile", (s, d) =>
    graft.ops.Profile.profile(
      pq(s, d, "orders"), Seq("o_orderkey", "o_custkey", "o_orderstatus")),
    Some {
      def row(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin
      Seq("o_orderkey", "o_custkey", "o_orderstatus")
        .map(row).mkString("\nUNION ALL\n")
    })

  // ------------------------------------------------------- round-13 entries

  private val round13Entries = Seq(
    // in-commit-timestamp read parity (§2.1 row 2 extension): timestamp
    // resolution and history() ride CommitInfo.inCommitTimestamp, never
    // file mtimes, on a table carrying the writer feature + property
    // (kernel/snapshot.rs ICT ordering; delta-spark InCommitTimestampUtils).
    // This engine writes no ICT itself, so the table is synthesized: commits
    // written normally, then the recorded values + protocol feature injected
    // and the log mtimes deliberately skewed AGAINST commit order.
    Entry("ict_time_travel", (s, d) => {
      val ict = Seq(1700000000000L, 1700000001000L, 1700000002000L)
      val dir = once(s"$d#ictTable") {
        val dirNew = tempDir("ict")
        val n = pq(s, d, "nation")
        (0 to 2).foreach { k =>
          DeltaTable.write(s, n.filter(s"n_nationkey % 3 = $k"), dirNew, mode = "append")
        }
        val logDir = java.nio.file.Paths.get(dirNew, "_delta_log")
        (0 to 2).foreach { v =>
          val f = logDir.resolve(LogStore.commitFileName(v))
          var text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
          require(text.contains("{\"commitInfo\":{"),
            s"ict_time_travel: unexpected commit shape in $f")
          text = text.replace("{\"commitInfo\":{",
            "{\"commitInfo\":{\"inCommitTimestamp\":" + ict(v) + ",")
          if (v == 0) {
            // the create commit's configuration is empty ({}) — a bare
            // comma-insert would leave a trailing comma
            text =
              if (text.contains("\"configuration\":{}"))
                text.replace("\"configuration\":{}",
                  "\"configuration\":{\"delta.enableInCommitTimestamps\":\"true\"}")
              else text.replace("\"configuration\":{",
                "\"configuration\":{\"delta.enableInCommitTimestamps\":\"true\",")
            text = text.replaceAll(
              "\\{\"protocol\":\\{[^}]*\\}\\}",
              "{\"protocol\":{\"minReaderVersion\":1,\"minWriterVersion\":7," +
                "\"writerFeatures\":[\"appendOnly\",\"invariants\",\"inCommitTimestamp\"]}}")
          }
          java.nio.file.Files.write(f, text.getBytes("UTF-8"))
        }
        // mtimes contradict commit order (v0 newest, v1 oldest): an
        // mtime-based resolver CANNOT return version 1 for the target below
        val now = System.currentTimeMillis()
        Seq(now, now - 7200000L, now - 3600000L).zipWithIndex.foreach {
          case (m, v) =>
            java.nio.file.Files.setLastModifiedTime(
              logDir.resolve(LogStore.commitFileName(v)),
              java.nio.file.attribute.FileTime.fromMillis(m))
        }
        dirNew
      }
      val t = DeltaTable.forPath(s, dir)
      val snap = t.deltaLog.snapshotForTimestamp(ict(1) + 500L)
      // history must report the RECORDED values newest-first — pins that
      // the history surface rides ICT too, not just resolution
      require(t.history().map(_._2) == ict.reverse,
        s"ict_time_travel: history must report recorded ICT values, got ${t.history().map(_._2)}")
      // resolved version/ICT join the OUTPUT so the oracle hash fails on a
      // wrong pin even when the row content happens to coincide
      graft.table.Scan.read(s, snap)
        .withColumn("resolved_version", lit(snap.version))
        .withColumn("resolved_ict_ms", lit(ict(snap.version.toInt)))
    }, Some(
      """SELECT *, CAST(1 AS BIGINT) AS resolved_version,
        |       CAST(1700000001000 AS BIGINT) AS resolved_ict_ms
        |FROM nation WHERE n_nationkey % 3 <= 1""".stripMargin)),

    // none -> name column-mapping upgrade as a real migration (§2.9 row 47
    // extension; reference refuses at operations/set_tbl_properties.rs:89 —
    // this engine matches delta-spark's upgrade instead): physical names
    // preserve logical names so pre-upgrade parquet stays addressable, and
    // DML across the upgrade routes through the mapped schema
    Entry("column_mapping_upgrade", (s, d) => {
      val dir = tempDir("cmup")
      DeltaTable.write(s, pq(s, d, "customer"), dir) // mapping mode none
      val t = DeltaTable.forPath(s, dir)
      t.setProperties(Map("delta.columnMapping.mode" -> "name"))
      val snap = t.refresh()
      require(ColumnMapping.mode(snap.metadata) == "name",
        "column_mapping_upgrade: upgrade must store mode=name")
      snap.schema.fields.foreach { f =>
        require(f.metadata.getString(ColumnMapping.PHYS_KEY) == f.name,
          s"column_mapping_upgrade: physical name must preserve logical " +
            s"name for ${f.name} (pre-upgrade parquet stays addressable)")
      }
      t.update(Map("c_acctbal" -> expr("c_acctbal + 100")),
        Some("c_mktsegment = 'BUILDING'"))
      t.delete(Some("c_nationkey >= 20"))
      t.toDF
    }, Some(
      """SELECT c_custkey, c_name, c_nationkey,
        |       CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
        |       c_mktsegment
        |FROM customer WHERE NOT (c_nationkey >= 20)""".stripMargin)),

    // non-ICT timestamp monotonicity (§2.1 row 2, r12-verdict probe #5): a
    // plain table whose log mtimes a copy shuffled AGAINST commit order.
    // The reference trusts raw mtimes (table/mod.rs:375) — "latest version
    // <= target" over a non-monotonic sequence is ill-defined and a
    // raw-mtime resolver pins v2 for the target below; this engine rides
    // delta-spark's forward clamp (ts_i = max(ts_i, prev+1),
    // DeltaHistoryManager.getCommits) and pins v1, while history() keeps
    // reporting the RECORDED mtimes — delta-spark parity on both surfaces
    // (history shows what happened, resolution monotonizes;
    // Round13Spec:221 pins the full boundary grid, this entry promotes the
    // resolution behavior into the driver gate).
    Entry("mtime_clamp_time_travel", (s, d) => {
      // absolute past mtimes (not now-relative): the clamped sequence — and
      // with it the oracle's resolved_ts_ms literal — stays deterministic
      // across the once() cache and driver re-runs
      val m0 = 1690000000000L
      val dir = once(s"$d#clampTable") {
        val dirNew = tempDir("clamp")
        val n = pq(s, d, "nation")
        (0 to 2).foreach { k =>
          DeltaTable.write(s, n.filter(s"n_nationkey % 3 = $k"), dirNew, mode = "append")
        }
        val logDir = java.nio.file.Paths.get(dirNew, "_delta_log")
        // v0 newest, v1 oldest, v2 between: clamped = (v0,m0), (v1,m0+1),
        // (v2,m0+2); raw mtimes see all three <= m0+1 and would pin v2
        Seq(m0, m0 - 7200000L, m0 - 3600000L).zipWithIndex.foreach {
          case (m, v) =>
            java.nio.file.Files.setLastModifiedTime(
              logDir.resolve(LogStore.commitFileName(v)),
              java.nio.file.attribute.FileTime.fromMillis(m))
        }
        dirNew
      }
      val t = DeltaTable.forPath(s, dir)
      require(t.history().map(_._2) == Seq(m0 - 3600000L, m0 - 7200000L, m0),
        s"mtime_clamp_time_travel: history must report the RECORDED mtimes " +
          s"newest-first (it does not monotonize), got ${t.history().map(_._2)}")
      val snap = t.deltaLog.snapshotForTimestamp(m0 + 1)
      graft.table.Scan.read(s, snap)
        .withColumn("resolved_version", lit(snap.version))
        .withColumn("resolved_ts_ms", lit(m0 + snap.version))
    }, Some(
      """SELECT *, CAST(1 AS BIGINT) AS resolved_version,
        |       CAST(1690000000001 AS BIGINT) AS resolved_ts_ms
        |FROM nation WHERE n_nationkey % 3 <= 1""".stripMargin)))

  private val round15Entries = Seq(
    // run-level idempotent replay for DELETE/UPDATE (§2.7 row 44 extension;
    // reference CommitProperties app_transactions apply to EVERY operation
    // — kernel/transaction/mod.rs:1-117): one appId advances through an
    // UPDATE, a DELETE, and a second UPDATE like a resumed change-stream
    // position; each replayed delivery no-ops with marked zeroed metrics.
    // The '_u'/'_v' concats make a double-application oracle-visible.
    Entry("dml_idempotent_replay", (s, d) => {
      val dir = tempDir("dmlir")
      DeltaTable.write(s, pq(s, d, "region"), dir)
      val t = DeltaTable.forPath(s, dir)
      def upd(ver: Long, suffix: String): Map[String, String] =
        t.update(Map("r_name" -> concat(col("r_name"), lit(suffix))),
          appTxn = Some(("r15dml", ver)))
      val u1 = upd(1L, "_u")
      require(u1.get("replay_skipped").isEmpty && u1("num_updated_rows").toLong > 0,
        s"dml_idempotent_replay: first UPDATE must apply, got $u1")
      val uReplay = upd(1L, "_u")
      require(uReplay.get("replay_skipped").contains("true") &&
        uReplay("num_updated_rows") == "0",
        s"dml_idempotent_replay: UPDATE replay of (r15dml, 1) must skip, got $uReplay")
      val d2 = t.delete(Some("r_regionkey >= 3"), appTxn = Some(("r15dml", 2L)))
      require(d2.get("replay_skipped").isEmpty && d2("num_deleted_rows").toLong > 0,
        s"dml_idempotent_replay: DELETE at version 2 must apply, got $d2")
      val dReplay = t.delete(Some("r_regionkey >= 3"), appTxn = Some(("r15dml", 2L)))
      require(dReplay.get("replay_skipped").contains("true") &&
        dReplay("num_deleted_rows") == "0",
        s"dml_idempotent_replay: DELETE replay of (r15dml, 2) must skip, got $dReplay")
      // at-or-BELOW the recorded position skips too (positional, not exact)
      val uLow = upd(1L, "_never")
      require(uLow.get("replay_skipped").contains("true"),
        s"dml_idempotent_replay: version 1 after 2 must skip, got $uLow")
      val u3 = upd(3L, "_v")
      require(u3.get("replay_skipped").isEmpty && u3("num_updated_rows").toLong > 0,
        s"dml_idempotent_replay: UPDATE at version 3 must apply, got $u3")
      require(t.txnVersion("r15dml").contains(3L),
        "dml_idempotent_replay: table must record the latest applied version")
      t.toDF
    }, Some(
      """SELECT r_regionkey, concat(r_name, '_u_v') AS r_name
        |FROM region WHERE r_regionkey < 3""".stripMargin)),

    // LogCleanup mtime-0 fail-safe (r14 fix, kernel LogCleanup.run): the
    // object-store list parsers degrade an unparseable/absent LastModified
    // to mtime 0, and 0 < cutoff reads "expired" — without the unknown-age
    // guard, ONE cleanup against such a listing deletes the ENTIRE
    // pre-checkpoint retention window. Replays a cleanup on a
    // degraded-mtime log and requires every commit to survive, then proves
    // the same cleanup still reaps once real aged mtimes are visible (the
    // guard defers deletion, it must not disable cleanup forever).
    Entry("log_cleanup_mtime0", (s, d) => {
      val dir = tempDir("lcm0")
      val ord = pq(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 0"), dir,
        configuration = Map(
          "delta.logRetentionDuration" -> "interval 1 millisecond",
          "delta.checkpointInterval" -> "1000"))
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 1"), dir, mode = "append")
      DeltaTable.write(s, ord.filter("o_orderkey % 3 = 2"), dir, mode = "append")
      val t = DeltaTable.forPath(s, dir)
      t.createCheckpoint()
      val fs = t.tablePath.getFileSystem(s.sessionState.newHadoopConf())
      val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
      def logNames() = fs.listStatus(logDir).map(_.getPath.getName).toSet
      val preCommits = logNames().filter(n => n.matches("\\d{20}\\.json") &&
        n.stripSuffix(".json").toLong < t.version)
      require(preCommits.nonEmpty,
        "log_cleanup_mtime0: no pre-checkpoint commits to protect")
      // degraded store: every log file's mtime reads 0
      fs.listStatus(logDir).foreach(f => fs.setTimes(f.getPath, 0L, 0L))
      t.cleanupMetadata()
      val lost = preCommits -- logNames()
      require(lost.isEmpty, "log_cleanup_mtime0: degraded-mtime cleanup " +
        s"deleted the retention window: ${lost.mkString(",")}")
      // real aged mtimes: the same cleanup now reaps everything expired
      fs.listStatus(logDir).foreach(f => fs.setTimes(f.getPath, 1000L, 1000L))
      t.cleanupMetadata()
      val leftover = preCommits.intersect(logNames())
      require(leftover.isEmpty, "log_cleanup_mtime0: aged pre-checkpoint " +
        s"commits survived the unblocked cleanup: ${leftover.mkString(",")}")
      DeltaTable.forPath(s, dir).toDF
    }, Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders")))

  private val round16Entries = Seq(
    // run-level idempotent replay for the WRITE path (§2.7 extension;
    // reference CommitProperties app_transactions apply to EVERY operation
    // — kernel/transaction/mod.rs:1-117; delta-spark txnAppId/txnVersion):
    // one appId advances through CREATE, append, and the format("...")
    // writer surface like a resumed batch-ingest position; each replayed
    // delivery no-ops. The replays carry DIFFERENT data than the originals
    // so a double-application is row-visible, and the create replay runs
    // under mode=error — it must skip as already-applied, not fail on the
    // table its own first run created.
    Entry("write_idempotent_replay", (s, d) => {
      val dir = tempDir("wir")
      val region = pq(s, d, "region")
      def cnt(): Long = DeltaTable.forPath(s, dir).toDF.count()
      // v1: CREATE (mode=error) writes keys < 3
      DeltaTable.write(s, region.filter("r_regionkey < 3"), dir,
        mode = "error", appTxn = Some(("r16w", 1L)))
      val n1 = cnt()
      require(n1 == region.filter("r_regionkey < 3").count(),
        s"write_idempotent_replay: create must write the <3 rows, got $n1")
      // replayed create: same marker, different data, mode=error — skips
      DeltaTable.write(s, region.filter("r_regionkey >= 3"), dir,
        mode = "error", appTxn = Some(("r16w", 1L)))
      require(cnt() == n1,
        "write_idempotent_replay: replayed create must no-op")
      // v2: append key 3; replay of v2 and an at-or-below v1 both skip
      DeltaTable.write(s, region.filter("r_regionkey = 3"), dir,
        mode = "append", appTxn = Some(("r16w", 2L)))
      val n2 = cnt()
      require(n2 == n1 + 1,
        s"write_idempotent_replay: append v2 must add one row, got $n2")
      DeltaTable.write(s, region.filter("r_regionkey = 3"), dir,
        mode = "append", appTxn = Some(("r16w", 2L)))
      DeltaTable.write(s, region.filter("r_regionkey = 3"), dir,
        mode = "append", appTxn = Some(("r16w", 1L)))
      require(cnt() == n2,
        "write_idempotent_replay: replayed/below-position appends must no-op")
      // v3 through the DataFrame writer surface (txnAppId/txnVersion
      // options), then its replay
      def viaWriter(): Unit = region.filter("r_regionkey = 4").write
        .format("graft-delta").mode("append")
        .option("txnAppId", "r16w").option("txnVersion", "3").save(dir)
      viaWriter()
      require(cnt() == n2 + 1,
        "write_idempotent_replay: writer-surface append v3 must apply")
      viaWriter()
      require(cnt() == n2 + 1,
        "write_idempotent_replay: writer-surface replay must no-op")
      val t = DeltaTable.forPath(s, dir)
      require(t.txnVersion("r16w").contains(3L),
        "write_idempotent_replay: table must record the latest applied version")
      t.toDF
    }, Some("SELECT * FROM region")))

  val entries: Seq[Entry] =
    scanEntries ++ sqlEntries ++ writeEntries ++ dmlEntries ++
      maintenanceEntries ++ round3Entries ++ eventEntries ++ round13Entries ++
      round15Entries ++ round16Entries :+ asofEntry :+ profileEntry
}
