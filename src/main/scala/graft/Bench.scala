package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entries.EntryCtx
import graft.llm.{Dedup, Similarity, TextOps}
import graft.table.DeltaTable

/**
 * Benchmark main: headline operator timings on SPARK_GRAFT_SF_DIR
 * (default sf0.1), shapes mirroring the reference harnesses
 * (BASELINE.md: TPC-H-ish query suite, merge upsert grid per
 * crates/benchmarks/src/merge.rs:122-279, optimize 50→few files per
 * python/tests/test_benchmark.py:103-157).
 *
 * Measurement discipline: every query runs `REPS` times (default 3) after a
 * warm-up execution, and the reported number is the MEDIAN of the timed
 * runs (min also emitted). Mutating operators (merge/delete/optimize) get a
 * byte-identical fresh table per repetition: the target is built once as a
 * template and cloned per run with a filesystem copy (Delta add paths are
 * table-relative, so a directory copy is a valid table). Query order is
 * fixed; table builds and clones are untimed setup. Prints ONE JSON line.
 */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Whole-process CPU time in ns (-1 where the platform bean is absent). */
  private def processCpuNs: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  // racy by design: a write per probe thread keeps the spin loops live past
  // the JIT; the value itself is never read for anything
  @volatile private var probeSink: Long = 0L

  /** Host-contention probe, run BEFORE and AFTER the suite so the bench
    * record is self-adjudicating (two of the last three driver records were
    * contention artifacts that each cost a builder+judge adjudication
    * cycle): `n` busy threads spin for `wallMs`, effective cores =
    * process-CPU gained / wall elapsed. An idle host reads ≈ the hardware
    * thread count; a contended host reads the share THIS JVM would actually
    * have gotten. Validity rule in BASELINE.md (probe <12 ⇒ absolutes
    * unusable — adjudicate by per-rep mins / interleaved A/B only). The
    * reference times only the op (crates/benchmarks/benches/merge.rs:16-44);
    * this separates measurement from environment the same way. */
  private def probeEffCores(n: Int, wallMs: Long): Double = {
    val cpu0 = processCpuNs
    if (cpu0 < 0) return -1.0
    val t0 = System.nanoTime()
    val deadline = t0 + wallMs * 1000000L
    val threads = (1 to n).map { i =>
      val t = new Thread(() => {
        var x = i.toLong
        while (System.nanoTime() < deadline) {
          x = x * 6364136223846793005L + 1442695040888963407L
        }
        probeSink ^= x
      }, s"graft-probe-$i")
      t.setDaemon(true); t.start(); t
    }
    threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    math.max(0.0, (processCpuNs - cpu0) / 1e9 / wall)
  }

  /** Process background-CPU rate over a short NO-SPIN window (cores'
    * worth of CPU the JVM burns while this thread only sleeps). The
    * post-suite probe runs while the SparkSession and its daemon threads
    * are still alive — their idle/GC CPU lands in the probe's process-CPU
    * delta and reads `probe_eff_cores_post` high relative to the
    * pre-Spark pre-probe. Sampling the background rate just before the
    * spin window and subtracting it makes the two sides comparable.
    * (Heuristic: during the spin the background threads get LESS CPU than
    * in the idle sample, so the subtraction can over-correct slightly —
    * still closer than not correcting, and the direction is conservative:
    * a clean window cannot be read as contended by it, since the rule's
    * thresholds sit far below 32 minus any plausible idle-Spark rate.) */
  private def backgroundCpuRate(wallMs: Long): Double = {
    val cpu0 = processCpuNs
    if (cpu0 < 0) return 0.0
    val t0 = System.nanoTime()
    Thread.sleep(wallMs)
    val wall = (System.nanoTime() - t0) / 1e9
    math.max(0.0, (processCpuNs - cpu0) / 1e9 / wall)
  }

  /** Recursive directory copy (template table → fresh per-rep table). */
  private def cloneDir(src: String, dst: String): Unit = {
    val from = Paths.get(src)
    val to = Paths.get(dst)
    Files.createDirectories(to.getParent)
    // walk() holds a directory stream until closed — leaked per clone
    // (3 mutating benches × reps + 16 grid cells) it can exhaust fds
    val walk = Files.walk(from)
    try walk.forEach { p: Path =>
      val t = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // reps=0 would run warm-ups then die on empty.min deep in record()
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS=$reps: need at least 1 timed rep")
    // pre-suite probe runs before the SparkSession exists — nothing but the
    // probe's own spin threads compete for the CPU it measures
    val probeMs = sys.env.getOrElse("SPARK_GRAFT_PROBE_MS", "1000").toLong
    var probePre = probeEffCores(cpus.toInt, probeMs)
    // Contended window: don't just self-flag the record — try once to not
    // produce it (three of the last four driver records were contention
    // artifacts the probe detected after the fact). A pre-probe below the
    // validity rule's hard floor (<12 effective cores) sleeps out the
    // contention for SPARK_GRAFT_PROBE_RETRY_MS (default 60s, 0 disables)
    // and re-probes ONCE; the record then carries "probe_retried":true, and
    // "contended":true if the window never cleared. Bounded: one retry, so
    // the bench can never wedge the driver's round on a busy host.
    val retryMs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RETRY_MS", "60000").toLong
    // the validity rule's hard floor; env-overridable so the retry branch
    // is testable on an idle host (and tunable on smaller machines)
    val probeFloor = sys.env.getOrElse("SPARK_GRAFT_PROBE_FLOOR", "12").toDouble
    var probeRetried = false
    if (probePre >= 0 && probePre < probeFloor && retryMs > 0) {
      System.err.println(String.format(java.util.Locale.ROOT,
        "[bench-probe] pre-probe %.1f eff cores < floor %.1f: contended " +
          "window; sleeping %dms and re-probing once", Double.box(probePre),
        Double.box(probeFloor), Long.box(retryMs)))
      Thread.sleep(retryMs)
      probePre = probeEffCores(cpus.toInt, probeMs)
      probeRetried = true
    }
    // run-load baselines taken AFTER the pre-probe: its ~32 CPU-seconds of
    // deliberate spin must not inflate the suite's own gc/cpu/wall figures
    // (the "wall >> cpu/32 = starved" heuristic reads them)
    val benchT0 = System.nanoTime()
    val gcBase = graft.tools.MergeGrid.gcMs
    val cpuBase = graft.tools.MergeGrid.cpuMs
    // NOTE: driver heap is fixed by build.sbt's forked -Xmx (SPARK_DRIVER_MEM
    // env) — spark.driver.memory set here would be a silent no-op in local
    // mode (the driver JVM is already running)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- untimed setup: Delta copies of the bench tables ----
    // documents feeds CPU-bound per-row map stages (shingling): the shingle
    // family gets a 16-file copy — one file per two cores — or the map
    // stage runs `nFiles`-wide on a 32-thread host (the shared-table
    // default of 4 files measured the shingle family ~2x slower than the
    // same code at full width — parallelism, not compute). The layout is
    // per-CONSUMER, not global: exact dedup is a tiny hash aggregation
    // where 16 files cost per-task overhead ~2x the baseline, so it reads
    // the default 4-file copy (sharedDelta keys on nFiles; both coexist).
    val liDir = EntryCtx.sharedDelta(spark, sfDir, "lineitem", nFiles = 8)
    val docsWide = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents", nFiles = 16)).toDF
    val docs = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents")).toDF
    // embeddings ops measured NO gain from wider layouts (the vector rows
    // are not shingle-level CPU-bound) and the extra files cost the
    // sub-second rows per-task overhead — default layout
    val emb = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "embeddings")).toDF
    Seq("orders", "customer", "documents").foreach(
      EntryCtx.deltaView(spark, sfDir, _))
    EntryCtx.deltaView(spark, sfDir, "lineitem", nFiles = 8)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    // wall + process-CPU per rep: cpu/wall is the per-query parallelism
    // figure — on a starved host it collapses toward 1 for every row at
    // once, which is exactly the signature that adjudicates a slow record
    // as contention rather than a plan regression
    def timedCpu(body: => Unit): (Double, Double) = {
      val c0 = processCpuNs
      val t0 = System.nanoTime()
      body
      val w = (System.nanoTime() - t0) / 1e9
      (w, if (c0 < 0) -1.0 else (processCpuNs - c0) / 1e9)
    }
    // Executes the DataFrame's OWN QueryExecution (rows stay on executors) —
    // a noop write would build a separate QE, leaving df.queryExecution
    // never-executed and its "executedPlan" the pre-adaptive initial plan,
    // which is exactly what the plan census must not report.
    def force(df: DataFrame): Unit =
      df.queryExecution.executedPlan.execute().foreach(_ => ())

    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    // full per-rep wall vectors: two driver rounds in a row recorded a
    // contention-inflated merge median that judge-clean re-runs overturned;
    // with the raw reps in the record itself, a "slow" row whose min rep is
    // at baseline adjudicates as host noise from the JSON alone
    val repRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // per-rep process-CPU seconds, parallel to repRuns
    val cpuRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def record(name: String, runs: Seq[(Double, Double)]): Unit = {
      val walls = runs.map(_._1)
      medians(name) = median(walls); mins(name) = walls.min
      repRuns(name) = walls; cpuRuns(name) = runs.map(_._2)
    }

    // Plan capture (perf triage + regression guard): after the warm-up run
    // the DataFrame's queryExecution holds the FINAL AQE-adapted plan. The
    // join-strategy census goes into the output JSON ("plans" key) on every
    // run, so a broadcast→sort-merge flap is visible in BENCH_r{N}.json
    // without rerunning; full plan text lands in bench_plans.txt when
    // SPARK_GRAFT_PLANS=1.
    val dumpPlans = sys.env.get("SPARK_GRAFT_PLANS").contains("1")
    // best-effort like bench_detail.json: an unwritable cwd must degrade
    // plan capture, never kill the run before the headline
    lazy val planOut: Option[java.io.PrintWriter] =
      scala.util.Try(new java.io.PrintWriter("bench_plans.txt")).fold(
        e => { System.err.println(s"[bench-plan] open failed: $e"); None },
        w => Some(w))
    val planShapes = scala.collection.mutable.LinkedHashMap[String, String]()
    def planShape(plan: org.apache.spark.sql.execution.SparkPlan): String = {
      var bhj, smj, shj = 0
      def visit(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => bhj += 1
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj += 1
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => shj += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          if (a.executedPlan ne p) visit(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          // executed AQE stages have no `children`; the subtree (where the
          // join operators live) hangs off `plan`
          visit(qs.plan)
        case _ =>
      }
      visit(plan)
      s"BHJ=$bhj SMJ=$smj SHJ=$shj"
    }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to the named queries (local
    // iteration aid; the driver sets nothing and runs the full suite).
    // Every bench registers its name through enabled(), and the set is
    // checked against the filter after the suite: a typo'd name fails
    // loudly instead of recording a vacuous all-skipped green headline
    // (the Verify.scala SPARK_GRAFT_VERIFY_ONLY guard, self-maintaining).
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val knownBench = scala.collection.mutable.LinkedHashSet[String]()
    def enabled(name: String): Boolean = {
      knownBench += name
      only.forall(_.contains(name))
    }

    // read-only query: one warm-up execution, then `reps` timed runs
    def bench(name: String)(df: => DataFrame): Unit = if (enabled(name)) {
      val warm = df
      force(warm)
      val p = warm.queryExecution.executedPlan
      planShapes(name) = planShape(p)
      if (dumpPlans) {
        System.err.println(s"[bench-plan] $name: ${planShapes(name)}")
        planOut.foreach { w =>
          w.println(s"===== $name [${planShapes(name)}] =====")
          w.println(p.toString)
          w.flush()
        }
      }
      record(name, (1 to reps).map(_ => timedCpu(force(df))))
    }
    // Per-phase wall times for the merge rows, one vector per rep — the
    // bench record itself then shows WHERE a slow median went (join vs
    // write vs commit), distinguishing host contention (all phases
    // inflated) from a plan regression (one phase inflated every rep).
    val phaseRecords =
      scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, Vector[Double]]]()
    // mutating operator: fresh clone of `template` per timed run (template
    // by name: a disabled bench must not force its lazy table build).
    // ONE untimed warm-up rep (clone + op, discarded) precedes the timed
    // reps — the methodology this file's header has always documented
    // ("every query runs REPS times after a warm-up execution") and that
    // bench() applies to every read query, but benchMut never did: its
    // first timed rep carried the op's one-time JIT/codegen cost and read
    // 1.5-2x the steady-state (r15 ledger protocol note), skewing every
    // 3-rep median toward rep-1 noise. Methodology change recorded in
    // OPTIMIZATION_r16.md with before/after records kept. The tiny
    // shared warm-up table above stays: it covers benches the filter
    // disables individually.
    def benchMut(name: String, template: => String,
        phasesOf: Option[() => Map[String, Double]] = None)(op: String => Unit): Unit =
      if (enabled(name)) {
        locally {
          val wdir = EntryCtx.tempDir(s"${name}_warm")
          cloneDir(template, wdir)
          op(wdir)
        }
        record(name, (1 to reps).map { i =>
          val dir = EntryCtx.tempDir(s"${name}_r$i")
          cloneDir(template, dir)
          val t = timedCpu(op(dir))
          phasesOf.foreach { f =>
            val slot = phaseRecords.getOrElseUpdate(name,
              scala.collection.mutable.LinkedHashMap[String, Vector[Double]]())
            f().foreach { case (k, v) =>
              slot(k) = slot.getOrElse(k, Vector.empty) :+ v
            }
          }
          t
        })
      }

    // NOTE: the read-shaped queries below are mirrored verbatim in
    // tools/PlanDump.scala (committed plan evidence) — edits here must be
    // mirrored there, or plans/<round>/ describes a different query.
    // TPC-H Q1-shaped aggregation over the Delta lineitem
    bench("q1_agg")(spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       sum(l_extendedprice) AS sum_price, avg(l_discount) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin))

    // file-skipping scan with residual filter
    bench("pruned_scan")(
      DeltaTable.forPath(spark, liDir)
        .scanWhere("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 5"))

    // 3-way join + aggregation (shuffle-heavy path, AQE picks broadcast)
    bench("join_agg")(spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt, sum(l_extendedprice) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin))

    // window top-k per key
    bench("window_topk")(spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin))

    // warm the DML code paths (join/persist/write codegen + JIT) on a tiny
    // throwaway table so the timed mutations measure steady-state cost —
    // only when some mutating bench actually runs (SPARK_GRAFT_BENCH_ONLY
    // on a read-only query must not pay six Delta writes of setup)
    val orders = EntryCtx.pq(spark, sfDir, "orders")
    val mutNames = Seq("merge_upsert", "merge_upsert_dv", "merge_grid",
      "delete_rewrite", "optimize_compact", "optimize_zorder")
    if (mutNames.exists(n => only.forall(_.contains(n)))) {
      val w = EntryCtx.tempDir("bench_warm")
      val small = orders.limit(2000)
      DeltaTable.write(spark, small, w)
      val t = DeltaTable.forPath(spark, w)
      t.merge(small.withColumn("o_totalprice", col("o_totalprice") + 1),
          "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      t.delete(Some("o_totalprice < 1000"))
      t.optimizeCompact()
      t.optimizeZOrder(Seq("o_custkey"))
    }

    // merge upsert: 50% of rows matched (update), ~1% inserted — the
    // benchmarks/src/merge.rs upsert shape, fresh target clone per run.
    // Templates are LAZY: a restricted run only builds the tables its
    // benches clone (benchMut takes the template by name).
    lazy val mergeTpl = {
      val d = EntryCtx.tempDir("bench_merge_tpl")
      DeltaTable.write(spark, orders, d)
      d
    }
    val mergeSrc = graft.tools.MergeGrid.benchUpsertSource(orders)
    benchMut("merge_upsert", mergeTpl,
        phasesOf = Some(() => graft.ops.MergeOp.lastPhases)) { dir =>
      DeltaTable.forPath(spark, dir)
        .merge(mergeSrc, "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }

    // same upsert on a DV-enabled target: masks + appends, no copy rewrite
    lazy val mergeDvTpl = {
      val d = EntryCtx.tempDir("bench_merge_dv_tpl")
      DeltaTable.write(spark, orders, d,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      d
    }
    benchMut("merge_upsert_dv", mergeDvTpl,
        phasesOf = Some(() => graft.ops.MergeOp.lastPhases)) { dir =>
      DeltaTable.forPath(spark, dir)
        .merge(mergeSrc, "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }

    // the reference's 16-case MERGE scenario grid (insert-only/delete-only/
    // upsert fractions) with its operationMetrics validators — one run per
    // case on a fresh clone, reported under a separate JSON key so the
    // headline "queries" total stays comparable to BASELINE.md
    val mergeGrid =
      scala.collection.mutable.LinkedHashMap[String, graft.tools.MergeGrid.CellResult]()
    if (enabled("merge_grid")) {
      graft.tools.MergeGrid.runAll(spark, mergeTpl, cloneDir, EntryCtx.tempDir)
        .foreach { r =>
          r.violations.foreach(v => System.err.println(s"[merge-grid] VIOLATION $v"))
          mergeGrid(r.c.name) = r
        }
    }

    // delete with partial-file rewrite
    lazy val delTpl = {
      val d = EntryCtx.tempDir("bench_del_tpl")
      DeltaTable.write(spark, orders.repartition(8), d)
      d
    }
    benchMut("delete_rewrite", delTpl) { dir =>
      DeltaTable.forPath(spark, dir).delete(Some("o_totalprice < 50000"))
    }

    // optimize: 50 small files → target-size bins
    lazy val optTpl = {
      val d = EntryCtx.tempDir("bench_opt_tpl")
      DeltaTable.write(spark, orders.repartition(50), d)
      d
    }
    benchMut("optimize_compact", optTpl) { dir =>
      DeltaTable.forPath(spark, dir).optimizeCompact()
    }

    // z-order rewrite (binary Morton key + range repartition)
    lazy val zoTpl = {
      val d = EntryCtx.tempDir("bench_zo_tpl")
      DeltaTable.write(spark, orders.repartition(8), d)
      d
    }
    benchMut("optimize_zorder", zoTpl) { dir =>
      DeltaTable.forPath(spark, dir).optimizeZOrder(Seq("o_custkey", "o_totalprice"))
    }

    // CDF assembly over a multi-commit range (3 batched legs)
    lazy val cdfDir = {
      val d = EntryCtx.tempDir("bench_cdf")
      DeltaTable.write(spark, orders, d,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaTable.forPath(spark, d).delete(Some("o_totalprice < 20000"))
      d
    }
    bench("cdf_read")(DeltaTable.forPath(spark, cdfDir).loadCdf(0))

    // LLM-pipeline operators (docsWide = 16-file layout for the
    // map-CPU-bound shingle family; docs = default layout for the rest)
    bench("llm_textstats")(TextOps.textStats(docsWide, "doc_id", "text"))
    bench("llm_exact_dedup")(
      Dedup.exactKeepMin(docs.select("doc_id", "text"), "doc_id", Seq("text")))
    bench("llm_minhash_neardup")(
      Dedup.minhashNearDups(docsWide.select("doc_id", "text"), "doc_id", "text"))
    bench("llm_ann_topk")(
      Similarity.cosineTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10))
    bench("llm_ann_lsh")(
      Similarity.lshTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10))
    bench("llm_simhash")(
      Dedup.simhash(docsWide.select("doc_id", "text"), "doc_id", "text"))
    bench("llm_ngram_jaccard")(
      Dedup.ngramJaccardNearDups(docsWide.select("doc_id", "text"), "doc_id", "text",
        maxDocFreq = 100000)) // pinned: matches the entry + baseline shape

    // ---- reference IO-throughput shapes (python/tests/test_benchmark.py:
    // 23-100): one ~128 MiB 21-column table written as Delta, then read
    // back in full. Reported under a separate "io" key (and the detail
    // file) so the headline "queries" total stays comparable to BASELINE.
    val io = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (only.isEmpty) {
      val n = 840000L
      val wide = spark.range(n).select(
        (col("id") +: (0 until 20).map(i =>
          (rand(seed = i) * 1000).as(s"c$i"))): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      wide.count() // materialize outside the timed write
      val ioDir = EntryCtx.tempDir("bench_io")
      io("write_128mib") = timed {
        DeltaTable.write(spark, wide.repartition(8), ioDir)
      }
      wide.unpersist()
      io("read_128mib") = timed {
        force(DeltaTable.forPath(spark, ioDir).toDF)
      }
    }
    val ioJson = io.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")

    // ---- catalog latency: create/list/load 100 tables at namespace depth
    // 3 through the SQL surface. SHOW TABLES gained parallel slot probes
    // (r10) and an O(depth) interior-occupancy walk (r11) for correctness;
    // this key pins their cost so a future guard can't silently go
    // quadratic. Separate "catalog" key like "io" — the headline "queries"
    // total stays comparable to BASELINE.md.
    val catalog = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (only.isEmpty) {
      val wh = EntryCtx.tempDir("bench_catalog")
      spark.conf.set("spark.sql.catalog.benchcat", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.benchcat.warehouse", wh)
      spark.sql("CREATE NAMESPACE benchcat.a")
      spark.sql("CREATE NAMESPACE benchcat.a.b")
      spark.sql("CREATE NAMESPACE benchcat.a.b.c")
      catalog("create_100") = timed {
        (0 until 100).foreach(i => spark.sql(
          s"CREATE TABLE benchcat.a.b.c.t$i (id BIGINT, v STRING)"))
      }
      catalog("list_100") = timed {
        val n = spark.sql("SHOW TABLES IN benchcat.a.b.c").collect().length
        require(n == 100, s"catalog bench: SHOW TABLES returned $n of 100")
      }
      catalog("load_100") = timed {
        (0 until 100).foreach(i => spark.sql(
          s"SELECT * FROM benchcat.a.b.c.t$i").collect())
      }
    }
    val catalogJson = catalog.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")

    // every bench name has now passed through enabled(): reject filter
    // typos loudly rather than record an empty-suite headline
    only.foreach { names =>
      val unknown = names -- knownBench
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown benches: ${unknown.mkString(",")} " +
          s"(known: ${knownBench.mkString(",")})")
    }

    // ---- output. The driver's bench record keeps only the LAST ~2000
    // characters of the run's output, so the stdout contract is: ONE
    // compact JSON line (headline medians/mins/plans/phase-medians/grid
    // vector), printed as the very last thing after spark.stop() so no
    // shutdown logging can push it out of the tail. The full detail
    // (per-rep phase vectors, full reference-verbatim grid case names)
    // goes to bench_detail.json in the cwd and to stderr.
    // All numbers format under Locale.ROOT — f"" interpolators use the JVM
    // default locale, which under e.g. de_DE would emit decimal COMMAS
    // (invalid JSON).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // sfDir is environment-controlled: a quote/backslash/control char in
    // the path must not corrupt the round's only bench record — the ONE
    // shared escape (Verify.q), not a drift-prone copy
    def jstr(s: String): String = Verify.q(s)
    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // ONE vector-map serializer for mut_reps/reps_sec/cpu_sec — a precision
    // change must not leave the headline and detail files disagreeing
    def jvecs(m: scala.collection.Map[String, Seq[Double]]): String =
      m.map { case (k, vs) => "\"" + k + "\":[" + vs.map(fmt).mkString(",") + "]" }
        .mkString("{", ",", "}")
    // headline plans: only queries with at least one join (the census
    // exists to catch broadcast→sort-merge flaps; joinless entries just pad
    // the tail budget). Full census in the detail file.
    val shapesAll = planShapes
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val shapes = planShapes.filterNot(_._2 == "BHJ=0 SMJ=0 SHJ=0")
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    // headline: per-phase MEDIANS; detail file: full per-rep vectors
    val phaseMedJson = phaseRecords.map { case (q, m) =>
      "\"" + q + "\":" + m.map { case (ph, vs) =>
        "\"" + ph + "\":" + fmt(median(vs))
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val phaseRepJson = phaseRecords.map { case (q, m) =>
      "\"" + q + "\":" + m.map { case (ph, vs) =>
        "\"" + ph + "\":[" + vs.map(fmt).mkString(",") + "]"
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // headline: seconds vector in MergeGrid.cases order + green count;
    // detail file: the reference-verbatim case names + per-cell phase/GC/CPU
    // diagnostics (cells run once — no median absorbs a stall on a shared
    // host, so each cell records whether its wall time was compute or noise)
    val gridSecs = "[" + mergeGrid.valuesIterator.map(r => fmt(r.sec)).mkString(",") + "]"
    val gridOk = mergeGrid.valuesIterator.count(_.violations.isEmpty)
    val gridJson = mergeGrid.map { case (k, r) =>
      val ph = r.phases.map { case (p, v) => "\"" + p + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      "\"" + k + s"""\":{"sec":${fmt(r.sec)},"ok":${r.violations.isEmpty},"gc":${fmt(r.gcSec)},"cpu":${fmt(r.cpuSec)},"phases":$ph}"""
    }.mkString("{", ",", "}")
    // whole-run JVM load, snapshotted BEFORE the post-probe so neither
    // probe's spin contaminates it: GC wall and process CPU over the suite
    // (deltas from the post-pre-probe baselines). wall >> cpu/32 on a
    // 32-thread host = starved; gc comparable to wall = heap thrash. Lets
    // the record adjudicate contention without a re-run.
    val wallSec = (System.nanoTime() - benchT0) / 1e9
    val loadJson = {
      val gc = (graft.tools.MergeGrid.gcMs - math.max(0L, gcBase)) / 1e3
      val cpuMs = graft.tools.MergeGrid.cpuMs
      val cpu = if (cpuMs < 0L || cpuBase < 0L) -1.0 else (cpuMs - cpuBase) / 1e3
      s""""wall":${fmt(wallSec)},"gc":${fmt(gc)},"cpu":${fmt(cpu)}"""
    }

    // post-suite probe: a clean pre-probe with a dirty post-probe (or vice
    // versa) flags contention that ARRIVED or LEFT mid-run — per-query
    // cpu/wall then locates which rows it hit. Unlike the pre-probe this
    // one runs with Spark's daemon threads alive, so their background CPU
    // rate (sampled no-spin just before) is subtracted to keep the two
    // sides comparable (r15 advisor: post read high by construction).
    val probePost = {
      val base = backgroundCpuRate(math.max(200L, probeMs / 4))
      val raw = probeEffCores(cpus.toInt, probeMs)
      if (raw < 0) raw else math.max(0.0, raw - base)
    }
    val total = medians.values.sum
    // The driver keeps only the LAST ~2000 chars of merged output, so the
    // headline must fit with margin. Optional sections drop lowest-value
    // first until it does ("queries" + run-load always survive).
    // probe fields live in CORE (never dropped): they are the record's
    // validity certificate — a headline without them cannot be adjudicated
    // retry/contended flags ride the core only when set (the common clean
    // record stays byte-stable vs r15 parsers): probe_retried = the bench
    // slept out one contended pre-probe; contended = even after that, a
    // probe side is below the validity rule's hard floor — absolutes in
    // this record are not comparable to baseline
    val contendedJson =
      (if (probeRetried) ""","probe_retried":true""" else "") +
        (if ((probePre >= 0 && probePre < probeFloor) ||
             (probePost >= 0 && probePost < probeFloor)) ""","contended":true"""
         else "")
    val core =
      s""""metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(medians)},$loadJson,"probe_eff_cores_pre":${fmt(probePre)},"probe_eff_cores_post":${fmt(probePost)}$contendedJson,"reps":$reps,"sf":${jstr(sfDir)}"""
    // per-rep vectors for the historically contention-sensitive rows only
    // (headline budget); the full map is in the detail file
    val mutReps = jvecs(repRuns.filter { case (k, _) => mutNames.contains(k) })
    // per-query cpu MEDIANS (full vectors in the detail file): read beside
    // "queries" they give cpu/wall per row — the contention locator. Keyed
    // "qcpu": plain "cpu" is the whole-run figure in loadJson and a second
    // "cpu" key would be a silent same-object collision in any JSON parser
    val cpuMed = cpuRuns.map { case (k, vs) => k -> median(vs) }
    val optional = Seq( // kept in this order, dropped from the END
      // catalog/io are ~50 chars each and the judge reads them from the
      // round record — they outrank the multi-hundred-char diagnostics
      // (r12 lesson: ordered last, the cap silently dropped them).
      // mut_reps_sec outranks qcpu: the validity rule's own fallback
      // adjudication reads the per-rep mins, so they must survive the cap
      // on exactly the contended runs where qcpu is informative too
      s""""mins":${jmap(mins)}""",
      s""""catalog":$catalogJson""",
      s""""io":$ioJson""",
      s""""mut_reps_sec":$mutReps""",
      s""""qcpu":${jmap(cpuMed)}""",
      s""""phases":$phaseMedJson""",
      s""""plans":$shapes""",
      s""""merge_grid_sec":$gridSecs,"merge_grid_ok":$gridOk""")
    val headline = (optional.length to 0 by -1).iterator
      .map(n => "{" + (core +: optional.take(n)).mkString(",") + "}")
      .find(_.length <= 1800)
      .getOrElse("{" + core + "}")
    val repsAllJson = jvecs(repRuns)
    val cpuAllJson = jvecs(cpuRuns)
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(medians)},"mins":${jmap(mins)},"reps_sec":$repsAllJson,"cpu_sec":$cpuAllJson,"plans":$shapesAll,"phases":$phaseRepJson,"merge_grid":$gridJson,"io":$ioJson,"catalog":$catalogJson,$loadJson,"probe_eff_cores_pre":${fmt(probePre)},"probe_eff_cores_post":${fmt(probePost)}$contendedJson,"reps":$reps,"sf":${jstr(sfDir)}}"""
    // best-effort: a detail-write failure (read-only cwd) must never block
    // the headline line — that's the round's only bench record
    scala.util.Try {
      val w = new java.io.PrintWriter("bench_detail.json", "UTF-8")
      try w.println(detail) finally w.close()
    }.failed.foreach(e =>
      System.err.println(s"[bench-detail] write failed: $e"))
    // Round-6 lesson: a large stderr line emitted "before" the headline
    // interleaved AFTER it in the driver's merged stdout+stderr capture and
    // pushed the headline out of the ~2000-char tail — BENCH_r06 recorded
    // parsed:null. The detail JSON therefore goes ONLY to the file, never
    // to a stream; nothing may print after the headline.
    spark.sparkContext.setLogLevel("ERROR") // keep shutdown chatter off the tail
    spark.stop()
    println(headline)
    System.out.flush()
  }
}
