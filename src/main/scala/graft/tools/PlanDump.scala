package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.entries.EntryCtx
import graft.llm.{Dedup, Similarity, TextOps}
import graft.table.DeltaTable

/**
 * Plan-evidence dumper for the optimization rounds: writes
 * `.explain("formatted")` of the BENCH-SHAPED queries to
 * `plans/<tag>/<query>_<suffix>.txt`, so a plan claim in
 * OPTIMIZATION_r*.md is checkable against committed files without
 * running Spark.
 *
 * Usage: `sbt "runMain graft.tools.PlanDump <outDir> <suffix> [q1,q2,…]"`
 * (same `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS` contract as Bench; the
 * query set defaults to every read-shaped bench query). The plans are the
 * PRE-EXECUTION formatted plans (AQE initial): deterministic, host-load
 * independent, and they carry PushedFilters/ReadSchema — the executed
 * (post-AQE) join census is separately recorded in the bench record's
 * "plans" key.
 *
 * DRIFT WARNING: the session confs, table layouts (nFiles) and query
 * expressions below are DELIBERATE verbatim copies of Bench.scala's —
 * the committed plan files are only evidence for the bench while the
 * two stay in sync. If you change a bench query, layout or session conf
 * in Bench.scala, mirror it here (and re-dump) or the plan evidence
 * silently describes a different query than the one timed.
 */
object PlanDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [names]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val filter: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    java.nio.file.Files.createDirectories(outDir)

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same table layouts as Bench (EntryCtx keys on nFiles, so these are
    // the exact frames the bench times)
    val liDir = EntryCtx.sharedDelta(spark, sfDir, "lineitem", nFiles = 8)
    val docsWide = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents", nFiles = 16)).toDF
    val docs = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents")).toDF
    val emb = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "embeddings")).toDF
    Seq("orders", "customer", "documents").foreach(
      EntryCtx.deltaView(spark, sfDir, _))
    EntryCtx.deltaView(spark, sfDir, "lineitem", nFiles = 8)

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "q1_agg" -> (() => spark.sql(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
          |       sum(l_extendedprice) AS sum_price, avg(l_discount) AS avg_disc,
          |       count(*) AS cnt
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),
      "pruned_scan" -> (() => DeltaTable.forPath(spark, liDir)
        .scanWhere("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 5")),
      "join_agg" -> (() => spark.sql(
        """SELECT c_mktsegment, count(*) AS cnt, sum(l_extendedprice) AS rev
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin)),
      "window_topk" -> (() => spark.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey,
          |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
          |  FROM orders) t WHERE rn <= 3""".stripMargin)),
      "llm_textstats" -> (() => TextOps.textStats(docsWide, "doc_id", "text")),
      "llm_exact_dedup" -> (() =>
        Dedup.exactKeepMin(docs.select("doc_id", "text"), "doc_id", Seq("text"))),
      "llm_minhash_neardup" -> (() =>
        Dedup.minhashNearDups(docsWide.select("doc_id", "text"), "doc_id", "text")),
      "llm_ann_topk" -> (() =>
        Similarity.cosineTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10)),
      "llm_ann_lsh" -> (() =>
        Similarity.lshTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10)),
      "llm_simhash" -> (() =>
        Dedup.simhash(docsWide.select("doc_id", "text"), "doc_id", "text")),
      "llm_ngram_jaccard" -> (() =>
        Dedup.ngramJaccardNearDups(docsWide.select("doc_id", "text"), "doc_id", "text",
          maxDocFreq = 100000)))

    queries.foreach { case (name, mk) =>
      if (filter.forall(_.contains(name))) {
        val df = mk()
        // capture explain("formatted") without stdout interleaving
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // ALSO execute and capture the AQE-final plan: the formatted
        // pre-execution plan prints shared subtrees once PER CONSUMER,
        // so exchange-reuse claims (ReusedExchange nodes) are only
        // visible in the executed plan (the Bench.force discipline —
        // executing the df's own QueryExecution, not a separate one)
        df.queryExecution.executedPlan.execute().foreach(_ => ())
        val executed = df.queryExecution.executedPlan.toString
        val p = outDir.resolve(s"${name}_$suffix.txt")
        java.nio.file.Files.write(p,
          (txt + "\n\n== Executed Plan (AQE final) ==\n" + executed)
            .getBytes("UTF-8"))
        System.err.println(s"[plan-dump] wrote $p")
      }
    }
    spark.stop()
  }
}
