package graft

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
 * python/tests/test_benchmark.py:103-157). Table builds are untimed setup;
 * each timed entry is one operator execution forced by count()/collect.
 * Prints ONE JSON line.
 */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- untimed setup: Delta copies of the bench tables ----
    val liDir = EntryCtx.sharedDelta(spark, sfDir, "lineitem", nFiles = 8)
    Seq("orders", "customer", "lineitem", "documents").foreach(
      EntryCtx.deltaView(spark, sfDir, _))
    val docs = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents")).toDF
    val emb = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "embeddings")).toDF

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    // read-only queries: warm-up run then best-of-2 (JIT/codegen warm; the
    // mutating ops below stay single-shot on fresh tables)
    def timedRead(df: => DataFrame): Double = { timed(force(df)); math.min(timed(force(df)), timed(force(df))) }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // TPC-H Q1-shaped aggregation over the Delta lineitem
    results("q1_agg") = timedRead(spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       sum(l_extendedprice) AS sum_price, avg(l_discount) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin))

    // file-skipping scan with residual filter
    results("pruned_scan") = timedRead(
      DeltaTable.forPath(spark, liDir)
        .scanWhere("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 5"))

    // 3-way join + aggregation (shuffle-heavy path, AQE picks broadcast)
    results("join_agg") = timedRead(spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt, sum(l_extendedprice) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin))

    // window top-k per key
    results("window_topk") = timedRead(spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin))

    // warm the DML code paths (join/persist/write codegen + JIT) on a tiny
    // throwaway table so the timed mutations measure steady-state cost
    val orders = EntryCtx.pq(spark, sfDir, "orders")
    locally {
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
    // benchmarks/src/merge.rs upsert shape, fresh target per run
    val mergeDir = EntryCtx.tempDir("bench_merge")
    DeltaTable.write(spark, orders, mergeDir)
    val mergeSrc = orders.filter("o_orderkey % 2 = 0")
      .unionByName(orders.filter("o_orderkey % 100 = 0")
        .withColumn("o_orderkey", col("o_orderkey") + 10000000))
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    results("merge_upsert") = timed {
      DeltaTable.forPath(spark, mergeDir)
        .merge(mergeSrc, "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }

    // same upsert on a DV-enabled target: masks + appends, no copy rewrite
    val mergeDvDir = EntryCtx.tempDir("bench_merge_dv")
    DeltaTable.write(spark, orders, mergeDvDir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    results("merge_upsert_dv") = timed {
      DeltaTable.forPath(spark, mergeDvDir)
        .merge(mergeSrc, "target.o_orderkey = source.o_orderkey")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }

    // delete with partial-file rewrite
    val delDir = EntryCtx.tempDir("bench_del")
    DeltaTable.write(spark, orders.repartition(8), delDir)
    results("delete_rewrite") = timed {
      DeltaTable.forPath(spark, delDir).delete(Some("o_totalprice < 50000"))
    }

    // optimize: 50 small files → target-size bins
    val optDir = EntryCtx.tempDir("bench_opt")
    DeltaTable.write(spark, orders.repartition(50), optDir)
    results("optimize_compact") = timed {
      DeltaTable.forPath(spark, optDir).optimizeCompact()
    }

    // z-order rewrite (binary Morton key + range repartition)
    val zoDir = EntryCtx.tempDir("bench_zo")
    DeltaTable.write(spark, orders.repartition(8), zoDir)
    results("optimize_zorder") = timed {
      DeltaTable.forPath(spark, zoDir).optimizeZOrder(Seq("o_custkey", "o_totalprice"))
    }

    // CDF assembly over a multi-commit range (3 batched legs)
    val cdfDir = EntryCtx.tempDir("bench_cdf")
    DeltaTable.write(spark, orders, cdfDir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaTable.forPath(spark, cdfDir).delete(Some("o_totalprice < 20000"))
    results("cdf_read") = timedRead(
      DeltaTable.forPath(spark, cdfDir).loadCdf(0))

    // LLM-pipeline operators
    results("llm_textstats") = timedRead(
      TextOps.textStats(docs, "doc_id", "text"))
    results("llm_exact_dedup") = timedRead(
      Dedup.exactKeepMin(docs.select("doc_id", "text"), "doc_id", Seq("text")))
    results("llm_minhash_neardup") = timedRead(
      Dedup.minhashNearDups(docs.select("doc_id", "text"), "doc_id", "text"))
    results("llm_ann_topk") = timedRead(
      Similarity.cosineTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10))
    results("llm_ann_lsh") = timedRead(
      Similarity.lshTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", 10))
    results("llm_simhash") = timedRead(
      Dedup.simhash(docs.select("doc_id", "text"), "doc_id", "text"))
    results("llm_ngram_jaccard") = timedRead(
      Dedup.ngramJaccardNearDups(docs.select("doc_id", "text"), "doc_id", "text"))

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
