package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entries.EntryCtx
import graft.llm.Dedup
import graft.table.DeltaTable

/**
 * Stage-level timing probe for the inverted-index dedup pipelines
 * (guide §1: find WHERE the time goes before changing anything). Times
 * each prefix of the ngram-Jaccard pipeline through the noop sink on the
 * bench's own 16-file documents layout, then the full minhash pipeline,
 * under the active spark.graft.dedup.capStrategy (set via system
 * property to A/B: -Dspark.graft.dedup.capStrategy=agg).
 *
 * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DedupProbe"
 */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val strategy = spark.conf.getOption("spark.graft.dedup.capStrategy").getOrElse("window")
    val docsWide = DeltaTable.forPath(spark,
      EntryCtx.sharedDelta(spark, sfDir, "documents", nFiles = 16)).toDF
      .select("doc_id", "text")

    def bench(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dedup-probe $strategy%s] $name%-28s med=${runs.sorted.apply(reps / 2)}%6.3f min=${runs.min}%6.3f")
    }

    // ngram pipeline prefixes (mirrors Dedup.ngramJaccardNearDups stages)
    val sh = Dedup.shingles(docsWide, "doc_id", "text", 3)
      .filter(col("__id").isNotNull)
      .select(col("__id"), xxhash64(col("__sh")).as("__h"))
    bench("ngram.1 shingle+hash")(sh)
    val sets = sh.groupBy("__id").agg(collect_set(col("__h")).as("__hs"))
    bench("ngram.2 sets agg")(sets)
    val posting = sets.select(col("__id"), explode(col("__hs")).as("__h"))
    bench("ngram.3 posting")(posting)
    // mirror of Dedup's WINDOW-cap + pinned-SMJ candidate stage (the
    // internals are private; keep in sync with ngramJaccardNearDups).
    // These three stage probes HARDCODE the window shape and the bench's
    // pinned cap (100000) — they are labelled "window4/5/6" regardless of
    // the active capStrategy so an agg-strategy run cannot read them as
    // agg-shaped evidence; only the *.full rows respect the knob.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    val rare = posting.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= 100000).drop("__df")
    bench("ngram.window4 rare (cap)")(rare)
    val cands = rare.select(col("__id").as("id_a"), col("__h"))
      .hint("merge")
      .join(rare.select(col("__id").as("id_b"), col("__h").as("__h2")),
        col("__h") === col("__h2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    bench("ngram.window5 cand pairs")(cands)
    bench("ngram.window6 cand distinct")(cands.distinct())
    println(s"[dedup-probe stats] docs=${docsWide.count()} " +
      s"postingRows=${posting.count()} candPairsRaw=${cands.count()} " +
      s"candPairsDistinct=${cands.distinct().count()} " +
      s"avgSetSize=${sets.select(avg(size(col("__hs")))).head.getDouble(0)}")
    bench("ngram.full")(Dedup.ngramJaccardNearDups(
      docsWide, "doc_id", "text", maxDocFreq = 100000))
    bench("minhash.1 sig agg")(Dedup.signatures(docsWide, "doc_id", "text"))
    bench("minhash.full")(Dedup.minhashNearDups(docsWide, "doc_id", "text"))
    spark.stop()
  }
}
