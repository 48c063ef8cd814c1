package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding (BPE) merge training — the classic
 * Sennrich et al. 2016 corpus-tokenizer construction as a Spark
 * aggregation loop (the reference engine has no tokenizer training; this
 * is the standard map-reduce formulation SentencePiece-style trainers use
 * at corpus scale).
 *
 * Shape: the corpus collapses ONCE to a (word, count) table — at 100 TB
 * the distinct-word table is orders of magnitude smaller than the corpus
 * and is the only thing the loop ever touches again. Each merge iteration
 * is one explode-pairs + sum aggregation over that table (map-side
 * partial agg), a driver collect of exactly ONE row (the argmax pair,
 * ties broken lexicographically so training is deterministic), and a
 * narrow per-word array rewrite. No UDFs — pair extraction and the
 * greedy merge fold are codegen column expressions; driver state is the
 * merge list itself (numMerges rows), never data.
 *
 * Lineage control: the symbol table is re-persisted per iteration and
 * localCheckpoint'd every [[checkpointEvery]] merges — an unbounded
 * iteration chain otherwise accretes a plan Catalyst re-analyzes
 * quadratically (the k-means loop pins the same lesson).
 */
object Bpe {

  /** Adjacent symbol pairs of an array column as (l, r) structs. */
  private def adjacentPairs(s: Column): Column =
    when(size(s) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(0), size(s) - 2),
        i => struct(element_at(s, i + 1).as("l"), element_at(s, i + 2).as("r"))))

  /** Greedy left-to-right non-overlapping merge of the (l, r) pair inside a
    * symbol array: a left fold where a trailing `l` followed by `r` becomes
    * the fused symbol ("aaa" + (a,a) → [aa, a], the standard BPE rewrite). */
  private def mergeFold(s: Column, l: String, r: String): Column =
    aggregate(s, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /**
   * Train `numMerges` BPE merges over the corpus text column. Returns the
   * ordered merge table (rank, left, right, pair_count) — rank 0 is the
   * first (highest-count) merge. Stops early when no pair reaches
   * `minPairCount`.
   */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, checkpointEvery: Int = 10): DataFrame = {
    require(numMerges >= 1, s"trainMerges: numMerges=$numMerges")
    require(minPairCount >= 1, s"trainMerges: minPairCount=$minPairCount")
    require(checkpointEvery >= 1, s"trainMerges: checkpointEvery=$checkpointEvery")
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel

    // corpus → (count, symbols); split("") yields per-character symbols
    // (an empty word cannot occur: words() never emits empty tokens)
    var words = df
      .select(explode(TextOps.words(TextOps.normalize(col(textCol)))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .select(col("__c"), split(col("__w"), "").as("__s"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    // Only the MOST RECENT checkpoint is ever a live lineage root: every
    // generation after checkpoint N roots at N (localCheckpoint truncates
    // lineage, so N's blocks can never recompute from N-1 anyway — keeping
    // ancestors adds zero recoverability), which means N-1 is releasable
    // the moment N materializes eagerly. The old exit-only release pinned
    // O(numMerges/checkpointEvery) full symbol-table copies simultaneously
    // (100 copies at numMerges=1000, checkpointEvery=10) for a bounded
    // 2-generation need. (A localCheckpoint that FAILS mid-materialization
    // can still leak its partial blocks — no handle survives the throw —
    // but that is a failed-job path, not a steady-state leak.)
    var lastCheckpoint: Option[DataFrame] = None
    var done = false
    var i = 0
    try {
    while (i < numMerges && !done) {
      val top = words
        .select(col("__c"), explode(adjacentPairs(col("__s"))).as("__p"))
        .groupBy(col("__p.l").as("__l"), col("__p.r").as("__r"))
        .agg(sum(col("__c")).as("__pc"))
        .orderBy(col("__pc").desc, col("__l").asc, col("__r").asc)
        .limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minPairCount) match {
        case None => done = true
        case Some(row) =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((l, r, c))
          var next = words.select(col("__c"), mergeFold(col("__s"), l, r).as("__s"))
          // localCheckpoint() already materializes AND caches eagerly —
          // layering persist+count on top stored the symbol table twice
          // and ran a redundant job on every checkpointEvery-th iteration
          if ((i + 1) % checkpointEvery == 0) {
            next = next.localCheckpoint() // eager: materialized on return
            lastCheckpoint.foreach(release)
            lastCheckpoint = Some(next)
          } else {
            next = next.persist(StorageLevel.MEMORY_AND_DISK)
            // a failed materialization must release the just-registered
            // cache entry, not leak its partial blocks for the session
            try next.count()
            catch { case t: Throwable => next.unpersist(); throw t }
          }
          // Dataset-level only here: frees persisted generations eagerly;
          // checkpointed ones keep their RDD blocks until exit (above)
          words.unpersist()
          words = next
          i += 1
      }
    }
    // finally, not straight-line: a failed iteration job must not leak the
    // cached symbol table for the session lifetime (kmeans/dsir discipline)
    } finally {
      words.unpersist()
      lastCheckpoint.foreach(release)
    }
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((l, r, c), rank) => (rank.toLong, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Free a symbol-table generation regardless of HOW it was cached:
    * Dataset.unpersist only clears CacheManager entries, which a
    * localCheckpoint'd frame does not have (its plan is a LogicalRDD whose
    * underlying RDD was cached at the RDD level) — without the RDD-level
    * unpersist every checkpointed generation, including the final one,
    * stayed pinned at MEMORY_AND_DISK until GC. */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }

  /** Encode each document's words with a trained merge list: token count
    * per document after applying every merge in rank order. The merge
    * list is a driver-side array (it IS small — that's the point of BPE);
    * application is the same codegen fold, numMerges passes over each
    * word's symbol array. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // each merge nests one transform+fold layer into ONE expression tree:
    // Catalyst's recursive plan transforms overflow the JVM stack at a few
    // thousand nesting levels, so a production-sized merge table (10k-32k)
    // must not be silently accepted and then die at PLAN time with an
    // opaque StackOverflowError. The cap sits well under the observed
    // overflow threshold while accepting everything trainMerges plausibly
    // produces; for real vocabularies tokenize outside the expression layer.
    require(merges.length <= 2000,
      s"tokenCounts: ${merges.length} merges would nest a " +
        s"${merges.length}-layer expression tree and overflow Catalyst's " +
        "recursive planning — this fold is for trained merge tables " +
        "(<= 2000); for production vocabularies tokenize outside the " +
        "expression layer")
    val syms0 = transform(TextOps.words(TextOps.normalize(col(textCol))),
      w => split(w, ""))
    val symsMerged = merges.foldLeft(syms0) { case (s, (l, r)) =>
      transform(s, w => mergeFold(w, l, r))
    }
    df.select(col(idCol),
      aggregate(symsMerged, lit(0L), (acc, w) => acc + size(w).cast("long"))
        .as("n_bpe_tokens"))
  }
}
