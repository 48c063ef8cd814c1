package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed keyword retrieval (BM25) over a document corpus — the
 * "find training docs about X" / retrieval-probe primitive of a corpus
 * pipeline. The reference engine (delta-rs) ships no text search; this is
 * the standard Okapi BM25 construction expressed Spark-first.
 *
 * Scale shape (the part that must survive 100 TB):
 *  - corpus tokens are exploded ONCE and immediately filtered by a
 *    broadcast join against the query vocabulary — the posting list that
 *    survives is |matching tokens|, not |all tokens|;
 *  - term frequencies are one hash aggregation on (doc, term); document
 *    frequencies reuse that aggregated (already shuffled) frame;
 *  - scoring joins the tiny per-term idf and the broadcast query terms
 *    back onto the tf frame — the only other shuffle is the final
 *    per-(query, doc) score aggregation.
 * Nothing is all-pairs and the only driver-side value is the corpus
 * (N, total-token) pair — a single 1-row aggregate.
 *
 * Determinism: per-term contributions are summed in ascending-term order
 * (via sorted-array fold, not float-sum-in-shuffle-order), so the score is
 * a well-defined IEEE value reproducible by any engine — that is what lets
 * the DuckDB oracle replay scores bit-for-bit.
 */
object Search {

  /**
   * BM25 top-k: for each query, the `k` best-scoring documents.
   *
   * Tokenization is [[TextOps.normalize]] + whitespace split on both sides
   * (queries and corpus), matching the dedup family.
   *
   * @param idfMode "lucene" (default): ln((N - df + 0.5)/(df + 0.5) + 1) —
   *                the Lucene/standard BM25+ idf. "rational": the same
   *                fraction WITHOUT the ln. Per term the two are strictly
   *                monotone in df, so per-term ordering is identical; the
   *                rational form exists because ln() is not guaranteed to
   *                round identically across engines, and cross-engine
   *                oracle tests need bit-exact scores.
   * @param k1 term-frequency saturation; default 1.25 (dyadic, so the SQL
   *           literal round-trips exactly — classic 1.2 is fine too when
   *           cross-engine bit-parity is not needed)
   * @param b  length normalization strength (0.75 = classic, dyadic)
   * @return (query_id, doc_id, rnk, n_terms, score)
   */
  def bm25TopK(
      corpus: DataFrame,
      docIdCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.25,
      b: Double = 0.75,
      idfMode: String = "lucene"): DataFrame = {
    require(idfMode == "lucene" || idfMode == "rational",
      s"bm25TopK: unknown idfMode '$idfMode' (lucene | rational)")
    require(k >= 1, "bm25TopK: k must be >= 1")
    // BM25's contract: k1 >= 0, 0 <= b <= 1 — out-of-range values make the
    // length-normalization denominator zero or negative (silently inverted
    // rankings, or DIVIDE_BY_ZERO under Spark 4's default ANSI mode)
    require(k1 >= 0.0, s"bm25TopK: k1 must be >= 0, got $k1")
    require(b >= 0.0 && b <= 1.0, s"bm25TopK: b must be in [0, 1], got $b")

    val docs0 = corpus
      .select(col(docIdCol).as("doc_id"),
        TextOps.words(TextOps.normalize(col(textCol))).as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
    // the N/avgdl aggregate AND the scoring pass both consume the
    // tokenized corpus: evaluate the (possibly expensive or
    // NON-DETERMINISTIC) upstream lineage exactly once through an
    // RDD-level persist the ContextCleaner can reclaim — the
    // Dedup.resolveDocFreqCap discipline (a Dataset.persist would leak one
    // cached corpus per call for the session; a double evaluation could
    // score a different corpus than the one N/avgdl were computed from,
    // shifting every BM25 score). An already-persisted input is used
    // as-is (its cache lifecycle belongs to the caller).
    val docs =
      if (corpus.storageLevel != org.apache.spark.storage.StorageLevel.NONE) docs0
      else {
        val rdd = docs0.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        corpus.sparkSession.createDataFrame(rdd, docs0.schema)
      }

    // Corpus-wide constants: N and avgdl. One 1-row aggregate; the division
    // is a single IEEE op so an external engine recomputing
    // sum(dl)/count(*) lands on the identical double.
    // coalesce: sum() over all-NULL doc lengths (every text NULL) is NULL
    // and getLong throws a bare NPE — degrade to avgdl 0 like an empty
    // corpus of words instead (the dsirWeights/packChunks discipline)
    val statsRow = docs.agg(count(lit(1)),
      coalesce(sum(col("__dl")), lit(0L))).head()
    val nDocs = statsRow.getLong(0)
    require(nDocs > 0, "bm25TopK: empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / nDocs.toDouble

    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(TextOps.words(TextOps.normalize(col(queryTextCol)))))
          .as("term"))

    // vocabulary filter: broadcast the (small) query term set so the
    // exploded corpus postings shrink before any shuffle
    val vocab = broadcast(qterms.select("term").distinct())
    val postings = docs
      .select(col("doc_id"), col("__dl"), explode(col("__ws")).as("term"))
      .join(vocab, Seq("term"))

    // min, not first: first() is explicitly non-deterministic, so corpus
    // rows sharing a doc_id (routine id collisions in scraped data) made
    // the length normalization — and the top-k membership — change between
    // runs. min matches the pinned llm_bm25 DuckDB oracle (min(dl)).
    // Duplicate-id semantics are documented as: tf merges the rows, dl is
    // the SHORTEST row, N still counts rows; dedupe upstream for per-row
    // scoring.
    val tf = postings.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min(col("__dl")).as("dl"))
    // document frequency rides the tf frame (no second pass over postings)
    val dfFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // idf over doubles built from exact integers — op order is part of the
    // cross-engine contract: ((N - df) + 0.5) / (df + 0.5) + 1, ln'd or not
    val rationalIdf =
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    val idf = if (idfMode == "lucene") log(rationalIdf) else rationalIdf

    // per-(query, doc, term) BM25 contribution; k1/b enter as literals
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    val contrib = col("__idf") * (col("tf") * lit(k1 + 1.0)) / denom

    val scored = tf
      .join(broadcast(dfFreq.withColumn("__idf", idf).select("term", "__idf")), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("__w", contrib)

    // deterministic score: fold the contributions in ascending-term order
    // (collect_list order is partition-dependent; the sort fixes it)
    val grouped = scored.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        TextOps.orderedFold(col("term"), col("__w").as("w"))(
          (acc, x) => acc + x("w")).as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    grouped.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "n_terms", "score")
  }
}
