package graft.entries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import graft.table.DeltaTable
import EntryCtx._

/**
 * Driver-contract entries for the training-data-pipeline operators
 * (dedup / similarity / multimodal / text analysis) over the `documents`
 * and `embeddings` testdata tables, each with a DuckDB-expressible oracle
 * where the semantics allow (hash-function-dependent ops get rows-only
 * checks plus ScalaTest coverage).
 */
object LlmEntries {

  /** documents with injected near-duplicates: every 10th doc reappears with
    * a shifted id and three extra words — gives MinHash verification real
    * positives whose expected answer DuckDB can recompute exactly. */
  /** Once-per-dataset planted-fixture guards: the non-emptiness of a
    * planted subset is invariant per sfDir, so each check runs ONE Spark
    * job per gate run, not one per consuming entry. */
  private val fixtureChecked =
    scala.collection.concurrent.TrieMap[String, Unit]()
  private def requirePlanted(key: String, df: => DataFrame, what: String): Unit =
    fixtureChecked.getOrElseUpdate(key, {
      // no planted positives ⇒ the consuming entries degenerate to "found
      // nothing" on both engines — green with the detectors never exercised
      require(df.limit(1).count() == 1, s"$what is empty at this SF")
    })

  // Planted-copy id offsets derived from the DATA (max+1), never fixed
  // literals: the sf1 probe proved the literal class collides when a larger
  // SF's ids cross them (merge_upsert's +1M vs 1.5M keys at sf1). Cached
  // per sfDir; the oracles replay the same value via a scalar subquery
  // (SELECT max(doc_id) + 1 FROM documents).
  // lazy holders, not raw values: TrieMap.getOrElseUpdate is not atomic
  // for the by-name computation, so two entries resolving one sfDir's
  // offset concurrently would both run the max() Spark job (same value,
  // duplicated work) — putIfAbsent of a holder makes exactly one compute
  private val offsetCache =
    scala.collection.concurrent.TrieMap[String, () => Long]()
  private def cachedOffset(key: String)(compute: => Long): Long = {
    val holder = new (() => Long) {
      lazy val value: Long = compute
      def apply(): Long = value
    }
    val h = offsetCache.putIfAbsent(key, holder).getOrElse(holder)
    // failure must not poison the cache: the installed holder captures the
    // FIRST caller's closure (and its SparkSession) — retrying through it
    // after e.g. a stopped session would fail forever. Remove-on-failure
    // lets the next caller install a holder over ITS OWN live session.
    try h()
    catch { case e: Throwable => offsetCache.remove(key, h); throw e }
  }
  private def docOffset(s: SparkSession, d: String): Long =
    cachedOffset(s"$d#doc")(
      pq(s, d, "documents").agg(max("doc_id")).head().getLong(0) + 1)
  private def vecOffset(s: SparkSession, d: String): Long =
    cachedOffset(s"$d#vec")(
      pq(s, d, "embeddings").agg(max("vec_id")).head().getLong(0) + 1)
  private val docOffSql = "(SELECT max(doc_id) + 1 FROM documents)"
  private val vecOffSql = "(SELECT max(vec_id) + 1 FROM embeddings)"

  private def corpusWithNearDups(s: SparkSession, d: String): DataFrame = {
    val docs = docsDelta(s, d).select("doc_id", "text")
    val mut = docs.filter("doc_id % 10 = 0")
      .withColumn("doc_id", col("doc_id") + docOffset(s, d))
      .withColumn("text", concat(col("text"), lit(" zz extra token")))
    requirePlanted(s"$d#neardups", mut,
      "corpusWithNearDups: planted near-duplicate set")
    docs.unionByName(mut)
  }

  /** One shingle-set CTE body (trigram shingles with the short-document
    * fallback) over `src`'s (doc_id, text) — ONE definition for the seven
    * oracle copies that previously pasted it verbatim; a shingling-contract
    * change now edits one place (the mixTokTotSql/md5Fold32 lesson). */
  private def shingleSelect(src: String): String =
    "SELECT doc_id, CASE WHEN len(w) >= 3 THEN list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) ELSE [array_to_string(w, ' ')] END AS s " +
      s"FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN [] ELSE list_filter(string_split_regex(trim(text), '\\s+'), w -> w != '') END AS w FROM $src) t"

  /** DuckDB VALUES rendering of the 16x64 JL sign matrix — ONE definition
    * for the two oracles (random_projection, ann_projected) that must agree
    * on the same projection (the duckBucketExpr precedent for hyperplanes). */
  private def signMatrixValues: String =
    graft.llm.Similarity.signMatrix(16, 64).zipWithIndex.map { case (r, j) =>
      r.map(v => if (v > 0) "1.0" else "-1.0")
        .mkString(s"($j, [", ", ", "])")
    }.mkString(", ")

  private val corpusSql =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL
       |SELECT doc_id + $docOffSql, text || ' zz extra token' FROM documents WHERE doc_id % 10 = 0""".stripMargin

  private def docsDelta(s: SparkSession, d: String): DataFrame =
    DeltaTable.forPath(s, sharedDelta(s, d, "documents")).toDF

  private def embDelta(s: SparkSession, d: String): DataFrame =
    DeltaTable.forPath(s, sharedDelta(s, d, "embeddings")).toDF

  /** Cross-engine-reproducible 64-bit shingle hash: the first 16 hex chars
    * of md5 assembled from two 32-bit halves (conv of >16 hex digits would
    * overflow a signed long). Spark's md5 and DuckDB's md5 agree, so the
    * oracle can replay the exact SimHash fingerprints. */
  private def md5Hash64(c: Column): Column = {
    val m = md5(c)
    val hi = conv(substring(m, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(m, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Shared DuckDB preamble of the mixture oracles (llm_mixture_sample /
    * llm_epoch_mixture / llm_temperature_mixture): per-doc token estimates
    * + per-source totals over the listed sources — ONE definition so the
    * three oracles cannot drift (this block already needed the same
    * coalesce/clamp fix applied twice). */
  private def mixTokTotSql(srcs: Seq[String]): String = {
    val in = srcs.map(s => s"'$s'").mkString(", ")
    raw"""WITH tok AS (
         |  SELECT doc_id, source,
         |         CAST(coalesce(list_sum([CAST(ceil(length(w) / 4.0) AS BIGINT) FOR w IN ws]), 0) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id, source,
         |          CASE WHEN length(trim(text)) = 0 THEN []
         |               ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
         |        FROM documents WHERE source IN ($in))
         |),
         |tot AS (SELECT source, SUM(n_tokens) AS t FROM tok GROUP BY source)""".stripMargin
  }

  /** ONE source list for the llm_temperature_mixture entry, shared by the
    * Scala call, the oracle's wsum fold and its totals preamble — editing
    * one of the three sites without the others would silently desync the
    * Spark side from its oracle (the fold order over exactly these sources
    * is part of the replay contract). */
  private val tempMixSrcs = Seq("src1", "src2", "src3", "src4")

  /** DuckDB replay of [[graft.llm.Curation.sampleCond]]'s salted md5 draw
    * key (NULL ids hash as '', like the Spark side). `qual` prefixes the
    * doc_id when the surrounding query aliases the table. */
  private def mdDrawSql(qual: String, salt: String): String =
    s"substr(${md5KeySql(qual, salt)}, 1, 8)"

  /** The un-truncated salted md5 draw key (shuffle-shards needs the full
    * hash as a sort key; everything else compares the 8-char prefix). */
  private def md5KeySql(qual: String, salt: String): String =
    s"md5(coalesce(CAST(${qual}doc_id AS VARCHAR), '') || ':$salt')"

  /** DuckDB keep-condition of [[graft.llm.Curation.sampleCond]] — ONE
    * definition for every doc-keyed fractional draw (the stratified-sample
    * and curation-pipeline oracles previously inlined their own copies of
    * the draw key, hidden from a future contract change). */
  private def docDrawCond(salt: String, frac: Double): String =
    s"${mdDrawSql("", salt)} < '${graft.llm.Curation.hexThreshold(frac)}'"

  /** Same rule keyed by the near-dup CLUSTER column (the leak-free split
    * sites; clusters are never NULL in the recursive-CTE output). */
  private def clusterDrawCond(salt: String, cum: Double): String =
    s"substr(md5(CAST(cluster AS VARCHAR) || ':$salt'), 1, 8) < '${graft.llm.Curation.hexThreshold(cum)}'"

  /** DuckDB replay of [[graft.llm.Curation.hexThreshold]] for a [0,1)
    * fraction expression — including the 4294967295 clamp (a fraction
    * whose product rounds to 2^32 would otherwise print NINE hex chars
    * and collapse the keep set). */
  private def thrSql(fracExpr: String): String =
    s"printf('%08x', LEAST(CAST(floor(($fracExpr) * 4294967296.0) AS BIGINT), 4294967295))"

  /** DuckDB mirror of [[graft.llm.TextOps.normalize]] — ONE definition so
    * the eight oracle call sites cannot drift from the Spark side. */
  // \x{000B} (VT): Java's \s includes it, RE2's does not — without the
  // explicit escape the two engines diverge on VT-bearing text (pinned
  // empirically in round 10: 'a\x0Bb' → Spark 'a b', bare-RE2 'ab')
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s\\p{Z}\\x{0085}\\x{000B}]', '', 'g'), '[\\s\\p{Z}\\x{0085}\\x{000B}]+', ' ', 'g'))"
  private val fpSql = s"md5($normSql)"

  /** DuckDB value of hex digit `i` (1-indexed) of the md5-hex column
    * `hexVar` — ONE definition for every bucket-hash oracle. */
  private def md5Dig(hexVar: String, i: Int): String =
    s"(strpos('0123456789abcdef', substr($hexVar, $i, 1)) - 1)"

  /** DuckDB fold of the first 32 md5 bits (8 hex digits), matching the
    * Spark side's `conv(substring(<hex>, 1, 8), 16, 10)`. The four
    * bucket-hash oracles (hash features, shuffle shards, DSIR, linear
    * quality) share THIS definition so a hash-contract change cannot
    * desynchronize one of them from its Spark implementation — the exact
    * drift class the 16→32-bit widening had to fix in three places. */
  private def md5Fold32(hexVar: String): String =
    (2 to 8).foldLeft(md5Dig(hexVar, 1))(
      (acc, i) => s"($acc * 16 + ${md5Dig(hexVar, i)})")

  /** DuckDB replay of the md5Hash64-based SimHash pipeline as a brute-force
    * oracle: same shingles, same md5-derived bits, same sign-aggregate; the
    * pigeonhole banding in Dedup.simhashNearDups is lossless for
    * hamming <= 3 (3 flipped bits cannot touch all four 16-bit chunks), so
    * the all-pairs version is the exact expected answer. */
  private def simhashOracleSql: String = {
    // bit j of the 64-bit hash = bit (j%4) of the hex digit at 1-indexed
    // position 16 - j/4 in the md5 string (big-endian numeric value).
    val sums = (0 until 64).map { j =>
      val pos = 16 - j / 4
      val b = j % 4
      s"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, $pos, 1)) - 1) >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val fpList = (0 until 64).map(j => s"CASE WHEN s$j > 0 THEN 1 ELSE 0 END")
      .mkString("[", ", ", "]")
    s"""WITH corpus AS ($corpusSql),
       |sh AS (
       |  SELECT doc_id, unnest(s) AS s FROM (${shingleSelect("corpus")}) t0
       |),
       |hs AS (SELECT doc_id, md5(s) AS m FROM sh),
       |bits AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fpList AS f FROM bits)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(list_sum([CASE WHEN a.f[k] <> b.f[k] THEN 1 ELSE 0 END FOR k IN range(1, 65)]) AS BIGINT) AS hamming
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id) p
       |WHERE hamming <= 3""".stripMargin
  }

  /** DuckDB replay of Multimodal.fakeDecode: per-dim integer byte sums over
    * hex(encode(text)) divided by 256 — a power-of-two divide, so fp32
    * (Spark) and fp64 (DuckDB) agree bit-for-bit after widening. */
  private def multimodalFeaturesOracle(dim: Int): String = {
    def byteExpr(i: String) =
      s"(strpos('0123456789ABCDEF', substr(hx, 2*$i+1, 1)) - 1) * 16 + (strpos('0123456789ABCDEF', substr(hx, 2*$i+2, 1)) - 1)"
    val fcols = (0 until dim).map { j =>
      s"CAST(COALESCE(list_sum([${byteExpr("i")} FOR i IN range(length(hx) // 2) IF i % $dim = $j]), 0) AS DOUBLE) / 256 AS f$j"
    }.mkString(", ")
    s"""SELECT doc_id, $fcols
       |FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents) t""".stripMargin
  }

  /** Shared recursive-CTE near-dup clustering pipeline over a CTE named
    * `corpus(doc_id, text, …)` — ONE definition (the normSql precedent) so
    * the split/dataset-card oracles cannot drift from each other. Ends with
    * `clusters(doc_id, cluster)`. Interpolated AFTER stripMargin-style
    * margins: these lines carry no margin character on purpose. */
  private val shingleClusterCtes =
    s"""sh AS (
  ${shingleSelect("corpus")}
),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) p
  WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
clusters AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node)"""

  /** DuckDB-side LSH bucket id: same hyperplanes, same sign rule. */
  private def duckBucketExpr(vecExpr: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (h, p) =>
      val lits = h.map(v => java.math.BigDecimal.valueOf(v).toPlainString).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vecExpr, $lits) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val planes = Similarity.hyperplanes(nBits = 4, dim = 64)

  /** Shared expected answer for the LSH-bucketed ANN entries (on-the-fly
    * buckets and Delta-partition-pruned buckets MUST agree). */
  private lazy val lshOracleSql: String = {
    val bucket = duckBucketExpr("v", planes)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 8),
       |s AS (
       |  SELECT q.qid, b.vec_id,
       |         list_dot_product(q.qv, b.v) /
       |         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))) AS cos
       |  FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.qid)
       |SELECT qid AS query_id, vec_id AS neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
       |FROM s QUALIFY rnk <= 10""".stripMargin
  }

  /** Expected answer for BOTH cross-corpus near-dup deployments (live
    * recompute and persisted-signature table) — they must agree. */
  private val crossNearDupOracleSql: String =
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |shard AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL SELECT doc_id + $docOffSql, text || ' zz extra token'
         |    FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 6 = 1),
         |shc AS (
         |  ${shingleSelect("corpus")}),
         |shs AS (
         |  ${shingleSelect("shard")}),
         |pairs AS (
         |  SELECT b.doc_id AS shard_id, a.doc_id AS corpus_id,
         |         len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
         |  FROM shc a CROSS JOIN shs b)
         |SELECT shard_id, corpus_id,
         |       CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
         |FROM pairs
         |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5""".stripMargin

  val entries: Seq[Entry] = Seq(

    // ---- text analysis ----------------------------------------------------

    Entry("llm_textstats", (s, d) =>
      TextOps.textStats(docsDelta(s, d), "doc_id", "text"),
      Some(
        """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          |       CAST(len(ws) AS BIGINT) AS n_words,
          |       CAST(coalesce(list_sum([CAST(ceil(length(w) / 4.0) AS BIGINT) FOR w IN ws]), 0) AS BIGINT) AS n_tokens
          |FROM (SELECT doc_id, text,
          |        CASE WHEN length(trim(text)) = 0 THEN []
          |             ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
          |      FROM documents)""".stripMargin)),

    // Unicode normalization (corpus cleaning stage 1) via the native
    // TextNormalize expression. documents.text is ASCII, so a fixed
    // unicode suffix (precomposed accents, an en-dash, the ﬁ ligature, and
    // an o + COMBINING DIAERESIS pair) is appended to give NFC composition
    // and accent folding real work; DuckDB's utf8proc-backed
    // nfc_normalize/strip_accents replay it byte-for-byte (accented chars
    // in play all fold to ASCII, sidestepping the engines' differing
    // treatment of non-decomposable compatibility characters).
    Entry("llm_normalize", (s, d) => {
      val suffix = " Çafé–ﬁ Nöel"
      val txt = concat(col("text"), lit(suffix))
      docsDelta(s, d).select(col("doc_id"),
        graft.functions.TextNormalize.normalizeText(txt, "nfc").as("norm_nfc"),
        lower(graft.functions.TextNormalize.normalizeText(txt, "strip_accents"))
          .as("norm_folded"))
    }, Some(
      """SELECT doc_id,
        |       nfc_normalize(text || ' Çafé–ﬁ No' || chr(776) || 'el') AS norm_nfc,
        |       lower(strip_accents(nfc_normalize(text || ' Çafé–ﬁ No' || chr(776) || 'el'))) AS norm_folded
        |FROM documents""".stripMargin)),

    // PII redaction over documents with deterministically seeded PII (the
    // corpus itself is synthetic prose; the seeds give every category real
    // positives whose redacted text DuckDB reproduces byte-for-byte). The
    // patterns live in the Java/RE2 common dialect subset and are applied
    // in a defined order, so the sequential CTE chain is an exact replay.
    Entry("llm_pii_redact", (s, d) => {
      val seeded = docsDelta(s, d).select(col("doc_id"), col("text"))
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"),
            lit(" reach me at jane.doe+spam@mail-host.example.com or 555-867-5309")))
          .when(col("doc_id") % 11 === 0, concat(col("text"),
            lit(" card 4111 1111 1111 1111 ssn 219-09-9999 ip 10.0.0.254")))
          .otherwise(col("text")))
      TextOps.redactPii(seeded, "text")
        .select(col("doc_id"), col("n_email"), col("n_card"), col("n_ssn"),
          col("n_phone"), col("n_ipv4"), col("text").as("text_redacted"))
    },
      Some(
        """WITH seeded AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 7 = 0 THEN text || ' reach me at jane.doe+spam@mail-host.example.com or 555-867-5309'
          |              WHEN doc_id % 11 = 0 THEN text || ' card 4111 1111 1111 1111 ssn 219-09-9999 ip 10.0.0.254'
          |              ELSE text END AS t
          |  FROM documents),
          |s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
          |              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t FROM seeded),
          |s2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all(t, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b')) AS BIGINT) AS n_card,
          |              regexp_replace(t, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b', '<CARD>', 'g') AS t FROM s1),
          |s3 AS (SELECT doc_id, n_email, n_card, CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
          |              regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t FROM s2),
          |s4 AS (SELECT doc_id, n_email, n_card, n_ssn, CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
          |              regexp_replace(t, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS t FROM s3),
          |s5 AS (SELECT doc_id, n_email, n_card, n_ssn, n_phone, CAST(len(regexp_extract_all(t, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ipv4,
          |              regexp_replace(t, '\b\d{1,3}(\.\d{1,3}){3}\b', '<IPV4>', 'g') AS t FROM s4)
          |SELECT doc_id, n_email, n_card, n_ssn, n_phone, n_ipv4, t AS text_redacted FROM s5""".stripMargin)),

    Entry("llm_quality", (s, d) => {
      val t = col("text")
      docsDelta(s, d).select(col("doc_id"),
        TextOps.meanWordLen(t).as("mean_word_len"),
        TextOps.digitRatio(t).as("digit_ratio"))
    }, Some(
      """SELECT doc_id,
        |       CASE WHEN len(ws) = 0 THEN 0.0
        |            ELSE list_sum([CAST(length(w) AS DOUBLE) FOR w IN ws])
        |                   / CAST(len(ws) AS DOUBLE) END AS mean_word_len,
        |       CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |                   / CAST(length(text) AS DOUBLE) END AS digit_ratio
        |FROM (SELECT doc_id, text,
        |        CASE WHEN length(trim(text)) = 0 THEN []
        |             ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
        |      FROM documents)""".stripMargin)),

    Entry("llm_fingerprint", (s, d) =>
      docsDelta(s, d).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp")),
      Some(s"SELECT doc_id, $fpSql AS fp FROM documents")),

    Entry("llm_langid", (s, d) =>
      TextOps.withLangId(docsDelta(s, d).select("doc_id", "text"),
        "text", "lang_pred").select("doc_id", "lang_pred"),
      Some {
        val norm = normSql
        val scores = TextOps.langMarkers.map { case (lang, ms) =>
          val list = ms.map(m => s"'$m'").mkString("(", ", ", ")")
          lang -> s"len(list_filter(string_split($norm, ' '), w -> w IN $list))"
        }
        val best = s"greatest(${scores.map(_._2).mkString(", ")})"
        val cases = scores.map { case (lang, sc) =>
          s"WHEN $sc = __best AND __best > 0 THEN '$lang'"
        }.mkString(" ")
        s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
           |FROM (SELECT doc_id, text, $best AS __best FROM documents) t""".stripMargin
      }),

    // ---- dedup ------------------------------------------------------------

    Entry("llm_exact_dedup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text", "lang")
      // data-derived offset: a fixed +10000 collides with original ids on
      // any corpus of >10000 docs (1-row driver aggregate, not data-plane)
      val off = docs.agg(max(col("doc_id")).cast("long")).head().getLong(0) + 1L
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(off)))
      Dedup.exactKeepMin(doubled, "doc_id", Seq("text")).select("doc_id", "lang")
    },
      // keep-min per distinct text over the doubled corpus — NOT
      // `SELECT doc_id, lang FROM documents`: that shortcut assumed every
      // original text is unique, which held at sf0.001/0.01 but not sf0.1
      // (8 native duplicate texts in the driver's 5000-doc table; caught
      // by the round-11 full-gate sf0.1 probe — Spark's 4992 was correct,
      // the oracle's 5000 was wrong)
      Some(
        """WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
          |doubled AS (
          |  SELECT doc_id, text, lang FROM documents
          |  UNION ALL
          |  SELECT doc_id + (SELECT o FROM off) AS doc_id, text, lang FROM documents)
          |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, min_by(lang, doc_id) AS lang
          |FROM doubled GROUP BY text""".stripMargin)),

    Entry("llm_neardup_minhash", (s, d) =>
      Dedup.minhashNearDups(corpusWithNearDups(s, d), "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.5)
        .select("id_a", "id_b"),
      Some(
        s"""WITH corpus AS ($corpusSql),
           |sh AS (
           |  ${shingleSelect("corpus")}
           |),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |         len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |)
           |SELECT id_a, id_b FROM pairs
           |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5""".stripMargin)),

    // dedup clustering: verified near-dup pairs → connected components
    // (alternating large-star/small-star) → canonical = min id per cluster.
    // Oracle: the same exact all-pairs Jaccard pair list as the minhash
    // entry, clustered by a recursive min-label CTE — reachability with a
    // UNION (set) recursion terminates, and min over all reachable labels
    // is exactly the component minimum.
    Entry("llm_dedup_clusters", (s, d) => {
      val corpus = corpusWithNearDups(s, d)
      val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.5)
      Dedup.dedupClusters(corpus.select("doc_id"), "doc_id", pairs)
        .select(col("doc_id"), col("cluster"), col("is_canonical"))
    },
      Some(
        s"""WITH RECURSIVE corpus AS ($corpusSql),
           |sh AS (
           |  ${shingleSelect("corpus")}
           |),
           |pairs AS (
           |  SELECT id_a, id_b FROM (
           |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |           len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
           |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id) p
           |  WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5
           |),
           |edges AS (
           |  SELECT id_a AS u, id_b AS v FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs
           |),
           |reach(node, lbl) AS (
           |  SELECT doc_id, doc_id FROM corpus
           |  UNION
           |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
           |)
           |SELECT node AS doc_id, min(lbl) AS cluster,
           |       node = min(lbl) AS is_canonical
           |FROM reach GROUP BY node""".stripMargin)),

    // candidate generation via the inverted shingle index is complete (any
    // pair with jaccard > 0 shares a shingle; df cap far above corpus df
    // here), so brute-force all-pairs Jaccard in DuckDB is the exact
    // expected output — including the jaccard value (IEEE division of
    // exact integer counts agrees bit-for-bit across engines).
    Entry("llm_ngram_jaccard", (s, d) => {
      // explicit corpus-appropriate cap (far above every shingle df in the
      // test corpus) — the library default is corpus-proportional and this
      // entry's oracle is exact brute-force, so behavior stays pinned
      val out = Dedup.ngramJaccardNearDups(corpusWithNearDups(s, d), "doc_id", "text",
        shingleSize = 3, threshold = 0.5, maxDocFreq = 100000)
        .select("id_a", "id_b", "jaccard")
      // "inverted index, no all-pairs" is invisible to the oracle (the
      // brute-force DuckDB answer is identical by construction): pin the
      // physical shape — a regression to crossJoin+filter shows up as a
      // nested-loop/cartesian join in the plan
      val plan = out.queryExecution.sparkPlan.toString
      require(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        "llm_ngram_jaccard: candidate generation must be an equi-join over " +
          "the inverted shingle index, not an all-pairs join")
      out
    },
      Some(
        s"""WITH corpus AS ($corpusSql),
           |sh AS (
           |  ${shingleSelect("corpus")}
           |),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |         len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |)
           |SELECT id_a, id_b,
           |       CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
           |FROM pairs
           |WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5""".stripMargin)),

    // winnowing (MOSS) fingerprint near-dups: min-of-window over ordered
    // k-gram md5s. The hash IS the md5 hex string, so DuckDB's list_min
    // replays fingerprint selection byte-for-byte — the oracle is the
    // exact brute-force expected output, including the shared counts.
    Entry("llm_winnow", (s, d) =>
      Dedup.winnowNearDups(corpusWithNearDups(s, d), "doc_id", "text",
        k = 4, window = 4, minShared = 5, maxDocFreq = 100000),
      Some(
        s"""WITH corpus AS ($corpusSql),
           |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN [] ELSE list_filter(string_split_regex(trim(text), '\\s+'), w -> w != '') END AS ws FROM corpus),
           |g AS (SELECT doc_id, CASE WHEN len(ws) < 4 THEN [] ELSE [md5(array_to_string(ws[i:i+3], ' ')) FOR i IN range(1, len(ws) - 2)] END AS hs FROM w),
           |f0 AS (SELECT doc_id, unnest(
           |         CASE WHEN len(hs) = 0 THEN []
           |              WHEN len(hs) < 4 THEN [list_min(hs)]
           |              ELSE list_distinct([list_min(hs[i:i+3]) FOR i IN range(1, len(hs) - 2)]) END) AS fp
           |       FROM g),
           |f AS (SELECT DISTINCT doc_id, fp FROM f0)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared
           |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |GROUP BY 1, 2
           |HAVING count(*) >= 5""".stripMargin)),

    // full oracle: md5-derived hash lets DuckDB replay the exact
    // fingerprints; the banded join is provably lossless at hamming<=3, so
    // brute-force all-pairs in DuckDB is the precise expected output.
    // (xxhash64 production default stays covered by LlmSpec.)
    Entry("llm_neardup_simhash", (s, d) =>
      Dedup.simhashNearDups(corpusWithNearDups(s, d), "doc_id", "text",
        hashFn = md5Hash64)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming")),
      Some(simhashOracleSql)),

    // ---- similarity search ------------------------------------------------

    Entry("llm_ann_topk", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.cosineTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id", "rnk")
    }, Some(
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (
        |  SELECT qid, vec_id,
        |         list_dot_product(qv, cv) /
        |         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        |  FROM q, c WHERE vec_id <> qid)
        |SELECT qid AS query_id, vec_id AS neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        |FROM s QUALIFY rnk <= 10""".stripMargin)),

    Entry("llm_ann_lsh", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.lshTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding",
        k = 10, nBits = 4, dim = 64)
        .select("query_id", "neighbor_id", "rnk")
    }, Some(lshOracleSql)),

    // the "persist the buckets" deployment of sign-LSH ANN: embeddings
    // written ONCE as a Delta table PARTITIONED BY bucket; each query
    // batch reads only its buckets' partitions (the engine's partition
    // pruning composed with the LSH math — corpus-linear → touched-
    // partitions-linear). Same expected answer as llm_ann_lsh.
    Entry("llm_ann_delta_pruned", (s, d) => {
      val emb = embDelta(s, d)
      // bucketed table built once per (sfDir) and reused across
      // invocations — same shared-table pattern as events_delta
      val dir = EntryCtx.shared2.getOrElseUpdate(s"$d#emb_bucketed", {
        val dd = tempDir("annp")
        // one SEEDED sentinel partition (bucket 999 — outside the 4-bit
        // hash range, so no query can ever select it): guarantees a
        // populated partition outside every query set, which keeps the
        // pruning assertion below live at EVERY scale factor instead of
        // hard-failing fixtures whose queries happen to cover all real
        // buckets. Never joined (bucket-equality against real hashes) and
        // absent from the oracle's raw embeddings table.
        val bucketed = emb
          .withColumn("bucket", Similarity.bucketId(col("embedding"), planes))
          .unionByName(emb.limit(1)
            .withColumn("vec_id", lit(-1L))
            .withColumn("bucket", lit(999L)))
        DeltaTable.write(s, bucketed, dd, partitionBy = Seq("bucket"))
        dd
      })
      val t = DeltaTable.forPath(s, dir)
      val queries = emb.filter("vec_id < 8")
      val qb = queries
        .select(Similarity.bucketId(col("embedding"), planes).as("b"))
        .distinct().collect().map(_.getLong(0))
      require(qb.nonEmpty, "no query buckets")
      val slice = t.scanWhere(s"bucket IN (${qb.mkString(",")})")
      // the entry's claim IS the pruning: the seeded sentinel partition
      // lies outside every possible query set, so the scan must always
      // read strictly fewer files than the table holds
      require(slice.inputFiles.length < t.files.size,
        s"partition pruning did not occur: ${slice.inputFiles.length} of " +
          s"${t.files.size} files read for buckets ${qb.toSeq.sorted}")
      Similarity.bucketedTopK(slice, queries, "vec_id", "embedding",
        "bucket", planes, k = 10)
        .select("query_id", "neighbor_id", "rnk")
    }, Some(lshOracleSql)),

    // IVF ANN: one-shot coarse quantizer (first-8 vectors as centroids),
    // shuffle-free cell assignment, nProbe=2 probed cells per query. DuckDB
    // re-derives the identical quantizer relationally (cell = argmax
    // centroid cosine, ties to the lowest centroid id on both sides).
    Entry("llm_ann_ivf", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.ivfTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding",
        k = 10, nCells = 8, nProbe = 2)
        .select("query_id", "neighbor_id", "rnk")
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |x AS (SELECT e.vec_id, e.v, c.cid,
        |        list_dot_product(e.v, c.cv) /
        |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
        |      FROM e CROSS JOIN c),
        |r AS (SELECT vec_id, v, cid,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |      FROM x),
        |cells AS (SELECT vec_id, v, cid FROM r WHERE rn = 1),
        |probes AS (SELECT vec_id, v, cid FROM r WHERE rn <= 2 AND vec_id < 8),
        |s AS (SELECT p.vec_id AS qid, t.vec_id AS nid,
        |        list_dot_product(p.v, t.v) /
        |        (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(t.v, t.v))) AS cos
        |      FROM probes p JOIN cells t ON p.cid = t.cid AND t.vec_id <> p.vec_id)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rnk
        |FROM s QUALIFY rnk <= 10""".stripMargin)),

    // embedding-cosine near-dup: LSH-bucketed candidate join + exact verify.
    // Doubled corpus (scaled copies, cosine exactly 1.0) provides known
    // positives; scaling by 2 is FP-exact so both engines agree bit-for-bit.
    Entry("llm_embedding_neardup", (s, d) => {
      val emb = embDelta(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val mut = emb.select((col("vec_id") + vecOffset(s, d)).as("vec_id"),
        transform(col("v"), x => x * lit(2.0)).as("v"))
      Similarity.cosineNearDups(emb.unionByName(mut), "vec_id", "v",
        threshold = 0.95, nBits = 4, dim = 64)
        .select("id_a", "id_b")
    }, Some {
      val bucket = duckBucketExpr("v", planes)
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corpus AS (
         |  SELECT vec_id, v FROM base
         |  UNION ALL SELECT vec_id + $vecOffSql, [x * 2 FOR x IN v] FROM base),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM corpus),
         |p AS (
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |         list_dot_product(a.v, c.v) /
         |         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
         |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |SELECT id_a, id_b FROM p WHERE cos >= 0.95""".stripMargin
    }),

    // SemDeDup (semantic dedup over embeddings): sign-LSH-bucketed cosine
    // pairs at a high threshold -> connected components -> smallest id per
    // semantic cluster is canonical. The scaled mutants (2·v) are exact
    // cosine-1 duplicates in BOTH engines (scaling by a power of two
    // commutes with IEEE rounding), so the expected clusters are exact.
    Entry("llm_semdedup", (s, d) => {
      val emb = embDelta(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val mut = emb.select((col("vec_id") + vecOffset(s, d)).as("vec_id"),
        transform(col("v"), x => x * lit(2.0)).as("v"))
      val corpus = emb.unionByName(mut)
      val pairs = Similarity.cosineNearDups(corpus, "vec_id", "v",
        threshold = 0.95, nBits = 4, dim = 64)
      Dedup.dedupClusters(corpus.select("vec_id"), "vec_id", pairs)
        .select(col("vec_id"), col("cluster"), col("is_canonical"))
    }, Some {
      val bucket = duckBucketExpr("v", planes)
      s"""WITH RECURSIVE base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corpus AS (
         |  SELECT vec_id, v FROM base
         |  UNION ALL SELECT vec_id + $vecOffSql, [x * 2 FOR x IN v] FROM base),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM corpus),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, c.vec_id AS id_b
         |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
         |  WHERE list_dot_product(a.v, c.v) /
         |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) >= 0.95),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT vec_id, vec_id FROM corpus
         |  UNION
         |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v)
         |SELECT node AS vec_id, min(lbl) AS cluster,
         |       node = min(lbl) AS is_canonical
         |FROM reach GROUP BY node""".stripMargin
    }),

    // ---- multimodal binary columns ----------------------------------------

    Entry("llm_multimodal_meta", (s, d) => {
      val withP = Multimodal.withPayload(docsDelta(s, d), "text")
      Multimodal.payloadMeta(withP, "doc_id", "payload")
    }, Some(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents""".stripMargin)),

    // frame sampling over the opaque payload: codegen'd explode+substr+hex;
    // oracle slices the hex of the blob (byte [o, o+L) = hex chars
    // [2o+1, 2o+2L]) since DuckDB cannot substring BLOBs directly.
    Entry("llm_multimodal_frames", (s, d) => {
      val withP = Multimodal.withPayload(docsDelta(s, d), "text")
      Multimodal.frameSample(withP, "doc_id", "payload", nFrames = 4, frameSize = 16)
    }, Some(
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       substring(hex(encode(text)),
        |                 CAST(2 * floor(f * octet_length(encode(text)) / 4) + 1 AS INT),
        |                 32) AS frame_hex
        |FROM documents, range(4) t(f)""".stripMargin)),

    // nearest-neighbor byte resample (fixed k taps — the resize shape)
    Entry("llm_multimodal_resize", (s, d) => {
      val withP = Multimodal.withPayload(docsDelta(s, d), "text")
      Multimodal.resampleHex(withP, "doc_id", "payload", k = 8)
    }, Some {
      val parts = (0 until 8).map(j =>
        s"substring(hx, CAST(2 * floor($j * n / 8) + 1 AS INT), 2)").mkString(" || ")
      s"""SELECT doc_id, $parts AS resized_hex
         |FROM (SELECT doc_id, hex(encode(text)) AS hx,
         |             octet_length(encode(text)) AS n FROM documents) t""".stripMargin
    }),

    // mapPartitions batch transform with a stubbed codec. The entry projects
    // one double column per dim (the harness can't sort/hash array cells) and
    // carries a full oracle: fakeDecode is deterministic byte math.
    Entry("llm_multimodal_features", (s, d) => {
      val withP = Multimodal.withPayload(docsDelta(s, d), "text")
      val feats = Multimodal.extractFeatures(withP, "doc_id", "payload", dim = 8)
      feats.select(col("doc_id") +: (0 until 8).map(j =>
        element_at(col("features"), j + 1).cast("double").as(s"f$j")): _*)
    }, Some(multimodalFeaturesOracle(8))),

    // deterministic stratified sampling (data-mixing ratios): salted-md5
    // hex-threshold selection, reproducible on any cluster layout; the
    // oracle replays the identical md5 prefix comparison
    Entry("llm_stratified_sample", (s, d) =>
      graft.llm.Curation.stratifiedSample(docsDelta(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.25), default = 0.1, salt = "mix1")
        .select("doc_id", "lang"),
      Some(
        s"""SELECT doc_id, lang FROM documents
           |WHERE CASE WHEN lang = 'en' THEN ${docDrawCond("mix1", 0.5)}
           |           WHEN lang = 'de' THEN ${docDrawCond("mix1", 0.25)}
           |           ELSE ${docDrawCond("mix1", 0.1)} END""".stripMargin)),

    // domain-mixture sampling to a token budget: per-domain keep rates are
    // DATA-DEPENDENT (budget × weight / domain token total), so the oracle
    // recomputes them in SQL. Weights are dyadic rationals summing to
    // exactly 1.0, so the Scala-side weight sum and the SQL literals are
    // IEEE-identical no matter the map iteration order, and the md5-draw
    // threshold (floor(r·2³²) as 8 hex chars) matches digit-for-digit.
    Entry("llm_mixture_sample", (s, d) => {
      val docs = docsDelta(s, d).select(col("doc_id"), col("source"), col("text"))
        .withColumn("n_tokens", TextOps.tokenEstimate(col("text")))
      graft.llm.Curation.mixtureSample(docs, "doc_id", "source", col("n_tokens"),
        Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.125, "src4" -> 0.125),
        tokenBudget = 3000, salt = "mix")
        .select("doc_id", "source", "n_tokens")
    },
      Some(
        s"""${mixTokTotSql(Seq("src1", "src2", "src3", "src4"))},
           |rates AS (
           |  SELECT source,
           |         CASE WHEN t <= 0 THEN 1.0 ELSE LEAST(1.0, CAST(3000 AS DOUBLE) * (CASE source WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.125 ELSE 0.125 END / 1.0) / CAST(t AS DOUBLE)) END AS r
           |  FROM tot)
           |SELECT k.doc_id, k.source, k.n_tokens
           |FROM tok k JOIN rates USING (source)
           |WHERE r >= 1.0 OR ${mdDrawSql("k.", "mix")} < ${thrSql("r")}""".stripMargin)),

    // epoch-repeating mixture (the upsampling half of data mixing): the
    // budget is DERIVED from src1's token total (7·t1/2, integer floor
    // division replayed identically in SQL) so src1's rate is ~2.33 at
    // EVERY scale factor — two guaranteed copies of every doc plus a ~1/3-
    // probability third (a fixed literal budget upsampled at sf0.01 but
    // silently degenerated to downsampling at sf0.1, leaving the floor(r)
    // replication branch untested); the oracle replays the budget
    // derivation, the rate arithmetic (budget * weight-share / tokens,
    // LEAST-clamped threshold like hexThreshold) and the per-doc
    // fractional md5 draw
    Entry("llm_epoch_mixture", (s, d) => {
      val docs = docsDelta(s, d).select(col("doc_id"), col("source"), col("text"))
        .withColumn("n_tokens", TextOps.tokenEstimate(col("text")))
      // outer coalesce: sum() over ZERO src1 rows is NULL and getLong
      // would NPE past the require below that exists for exactly this case
      val t1 = docs.filter(col("source") === "src1")
        .agg(coalesce(sum(coalesce(col("n_tokens"), lit(0L))), lit(0L))
          .cast("long")).head.getLong(0)
      require(t1 > 0, "llm_epoch_mixture: src1 has no tokens at this SF")
      val out = graft.llm.Curation.epochMixture(docs, "doc_id", "source",
        col("n_tokens"), Map("src1" -> 4.0, "src2" -> 1.0, "src3" -> 1.0),
        tokenBudget = 7L * t1 / 2L, salt = "mix8")
      // the entry's NAME is upsampling: some source must land at rate >= 1
      // (a guaranteed second epoch) or the floor(r) replication branch is
      // degenerate downsampling and silently untested
      require(out.where("epoch >= 1").limit(1).count() == 1,
        "llm_epoch_mixture: no source reached a full second epoch — the " +
          "upsampling branch is untested (budget derivation broken?)")
      out
    }, Some(
      s"""${mixTokTotSql(Seq("src1", "src2", "src3"))},
         |b AS (SELECT (7 * t) // 2 AS budget FROM tot WHERE source = 'src1'),
         |rates AS (
         |  SELECT source,
         |         CASE WHEN t <= 0 THEN 1.0 ELSE CAST((SELECT budget FROM b) AS DOUBLE) * (CASE source WHEN 'src1' THEN 4.0 ELSE 1.0 END / 6.0) / CAST(t AS DOUBLE) END AS r
         |  FROM tot),
         |ep AS (
         |  SELECT k.doc_id, k.source,
         |         CAST(floor(r.r) AS BIGINT) AS f,
         |         ${thrSql("r.r - floor(r.r)")} AS thr
         |  FROM tok k JOIN rates r USING (source)),
         |expl AS (SELECT doc_id, source, f, thr, unnest(range(0, f + 1)) AS e FROM ep)
         |SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
         |FROM expl
         |WHERE e < f OR ${mdDrawSql("", "mix8")} < thr""".stripMargin)),

    // temperature-smoothed mixture (XLM-R/mT5 multinomial sampling):
    // per-source weights are sqrt(token total) — alpha = 0.5 rides the
    // IEEE-exact sqrt so the oracle replays weight, ordered weight-sum
    // fold ((w1+w2)+w3)+w4 (the ListMap insertion-order contract), rate
    // arithmetic and md5 draw bit-for-bit; absent sources weigh 0.0 but
    // still participate in the fold, like the Scala side
    Entry("llm_temperature_mixture", (s, d) => {
      val docs = docsDelta(s, d).select(col("doc_id"), col("source"), col("text"))
        .withColumn("n_tokens", TextOps.tokenEstimate(col("text")))
      graft.llm.Curation.temperatureMixture(docs, "doc_id", "source",
        col("n_tokens"), tempMixSrcs, tokenBudget = 3000, alpha = 0.5,
        salt = "temp")
        .select("doc_id", "source", "n_tokens")
    },
      Some {
        val wsumSql = tempMixSrcs
          .map(s => s"coalesce((SELECT w FROM w WHERE source = '$s'), 0.0)")
          .reduce((a, b) => s"($a + $b)")
        s"""${mixTokTotSql(tempMixSrcs)},
           |w AS (SELECT source, t, sqrt(CAST(t AS DOUBLE)) AS w FROM tot),
           |ws AS (SELECT $wsumSql AS s),
           |rates AS (
           |  SELECT source,
           |         CASE WHEN t <= 0 THEN 1.0
           |              ELSE LEAST(1.0, CAST(3000 AS DOUBLE) * (w / (SELECT s FROM ws)) / CAST(t AS DOUBLE)) END AS r
           |  FROM w)
           |SELECT k.doc_id, k.source, k.n_tokens
           |FROM tok k JOIN rates USING (source)
           |WHERE r >= 1.0 OR ${mdDrawSql("k.", "temp")} < ${thrSql("r")}""".stripMargin
      }),

    // C4-style blocklist filter: normalized-word membership against a
    // literal list ("slow"/"error" occur in this corpus, "spamx" never) —
    // count, ratio (one IEEE division, engine-identical), any-hit flag
    Entry("llm_blocklist", (s, d) =>
      TextOps.blocklistStats(docsDelta(s, d), "doc_id", "text",
        Seq("slow", "error", "broken", "spamx")),
      Some(
        s"""WITH base AS (
           |  SELECT doc_id,
           |         CASE WHEN length($normSql) = 0 THEN [] ELSE string_split($normSql, ' ') END AS ws
           |  FROM documents),
           |st AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           |              CAST(len(list_filter(ws, w -> w IN ('slow', 'error', 'broken', 'spamx'))) AS BIGINT) AS n_hits
           |       FROM base)
           |SELECT doc_id, n_words, n_hits,
           |       CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / CAST(n_words AS DOUBLE) END AS hit_ratio,
           |       n_hits > 0 AS flagged
           |FROM st""".stripMargin)),

    // CCNet-style per-source quality terciles: bucket 1 = shortest
    // (stand-in for best perplexity) — exact within-group ntile with the
    // deterministic (score, id) order pinned NULLS-explicitly on both
    // engines; Spark and DuckDB ntile share the standard SQL split
    // (ceil-sized leading buckets)
    Entry("llm_quantile_buckets", (s, d) =>
      graft.llm.Curation.quantileBuckets(
        docsDelta(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", nBuckets = 3),
      Some(
        """SELECT doc_id, source, n_chars,
          |       CAST(ntile(3) OVER (PARTITION BY source
          |         ORDER BY n_chars ASC NULLS LAST, doc_id ASC NULLS FIRST) AS BIGINT) AS bucket
          |FROM documents""".stripMargin)),

    // GPT-style sequence packing: documents laid out in id order into a
    // continuous token stream cut into 2048-token chunks; distributed
    // two-phase cumsum (range partition + per-partition window + P-row
    // offset join), oracle = DuckDB's global window over the same stream
    Entry("llm_token_pack", (s, d) => {
      val toks = TextOps.textStats(docsDelta(s, d), "doc_id", "text")
        .select("doc_id", "n_tokens")
      graft.llm.Curation.packChunks(toks, "doc_id", "n_tokens", budget = 2048, nParts = 8)
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |         CAST(coalesce(list_sum([CAST(ceil(length(w) / 4.0) AS BIGINT) FOR w IN ws]), 0) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id,
        |          CASE WHEN length(trim(text)) = 0 THEN []
        |               ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
        |        FROM documents)),
        |cum AS (SELECT doc_id, n_tokens,
        |               sum(n_tokens) OVER (ORDER BY doc_id) AS gcum FROM toks)
        |SELECT doc_id, n_tokens,
        |       CAST(gcum - n_tokens AS BIGINT) AS token_offset,
        |       CAST(floor((gcum - n_tokens) / 2048) AS BIGINT) AS first_chunk,
        |       CAST(greatest(floor((gcum - n_tokens) / 2048), floor((gcum - 1) / 2048)) AS BIGINT) AS last_chunk
        |FROM cum""".stripMargin)),

    // domain balancing: at most 10 docs per source, longest-first with a
    // doc_id tiebreak; the rank filter compiles to WindowGroupLimit (a
    // partial map-side top-k before the exchange), so a skewed mega-domain
    // ships only its 10 best rows per task
    Entry("llm_source_cap", (s, d) =>
      graft.llm.Curation.capPerGroup(
        docsDelta(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", maxPerGroup = 10),
      Some(
        """SELECT doc_id, source, n_chars, group_rank FROM (
          |  SELECT doc_id, source, n_chars,
          |         CAST(row_number() OVER (PARTITION BY source
          |           ORDER BY n_chars DESC NULLS LAST, doc_id ASC NULLS FIRST) AS BIGINT) AS group_rank
          |  FROM documents) t
          |WHERE group_rank <= 10""".stripMargin)),

    // corpus selection under a token budget (FineWeb/DataComp assembly):
    // quality-ordered (n_chars DESC) maximal prefix whose cumulative token
    // cost fits 20k — roughly half this corpus; same two-phase distributed
    // cumsum as llm_token_pack, ordered by quality instead of id
    Entry("llm_budget_select", (s, d) => {
      val toks = TextOps.textStats(docsDelta(s, d), "doc_id", "text")
        .select("doc_id", "n_tokens")
      val docs = docsDelta(s, d).select("doc_id", "n_chars")
        .join(toks, Seq("doc_id"))
      graft.llm.Curation.budgetSelect(docs, "doc_id", "n_tokens", "n_chars",
        budget = 20000, nParts = 8)
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |         CAST(coalesce(list_sum([CAST(ceil(length(w) / 4.0) AS BIGINT) FOR w IN ws]), 0) AS BIGINT) AS n_tokens
        |  FROM (SELECT doc_id, n_chars,
        |          CASE WHEN length(trim(text)) = 0 THEN []
        |               ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
        |        FROM documents)),
        |cum AS (SELECT doc_id, n_chars, n_tokens,
        |               sum(n_tokens) OVER (ORDER BY n_chars DESC NULLS LAST, doc_id ASC NULLS FIRST
        |                                   ROWS UNBOUNDED PRECEDING) AS cum_cost
        |        FROM toks)
        |SELECT doc_id, n_chars, n_tokens, CAST(cum_cost AS BIGINT) AS cum_cost
        |FROM cum WHERE cum_cost <= 20000""".stripMargin)),

    // benchmark contamination: corpus docs sharing >= 5 trigram shingles
    // with an eval-set doc (broadcast bench side, shingle equi-join); the
    // benchmark here is a verbatim subset, so self-hits are guaranteed
    Entry("llm_contamination", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val bench = docs.filter("doc_id % 37 = 0")
        .select(col("doc_id").as("bench_id"), col("text"))
      requirePlanted(s"$d#contam_bench", bench,
        "llm_contamination: planted benchmark subset")
      graft.llm.Curation.contamination(docs, "doc_id", "text",
        bench, "bench_id", "text", shingleSize = 3, minShared = 5)
        .select(col("doc_id"), col("bench_id"), col("shared").cast("long").as("shared"))
    }, Some(
      s"""WITH sh AS (
         |  ${shingleSelect("documents")}
         |),
         |bench AS (SELECT doc_id AS bench_id, s AS bs FROM sh WHERE doc_id % 37 = 0)
         |SELECT a.doc_id, b.bench_id, CAST(len(list_intersect(a.s, b.bs)) AS BIGINT) AS shared
         |FROM sh a JOIN bench b ON len(list_intersect(a.s, b.bs)) >= 5""".stripMargin)),

    // Gopher-style repetition signals: distinct-word ratio + top word /
    // bigram / trigram mass fraction, all computed per-row (array_sort +
    // aggregate lambda — no explode, no shuffle); the oracle recomputes the
    // same multiplicities via unnest + two-level grouping
    Entry("llm_repetition", (s, d) =>
      TextOps.repetitionStats(docsDelta(s, d), "doc_id", "text"),
      Some(
        """WITH base AS (
          |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          |                      ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS wl
          |  FROM documents),
          |words AS (SELECT doc_id, unnest(wl) AS g FROM base),
          |bigrams AS (SELECT doc_id, unnest(list_transform(range(1, len(wl)), i -> wl[i] || ' ' || wl[i+1])) AS g FROM base),
          |trigrams AS (SELECT doc_id, unnest(list_transform(range(1, len(wl) - 1), i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])) AS g FROM base),
          |wstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS w, count(*) AS d, max(c) AS mx
          |          FROM (SELECT doc_id, g, count(*) AS c FROM words GROUP BY 1, 2) GROUP BY 1),
          |bstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, max(c) AS bmx
          |          FROM (SELECT doc_id, g, count(*) AS c FROM bigrams GROUP BY 1, 2) GROUP BY 1),
          |tstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nt, max(c) AS tmx
          |          FROM (SELECT doc_id, g, count(*) AS c FROM trigrams GROUP BY 1, 2) GROUP BY 1)
          |SELECT b.doc_id, coalesce(wstat.w, 0) AS n_words,
          |       CASE WHEN coalesce(wstat.w, 0) = 0 THEN 0.0 ELSE wstat.d / wstat.w END AS distinct_word_ratio,
          |       CASE WHEN coalesce(wstat.w, 0) = 0 THEN 0.0 ELSE wstat.mx / wstat.w END AS top_word_frac,
          |       CASE WHEN coalesce(bstat.nb, 0) = 0 THEN 0.0 ELSE bstat.bmx / bstat.nb END AS top_bigram_frac,
          |       CASE WHEN coalesce(tstat.nt, 0) = 0 THEN 0.0 ELSE tstat.tmx / tstat.nt END AS top_trigram_frac
          |FROM base b LEFT JOIN wstat USING (doc_id) LEFT JOIN bstat USING (doc_id)
          |            LEFT JOIN tstat USING (doc_id)""".stripMargin)),

    // CCNet-style boilerplate line removal: lines seeded into 1/5 (banner)
    // and 1/3 (footer) of docs cross the corpus-frequency threshold and are
    // stripped from every copy; document text is reassembled in line order.
    // The oracle replays the exact split/count/join/rebuild in DuckDB.
    Entry("llm_line_dedup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val corpus = docs.select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0, lit("ACCEPT COOKIES TO CONTINUE\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0, lit("\nSubscribe to our newsletter"))
            .otherwise(lit(""))).as("text"))
      Dedup.removeRepeatedLines(corpus, "doc_id", "text", minRepeat = 50)
    }, Some(
      """WITH corpus AS (
        |  SELECT doc_id,
        |         coalesce(
        |           (CASE WHEN doc_id % 5 = 0 THEN 'ACCEPT COOKIES TO CONTINUE' || chr(10) ELSE '' END)
        |           || text ||
        |           (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Subscribe to our newsletter' ELSE '' END),
        |           '') AS text
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
        |e AS (SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1), i -> {'p': i, 'ln': ls[i]})) AS u FROM l),
        |f AS (SELECT doc_id, u.p AS p, u.ln AS ln FROM e),
        |c AS (SELECT ln, count(*) AS cnt FROM f GROUP BY ln),
        |g AS (SELECT f.doc_id, f.p, f.ln,
        |             (c.cnt >= 50 AND length(trim(f.ln)) > 0) AS rm
        |      FROM f JOIN c USING (ln))
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed,
        |       coalesce(string_agg(CASE WHEN rm THEN NULL ELSE ln END, chr(10) ORDER BY p), '') AS text
        |FROM g GROUP BY doc_id""".stripMargin)),

    // LM-lite familiarity: fraction of each doc's bigrams (with
    // multiplicity) seen fewer than minCount times corpus-wide — integer
    // counts + one exact division, so the oracle is bit-exact
    Entry("llm_bigram_novelty", (s, d) =>
      TextOps.rareBigramRatio(docsDelta(s, d), "doc_id", "text", minCount = 3),
      Some(
        """WITH base AS (
          |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          |                      ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS wl
          |  FROM documents),
          |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(wl)), i -> wl[i] || ' ' || wl[i+1])) AS g FROM base),
          |c AS (SELECT g, count(*) AS cnt FROM bg GROUP BY g),
          |j AS (SELECT bg.doc_id, bg.g, c.cnt FROM bg JOIN c USING (g)),
          |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |               CAST(sum(CASE WHEN cnt < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
          |        FROM j GROUP BY doc_id)
          |SELECT b.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
          |       coalesce(a.n_rare, 0) AS n_rare,
          |       CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0
          |            ELSE a.n_rare / a.n_bigrams END AS rare_bigram_ratio
          |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // corpus-level top-k bigrams (filter-list construction): one explode +
    // map-side-combined count + deterministic top-k (count desc, gram asc)
    Entry("llm_top_ngrams", (s, d) =>
      TextOps.topNgrams(docsDelta(s, d), "text", n = 2, k = 20),
      Some(
        """SELECT g AS gram, CAST(count(*) AS BIGINT) AS cnt
          |FROM (
          |  SELECT doc_id, unnest(list_transform(range(1, len(wl)), i -> wl[i] || ' ' || wl[i+1])) AS g
          |  FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          |                            ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS wl
          |        FROM documents) b)
          |GROUP BY g ORDER BY cnt DESC, gram ASC LIMIT 20""".stripMargin)),

    // BM25 keyword retrieval: queries are the first five normalized words
    // of every 97th document (guaranteed non-empty match set — NOT a
    // guaranteed top-10 self-hit: length normalization can rank shorter
    // unrelated docs above the long source doc). rational idf mode (the
    // BM25 fraction without the ln) keeps every arithmetic step an exact
    // IEEE op from integer inputs, and contributions are summed in
    // ascending-term order on BOTH engines — so the full double score
    // hash-matches, not just the ranking.
    Entry("llm_bm25", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val queries = docs.filter("doc_id % 97 = 3")
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextOps.words(TextOps.normalize(col("text"))), 1, 5), " ")
            .as("qtext"))
      graft.llm.Search.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 10, idfMode = "rational")
    }, Some {
      val norm = normSql
      s"""WITH d AS (
         |  SELECT doc_id, CASE WHEN length(nt) = 0 THEN [] ELSE string_split(nt, ' ') END AS ws
         |  FROM (SELECT doc_id, $norm AS nt FROM documents) n),
         |dl AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM d),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS toks FROM dl),
         |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:5])) AS term
         |       FROM dl WHERE doc_id % 97 = 3),
         |vocab AS (SELECT DISTINCT term FROM qt),
         |post AS (SELECT doc_id, dl, unnest(ws) AS term FROM dl),
         |postf AS (SELECT p.doc_id, p.dl, p.term FROM post p JOIN vocab v USING (term)),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
         |       FROM postf GROUP BY 1, 2),
         |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |sc AS (SELECT q.query_id, t.doc_id, t.term,
         |         ((CAST(st.n AS DOUBLE) - f.df + 0.5) / (f.df + 0.5) + 1.0)
         |           * (t.tf * 2.25)
         |           / (t.tf + 1.25 * (1.0 - 0.75 + 0.75 * t.dl / (CAST(st.toks AS DOUBLE) / CAST(st.n AS DOUBLE)))) AS w
         |       FROM tf t JOIN dfx f USING (term) JOIN qt q USING (term), st),
         |g AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |        list_sum(list(w ORDER BY term)) AS score
         |      FROM sc GROUP BY 1, 2)
         |SELECT query_id, doc_id,
         |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
         |       n_terms, score
         |FROM g QUALIFY rnk <= 10""".stripMargin
    }),

    // scalar-quantized ANN: int8-style codes against corpus-wide per-dim
    // min/max, ranking on the exact integer code dot product — codes and
    // scores replay bit-for-bit in any engine (no FP summation anywhere)
    Entry("llm_ann_quantized", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.quantizedTopK(emb, emb.filter("vec_id < 8"), "vec_id",
        "embedding", k = 10, dim = 64)
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |st AS (SELECT u.i AS i, min(e.v[u.i]) AS mn, max(e.v[u.i]) AS mx
        |       FROM e, range(1, 65) AS u(i) GROUP BY u.i),
        |c AS (SELECT e.vec_id, s.i,
        |        CASE WHEN s.mx = s.mn THEN 0
        |             ELSE CAST(round((e.v[s.i] - s.mn) * 255.0 / (s.mx - s.mn)) AS BIGINT)
        |        END AS code
        |      FROM e, st s),
        |p AS (SELECT q.vec_id AS qid, t.vec_id AS nid,
        |        CAST(SUM(q.code * t.code) AS BIGINT) AS score
        |      FROM c q JOIN c t ON q.i = t.i AND t.vec_id <> q.vec_id
        |      WHERE q.vec_id < 8 GROUP BY 1, 2)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS BIGINT) AS rnk,
        |       score
        |FROM p QUALIFY rnk <= 10""".stripMargin)),

    // product-quantization ANN (PQ + asymmetric distance): 64-dim vectors
    // → 8 subspace codes against first-16 one-shot codebooks; corpus
    // distances are pure table lookups. Every step (encoding argmin, ADC
    // fold in subspace order) is an exact IEEE expression, so DuckDB
    // replays codes, distances and ranks bit-for-bit.
    Entry("llm_ann_pq", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.pqTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding",
        k = 10, dim = 64, m = 8, codebookSize = 16)
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
        |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
        |enc AS (
        |  SELECT e.vec_id, sx.s, cb.c,
        |         list_sum([(e.v[8 * sx.s + j] - cb.cv[8 * sx.s + j]) * (e.v[8 * sx.s + j] - cb.cv[8 * sx.s + j]) FOR j IN range(1, 9)]) AS d
        |  FROM e, range(0, 8) AS sx(s), cb),
        |code AS (
        |  SELECT vec_id, s, c FROM (
        |    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        |    FROM enc) r
        |  WHERE rn = 1),
        |sc AS (
        |  SELECT qd.vec_id AS qid, tc.vec_id AS nid,
        |         list_sum(list(qd.d ORDER BY qd.s)) AS dist2
        |  FROM code tc
        |  JOIN enc qd ON qd.s = tc.s AND qd.c = tc.c
        |  WHERE qd.vec_id < 8 AND tc.vec_id <> qd.vec_id
        |  GROUP BY 1, 2)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY dist2 ASC, nid ASC) AS BIGINT) AS rnk,
        |       dist2
        |FROM sc QUALIFY rnk <= 10""".stripMargin)),

    // the FAISS-style IVF-PQ composition: coarse cells route candidates
    // (equi-join, |corpus| × nProbe / nCells), PQ ADC scores them — one
    // ADC pipeline shared with llm_ann_pq, one cell pipeline shared with
    // llm_ann_ivf; the oracle composes both replays
    Entry("llm_ann_ivf_pq", (s, d) => {
      val emb = embDelta(s, d)
      Similarity.pqTopK(emb, emb.filter("vec_id < 8"), "vec_id", "embedding",
        k = 10, dim = 64, m = 8, codebookSize = 16, nCells = 8, nProbe = 2)
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cen AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |x AS (SELECT e.vec_id, e.v, cen.cid,
        |        list_dot_product(e.v, cen.cv) /
        |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))) AS cos
        |      FROM e CROSS JOIN cen),
        |r AS (SELECT vec_id, cid,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |      FROM x),
        |cells AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |probes AS (SELECT vec_id, cid FROM r WHERE rn <= 2 AND vec_id < 8),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
        |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16) t),
        |enc AS (
        |  SELECT e.vec_id, sx.s, cb.c,
        |         list_sum([(e.v[8 * sx.s + j] - cb.cv[8 * sx.s + j]) * (e.v[8 * sx.s + j] - cb.cv[8 * sx.s + j]) FOR j IN range(1, 9)]) AS d
        |  FROM e, range(0, 8) AS sx(s), cb),
        |code AS (
        |  SELECT vec_id, s, c FROM (
        |    SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
        |    FROM enc) r
        |  WHERE rn = 1),
        |sc AS (
        |  SELECT qd.vec_id AS qid, tc.vec_id AS nid,
        |         list_sum(list(qd.d ORDER BY qd.s)) AS dist2
        |  FROM code tc
        |  JOIN cells ce ON ce.vec_id = tc.vec_id
        |  JOIN probes p ON p.cid = ce.cid
        |  JOIN enc qd ON qd.s = tc.s AND qd.c = tc.c AND qd.vec_id = p.vec_id
        |  WHERE tc.vec_id <> qd.vec_id
        |  GROUP BY 1, 2)
        |SELECT qid AS query_id, nid AS neighbor_id,
        |       CAST(row_number() OVER (PARTITION BY qid ORDER BY dist2 ASC, nid ASC) AS BIGINT) AS rnk,
        |       dist2
        |FROM sc QUALIFY rnk <= 10""".stripMargin)),

    // distributed k-means (one Lloyd iteration + final assignment) in the
    // exact summation mode: init = first-8 vectors by id, assignment
    // tie-break toward the lowest cluster id, centroid update folds member
    // values in ascending row-id order — every arithmetic step is a
    // well-defined IEEE value, so DuckDB replays clusters AND distances
    // bit-for-bit. (fast mode — plain sum/count — is the production path
    // and is covered by LlmSpec.)
    Entry("llm_kmeans", (s, d) => {
      val emb = embDelta(s, d)
      graft.llm.Clustering.kmeans(emb, "vec_id", "embedding",
        k = 8, iters = 1, exact = true)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dist2"))
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8) t),
        |d1 AS (SELECT e.vec_id, e.v, c.cid,
        |         list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) FOR i IN range(1, 65)]) AS d
        |       FROM e CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, v, cid FROM (
        |         SELECT vec_id, v, cid,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        |         FROM d1) r
        |       WHERE rn = 1),
        |u1 AS (SELECT a1.cid, u.i AS i,
        |         list_sum(list(a1.v[u.i] ORDER BY a1.vec_id)) / CAST(count(*) AS DOUBLE) AS m
        |       FROM a1, range(1, 65) AS u(i)
        |       GROUP BY a1.cid, u.i),
        |cm AS (SELECT cid, list(m ORDER BY i) AS cv FROM u1 GROUP BY cid),
        |c1 AS (SELECT c0.cid, coalesce(cm.cv, c0.cv) AS cv
        |       FROM c0 LEFT JOIN cm USING (cid)),
        |d2 AS (SELECT e.vec_id, c.cid,
        |         list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]) FOR i IN range(1, 65)]) AS d
        |       FROM e CROSS JOIN c1 c)
        |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d AS dist2 FROM (
        |  SELECT vec_id, cid, d,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        |  FROM d2) r
        |WHERE rn = 1""".stripMargin)),

    // RAG-style sliding-window chunking: 40-word windows advancing by 30
    // (10-word overlap); shuffle-free explode, exact string reassembly
    Entry("llm_chunks", (s, d) =>
      graft.llm.Curation.chunkOverlap(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text", chunkSize = 40, step = 30),
      Some(
        """WITH d AS (
          |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
          |                      ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
          |  FROM documents),
          |n AS (SELECT doc_id, ws, len(ws) AS n FROM d),
          |c AS (SELECT doc_id, ws,
          |        unnest(range(0, CASE WHEN n <= 40 THEN 1 ELSE (n - 40 + 29) // 30 + 1 END)) AS ci
          |      FROM n)
          |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
          |       array_to_string(list_slice(ws, ci * 30 + 1, ci * 30 + 40), ' ') AS chunk_text,
          |       CAST(len(list_slice(ws, ci * 30 + 1, ci * 30 + 40)) AS BIGINT) AS n_chunk_words
          |FROM c""".stripMargin)),

    // Gopher-style composite quality gate over a corpus seeded with rule
    // violations (bullet-heavy docs, symbol/ellipsis spam) so every rule
    // fires both ways; each ratio is one IEEE division of exact integer
    // counts and the DuckDB oracle replays the whole gate including the
    // pass/fail conjunction
    Entry("llm_gopher_quality", (s, d) => {
      val seeded = docsDelta(s, d).select(col("doc_id"), col("text"))
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(lit("- bullet one\n- bullet two\n"), col("text")))
          .when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" ### ### ### more…\ntrailing line...")))
          .otherwise(col("text")))
      TextOps.gopherQuality(seeded, "doc_id", "text")
    }, Some {
      val stopList = TextOps.gopherStopwords.map(sw => s"'$sw'").mkString("(", ", ", ")")
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0 THEN '- bullet one' || chr(10) || '- bullet two' || chr(10) || text
         |         WHEN doc_id % 17 = 0 THEN text || ' ### ### ### more…' || chr(10) || 'trailing line...'
         |         ELSE text END AS t
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, t,
         |         CASE WHEN length(trim(t)) = 0 THEN [] ELSE list_filter(string_split_regex(trim(t), '\\s+'), w -> w != '') END AS w,
         |         string_split(regexp_replace(regexp_replace(t, '^\\n+', ''), '\\n+$$', ''), chr(10)) AS l
         |  FROM seeded),
         |m AS (
         |  SELECT doc_id,
         |         CAST(len(w) AS BIGINT) AS n_words,
         |         CASE WHEN len(w) = 0 THEN 0.0
         |              ELSE list_sum([CAST(length(x) AS DOUBLE) FOR x IN w]) / CAST(len(w) AS DOUBLE) END AS mean_word_len,
         |         CASE WHEN len(w) = 0 THEN 0.0
         |              ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS frac_alpha_words,
         |         CASE WHEN len(w) = 0 THEN 0.0
         |              ELSE CAST(len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS symbol_word_ratio,
         |         CASE WHEN len(l) = 0 THEN 0.0
         |              ELSE CAST(len(list_filter(l, x -> regexp_matches(x, '^\\s*[-*•]'))) AS DOUBLE) / CAST(len(l) AS DOUBLE) END AS frac_bullet_lines,
         |         CASE WHEN len(l) = 0 THEN 0.0
         |              ELSE CAST(len(list_filter(l, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE) / CAST(len(l) AS DOUBLE) END AS frac_ellipsis_lines,
         |         CAST(len(list_distinct(list_filter([lower(x) FOR x IN w], x -> x IN $stopList))) AS BIGINT) AS n_stopwords
         |  FROM base)
         |SELECT doc_id, n_words, mean_word_len, frac_alpha_words, symbol_word_ratio,
         |       frac_bullet_lines, frac_ellipsis_lines, n_stopwords,
         |       (n_words >= 50 AND n_words <= 100000
         |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |        AND frac_alpha_words >= 0.8 AND symbol_word_ratio <= 0.1
         |        AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
         |        AND n_stopwords >= 2) AS quality_pass
         |FROM m""".stripMargin
    }),

    // per-source corpus rollup (the pipeline-health dashboard query):
    // doc/token totals, exact mean length, language mix — one partial-agg
    // groupBy on source, every ratio a single IEEE division
    Entry("llm_corpus_stats", (s, d) => {
      val t = col("text")
      docsDelta(s, d)
        .select(col("source"), col("lang"),
          TextOps.wordCount(t).as("__nw"), TextOps.tokenEstimate(t).as("__nt"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("__nw")).as("total_words"),
          sum(col("__nt")).as("total_tokens"),
          (sum(col("__nw")).cast("double") / count(lit(1)).cast("double"))
            .as("mean_words"),
          countDistinct(col("lang")).cast("long").as("n_langs"))
    }, Some(
      """WITH w AS (
        |  SELECT source, lang,
        |         CAST(len(ws) AS BIGINT) AS nw,
        |         CAST(coalesce(list_sum([CAST(ceil(length(x) / 4.0) AS BIGINT) FOR x IN ws]), 0) AS BIGINT) AS nt
        |  FROM (SELECT source, lang,
        |          CASE WHEN length(trim(text)) = 0 THEN []
        |               ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
        |        FROM documents) t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS total_words,
        |       CAST(sum(nt) AS BIGINT) AS total_tokens,
        |       CAST(sum(nw) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_words,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM w GROUP BY source""".stripMargin)),

    // ---- end-to-end corpus curation ---------------------------------------
    // The whole training-data assembly line composed from the library's own
    // operators: language ID -> quality gate -> exact dedup (fingerprint,
    // keep-min) -> near-dup removal (inverted-index Jaccard, larger id
    // dropped) -> deterministic stratified mix. Every stage is
    // deterministic, so the oracle replays the full pipeline as DuckDB CTEs
    // and the surviving rows hash-match end to end. Scale shape: two hash
    // shuffles (dedup groupBy, shingle index) + one narrow filter chain —
    // no stage is driver-side or all-pairs.
    Entry("llm_curation_pipeline", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      // seed the corpus with exact copies and near-copies so both dedup
      // stages have real positives whose expected fate DuckDB can recompute
      // disjoint planted-copy bands: near copies at [off, 2*off), exact
      // copies at [2*off, 3*off) — off = max(doc_id)+1 keeps them disjoint
      // from the base AND each other at every SF
      val off = docOffset(s, d)
      val exactCopies = docs.filter("doc_id % 7 = 0")
        .withColumn("doc_id", col("doc_id") + 2 * off)
      val nearCopies = docs.filter("doc_id % 10 = 0")
        .withColumn("doc_id", col("doc_id") + off)
        .withColumn("text", concat(col("text"), lit(" zz extra token")))
      val corpus = docs.unionByName(exactCopies).unionByName(nearCopies)

      val t = col("text")
      val scored = TextOps.withLangId(corpus, "text", "lang_pred")
        .select(col("doc_id"), t, col("lang_pred"),
          TextOps.wordCount(t).as("n_words"),
          TextOps.meanWordLen(t).as("mwl"),
          TextOps.digitRatio(t).as("dr"))
        .filter(col("lang_pred") =!= "und" && col("n_words") >= 5 &&
          col("mwl") >= 3.0 && col("mwl") <= 12.0 && col("dr") < 0.3)

      val withFp = scored.withColumn("fp", TextOps.fingerprint(t))
      // The scored+exact-dedup prefix feeds TWO consumers (the near-dup
      // pair mining and the anti-join that applies it); as one lazy plan
      // the whole langid+quality scoring subtree re-executed once per
      // consumer — the projections differ, so ReuseExchange cannot unify
      // them (48 parquet scans in the executed plan, 12.9s at sf0.01).
      // Materialize the deduped intermediate ONCE to a per-invocation temp
      // parquet (optimization-guide §3.3: materialise an intermediate to
      // truncate the plan) so the prefix runs exactly once; rows, columns
      // and values are unchanged (long/string/double round-trip parquet
      // exactly), and nothing persists across invocations (fresh tempDir
      // per call, recomputed from the sfDir inputs every run).
      val dd = tempDir("curpipe")
      Dedup.exactKeepMin(withFp, "doc_id", Seq("fp"))
        .write.mode("overwrite").parquet(dd)
      val exactDeduped = s.read.parquet(dd)

      val pairs = Dedup.ngramJaccardNearDups(
        exactDeduped.select("doc_id", "text"), "doc_id", "text",
        shingleSize = 3, threshold = 0.5, maxDocFreq = 100000)
      val nearDeduped = exactDeduped.join(
        pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")

      graft.llm.Curation.stratifiedSample(nearDeduped, "doc_id", "lang_pred",
          Map("en" -> 0.6, "de" -> 0.8), default = 0.5, salt = "cur7")
        .select("doc_id", "lang_pred", "n_words")
    }, Some {
      val norm = normSql
      val scores = TextOps.langMarkers.map { case (lang, ms) =>
        val list = ms.map(m => s"'$m'").mkString("(", ", ", ")")
        lang -> s"len(list_filter(string_split($norm, ' '), w -> w IN $list))"
      }
      val best = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (lang, sc) =>
        s"WHEN $sc = __best AND __best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2 * $docOffSql, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + $docOffSql, text || ' zz extra token' FROM documents WHERE doc_id % 10 = 0),
         |scored AS (
         |  SELECT doc_id, text,
         |         CASE $cases ELSE 'und' END AS lang_pred,
         |         CAST(len(ws) AS BIGINT) AS n_words,
         |         CASE WHEN len(ws) = 0 THEN 0.0
         |              ELSE list_sum([CAST(length(w) AS DOUBLE) FOR w IN ws])
         |                     / CAST(len(ws) AS DOUBLE) END AS mwl,
         |         CASE WHEN length(text) = 0 THEN 0.0
         |              ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |                     / CAST(length(text) AS DOUBLE) END AS dr
         |  FROM (SELECT doc_id, text, $best AS __best,
         |          CASE WHEN length(trim(text)) = 0 THEN []
         |               ELSE list_filter(string_split_regex(trim(text), '\\s+'), w -> w != '') END AS ws
         |        FROM corpus) t),
         |qual AS (SELECT * FROM scored
         |         WHERE lang_pred <> 'und' AND n_words >= 5
         |           AND mwl >= 3.0 AND mwl <= 12.0 AND dr < 0.3),
         |fp AS (SELECT *, md5($norm) AS f FROM qual),
         |ex AS (SELECT * FROM fp WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
         |sh AS (${shingleSelect("ex")}),
         |dropped AS (
         |  SELECT DISTINCT b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |          / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5),
         |nd AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT id_b FROM dropped))
         |SELECT doc_id, lang_pred, n_words FROM nd
         |WHERE CASE WHEN lang_pred = 'en' THEN ${docDrawCond("cur7", 0.6)}
         |           WHEN lang_pred = 'de' THEN ${docDrawCond("cur7", 0.8)}
         |           ELSE ${docDrawCond("cur7", 0.5)} END""".stripMargin
    }),

    // TF-IDF keyword extraction (rational idf — one exact integer
    // division per score, replayed bit-for-bit; ties alphabetical)
    Entry("llm_tfidf_terms", (s, d) =>
      TextOps.tfidfTerms(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text", k = 5),
      Some {
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(CASE WHEN length(nm) = 0 THEN []
           |                             ELSE string_split(nm, ' ') END) AS w
           |  FROM (SELECT doc_id, $normSql AS nm FROM documents) t),
           |n AS (SELECT count(*) AS n FROM documents),
           |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
           |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
           |sc AS (
           |  SELECT tf.doc_id, tf.w, CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
           |  FROM tf JOIN df USING (w) CROSS JOIN n)
           |SELECT doc_id, w AS term,
           |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS BIGINT) AS rnk,
           |       score
           |FROM sc QUALIFY rnk <= 5""".stripMargin
      }),

    // audio-style windowed energy (VAD/silence-trim precursor): payload
    // bytes as centered 8-bit samples, 64-sample frames hopping 32, exact
    // INTEGER per-frame energies — DuckDB recomputes from the hex form
    Entry("llm_multimodal_audio", (s, d) => {
      val withP = Multimodal.withPayload(
        docsDelta(s, d).select("doc_id", "text"), "text")
      Multimodal.windowEnergy(withP, "doc_id", "payload",
        window = 64, hop = 32)
    }, Some {
      def dig(e: String) = s"(strpos('0123456789ABCDEF', substr(hx, $e, 1)) - 1)"
      val byteC = s"(${dig("2 * (w * 32 + i) + 1")} * 16 + ${dig("2 * (w * 32 + i) + 2")} - 128)"
      s"""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
         |n AS (SELECT doc_id, hx, length(hx) // 2 AS nb FROM h),
         |f AS (SELECT doc_id,
         |        unnest([{'frame_idx': w,
         |                 'energy': list_sum([v * v FOR v IN [$byteC FOR i IN range(64)]])}
         |                FOR w IN range((nb - 64) // 32 + 1)], recursive := true)
         |      FROM n WHERE nb >= 64)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(energy AS BIGINT) AS energy
         |FROM f""".stripMargin
    }),

    // ---- incremental / fuzzy dedup and featurization ----------------------

    // cross-corpus (incremental-ingestion) dedup: a new shard is admitted
    // against the accumulated corpus by normalized fingerprint (anti-join)
    // and then exact-deduped against itself (keep-min). The shard carries
    // planted corpus copies (must be dropped) and planted intra-shard
    // copies (keep-min keeps the original); the oracle replays fingerprint,
    // anti-join and keep-min relationally.
    Entry("llm_cross_dedup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text", "source")
      val off = docOffset(s, d)
      val corpus = docs.filter("doc_id % 3 != 0")
      val shard = docs.filter("doc_id % 3 = 0")
        .unionByName(corpus.filter("doc_id % 6 = 1")
          .withColumn("doc_id", col("doc_id") + off))
        .unionByName(docs.filter("doc_id % 3 = 0 AND doc_id % 9 = 0")
          .withColumn("doc_id", col("doc_id") + 2 * off))
      Dedup.crossDedup(corpus, shard, "doc_id", "text")
        .select("doc_id", "source")
    }, Some {
      val fp = fpSql
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |shard AS (
         |  SELECT doc_id, text, source FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL SELECT doc_id + $docOffSql, text, source FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 6 = 1
         |  UNION ALL SELECT doc_id + 2 * $docOffSql, text, source FROM documents WHERE doc_id % 3 = 0 AND doc_id % 9 = 0),
         |cf AS (SELECT DISTINCT $fp AS f FROM corpus),
         |sf AS (SELECT doc_id, source, $fp AS f FROM shard),
         |kept AS (SELECT sf.* FROM sf LEFT JOIN cf USING (f) WHERE cf.f IS NULL)
         |SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source
         |FROM kept GROUP BY f""".stripMargin
    }),

    // fuzzy near-dup via blocking + bounded edit distance: block key = the
    // first 16 chars of the normalized text (equi-join, no all-pairs), pair
    // when levenshtein <= 10. Planted mutants append ' typoq xq' (9 edits,
    // prefix intact); the oracle replays block + unbounded levenshtein —
    // Spark's thresholded banded DP returns the same distances under the
    // cutoff.
    Entry("llm_fuzzy_dedup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val mut = docs.filter("doc_id % 7 = 0")
        .withColumn("doc_id", col("doc_id") + docOffset(s, d))
        .withColumn("text", concat(col("text"), lit(" typoq xq")))
      Dedup.fuzzyNearDups(docs.unionByName(mut), "doc_id", "text",
        maxDist = 10, prefixLen = 16)
    }, Some {
      val norm = normSql
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $docOffSql, text || ' typoq xq' FROM documents WHERE doc_id % 7 = 0),
         |n AS (SELECT doc_id, $norm AS nm FROM corpus),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.nm, b.nm) AS dd
         |  FROM n a JOIN n b
         |    ON substr(a.nm, 1, 16) = substr(b.nm, 1, 16)
         |   AND a.doc_id < b.doc_id
         |   AND abs(length(a.nm) - length(b.nm)) <= 10)
         |SELECT id_a, id_b, CAST(dd AS BIGINT) AS edit_dist FROM p WHERE dd <= 10""".stripMargin
    }),

    // Johnson–Lindenstrauss random projection 64 → 16 dims (±1 signs,
    // power-of-two scale so the projected doubles replay bit-for-bit in any
    // engine); long-format output, DuckDB folds the same products in the
    // same order
    Entry("llm_random_projection", (s, d) => {
      Similarity.randomProjection(embDelta(s, d), "embedding", "proj",
          dim = 64, outDim = 16)
        .select(col("vec_id"),
          posexplode(col("proj")).as(Seq("dim_idx", "value")))
        .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
          col("value"))
    }, Some {
      val rows = signMatrixValues
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s(j, sv) AS (VALUES $rows)
         |SELECT vec_id, CAST(j AS BIGINT) AS dim_idx,
         |       list_sum([v[i] * sv[i] FOR i IN range(1, 65)]) * 0.25 AS value
         |FROM e CROSS JOIN s""".stripMargin
    }),

    // leakage-free splits: assignment hashes the NEAR-DUP CLUSTER, so a
    // test doc's near-copy can never sit in train; oracle = the
    // dedup_clusters recursive-CTE components + the same md5 threshold rule
    Entry("llm_leakfree_split", (s, d) => {
      val corpus = corpusWithNearDups(s, d)
      val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.5)
      graft.llm.Curation.leakFreeSplit(corpus.select("doc_id"), "doc_id", pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split7")
        .select("doc_id", "cluster", "split")
    }, Some {
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         |$shingleClusterCtes
         |SELECT doc_id, cluster,
         |       CASE WHEN ${clusterDrawCond("split7", 0.8)} THEN 'train'
         |            WHEN ${clusterDrawCond("split7", 0.9)} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM clusters""".stripMargin
    }),

    // exact substring-span dedup (Lee et al. 2022 shape): tokens covered
    // by any corpus-repeated 8-gram are removed mid-document; a planted
    // 12-word boilerplate prefix on every 5th doc is excised EXACTLY
    // (grams crossing into unique text stay under the threshold) and the
    // oracle replays gram counts, coverage expansion, and reassembly
    Entry("llm_span_dedup", (s, d) => {
      val boiler = "subscribe to our newsletter now for free daily updates and offers today"
      val docs = docsDelta(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.removeRepeatedSpans(docs, "doc_id", "text", n = 8, minRepeat = 5)
    }, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN 'subscribe to our newsletter now for free daily updates and offers today ' || text
        |              ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
        |                          ELSE list_filter(string_split_regex(trim(text), '\s+'), w -> w != '') END AS ws
        |      FROM d),
        |g AS (SELECT doc_id, unnest([{'gpos': i - 1, 'gh': md5(array_to_string(ws[i:i+7], ' '))}
        |                             FOR i IN range(1, len(ws) - 6)], recursive := true)
        |      FROM w WHERE len(ws) >= 8),
        |c AS (SELECT gh, count(*) AS f FROM g GROUP BY gh),
        |fl AS (SELECT doc_id, list(gpos) AS starts
        |       FROM g JOIN c USING (gh) WHERE f >= 5 GROUP BY doc_id),
        |k AS (SELECT w.doc_id, w.ws, coalesce(fl.starts, []) AS st
        |      FROM w LEFT JOIN fl ON w.doc_id = fl.doc_id),
        |r AS (SELECT doc_id, ws,
        |        [ws[p + 1] FOR p IN range(len(ws))
        |         IF len(list_filter(st, s -> s <= p AND p <= s + 7)) = 0] AS kept
        |      FROM k)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |       CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
        |       array_to_string(kept, ' ') AS cleaned
        |FROM r""".stripMargin)),

    // the dataset card: per-(split, lang) doc/word totals with ROLLUP
    // margins over the leak-free splits — the end-of-pipeline report a
    // training run ships with its data. Composition of leakFreeSplit +
    // corpus stats + grouping sets, all replayed relationally.
    Entry("llm_dataset_card", (s, d) => {
      // two FRESH scans (distinct expression ids): the pair graph and the
      // split input sharing one lineage trips Spark's ambiguous-self-join
      // analyzer on the carried lang/split attributes
      def mkCorpus() = {
        val base = docsDelta(s, d).select("doc_id", "text", "lang")
        base.unionByName(base.filter("doc_id % 10 = 0")
          .withColumn("doc_id", col("doc_id") + docOffset(s, d))
          .withColumn("text", concat(col("text"), lit(" zz extra token"))))
      }
      val pairs = Dedup.minhashNearDups(mkCorpus().select("doc_id", "text"),
        "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 64,
        threshold = 0.5)
      val assigned = graft.llm.Curation.leakFreeSplit(mkCorpus(), "doc_id",
        pairs, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "split7")
      val sel = assigned.select(assigned("split"), assigned("lang"),
        TextOps.wordCount(assigned("text")).as("__nw"))
      // Spark quirk: DataFrame rollup-BY-NAME over any plan containing a
      // self-join (the minhash band join) trips the ambiguous-self-join
      // analyzer even on a clean 3-column projection; the SQL ROLLUP over
      // a temp view resolves by name without the dataset-id tagging
      // per-run unique name: two concurrent invocations on one session must
      // not clobber each other's view between registration and the SQL read
      val view = s"graft_card_view_${EntryCtx.uniqueSuffix()}"
      sel.createOrReplaceTempView(view)
      // spark.sql analyzes eagerly — the view is inlined into the returned
      // plan, so dropping it immediately is safe and leaves no catalog debris
      val out = s.sql(
        s"""SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(__nw) AS BIGINT) AS total_words
           |FROM $view GROUP BY ROLLUP (split, lang)""".stripMargin)
      s.catalog.dropTempView(view)
      out
    }, Some {
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + $docOffSql, text || ' zz extra token', lang
         |  FROM documents WHERE doc_id % 10 = 0),
         |$shingleClusterCtes,
         |assigned AS (
         |  SELECT doc_id,
         |         CASE WHEN ${clusterDrawCond("split7", 0.8)} THEN 'train'
         |              WHEN ${clusterDrawCond("split7", 0.9)} THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM clusters),
         |w AS (
         |  SELECT a.split, c.lang,
         |         CAST(len(CASE WHEN length(trim(c.text)) = 0 THEN []
         |                       ELSE list_filter(string_split_regex(trim(c.text), '\\s+'), w -> w != '') END) AS BIGINT) AS nw
         |  FROM corpus c JOIN assigned a USING (doc_id))
         |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nw) AS BIGINT) AS total_words
         |FROM w GROUP BY ROLLUP (split, lang)""".stripMargin
    }),

    // the JL scale path end-to-end: project 64 → 16 dims once, then rank
    // by cosine IN THE PROJECTED SPACE — every downstream vector pass (and
    // the memory ANN joins move) shrinks by 4×; projection and ranking
    // both replay exactly in DuckDB
    Entry("llm_ann_projected", (s, d) => {
      val proj = Similarity.randomProjection(embDelta(s, d), "embedding",
        "proj", dim = 64, outDim = 16).select(col("vec_id"), col("proj"))
      Similarity.cosineTopK(proj, proj.filter("vec_id < 8"), "vec_id", "proj",
        k = 10).select("query_id", "neighbor_id", "rnk")
    }, Some {
      val rows = signMatrixValues
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s(j, sv) AS (VALUES $rows),
         |pr AS (
         |  SELECT vec_id, list(p ORDER BY j) AS pv FROM (
         |    SELECT vec_id, j,
         |           list_sum([v[i] * sv[i] FOR i IN range(1, 65)]) * 0.25 AS p
         |    FROM e CROSS JOIN s) t GROUP BY vec_id),
         |q AS (SELECT vec_id AS qid, pv AS qv FROM pr WHERE vec_id < 8),
         |sc AS (
         |  SELECT q.qid, pr.vec_id,
         |         list_dot_product(q.qv, pr.pv) /
         |         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(pr.pv, pr.pv))) AS cos
         |  FROM q, pr WHERE pr.vec_id <> q.qid)
         |SELECT qid AS query_id, vec_id AS neighbor_id,
         |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         |FROM sc QUALIFY rnk <= 10""".stripMargin
    }),

    // feature hashing (hashing trick): signed md5-bucketed bag-of-words in
    // a fixed 256-dim space, sparse long-format output; no vocabulary pass
    // anywhere, so the featurization is replayable engine-independently
    Entry("llm_hash_features", (s, d) =>
      TextOps.hashedFeatures(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text", numBuckets = 256),
      Some {
        val norm = normSql
        // shared 32-bit md5 fold; sign from hex digit 9
        val h32 = md5Fold32("m")
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(CASE WHEN length(nm) = 0 THEN []
           |                             ELSE string_split(nm, ' ') END) AS w
           |  FROM (SELECT doc_id, $norm AS nm FROM documents) t),
           |h AS (SELECT doc_id, md5(w) AS m FROM toks),
           |f AS (SELECT doc_id,
           |        ($h32 % 256) AS bucket,
           |        CASE WHEN ${md5Dig("m", 9)} % 2 = 0 THEN 1 ELSE -1 END AS sgn
           |      FROM h)
           |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           |       CAST(sum(sgn) AS BIGINT) AS weight
           |FROM f GROUP BY doc_id, bucket""".stripMargin
      }),

    // streaming corpus ingestion with cross-batch dedup: a graft-delta
    // STREAM of incoming shards is admitted batch-by-batch against the
    // accumulated output corpus (crossDedup: fingerprint anti-join +
    // intra-batch keep-min) and appended. Constructed so the result is
    // identical whichever way the source batches the two commits (each
    // commit is one file; planted copies carry HIGHER ids than their
    // originals and novel texts are globally unique via an id suffix), so
    // the oracle is the global fingerprint keep-min.
    Entry("streaming_ingest_dedup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text", "source")
      val src = tempDir("st_ingest_src")
      DeltaTable.write(s, docs.repartition(1), src)
      val off = docOffset(s, d)
      val additions = docs.filter("doc_id % 4 = 0")
          .withColumn("doc_id", col("doc_id") + off)
        .unionByName(docs.filter("doc_id % 5 = 0")
          .withColumn("text",
            concat(col("text"), lit(" novel "), col("doc_id").cast("string")))
          .withColumn("doc_id", col("doc_id") + 2 * off))
      DeltaTable.write(s, additions.repartition(1), src, mode = "append")
      val tgt = tempDir("st_ingest_tgt")
      // ONE FILE PER BATCH: the entry's NAME is cross-batch dedup — with
      // the source's default file budget both commits land in a single
      // batch and the accumulated-target anti-join branch is dead code
      // (the batching-invariant fixture means the oracle can't tell)
      val q = s.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          val corpus =
            if (DeltaTable.isDeltaTable(s, tgt)) DeltaTable.forPath(s, tgt).toDF
            else batch.limit(0)
          DeltaTable.write(s, Dedup.crossDedup(corpus, batch, "doc_id", "text"),
            tgt, mode = "append")
          ()
        }.start()
      try {
        q.processAllAvailable()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "streaming_ingest_dedup: the two commits must arrive in separate " +
            "batches to exercise the cross-batch admission path")
      } finally q.stop()
      DeltaTable.forPath(s, tgt).toDF.select("doc_id", "source")
    }, Some {
      val fp = fpSql
      s"""WITH all_docs AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL SELECT doc_id + $docOffSql, text, source FROM documents WHERE doc_id % 4 = 0
         |  UNION ALL SELECT doc_id + 2 * $docOffSql, text || ' novel ' || CAST(doc_id AS VARCHAR), source
         |    FROM documents WHERE doc_id % 5 = 0)
         |SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source
         |FROM (SELECT doc_id, source, $fp AS f FROM all_docs) t GROUP BY f""".stripMargin
    }),

    // deterministic global shuffle into training shards: md5 bucket +
    // within-shard md5 rank — a reproducible uniform permutation any
    // engine can replay (new epoch = new salt, no stored state)
    Entry("llm_shuffle_shards", (s, d) =>
      graft.llm.Curation.shuffleShards(
        docsDelta(s, d).select("doc_id", "source"), "doc_id",
        nShards = 8, salt = "shuf7")
        .select("doc_id", "source", "shard", "pos"),
      Some {
        val h32 = md5Fold32("h") // shared 32-bit md5 fold
        s"""WITH b AS (
           |  SELECT doc_id, source,
           |         ${md5KeySql("", "shuf7")} AS h
           |  FROM documents)
           |SELECT doc_id, source,
           |       CAST(($h32 % 8) AS BIGINT) AS shard,
           |       CAST(row_number() OVER (
           |         PARTITION BY $h32 % 8
           |         ORDER BY h, doc_id) AS BIGINT) AS pos
           |FROM b""".stripMargin
      }),

    // distributed BPE tokenizer training (Sennrich'16 as a Spark
    // aggregation loop). The full 30-merge loop's argmax-dependent
    // rewriting is not one SQL statement (LlmSpec pins exact equality
    // with a naive single-machine reference, incl. tie-breaks and early
    // stop) — but ONE training iteration IS: the driver entry runs the
    // real trainMerges machinery for a single merge and DuckDB replays
    // the pair-count argmax (adjacent char pairs of the distinct-word
    // table, count-desc then lexicographic tie-break) exactly.
    Entry("llm_bpe_merges", (s, d) =>
      graft.llm.Bpe.trainMerges(docsDelta(s, d).select("text"), "text",
        numMerges = 1),
      Some(
        s"""WITH wc AS (
           |  SELECT w, count(*) AS c FROM (
           |    SELECT unnest(string_split(norm, ' ')) AS w
           |    FROM (SELECT $normSql AS norm FROM documents) n
           |    WHERE norm <> '') t
           |  WHERE w <> '' GROUP BY w),
           |pr AS (
           |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, c
           |  FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM wc) s)
           |SELECT CAST(0 AS BIGINT) AS rank, l AS "left", r AS "right",
           |       CAST(sum(c) AS BIGINT) AS pair_count
           |FROM pr GROUP BY l, r
           |HAVING sum(c) >= 2
           |ORDER BY pair_count DESC, l, r LIMIT 1""".stripMargin)),

    // BPE encoding under a FIXED merge list whose character sets are
    // pairwise disjoint (t+h, e+r, a+n, o+u): with single-char sides and
    // l != r, Bpe.mergeFold's greedy left-to-right non-overlapping fusion
    // per word equals non-overlapping substring counting on the
    // space-joined normalized text (occurrences cannot span the space,
    // cannot overlap, and disjoint alphabets mean merges cannot interact)
    // — so DuckDB replays the token counts exactly with replace().
    Entry("llm_bpe_encode", (s, d) =>
      graft.llm.Bpe.tokenCounts(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text",
        Seq(("t", "h"), ("e", "r"), ("a", "n"), ("o", "u"))),
      Some {
        val fused = Seq("th", "er", "an", "ou").map(p =>
          s"(length(norm) - length(replace(norm, '$p', ''))) // 2")
          .mkString(" - ")
        s"""SELECT doc_id,
           |       CAST(length(replace(norm, ' ', '')) - $fused AS BIGINT)
           |         AS n_bpe_tokens
           |FROM (SELECT doc_id, $normSql AS norm FROM documents) t""".stripMargin
      }),

    // DSIR importance weighting (Xie'23): every document scored by how
    // target-like (lang='en') its hashed-unigram distribution is — the
    // cheap pretraining-data selection signal; rational ratio form (no ln)
    // + position-ordered fold make the double weights replay bit-for-bit
    Entry("llm_dsir_weights", (s, d) =>
      graft.llm.Curation.dsirWeights(
        docsDelta(s, d).select("doc_id", "text", "lang"),
        "doc_id", "text", col("lang") === "en", numBuckets = 256),
      Some {
        val h32 = md5Fold32("m") // shared 32-bit md5 fold
        s"""WITH ws AS (
           |  SELECT doc_id, lang = 'en' AS t,
           |         CASE WHEN length(nm) = 0 THEN [] ELSE string_split(nm, ' ') END AS ws
           |  FROM (SELECT doc_id, lang, $normSql AS nm FROM documents) n),
           |toks AS (
           |  SELECT doc_id, t,
           |         unnest([{'pos': i, 'w': ws[i + 1]} FOR i IN range(len(ws))],
           |                recursive := true)
           |  FROM ws),
           |h AS (SELECT doc_id, t, pos,
           |        ($h32 % 256) AS f
           |      FROM (SELECT doc_id, t, pos, md5(w) AS m FROM toks) x),
           |cr AS (SELECT f, count(*) AS cr FROM h GROUP BY f),
           |ct AS (SELECT f, count(*) AS ct FROM h WHERE t GROUP BY f),
           |tot AS (SELECT count(*) AS nr, count(*) FILTER (WHERE t) AS nt FROM h),
           |feats AS (SELECT cr.f,
           |            (CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) * CAST(nr + 256 AS DOUBLE)) /
           |            (CAST(nt + 256 AS DOUBLE) * CAST(cr.cr + 1 AS DOUBLE)) AS wf
           |          FROM cr LEFT JOIN ct ON cr.f = ct.f, tot),
           |sc AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |         list_sum(list_transform(list_sort(list({'pos': pos, 'wf': wf})),
           |                                 x -> x.wf)) AS dsir_weight
           |       FROM h JOIN feats ON h.f = feats.f GROUP BY h.doc_id)
           |SELECT d.doc_id, d.lang = 'en' AS is_target,
           |       coalesce(sc.n_tokens, 0) AS n_tokens,
           |       coalesce(sc.dsir_weight, 0.0) AS dsir_weight
           |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin
      }),

    // corpus diversity census: per-source distinct-trigram ratio (the
    // Self-BLEU-style repetitiveness signal corpus QA dashboards track);
    // exact integer counts + one IEEE division
    Entry("llm_ngram_diversity", (s, d) => {
      val ws = docsDelta(s, d).select(col("source"),
        TextOps.words(TextOps.normalize(col("text"))).as("__ws"))
      val grams = ws.select(col("source"), explode(
        when(size(col("__ws")) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("__ws")) - 3), i =>
            concat_ws(" ", element_at(col("__ws"), i + 1),
              element_at(col("__ws"), i + 2),
              element_at(col("__ws"), i + 3))))).as("__g"))
      grams.groupBy("source").agg(
        count(lit(1)).as("total_ngrams"),
        countDistinct(col("__g")).as("distinct_ngrams"))
        .withColumn("diversity",
          col("distinct_ngrams").cast("double") / col("total_ngrams").cast("double"))
    }, Some {
      s"""WITH ws AS (
         |  SELECT source, CASE WHEN length(nm) = 0 THEN []
         |                      ELSE string_split(nm, ' ') END AS ws
         |  FROM (SELECT source, $normSql AS nm FROM documents) n),
         |g AS (SELECT source,
         |        unnest(CASE WHEN len(ws) < 3 THEN []
         |               ELSE [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
         |               END) AS g
         |      FROM ws)
         |SELECT source, CAST(count(*) AS BIGINT) AS total_ngrams,
         |       CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
         |       CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS diversity
         |FROM g GROUP BY source""".stripMargin
    }),

    // pretrained linear classifier applied at corpus scale (the fastText
    // quality-filter deployment shape): score = bias + Σ count_b · w_b over
    // hashed unigram buckets. The weight table is exact binary fractions
    // (multiples of 0.125) derived arithmetically from the bucket id, so
    // DuckDB reproduces products, fold order, and the pass threshold
    // bit-for-bit.
    Entry("llm_linear_quality", (s, d) =>
      TextOps.linearScore(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text",
        weights = Array.tabulate(256)(i => ((i % 7) - 3) * 0.125),
        bias = 0.25),
      Some {
        val h32 = md5Fold32("m") // shared 32-bit md5 fold
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(CASE WHEN length(nm) = 0 THEN []
           |                             ELSE string_split(nm, ' ') END) AS w
           |  FROM (SELECT doc_id, $normSql AS nm FROM documents) t),
           |h AS (SELECT doc_id,
           |        ($h32 % 256) AS b
           |      FROM (SELECT doc_id, md5(w) AS m FROM toks) x),
           |c AS (SELECT doc_id, b, count(*) AS cnt FROM h GROUP BY 1, 2),
           |sc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
           |         0.25 + list_sum(list_transform(
           |           list_sort(list({'b': b,
           |                           'v': CAST(cnt AS DOUBLE) * ((b % 7) - 3) * 0.125})),
           |           x -> x.v)) AS score
           |       FROM c GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
           |       coalesce(sc.score, 0.25) AS score,
           |       coalesce(sc.score, 0.25) > 0 AS pass
           |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin
      }),

    // cross-corpus near-dup decontamination: incoming shard vs accumulated
    // corpus via MinHash bands + exact Jaccard verify (candidates complete
    // at this threshold as in llm_neardup_minhash, so DuckDB's brute-force
    // corpus×shard Jaccard incl. the jaccard doubles is the exact answer)
    Entry("llm_cross_neardup", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val corpus = docs.filter("doc_id % 3 != 0")
      val shard = docs.filter("doc_id % 3 = 0")
        .unionByName(corpus.filter("doc_id % 6 = 1")
          .withColumn("doc_id", col("doc_id") + docOffset(s, d))
          .withColumn("text", concat(col("text"), lit(" zz extra token"))))
      Dedup.crossNearDups(corpus, shard, "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.5)
    }, Some(crossNearDupOracleSql)),

    // the steady-state deployment of the same op: corpus signatures are
    // computed ONCE, persisted as their own Delta table, and the shard
    // joins against the STORED sig/hset columns — corpus text never
    // rereads. Shares llm_cross_neardup's oracle: the cache must be
    // semantically invisible.
    Entry("llm_neardup_persisted", (s, d) => {
      val docs = docsDelta(s, d).select("doc_id", "text")
      val corpus = docs.filter("doc_id % 3 != 0")
      val shard = docs.filter("doc_id % 3 = 0")
        .unionByName(corpus.filter("doc_id % 6 = 1")
          .withColumn("doc_id", col("doc_id") + docOffset(s, d))
          .withColumn("text", concat(col("text"), lit(" zz extra token"))))
      val sigDir = EntryCtx.shared2.getOrElseUpdate(s"$d#corpus_sigs", {
        val dd = tempDir("sigs")
        DeltaTable.write(s,
          Dedup.signatures(corpus, "doc_id", "text",
            shingleSize = 3, numHashes = 128), dd)
        dd
      })
      Dedup.crossNearDupsAgainstSignatures(
        DeltaTable.forPath(s, sigDir).toDF, shard, "doc_id", "text",
        shingleSize = 3, numHashes = 128, bands = 64, threshold = 0.5)
    }, Some(crossNearDupOracleSql)),

    // markup stripping over a deterministically-wrapped corpus: script/
    // style payload removal, tag drop, ordered entity decode (&amp; last
    // so double escapes resolve one level), whitespace collapse — the
    // exact regexp chain is the contract and DuckDB (RE2) replays it
    Entry("llm_strip_markup", (s, d) => {
      val noisy = docsDelta(s, d).select(col("doc_id"),
        concat(lit("<div id=x><p>"), col("text"),
          lit("</p><style>p{color:red}</style><script>if (1<2) x=3;</script>" +
            "<!-- c --> &amp;lt;tag&gt; &nbsp;done")).as("text"))
      noisy.select(col("doc_id"), TextOps.stripMarkup(col("text")).as("cleaned"))
    }, Some(
      """WITH noisy AS (
        |  SELECT doc_id,
        |         '<div id=x><p>' || text || '</p><style>p{color:red}</style><script>if (1<2) x=3;</script><!-- c --> &amp;lt;tag&gt; &nbsp;done' AS t
        |  FROM documents)
        |SELECT doc_id,
        |       trim(regexp_replace(
        |         replace(replace(replace(replace(replace(replace(
        |           regexp_replace(
        |             regexp_replace(
        |               regexp_replace(
        |                 regexp_replace(t, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |                 '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |               '(?s)<!--.*?-->', ' ', 'g'),
        |             '(?s)<(/?[a-zA-Z][^<>]*|[!?][^<>]*)>', ' ', 'g'),
        |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |         '\s+', ' ', 'g')) AS cleaned
        |FROM noisy""".stripMargin)),

    // ANN quality evaluation: recall@10 of sign-LSH vs the exact
    // brute-force ranking, per query — the measurement harness a real ANN
    // deployment tunes nBits against; both rankers and the recall itself
    // replay in DuckDB
    Entry("llm_ann_recall", (s, d) => {
      val emb = embDelta(s, d)
      val q = emb.filter("vec_id < 8")
      val brute = Similarity.cosineTopK(emb, q, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding",
        k = 10, nBits = 4, dim = 64).select(
        col("query_id"), col("neighbor_id").as("__ln"))
      brute.join(lsh,
          brute("query_id") === lsh("query_id") &&
            col("neighbor_id") === col("__ln"), "left")
        .groupBy(brute("query_id").as("query_id"))
        .agg((count(col("__ln")).cast("double") / lit(10.0)).as("recall_at_10"))
    }, Some {
      val bucket = duckBucketExpr("v", planes)
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
         |bf AS (
         |  SELECT qid AS query_id, vec_id AS neighbor_id FROM (
         |    SELECT q.qid, e.vec_id,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             list_dot_product(q.qv, e.v) /
         |             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
         |             e.vec_id) AS rnk
         |    FROM q, e WHERE e.vec_id <> q.qid) t WHERE rnk <= 10),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
         |qb AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 8),
         |lh AS (
         |  SELECT qid AS query_id, vec_id AS neighbor_id FROM (
         |    SELECT qb.qid, b.vec_id,
         |           row_number() OVER (PARTITION BY qb.qid ORDER BY
         |             list_dot_product(qb.qv, b.v) /
         |             (sqrt(list_dot_product(qb.qv, qb.qv)) * sqrt(list_dot_product(b.v, b.v))) DESC,
         |             b.vec_id) AS rnk
         |    FROM qb JOIN b ON qb.bucket = b.bucket AND b.vec_id <> qb.qid) t
         |  WHERE rnk <= 10)
         |SELECT bf.query_id,
         |       CAST(count(lh.neighbor_id) AS DOUBLE) / 10.0 AS recall_at_10
         |FROM bf LEFT JOIN lh USING (query_id, neighbor_id)
         |GROUP BY bf.query_id""".stripMargin
    }),

    // self-trained bigram LM fluency score (CCNet/KenLM filter shape):
    // every probability is one IEEE division of exact counts, the per-doc
    // sum folds in position order, so DuckDB replays the doubles exactly
    Entry("llm_bigram_lm", (s, d) =>
      TextOps.bigramLmScore(docsDelta(s, d).select("doc_id", "text"),
        "doc_id", "text"),
      Some(
        s"""WITH d AS (
           |  SELECT doc_id, CASE WHEN length(nm) = 0 THEN []
           |                      ELSE string_split(nm, ' ') END AS ws
           |  FROM (SELECT doc_id, $normSql AS nm FROM documents) t),
           |b AS (
           |  SELECT doc_id, unnest([{'pos': i, 'w1': ws[i], 'w2': ws[i+1]}
           |                         FOR i IN range(1, len(ws))], recursive := true)
           |  FROM d WHERE len(ws) >= 2),
           |c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY w1, w2),
           |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
           |p AS (
           |  SELECT b.doc_id, b.pos,
           |         CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE) AS p
           |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
           |s AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |         list_sum(list(p ORDER BY pos)) / CAST(count(*) AS DOUBLE) AS lm_score
           |  FROM p GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
           |       coalesce(s.lm_score, 0.0) AS lm_score
           |FROM d LEFT JOIN s USING (doc_id)""".stripMargin)),

    // C4-style GLOBAL paragraph dedup (Dedup.dedupParagraphs): every
    // distinct normalized paragraph survives only at its first
    // (doc_id, position) occurrence corpus-wide. Two boilerplate
    // paragraphs appended to EVERY document must each survive exactly
    // once (in the minimal doc_id); whole-document duplicates already in
    // the corpus lose all their paragraphs and clean to ''.
    Entry("llm_paragraph_dedup", (s, d) => {
      val noisy = docsDelta(s, d).select(col("doc_id"),
        concat(col("text"), lit("\nSubscribe to our newsletter today" +
          "\nAll rights reserved worldwide")).as("text"))
      graft.llm.Dedup.dedupParagraphs(noisy, "doc_id", "text")
    }, Some {
      val normP = // same VT pin as normSql
        "trim(regexp_replace(regexp_replace(lower(p), '[^\\p{L}\\p{N}\\s\\p{Z}\\x{0085}\\x{000B}]', '', 'g'), '[\\s\\p{Z}\\x{0085}\\x{000B}]+', ' ', 'g'))"
      s"""WITH base AS (
         |  SELECT doc_id,
         |         text || chr(10) || 'Subscribe to our newsletter today' || chr(10) || 'All rights reserved worldwide' AS t
         |  FROM documents),
         |ls AS (SELECT doc_id, string_split(t, chr(10)) AS ps FROM base),
         |px AS (SELECT doc_id,
         |         unnest([{'pos': i, 'p': ps[i + 1]} FOR i IN range(len(ps))],
         |                recursive := true)
         |       FROM ls),
         |f AS (SELECT doc_id, pos, p, md5($normP) AS fp
         |      FROM px WHERE trim(p) != ''),
         |w AS (SELECT doc_id, pos, p,
         |        row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
         |      FROM f),
         |agg AS (SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS cleaned
         |        FROM w WHERE rn = 1 GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.cleaned, '') AS cleaned
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    }))
}
