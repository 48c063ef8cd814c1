package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for training-data assembly at 100 TB scale:
 * deterministic stratified sampling (data mixing) and benchmark
 * contamination detection. Pure column expressions / equi-joins — no UDFs,
 * no all-pairs comparisons, no driver materialization.
 */
object Curation {

  /** First-8-hex-digit threshold for a uniform [0,1) fraction: a row is
    * kept when the md5 prefix of its salted key compares below it. The
    * selector is an 8-hex-char string comparison — portable across engines
    * (Spark and DuckDB md5 agree), stable across runs, and independent of
    * partitioning, unlike `DataFrame.sample`. Granularity 1/2^32. */
  private[graft] def hexThreshold(frac: Double): String =
    f"${math.min((frac * 4294967296.0).toLong, 4294967295L)}%08x"

  /** Deterministic keep-condition: fraction `frac` of keys, selected by
    * salted md5. Changing `salt` draws an independent sample. NULL keys
    * hash as the empty string (all NULL-key rows share one draw) — without
    * the coalesce they would be silently dropped for 0 < frac < 1 but kept
    * at frac >= 1, a discontinuity. */
  /** THE salted draw every sampler/splitter/shuffler shares: md5 of
    * "key:salt" with NULL keys hashing as '' so no row silently routes to
    * a default branch. One definition — leakFreeSplit once hand-rolled
    * this and dropped the coalesce, sending every NULL-key row to the
    * last split. */
  private[llm] def saltedHash(key: Column, salt: String): Column =
    md5(concat(coalesce(key.cast("string"), lit("")), lit(":" + salt)))

  /** First 8 hex chars (32 bits) of [[saltedHash]] — the comparable draw. */
  private[llm] def draw8(key: Column, salt: String): Column =
    substring(saltedHash(key, salt), 1, 8)

  def sampleCond(key: Column, frac: Double, salt: String): Column =
    if (frac <= 0) lit(false)
    else if (frac >= 1) lit(true)
    else draw8(key, salt) < lit(hexThreshold(frac))

  /**
   * Stratified sample: per-stratum fractions (data-mixing ratios), rows in
   * unlisted strata keep `default`. Deterministic in (idCol, salt) — the
   * same mix is reproducible on any cluster layout, and re-running with a
   * new salt draws a fresh independent mix. One narrow filter, no shuffle.
   */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    val cond = fractions.foldRight(sampleCond(col(idCol), default, salt)) {
      case ((stratum, frac), acc) =>
        when(col(strataCol) === stratum, sampleCond(col(idCol), frac, salt))
          .otherwise(acc)
    }
    df.filter(cond)
  }

  /**
   * Domain-mixture sampling to a token budget — the data-mixing step that
   * turns "train on 60% web / 30% books / 10% code, N tokens total" into a
   * concrete document sample. For each domain d with target weight w_d the
   * per-document keep rate is
   *   r_d = min(1, tokenBudget * (w_d / Σw) / tokens_d)
   * and documents are kept by the same deterministic salted-md5 draw as
   * [[sampleCond]] (reproducible on any cluster layout; a new salt draws an
   * independent mix). Domains not in `weights` are dropped. A domain whose
   * corpus is smaller than its target keeps everything (r = 1) — the
   * shortfall is reported rather than silently re-balanced; callers decide
   * whether to upweight elsewhere or epoch-repeat that domain.
   *
   * Scale shape: one tiny aggregation (one row per DOMAIN, not per row)
   * collected to the driver to compute rates, then one narrow filter over
   * the corpus. Sampling is per-document, so the realized token count
   * concentrates around the target (documents ≪ budget); exact-to-the-token
   * packing belongs to [[packChunks]] downstream.
   */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokensCol: Column,
      weights: Map[String, Double],
      tokenBudget: Long,
      salt: String = "graft"): DataFrame = {
    val rates = mixtureRates(df, domainCol, tokensCol, weights, tokenBudget,
      "mixtureSample").map { case (d, r) => d -> math.min(1.0, r) }
    // default = 0.0: domains without a weight (or absent from the corpus)
    // are dropped — same fold as stratifiedSample, kept in one place
    stratifiedSample(df, idCol, domainCol, rates, default = 0.0, salt = salt)
  }

  /**
   * Uncapped per-domain mixture rates r_d = tokenBudget·(w_d/Σw)/tokens_d
   * (a domain with no tokens rates 1.0 — the shortfall rule) — the shared
   * preamble of [[mixtureSample]] (which caps at 1) and [[epochMixture]]
   * (which doesn't). The arithmetic ORDER (`budget * share`, then `/ t`)
   * is part of the oracle contract: external engines replay these doubles
   * bit-for-bit. One row per domain crosses the driver.
   */
  private def mixtureRates(df: DataFrame, domainCol: String, tokensCol: Column,
      weights: Map[String, Double], tokenBudget: Long,
      opName: String): Map[String, Double] = {
    // cheap config checks BEFORE the corpus scan: a bad budget/weight map
    // must not cost a full aggregation job first
    validateMixtureArgs(weights, tokenBudget, opName)
    mixtureRatesFromTotals(
      domainTokenTotals(df, domainCol, tokensCol, weights.keys.toSeq, opName),
      weights, tokenBudget, opName)
  }

  private def validateMixtureArgs(weights: Map[String, Double],
      tokenBudget: Long, opName: String): Unit = {
    require(tokenBudget > 0, s"$opName: tokenBudget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, s"$opName: weights must be non-negative, not all zero")
  }

  /** The rate arithmetic of [[mixtureRates]] over ALREADY-aggregated
    * totals — shared so [[temperatureMixture]] can derive weights and
    * rates from one corpus scan without drifting from this formula. */
  private def mixtureRatesFromTotals(totals: Map[String, Long],
      weights: Map[String, Double], tokenBudget: Long,
      opName: String): Map[String, Double] = {
    validateMixtureArgs(weights, tokenBudget, opName)
    val wsum = weights.values.sum
    weights.flatMap { case (d, w) =>
      totals.get(d).map { t =>
        val target = tokenBudget.toDouble * (w / wsum)
        d -> (if (t <= 0) 1.0 else target / t)
      }
    }
  }

  /** ONE per-domain token-total aggregation (one output row per domain)
    * serving [[mixtureRates]], [[temperatureWeights]] and
    * [[temperatureMixture]] — previously duplicated, and the two copies
    * could drift on the coalesce/cast/type-check details. */
  private def domainTokenTotals(df: DataFrame, domainCol: String,
      tokensCol: Column, domains: Seq[String],
      opName: String): Map[String, Long] = {
    // string-keyed contract, checked up front: a non-string domain column
    // would pass the isin filter via implicit casts and then die on the
    // driver with a bare ClassCastException at getString
    require(df.schema(domainCol).dataType == org.apache.spark.sql.types.StringType,
      s"$opName: domain column '$domainCol' must be STRING (weights are " +
        s"string-keyed), got ${df.schema(domainCol).dataType.simpleString}")
    df.filter(col(domainCol).isin(domains: _*))
      .groupBy(col(domainCol).as("__d"))
      .agg(sum(coalesce(tokensCol, lit(0L)).cast("long")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /**
   * Temperature-smoothed domain weights — the multinomial sampling rule of
   * the XLM-R/mT5 pipelines ("sample language l with probability ∝
   * p_l^α"): from each domain's token total t_d the unnormalized weight is
   * t_d^α, which equals p_d^α up to the constant (Σt)^α that
   * [[mixtureSample]]/[[epochMixture]]'s own w/Σw normalization cancels.
   * α < 1 flattens the mixture toward uniform (upweights low-resource
   * domains); α = 1 is natural proportional sampling. Feed the result
   * straight into the mixture samplers:
   * {{{
   * val w = Curation.temperatureWeights(docs, "lang", col("n_tokens"),
   *   Seq("en", "fr", "sw"), alpha = 0.5)
   * Curation.mixtureSample(docs, "doc_id", "lang", col("n_tokens"), w, budget)
   * }}}
   *
   * Determinism contract: α = 0.5 and α = 1.0 route through sqrt/identity —
   * both IEEE-exact, so an external engine replays the weights (and the
   * downstream keep rates) bit-for-bit, which is what the mixture oracles
   * require; any other α uses pow (correct, but last-ULP libm-dependent —
   * fine for training, not for a hash-equality oracle). The returned map
   * preserves `domains` order (a ListMap): the weight-sum fold downstream
   * is order-sensitive in the last ULP, so iteration order is part of the
   * replay contract. A domain absent from the corpus weighs 0 (it still
   * participates in the Σw fold, matching the samplers' arithmetic).
   *
   * Scale shape: one row per domain crosses the driver, like the samplers'
   * own rate aggregation.
   */
  def temperatureWeights(
      df: DataFrame,
      domainCol: String,
      tokensCol: Column,
      domains: Seq[String],
      alpha: Double = 0.5): scala.collection.immutable.ListMap[String, Double] = {
    validateTemperatureArgs(domains, alpha, "temperatureWeights")
    weightsFromTotals(
      domainTokenTotals(df, domainCol, tokensCol, domains, "temperatureWeights"),
      domains, alpha, "temperatureWeights")
  }

  private def validateTemperatureArgs(domains: Seq[String], alpha: Double,
      opName: String): Unit = {
    require(alpha > 0, s"$opName: alpha must be positive, got $alpha")
    require(domains.nonEmpty && domains.distinct == domains,
      s"$opName: domains must be non-empty and distinct")
  }

  private def weightsFromTotals(totals: Map[String, Long], domains: Seq[String],
      alpha: Double, opName: String): scala.collection.immutable.ListMap[String, Double] = {
    validateTemperatureArgs(domains, alpha, opName)
    scala.collection.immutable.ListMap(domains.map { d =>
      val t = math.max(totals.getOrElse(d, 0L), 0L).toDouble
      val w =
        if (alpha == 1.0) t
        else if (alpha == 0.5) math.sqrt(t)
        else math.pow(t, alpha)
      d -> w
    }: _*)
  }

  /**
   * One-scan temperature mixture: [[temperatureWeights]] composed with
   * [[mixtureSample]] but aggregating the per-domain token totals ONCE —
   * the separate compose path scans the corpus twice for identical totals,
   * which at 100 TB is a doubled full pass. Output and arithmetic are
   * exactly the compose path's (same totals feed both the weight and rate
   * formulas; spec-asserted set equality).
   */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokensCol: Column,
      domains: Seq[String],
      tokenBudget: Long,
      alpha: Double = 0.5,
      salt: String = "graft"): DataFrame = {
    // cheap config checks BEFORE the corpus scan (the budget check repeats
    // inside mixtureRatesFromTotals; here it must precede the aggregation)
    validateTemperatureArgs(domains, alpha, "temperatureMixture")
    require(tokenBudget > 0, "temperatureMixture: tokenBudget must be positive")
    val totals = domainTokenTotals(df, domainCol, tokensCol, domains,
      "temperatureMixture")
    val weights = weightsFromTotals(totals, domains, alpha, "temperatureMixture")
    val rates = mixtureRatesFromTotals(totals, weights, tokenBudget,
      "temperatureMixture").map { case (d, r) => d -> math.min(1.0, r) }
    stratifiedSample(df, idCol, domainCol, rates, default = 0.0, salt = salt)
  }

  /**
   * Epoch-repeating domain mixture — the UPSAMPLING half of data mixing
   * that [[mixtureSample]] deliberately leaves to the caller: a domain
   * whose target token share exceeds its corpus size is REPEATED across
   * training epochs (the LLaMA-style "books ×2.4" mixture). For domain d
   * the uncapped rate r_d = tokenBudget * (w_d / Σw) / tokens_d becomes
   * floor(r_d) guaranteed epochs of every document plus one further epoch
   * kept by the deterministic salted-md5 draw at probability r_d −
   * floor(r_d). Output is one row per (document, epoch) with a 0-based
   * `epoch` column (epoch numbering lets [[shuffleShards]] interleave
   * repeats instead of concatenating them). Rates ≤ 1 degrade to exactly
   * [[mixtureSample]]'s behavior (0 guaranteed epochs + fractional draw);
   * an empty domain keeps one epoch, like mixtureSample's shortfall rule.
   *
   * `maxEpochs` fails loudly when a tiny domain × large budget would
   * explode (a 100-token domain against a 1B-token target is a
   * configuration error, not a 10-million-fold replication request).
   *
   * Scale shape: one tiny per-DOMAIN aggregation to the driver for rates,
   * then a narrow per-row `sequence`/`explode` — no shuffle, no join;
   * output size is exactly the mixture's epoch multiple. Rate arithmetic
   * is ordered `budget * (w/Σw) / tokens` so external engines replay the
   * doubles bit-for-bit (the mixtureSample oracle precedent).
   */
  def epochMixture(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokensCol: Column,
      weights: Map[String, Double],
      tokenBudget: Long,
      maxEpochs: Int = 16,
      salt: String = "graft"): DataFrame = {
    require(maxEpochs >= 1, s"epochMixture: maxEpochs=$maxEpochs")
    val rates = mixtureRates(df, domainCol, tokensCol, weights, tokenBudget,
      "epochMixture")
    val over = rates.filter(_._2 > maxEpochs)
    require(over.isEmpty,
      s"epochMixture: rate exceeds maxEpochs=$maxEpochs for ${over.keys.mkString(",")} " +
        s"(${over.values.map(r => f"$r%.1f").mkString(",")} epochs) — " +
        "shrink the budget or upweight larger domains")
    // per-domain full-epoch count and fractional-epoch threshold as
    // when-chains (bounded by the domain count, all driver-held)
    val fullCol = rates.foldLeft(lit(0)) { case (acc, (d, r)) =>
      when(col(domainCol) === d, lit(r.toInt)).otherwise(acc)
    }
    val thrCol = rates.foldLeft(lit("00000000")) { case (acc, (d, r)) =>
      when(col(domainCol) === d, lit(hexThreshold(r - r.toInt))).otherwise(acc)
    }
    val drawn = draw8(col(idCol), salt)
    df.filter(col(domainCol).isin(rates.keys.toSeq: _*))
      .withColumn("__full", fullCol)
      // __full + 1 candidate epochs; the last one is the fractional draw
      // (generators can't nest inside cast — epoch is cast a step later)
      .select(col(idCol), col(domainCol), col("__full"), thrCol.as("__thr"),
        explode(sequence(lit(0), col("__full"))).as("__e"))
      .filter(col("__e") < col("__full") || drawn < col("__thr"))
      .select(col(idCol), col(domainCol), col("__e").cast("long").as("epoch"))
  }

  /**
   * GPT-style sequence packing (concat-and-chunk): documents are laid out
   * in `idCol` order into a continuous token stream cut into fixed
   * `budget`-token training chunks; returns each document's global token
   * offset and the first/last chunk it lands in (documents may straddle a
   * boundary — the standard pretraining packing).
   *
   * Scale shape: a naive global window (`Window.orderBy`) collapses to ONE
   * partition. Instead: range-repartition on the id (a distributed sort),
   * cumulative-sum WITHIN each partition, then one tiny aggregation (one
   * row per partition) whose running totals broadcast back as per-partition
   * offsets — the classic two-phase scan. Only P partial sums cross the
   * driver.
   */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      nParts: Int = 32): DataFrame = {
    require(budget > 0, "packChunks: budget must be positive")
    // NULL token counts contribute 0 (sum() would skip them, and an
    // all-NULL partition would return a NULL total → driver NPE)
    val base = df.select(col(idCol),
      coalesce(col(tokensCol), lit(0L)).cast("long").as("__tok"))
    globalCumsum(base, Seq(col(idCol)), "__tok", nParts)
      .select(col(idCol), col("__tok").as(tokensCol),
        (col("__gcum") - col("__tok")).as("token_offset"),
        floor((col("__gcum") - col("__tok")) / budget).cast("long").as("first_chunk"),
        // greatest(): a zero-token document never reports last < first
        greatest(floor((col("__gcum") - col("__tok")) / budget),
          floor((col("__gcum") - 1) / budget)).cast("long").as("last_chunk"))
  }

  /**
   * Two-phase distributed cumulative sum — the scalable form of a GLOBAL
   * `sum(value) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING)` (which would
   * otherwise collapse to one partition): range-repartition on `ord` (a
   * distributed sort), cumulative-sum WITHIN each partition (ROWS frame —
   * the default RANGE frame gives rows tied on `ord` the same running
   * total), then one tiny aggregation whose P running totals broadcast
   * back as per-partition offsets. Only P longs cross the driver.
   *
   * Returns `df`'s columns plus `__gcum` (the value column's global
   * running total, own row included), eagerly pinned via localCheckpoint.
   * Per-partition totals come from `sum(value)`, not `max` of the running
   * cumsum, so NEGATIVE values are totaled correctly (a partition ending
   * below its peak would otherwise inflate every later offset).
   *
   * `repartitionByRange` picks boundaries by SAMPLING — nondeterministic
   * across jobs — so the per-partition cumsums are computed once, persisted
   * and reused by both the offsets pass and the result, and the returned
   * frame is checkpointed before the cache drops; two jobs re-deriving the
   * partitioning independently would disagree on offsets.
   */
  private def globalCumsum(df: DataFrame, ord: Seq[Column], valueCol: String,
      nParts: Int): DataFrame = {
    val parts = df.repartitionByRange(nParts, ord: _*)
      .withColumn("__p", spark_partition_id())
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__p")).orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = parts.withColumn("__cum", sum(col(valueCol)).over(wp))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one row per non-empty partition; running offsets on the driver
      val totals = cum.groupBy("__p").agg(sum(col(valueCol)).as("__t"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) => (p, acc + t) }
        .init.map(_._2).zip(totals.map(_._1)).map { case (off, p) => (p, off) }.toMap
      val offCol = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
        when(col("__p") === p, lit(off)).otherwise(acc)
      }
      val result = cum.withColumn("__gcum", col("__cum") + offCol)
        .drop("__p", "__cum")
      // pin the rows before dropping the cache the plan depends on
      result.localCheckpoint()
    } finally cum.unpersist()
  }

  /**
   * RAG-style sliding-window chunking: each document's whitespace tokens
   * are cut into windows of `chunkSize` words advancing by `step` words
   * (overlap = chunkSize - step), the standard retrieval-corpus chunker.
   * Returns one row per (document, chunk): (idCol, chunk_idx, chunk_text,
   * n_chunk_words). A document with at most `chunkSize` words (including
   * an empty one) yields exactly one chunk.
   *
   * Scale shape: pure per-row explode of a computed sequence — shuffle-free
   * and codegen'd end to end; output size is input size × (1/step overlap
   * factor), the intrinsic cost of overlapped chunking.
   *
   * The chunk-count sequence is guarded to start at a non-negative length:
   * `sequence(0, n)` REVERSES when n < 0 (Spark auto-descends), so the
   * count is clamped to ≥ 1 rather than letting an empty doc produce a
   * descending sequence.
   */
  def chunkOverlap(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      step: Int): DataFrame = {
    require(chunkSize >= 1, "chunkOverlap: chunkSize must be >= 1")
    require(step >= 1 && step <= chunkSize,
      "chunkOverlap: step must be in [1, chunkSize]")
    val n = size(col("__ws"))
    // ceil((n - chunkSize) / step) + 1 via double floor (exact: quotient of
    // longs < 2^52); docs that fit in one window take the constant branch
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(floor((n - chunkSize + step - 1).cast("double") / step)
        .cast("int") + 1)
    // NULL text coalesces to "" (the removeRepeatedLines/Spans discipline):
    // words(NULL) is NULL, sequence(0, NULL) is NULL, and explode(NULL)
    // would silently DROP the document instead of yielding its one empty
    // chunk as the contract promises
    df.select(col(idCol),
        TextOps.words(coalesce(col(textCol), lit(""))).as("__ws"))
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__chunk",
        slice(col("__ws"), col("chunk_idx") * step + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_chunk_words"))
  }

  /**
   * Benchmark contamination: corpus documents sharing at least `minShared`
   * distinct word n-gram shingles with a benchmark document — the standard
   * decontamination pass before training. Returns (idCol, bench_id, shared).
   *
   * Scale shape: the benchmark side is small by nature (eval sets), so its
   * exploded shingles broadcast; the corpus side is one explode + one
   * equi-join on the shingle + one aggregation — linear in corpus size,
   * no all-pairs. Run exact dedup first: pathological boilerplate shingles
   * belong there, not here.
   */
  def contamination(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      shingleSize: Int = 3,
      minShared: Int = 5): DataFrame = {
    val c = Dedup.shingles(corpus, idCol, textCol, shingleSize)
    val b = broadcast(Dedup.shingles(benchmark, benchIdCol, benchTextCol, shingleSize)
      .withColumnRenamed("__id", "__bid"))
    c.join(b, "__sh")
      .groupBy(col("__id").as(idCol), col("__bid").as("bench_id"))
      // shingle arrays are distinct per document, so each shared shingle
      // contributes exactly one joined row
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /**
   * Leakage-free train/validation/test splitting: assignment hashes the
   * NEAR-DUP CLUSTER id, not the document id, so every member of a
   * near-duplicate cluster lands in the same split — the eval-contamination
   * mode where a test document's near-copy sits in train simply cannot
   * occur. `splits` are (name, fraction) in order; fractions must sum to 1.
   * Selection is the salted-md5 hex-threshold rule of [[stratifiedSample]]
   * (deterministic in (cluster, salt), layout-independent, replayable).
   *
   * Scale shape: one connected-components pass over the pair graph
   * ([[Dedup.dedupClusters]] — alternating large-star/small-star, edges
   * only for actual near-dups) + a broadcast-sized join of components back
   * to the corpus + a pure projection for the split. Nothing driver-side.
   */
  def leakFreeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], salt: String): DataFrame = {
    require(splits.nonEmpty && splits.map(_._1).distinct.size == splits.size,
      s"leakFreeSplit: split names must be unique: $splits")
    require(splits.forall(_._2 > 0) && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"leakFreeSplit: fractions must be positive and sum to 1: $splits")
    val clustered = Dedup.dedupClusters(docs, idCol, pairs)
    // draw8 coalesces a NULL cluster to '' — a hand-rolled hash here once
    // made every NULL-cluster row's when-conditions NULL, deterministically
    // routing them ALL to the last split instead of distributing them
    val h = draw8(col("cluster"), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cumFrac)) =>
        val cond = h < lit(hexThreshold(cumFrac))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    clustered.withColumn("split", assigned)
  }

  /**
   * Deterministic global shuffle + shard assignment for training export:
   * shard = md5(id:salt) bucket, position within shard = rank of the md5
   * hex (ties to the id). The training loader reads shard files in pos
   * order and sees a reproducible uniform permutation of the corpus —
   * reshuffling between epochs is just a new salt, with no state to store.
   *
   * Scale shape: one hash projection + one shuffle on the shard key with a
   * per-shard sort (the row_number window). Shards are the parallelism
   * unit: size `nShards` so a shard fits an executor's sort budget
   * (corpus_bytes / nShards ≲ 1 GB) and the window never sees more than
   * one shard per task. NULL ids hash as '' (like [[stratifiedSample]])
   * so no row is silently dropped.
   *
   * Determinism contract: positions are fully reproducible iff `idCol`
   * values are unique — rows sharing an id (including two or more NULL
   * ids) tie on BOTH window sort keys and their relative positions follow
   * partition arrival order. Run [[graft.llm.Dedup.exactKeepMin]] (or any
   * id-dedup) first if the corpus can carry duplicate ids.
   */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    require(nShards >= 1, s"shuffleShards: nShards=$nShards")
    val h = saltedHash(col(idCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      // 8 hex chars = 32 hash bits: the old 4-char (16-bit) prefix capped
      // distinct shard keys at 65,536 — shards beyond that stayed
      // permanently EMPTY and counts near it skewed 2:1, breaking the
      // uniform-permutation contract exactly at the 100k-shard scale the
      // sizing rule above implies
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % nShards)
          .as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /**
   * DSIR-shape importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document by
   * how target-like its hashed-unigram distribution is — the standard
   * cheap pretraining-data selection signal (a raw web corpus reweighted
   * toward a high-quality target domain, then resampled by weight, e.g.
   * via [[mixtureSample]]/[[sampleCond]] on a weight threshold).
   *
   * Features are md5-hashed unigram buckets (the [[TextOps.hashedFeatures]]
   * bucket function). Bucket counts over the target slice (`targetPred`)
   * and the whole corpus are Laplace-smoothed into probabilities, and each
   * token contributes ONE importance ratio
   * `((cT_f + 1) * (NR + D)) / ((NT + D) * (cR_f + 1))` — the rational
   * form of DSIR's log-likelihood-ratio feature. The ln is monotone per
   * term and would cost cross-engine libm parity; the ratio form is IEEE
   * ops over exact integers and the per-document sum folds in token
   * POSITION order, so external engines replay the doubles bit-for-bit
   * (the bm25/bigramLm precedent).
   *
   * Scale shape: one token explode, two D-row feature aggregations joined
   * back (broadcast-sized), one per-document ordered fold. No vocabulary
   * collect; driver state is the two scalar totals.
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, numBuckets: Int = 256): DataFrame = {
    require(numBuckets >= 2, s"dsirWeights: numBuckets=$numBuckets")
    import org.apache.spark.storage.StorageLevel
    val toks = df
      .select(col(idCol), targetPred.as("__t"),
        posexplode(TextOps.words(TextOps.normalize(col(textCol)))).as(Seq("__pos", "__w")))
      .select(col(idCol), col("__t"), col("__pos"),
        TextOps.md5Bucket(col("__w"), numBuckets).as("__f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val tot = toks.agg(count(lit(1)).as("nr"),
        // coalesce: sum() over an EMPTY token table is NULL, and getLong
        // on a null cell throws — an all-blank corpus must yield zero
        // weights, not an NPE
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L)).as("nt"))
        .collect()(0)
      val (nr, nt) = (tot.getLong(0), tot.getLong(1))
      val cR = toks.groupBy("__f").agg(count(lit(1)).as("__cR"))
      val cT = toks.filter(col("__t")).groupBy("__f")
        .agg(count(lit(1)).as("__cT"))
      val feats = cR.join(cT, Seq("__f"), "left").select(col("__f"),
        ((coalesce(col("__cT"), lit(0L)) + 1L).cast("double") *
          lit(nr + numBuckets).cast("double") /
          (lit(nt + numBuckets).cast("double") *
            (col("__cR") + 1L).cast("double"))).as("__wf"))
      val scored = toks.join(feats, Seq("__f"))
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_tokens"),
          aggregate(array_sort(collect_list(struct(col("__pos"), col("__wf")))),
            lit(0.0), (acc, x) => acc + x("__wf")).as("dsir_weight"))
      val out = df.select(col(idCol), targetPred.as("is_target"))
        .join(scored, Seq(idCol), "left")
        .select(col(idCol), col("is_target"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"))
      // localCheckpoint (eager), not cache(): materializes before the
      // token table unpersists below, and the checkpoint blocks are freed
      // by the ContextCleaner when the result is garbage-collected — a
      // cache() entry would leak in the cache manager for the session
      // lifetime on every invocation
      out.localCheckpoint(true)
    } finally toks.unpersist()
  }

  /**
   * Per-group cap (domain balancing, the Common-Crawl "max N pages per
   * host" rule): keep at most `maxPerGroup` rows of each `groupCol` value,
   * best-first by `orderCol` descending with `idCol` ascending as the
   * deterministic tiebreak. Output rows carry their 1-based `group_rank`.
   *
   * Scale shape: one shuffle on the group key. The `row_number() <= k`
   * filter is recognized by Catalyst's WindowGroupLimit rule, which
   * inserts a PARTIAL top-k pass before the exchange — a
   * million-document domain ships only its k best rows per map task, so
   * domain skew never lands on a single reducer's sort. NULL order values
   * rank last on both engines only when pinned explicitly
   * (`desc_nulls_last` here, `DESC NULLS LAST` in SQL oracles): Spark's
   * DESC default is NULLS LAST but DuckDB's is NULLS FIRST. The id
   * tiebreak is pinned ASC NULLS FIRST for the same reason (there the
   * defaults diverge the other way: Spark ASC = NULLS FIRST, DuckDB ASC =
   * NULLS LAST).
   */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      orderCol: String, maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 1, s"capPerGroup: maxPerGroup=$maxPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc_nulls_last, col(idCol).asc_nulls_first)
    df.withColumn("group_rank", row_number().over(w).cast("long"))
      .filter(col("group_rank") <= maxPerGroup)
  }

  /**
   * Per-group quantile bucketing (the CCNet head/middle/tail step): each
   * row gets its within-group quantile bucket of `scoreCol` — bucket 1 =
   * best scores — the standard per-language perplexity-tercile assignment
   * that downstream mixing then samples from. Deterministic total order
   * (score ASC = better first, `idCol` tiebreak, NULLs pinned last) makes
   * the buckets replayable by any engine's `ntile`.
   *
   * Scale shape: one shuffle on the group key and a per-group sort —
   * inherent to EXACT quantiles (every row's bucket depends on the full
   * group distribution). ntile carries no partial top-k shortcut, so a
   * mega-group lands on one reducer's sort: that sort spills rather than
   * OOMs, and when group cardinality is very low vs data (3 languages ×
   * 10 TB) pre-aggregate approximate thresholds instead and bucket by
   * comparison — this operator is the exact form.
   */
  def quantileBuckets(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"quantileBuckets: nBuckets=$nBuckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc_nulls_last, col(idCol).asc_nulls_first)
    df.withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
  }

  /**
   * Quality-budget selection (the FineWeb / DataComp corpus-assembly
   * step): order the corpus by `qualityCol` descending (tiebreak `idCol`
   * ascending) and keep the maximal PREFIX whose cumulative `costCol`
   * (token count) stays within `budget` — "take the best documents until
   * the token budget is spent". Kept rows return with their running
   * `cum_cost` (cost of the row itself included). Strict-prefix
   * semantics: the first document that overflows the budget ends the
   * selection (no knapsack backfill with smaller later documents), which
   * keeps the result a pure function of the ordering and replayable by
   * any engine's window cumsum.
   *
   * Scale shape: the [[globalCumsum]] two-phase cumulative sum, ordered
   * by quality instead of id. The driver holds one long per partition;
   * rows never leave executors. NULL quality sorts last (selected only if
   * budget remains), NULL cost counts 0, and the id tiebreak is pinned
   * ASC NULLS FIRST explicitly (Spark's ASC default; DuckDB's is NULLS
   * LAST — oracle SQL must pin it too if ids can be NULL).
   */
  def budgetSelect(df: DataFrame, idCol: String, costCol: String,
      qualityCol: String, budget: Long, nParts: Int = 32): DataFrame = {
    require(budget > 0, s"budgetSelect: budget=$budget must be positive")
    val ord = Seq(col(qualityCol).desc_nulls_last, col(idCol).asc_nulls_first)
    val base = df.select(col(idCol), col(qualityCol),
      coalesce(col(costCol), lit(0L)).cast("long").as("__cost"))
    globalCumsum(base, ord, "__cost", nParts)
      .withColumnRenamed("__gcum", "cum_cost")
      .filter(col("cum_cost") <= budget)
      .select(col(idCol), col(qualityCol), col("__cost").as(costCol),
        col("cum_cost"))
  }
}
