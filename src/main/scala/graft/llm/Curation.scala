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
  def sampleCond(key: Column, frac: Double, salt: String): Column =
    if (frac <= 0) lit(false)
    else if (frac >= 1) lit(true)
    else substring(md5(concat(coalesce(key.cast("string"), lit("")),
      lit(":" + salt))), 1, 8) < lit(hexThreshold(frac))

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
}
