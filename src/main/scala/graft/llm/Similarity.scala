package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), for training-data curation (near-dup by embedding,
 * retrieval probes).
 *
 * Two paths:
 *  - [[cosineTopK]]: brute force — the *correctness baseline*. The query
 *    set is broadcast; the corpus streams through one narrow projection,
 *    then a per-query top-k window. Cost O(|corpus| × |queries|); right
 *    answer, only sane when queries ≪ corpus.
 *  - [[lshTopK]]: the *scale path* — random-hyperplane (sign) LSH buckets
 *    both sides, the join is an equi-join on bucket id, so the corpus is
 *    probed only where it collides with a query. At 100 TB you'd persist
 *    the bucketed corpus (bucket as partition column of a Delta table) and
 *    prune by bucket at scan time.
 *
 * All arithmetic is double-precision column expressions (zip_with +
 * aggregate) inside codegen — no UDFs, no driver collect of vectors.
 */
object Similarity {

  /** Left-to-right double dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Degenerate-safe ranking cosine: a zero-norm (all-zero / padding)
    * embedding makes the plain cosine 0/0 — under Spark 4's default ANSI
    * mode that THROWS DIVIDE_BY_ZERO and kills the whole query (and with
    * ANSI off it yields NaN, which ranks ABOVE every real score and
    * satisfies `>= threshold`). Guard the norms and map degenerate inputs
    * to -1: ranked last, never passing a positive threshold.
    *
    * Three array passes per call (dot + the two squared norms): the NaN
    * fallback is `nanvl`, not `when(isnan(c), …).otherwise(c)` — a
    * conditional references the cosine twice, and lambda-bearing
    * expressions are excluded from subexpression elimination, so the
    * two-branch form recomputes the whole dot per reference. The join
    * paths below go further and precompute each SIDE's squared norm before
    * the join (one array pass per joined pair instead of three). */
  def rankCosine(a: Column, b: Column): Column = {
    val na2 = dot(a, a)
    val nb2 = dot(b, b)
    when(na2 === 0.0 || nb2 === 0.0, lit(-1.0))
      .otherwise(nanvl(dot(a, b) / (sqrt(na2) * sqrt(nb2)), lit(-1.0)))
  }

  /** [[rankCosine]] over a joined pair whose squared norms were computed
    * per SIDE before the join — the per-pair cost is the single dot pass.
    * `sqrt(n2a) * sqrt(n2b)` (not `sqrt(n2a * n2b)`): per-side square
    * roots keep the result bit-identical to `norm(a) * norm(b)`, which is
    * what the DuckDB oracles replay. */
  private def pairCos(d: Column, n2a: Column, n2b: Column): Column =
    when(n2a === 0.0 || n2b === 0.0, lit(-1.0))
      .otherwise(nanvl(d / (sqrt(n2a) * sqrt(n2b)), lit(-1.0)))

  /** Per-query top-k over a scored (query_id, neighbor_id, <scoreCol>)
    * set — THE ranking definition shared by every path (brute-force, IVF,
    * LSH, quantized, PQ): one copy of the tie-break (ascending neighbor
    * id) and rank semantics, so a fix here cannot diverge the rankers. */
  private def topK(scored: DataFrame, k: Int, scoreCol: String = "cos",
      ascending: Boolean = false): DataFrame = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    val w = Window.partitionBy("query_id").orderBy(ord, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", scoreCol)
  }

  /** The LSH paths hash against `dim`-length hyperplanes; a mismatched
    * vector width makes every plane dot NULL (zip_with null-pads), every
    * bit 0, and every row bucket 0 — silently degrading the equi-join to
    * the all-pairs comparison it exists to avoid. One-row sanity check
    * (note: runs an eager one-row Spark job at call time). Sampled over
    * non-null vectors so a leading null embedding raises the real
    * diagnostic, not a NullPointerException on getInt. */
  /** One-row embedding-width probe over non-null vectors (a leading NULL
    * must raise the real diagnostic, not an NPE on getInt) — THE shared
    * mechanics for every dim check in the package; callers supply their
    * own consequence message. */
  private[llm] def probeWidth(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("__w")).filter(col("__w").isNotNull)
      .limit(1).collect().headOption.map(_.getInt(0))

  private def requireDim(df: DataFrame, vecCol: String, dim: Int, op: String): Unit =
    probeWidth(df, vecCol).foreach { w =>
      require(w == dim,
        s"$op: dim=$dim does not match embedding width $w — " +
          "LSH buckets would collapse to 0 (all-pairs join) / IVF cell " +
          "assignment would go NULL (empty probe join)")
    }

  /** The same width check compiled INTO the plan: EVERY row is validated
    * (a one-row probe misses a ragged corpus) and no eager driver job is
    * scheduled — requireDim's limit(1) collect costs a whole job launch
    * per side, two of which were ~30% of the lshTopK wall on the bench's
    * sub-second row. NULL vectors pass through (callers drop them per the
    * package's NULL rule); the mismatch raises at execution, from inside
    * the same whole-stage-codegen projection that computes the dots. */
  private def guardWidth(vec: Column, dim: Int, op: String): Column =
    when(vec.isNull || size(vec) === dim, vec)
      .otherwise(raise_error(concat(
        lit(s"$op: dim=$dim does not match embedding width "),
        size(vec).cast("string"),
        lit(" — LSH buckets would collapse to 0 (all-pairs join)"))))

  /**
   * Exact cosine top-k: for each row of `queries` (small — it is broadcast),
   * the `k` nearest corpus rows by cosine, ties broken by ascending id.
   * Returns (query_id, neighbor_id, rnk, cos).
   */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // NULL embeddings carry no geometry: admitted, a NULL query would
    // emit k half-null result rows and a NULL corpus row would pad any
    // under-full candidate set with cos=NULL rows — the 'silent garbage'
    // quantizedTopK/pqTopK guard against; same rule here
    val q = broadcast(queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        dot(col(vecCol), col(vecCol)).as("__qn2")))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        dot(col(vecCol), col(vecCol)).as("__cn2"))
    // in-plan width/element guard, POST-HOC: pairCos maps zero norms and
    // NaN to -1.0 and NULL only survives from a NULL dot — i.e. a width
    // mismatch (zip_with null-pads) or a NULL vector element. Previously
    // a 384-dim query against a 512-dim corpus "ranked" k lowest-id
    // neighbors with cos=NULL for every pair — the silent garbage every
    // other ranker guards against, missing only from the brute-force
    // baseline. One null check per pair (a per-pair size() comparison
    // measured ~20-40% slower; a pre-join width probe costs an extra job).
    topK(c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      // bound column FIRST (the distArr discipline: lambda-bearing dot is
      // excluded from subexpression elimination — inlining it into the
      // guard too would run the whole dot twice per pair)
      .withColumn("cos",
        pairCos(dot(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")))
      .withColumn("cos",
        when(col("cos").isNotNull, col("cos")).otherwise(raise_error(lit(
          "cosineTopK: NULL cosine — mismatched embedding widths " +
            "(or NULL vector elements) between query and corpus")))), k)
  }

  /** Deterministic pseudo-random hyperplanes: `nBits` rows × `dim` values in
    * [-1, 1], 3 decimal places (so SQL literals round-trip bit-exactly). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    Array.tabulate(nBits, dim) { (p, j) =>
      // LCG on the flat index — stable across JVMs, no java.util.Random
      val x = (seed + p.toLong * dim + j) * 6364136223846793005L + 1442695040888963407L
      val u = ((x >>> 33) % 2001L).toDouble / 1000.0 - 1.0 // [-1, 1] step .001
      u
    }
  }

  /** Sign-LSH bucket id of a vector column: bit p set iff dot(v, h_p) > 0.
    * Capped at 64 planes: Java's long shift masks its count to p % 64, so
    * plane 64 would silently alias onto bit 0 (vectors disagreeing on
    * plane i still collide via plane i+64 — corrupted buckets, quietly
    * degraded recall) instead of widening the bucket space. */
  def bucketId(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 64,
      s"bucketId: ${planes.length} planes exceed the 64-bit bucket id — " +
        "1L << p wraps at 64 and aliases high planes onto low bits")
    planes.zipWithIndex.map { case (h, p) =>
      val lits = array(h.map(lit): _*)
      when(dot(vec, lits) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Sign-LSH top-k over a corpus whose bucket id is ALREADY a column —
   * the "persist the buckets" deployment of [[lshTopK]]: write the corpus
   * as a Delta table `PARTITIONED BY (bucket)` once, and each query batch
   * reads only its buckets' partitions (partition pruning at the scan, no
   * per-query bucket recompute over the corpus). At 100 TB this turns ANN
   * lookup cost from corpus-linear into |touched partitions|-linear — the
   * composition of the engine's partition pruning with the LSH math.
   * `corpus` is typically `table.scanWhere("bucket IN (…)")`.
   */
  def bucketedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String,
      planes: Array[Array[Double]],
      k: Int): DataFrame = {
    val dim = planes.head.length
    // the CORPUS side is the one most likely to drift — it was persisted
    // separately: check its width AND that the persisted bucket column was
    // computed with THESE planes (one sampled row; stale planes would make
    // the equi-join match semantically different buckets and silently
    // drop true neighbors)
    requireDim(corpus, vecCol, dim, "bucketedTopK")
    corpus.select(col(bucketCol).cast("long").as("__b0"),
        bucketId(col(vecCol), planes).as("__b1"))
      .filter(col("__b0").isNotNull && col("__b1").isNotNull)
      .limit(1).collect().headOption.foreach { r =>
        require(r.getLong(0) == r.getLong(1),
          s"bucketedTopK: persisted $bucketCol=${r.getLong(0)} does not match " +
            s"bucketId recomputed from the supplied planes (${r.getLong(1)}) — " +
            "the corpus was bucketed with different planes")
      }
    requireDim(queries, vecCol, dim, "bucketedTopK")
    // the one-row probes above fast-fail the common mistakes (wrong planes,
    // wrong dim), but a RAGGED persisted corpus (right width in the sampled
    // row, drifted later) slips past any probe by construction — the
    // per-row in-plan guard closes that for this path like lshTopK's
    bucketedTopKUnchecked(corpus, queries, idCol, vecCol, bucketCol, planes, k,
      guardDim = Some((dim, "bucketedTopK")))
  }

  /** [[bucketedTopK]] minus every eager probe — for callers that already
    * validated their sides (the public wrapper probes both), so the hot
    * path schedules zero extra jobs. `guardDim` compiles a per-row
    * [[guardWidth]] check into each side's projection instead (lshTopK's
    * deployment: full validation, no extra jobs). */
  private def bucketedTopKUnchecked(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String,
      planes: Array[Array[Double]],
      k: Int,
      guardDim: Option[(Int, String)] = None): DataFrame = {
    def g(c: Column): Column =
      guardDim.fold(c) { case (dm, op) => guardWidth(c, dm, op) }
    // NULL embeddings: a NULL query hashes to bucket 0 (every plane test
    // false) and would equi-join that whole bucket with cos=NULL — drop
    // both sides' NULL vectors, same rule as cosineTopK/quantizedTopK
    // (the isNotNull filter stays on the RAW column so it pushes to the
    // scan; the guard wraps only the projected copy)
    val q = broadcast(queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        g(col(vecCol)).as("__qv"), dot(col(vecCol), col(vecCol)).as("__qn2"),
        bucketId(col(vecCol), planes).as("__qb")))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), g(col(vecCol)).as("__cv"),
        col(bucketCol).as("__cb"), dot(col(vecCol), col(vecCol)).as("__cn2"))
    topK(c.join(q, col("__cb") === col("__qb") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        pairCos(dot(col("__qv"), col("__cv")), col("__qn2"), col("__cn2"))), k)
  }

  /** Deterministic ±1 sign matrix for [[randomProjection]] (same LCG family
    * as [[hyperplanes]] — stable across JVMs, literal-replayable in SQL). */
  def signMatrix(outDim: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] =
    Array.tabulate(outDim, dim) { (p, j) =>
      val x = (seed + p.toLong * dim + j) * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 33) & 1L) == 0L) 1.0 else -1.0
    }

  /**
   * Johnson–Lindenstrauss random projection to `outDim` dimensions with a
   * dense ±1 sign matrix (Achlioptas' database-friendly construction),
   * scaled by 1/sqrt(outDim). Distances and inner products are preserved in
   * expectation — project once, then run the exact/LSH/IVF rankers in the
   * cheap space; at 100 TB this divides every downstream vector pass (and
   * the memory the ANN joins move) by dim/outDim.
   *
   * Shape: a pure projection — outDim literal-array dot products per row
   * inside codegen, no shuffle, no UDF, no driver state beyond the
   * outDim × dim sign literals. Keep outDim a perfect square of a power of
   * two (default 16 → scale 1/4): the final scaling is then a
   * power-of-two division, fp-exact in any engine, so external systems
   * can replay projected vectors bit-for-bit.
   */
  def randomProjection(df: DataFrame, vecCol: String, outCol: String,
      dim: Int, outDim: Int = 16, seed: Long = 7L): DataFrame = {
    require(outDim >= 1, s"randomProjection: outDim=$outDim")
    requireDim(df, vecCol, dim, "randomProjection")
    val signs = signMatrix(outDim, dim, seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val comps = signs.map { row =>
      dot(col(vecCol), array(row.map(lit): _*)) * lit(scale)
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Array of cosines of `vec` against literal `centroids` (zero-norm and
    * NaN guarded to -1; each centroid's norm a compile-time constant with
    * the same left-to-right summation order as `dot`, so values are
    * bit-identical to norm(c)). Shared by [[ivfTopK]] and the IVF routing
    * inside [[pqTopK]]. */
  private def centroidCosArr(centroids: Array[Array[Double]])(
      vec: Column, nv2: Column): Column =
    array(centroids.map { c =>
      val cn = math.sqrt(c.foldLeft(0.0)((acc, x) => acc + x * x))
      if (cn == 0.0) lit(-1.0)
      else when(nv2 === 0.0, lit(-1.0))
        .otherwise(nanvl(dot(vec, array(c.map(lit): _*)) / (sqrt(nv2) * lit(cn)),
          lit(-1.0)))
    }: _*)

  /**
   * IVF (inverted-file) ANN: a coarse quantizer splits the corpus into
   * `nCells` cells; each query probes only its `nProbe` nearest cells and
   * ranks that slice of the corpus — |corpus| × nProbe / nCells candidate
   * work instead of brute force. Centroids are the first `nCells` corpus
   * vectors by id (a deterministic one-shot quantizer; production would
   * refine them with a few distributed k-means rounds — the
   * assignment/probe machinery below is identical either way).
   *
   * Scale shape: cell assignment is a shuffle-FREE projection (argmax over
   * an array of centroid cosines, first-max tie-break = lowest cell id);
   * the probe is an equi-join on cell id with the query side broadcast. At
   * 100 TB, persist the corpus with `cell` as a partition column and the
   * probed cells prune at scan time.
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 2,
      trainedCentroids: Option[Array[Array[Double]]] = None): DataFrame = {
    // quantizer: either externally trained centroids (e.g.
    // [[Clustering.kmeansCentroids]] — the production path: train once,
    // reuse across queries) or the first-nCells one-shot fallback.
    // The fallback is a tiny driver collect: nCells × dim doubles.
    // NULL embeddings are excluded (a null among the first nCells ids would
    // NPE on the driver) and the centroid width anchors a one-row width
    // check below — a width-mismatched corpus otherwise yields NULL cosine
    // arrays, NULL cells, and a silently empty probe join.
    val centroids: Array[Array[Double]] = trainedCentroids.getOrElse(corpus
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(_.getSeq[Double](1).toArray))
    require(centroids.nonEmpty, "ivfTopK: corpus has no non-null embeddings")
    requireDim(corpus, vecCol, centroids(0).length, "ivfTopK corpus")
    requireDim(queries, vecCol, centroids(0).length, "ivfTopK queries")

    // the nCells-cosine array is MATERIALIZED as its own column before the
    // argmax/probe expressions consume it: lambda-bearing expressions are
    // excluded from Spark's subexpression elimination, so inlining cosArr
    // into both array_position and array_max would recompute all
    // nCells x dim cosine arithmetic per reference. The row's squared norm
    // (`nv2`) is likewise a materialized column, and each centroid's norm
    // is a compile-time Scala constant (same left-to-right summation order
    // as the `dot` aggregate, so the value is bit-identical) — per row the
    // array does nCells dot passes, not 3 × nCells.
    def cosArr(vec: Column, nv2: Column): Column =
      centroidCosArr(centroids)(vec, nv2)

    // NULL embeddings: same rule as every sibling ranker (cosineTopK) —
    // unfiltered, a NULL query still explodes nProbe probe cells and
    // row_number hands it k arbitrary NULL-cosine "neighbors"
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        dot(col(vecCol), col(vecCol)).as("__cn2"))
      .withColumn("__ca", cosArr(col("__cv"), col("__cn2")))
      .withColumn("__cell",
        (array_position(col("__ca"), array_max(col("__ca"))) - 1).cast("int"))
      .drop("__ca")
    // top-nProbe cell ids: sort (cos desc, index asc) via struct keys
    val q = broadcast(queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        dot(col(vecCol), col(vecCol)).as("__qn2"))
      .withColumn("__ca", cosArr(col("__qv"), col("__qn2")))
      .withColumn("__probe", explode(slice(transform(sort_array(transform(col("__ca"),
        (cc, i) => struct((-cc).as("nc"), i.as("i")))), st => st("i")), 1, nProbe)))
      .drop("__ca"))
    topK(c.join(q, col("__probe") === col("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        pairCos(dot(col("__qv"), col("__cv")), col("__qn2"), col("__cn2"))), k)
  }

  /**
   * Scalar-quantized (int8-style) ANN: every embedding is encoded to one
   * integer code in [0, 255] per dimension against corpus-wide per-dim
   * min/max, and ranking runs on the integer dot product of the codes —
   * the classic memory-bandwidth play (4× smaller vectors than fp32, 8×
   * smaller than fp64, exact integer arithmetic in the hot loop).
   *
   * Scale shape: the per-dim stats are ONE partially-aggregated row
   * (2 × dim doubles) broadcast everywhere; encoding is a shuffle-free
   * projection; the scan is brute force over codes here (the correctness
   * baseline) — at 100 TB you persist the coded corpus once (codes as an
   * `array<smallint>` column of a Delta table) and put the IVF/LSH
   * bucketing from [[ivfTopK]]/[[lshTopK]] in front, which composes
   * because encoding is per-row.
   *
   * Integer scores make cross-engine verification exact: any engine that
   * replays min/max + the rounding formula gets bit-identical codes and
   * therefore identical scores — no FP-summation-order caveats at all.
   *
   * @return (query_id, neighbor_id, rnk, score) — score = Σ qcode·ccode
   */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int): DataFrame = {
    requireDim(corpus, vecCol, dim, "quantizedTopK corpus")
    // a width-mismatched QUERY side would zip_with-null-pad every code
    // product into NULL scores while the top-k window still emits k rows —
    // silent garbage, so both sides are checked
    requireDim(queries, vecCol, dim, "quantizedTopK queries")
    val v = col(vecCol).cast("array<double>")

    // one broadcastable row of per-dimension [min, max] over the corpus.
    // NaN elements map to NULL first (nanvl): NaN sorts GREATEST in Spark
    // aggregates, so one bad corpus row previously poisoned that
    // dimension's max — every code computed round(NaN), which throws
    // CAST_INVALID_INPUT under ANSI (whole query dead on one row) or
    // silently zeroed the dimension with ANSI off. NULL already rides the
    // aggregate/code NULL handling.
    val statsOf = (vc: Column) => transform(vc, x => nanvl(x, lit(null)))
    val stats = broadcast(corpus.select(statsOf(v).as("__v")).agg(
      array((0 until dim).map(i => min(element_at(col("__v"), i + 1))): _*).as("__mn"),
      array((0 until dim).map(i => max(element_at(col("__v"), i + 1))): _*).as("__mx")))

    // code_i = round((x_i - mn_i) * 255 / (mx_i - mn_i)); constant
    // dimensions encode as 0. Codes SATURATE to [0, 255] like a real int8
    // quantizer: corpus rows are in [mn, mx] by construction (clamp is a
    // no-op there) but QUERY values are not — an out-of-range query
    // dimension previously produced a negative/overflowing code whose
    // products silently corrupted the ranking. HALF_UP rounding ==
    // round-half-away-from-zero (the common SQL round).
    def codes(vc: Column): Column =
      transform(vc, (x, i) => {
        val mn = element_at(col("__mn"), i + 1)
        val mx = element_at(col("__mx"), i + 1)
        when(mx === mn, lit(0L))
          .otherwise(greatest(lit(0L), least(lit(255L),
            round((x - mn) * lit(255.0) / (mx - mn)).cast("long"))))
      })

    // NULL and NaN-bearing embeddings drop on BOTH sides (the pqTopK
    // discipline, extended: a NaN element carries no geometry either —
    // passing it through produced a NULL code whose products silently
    // mis-ranked the row, or an ANSI cast error)
    def usable(vc: Column): Column =
      vc.isNotNull && !exists(vc, x => isnan(x))
    val c = corpus.select(col(idCol).as("neighbor_id"), v.as("__cv"))
      .filter(usable(col("__cv")))
      .crossJoin(stats)
      .select(col("neighbor_id"), codes(col("__cv")).as("__cc"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), v.as("__qv"))
      .filter(usable(col("__qv")))
      .crossJoin(stats)
      .select(col("query_id"), codes(col("__qv")).as("__qc")))

    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        aggregate(zip_with(col("__qc"), col("__cc"), (a, x) => a * x),
          lit(0L), (acc, x) => acc + x))
    topK(scored, k, scoreCol = "score")
  }

  /**
   * Product-quantization ANN (PQ with asymmetric distance computation —
   * Jégou et al., "Product Quantization for Nearest Neighbor Search"):
   * vectors are split into `m` subspaces; each subvector is replaced by the
   * id of its nearest codebook entry, compressing dim fp32 values to `m`
   * small integers (64-dim fp32 → 8 bytes at m=8: 32× smaller). Queries
   * stay full-precision: each query precomputes an m×codebookSize distance
   * table once, and every corpus distance is then `m` table lookups — no
   * per-pair floating arithmetic at all.
   *
   * Scale shape: encoding is a shuffle-free projection (the codebooks are
   * literal expressions); the distance table rides the broadcast query
   * side; scoring is lookups + a short fold. At 100 TB you persist the
   * codes column once (train-once codebooks via `trainIters > 0` /
   * [[Clustering.kmeansCentroids]]) and put IVF bucketing in front —
   * encoding composes with cell assignment because both are per-row.
   *
   * Determinism: codebook init is the first `codebookSize` vectors by id;
   * encoding ties break toward the lowest code; the ADC sum folds
   * subspaces in ascending order. With `trainIters = 0` every value is an
   * exact replayable IEEE expression (the oracle path); with training the
   * codebooks inherit [[Clustering]]'s exact-mode guarantees if requested.
   *
   * @return (query_id, neighbor_id, rnk, dist2) — dist2 = ADC distance,
   *         rank 1 = nearest
   */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      m: Int = 8,
      codebookSize: Int = 16,
      trainIters: Int = 0,
      exactTrain: Boolean = false,
      nCells: Int = 0,
      nProbe: Int = 2): DataFrame = {
    require(m >= 1 && dim % m == 0, s"pqTopK: dim=$dim not divisible by m=$m")
    require(codebookSize >= 1, "pqTopK: codebookSize must be >= 1")
    require(nCells >= 0 && (nCells == 0 || nProbe >= 1),
      s"pqTopK: nCells=$nCells nProbe=$nProbe")
    requireDim(corpus, vecCol, dim, "pqTopK corpus")
    requireDim(queries, vecCol, dim, "pqTopK queries")
    val sub = dim / m
    val v = col(vecCol).cast("array<double>")
    // NULL embeddings are dropped on BOTH sides: a null corpus vector
    // encodes to null codes → NULL ADC distance, and Spark's ASC window
    // order is NULLS FIRST — the null row would take rank 1 of every query
    val corpusNN = corpus.filter(col(vecCol).isNotNull)
    val queriesNN = queries.filter(col(vecCol).isNotNull)

    // codebooks[s][c][j]: trainIters=0 slices the first codebookSize
    // vectors (one-shot, exactly replayable); otherwise per-subspace
    // k-means over the subvectors (m small training jobs, train-once)
    val codebooks: Array[Array[Array[Double]]] =
      if (trainIters == 0) {
        val seeds = corpusNN.select(col(idCol), v.as("__v"))
          .orderBy(col(idCol)).limit(codebookSize)
          .collect().map(_.getSeq[Double](1).toArray)
        require(seeds.nonEmpty, "pqTopK: corpus has no non-null embeddings")
        Array.tabulate(m)(s => seeds.map(_.slice(s * sub, (s + 1) * sub)))
      } else Array.tabulate(m) { s =>
        Clustering.kmeansCentroids(
          corpusNN.select(col(idCol), slice(v, s * sub + 1, sub).as("__sv")),
          idCol, "__sv", codebookSize, trainIters, exactTrain)
      }
    // the ACTUAL codebook length — a corpus smaller than codebookSize
    // yields fewer entries, and the flattened ADC table below is laid out
    // with this stride (striding by the REQUESTED size would read another
    // subspace's distances, or index past the table under ANSI)
    val cbLen = codebooks(0).length

    // squared distance of subspace s of a vector to codebook entry cb,
    // folded in ascending in-subspace order
    def subDist2(vc: Column, s: Int, cb: Array[Double]): Column =
      aggregate(zip_with(slice(vc, s * sub + 1, sub), array(cb.map(lit): _*),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

    // IVF routing (nCells > 0, the FAISS IVF-PQ composition): a one-shot
    // coarse quantizer assigns every corpus row a cell from its FULL
    // vector before coding; queries probe their nProbe nearest cells and
    // the candidate join becomes the cell equi-join instead of the
    // brute-force cross join — |corpus| × nProbe / nCells ADC work.
    val ivfCentroids: Array[Array[Double]] =
      if (nCells == 0) Array.empty
      else {
        val cs = corpusNN.select(col(idCol), v.as("__v0"))
          .orderBy(col(idCol)).limit(nCells)
          .collect().map(_.getSeq[Double](1).toArray)
        require(cs.nonEmpty, "pqTopK: corpus has no non-null embeddings")
        cs
      }

    // corpus encoding: per subspace, bind the distance array then argmin
    // (ties → lowest code id); codes assembled into one array<int> column
    var c = corpusNN.select(col(idCol).as("neighbor_id"), v.as("__cv"))
    if (nCells > 0) {
      c = c.withColumn("__cn2", dot(col("__cv"), col("__cv")))
        .withColumn("__ca", centroidCosArr(ivfCentroids)(col("__cv"), col("__cn2")))
        .withColumn("__cell",
          (array_position(col("__ca"), array_max(col("__ca"))) - 1).cast("int"))
        .drop("__ca", "__cn2")
    }
    for (s <- 0 until m) {
      val darr = array(codebooks(s).map(cb => subDist2(col("__cv"), s, cb)): _*)
      c = c.withColumn(s"__pqd$s", darr)
        .withColumn(s"__pqc$s",
          (array_position(col(s"__pqd$s"), array_min(col(s"__pqd$s"))) - 1).cast("int"))
        .drop(s"__pqd$s")
    }
    val codedCols = col("neighbor_id") +:
      (if (nCells > 0) Seq(col("__cell")) else Nil) :+
      array((0 until m).map(s => col(s"__pqc$s")): _*).as("__codes")
    val coded = c.select(codedCols: _*)

    // query side: flattened ADC table [s * cbLen + c] bound once
    val dt = array((for (s <- 0 until m; cb <- codebooks(s))
      yield subDist2(col("__qv"), s, cb)): _*)
    val q0 = queriesNN.select(col(idCol).as("query_id"), v.as("__qv"))
      .withColumn("__dt", dt)
    val q = broadcast(
      if (nCells > 0)
        q0.withColumn("__qn2", dot(col("__qv"), col("__qv")))
          .withColumn("__qa", centroidCosArr(ivfCentroids)(col("__qv"), col("__qn2")))
          .withColumn("__probe", explode(slice(transform(sort_array(
            transform(col("__qa"), (cc, i) => struct((-cc).as("nc"), i.as("i")))),
            st => st("i")), 1, nProbe)))
          .drop("__qa", "__qn2", "__qv")
      else q0.drop("__qv"))

    // ADC score: m table lookups folded in subspace order
    val joined =
      if (nCells > 0) coded.join(q, col("__probe") === col("__cell"))
      else coded.crossJoin(q)
    val scored = joined
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dist2",
        aggregate(
          transform(col("__codes"), (code, s) =>
            element_at(col("__dt"), s * cbLen + code + 1)),
          lit(0.0), (acc, x) => acc + x))
    topK(scored, k, scoreCol = "dist2", ascending = true)
  }

  /**
   * Embedding near-duplicate pairs: all (id_a < id_b) with cosine ≥
   * `threshold`, found via sign-LSH bucketing (equi-join on bucket id — NOT
   * an all-pairs cross join) and verified exactly. Bucketing costs recall
   * for pairs straddling a hyperplane; raise `nBits` multi-probe style by
   * unioning rotated plane sets when higher recall is needed.
   */
  def cosineNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nBits: Int = 4,
      dim: Int = 64): DataFrame = {
    requireDim(corpus, vecCol, dim, "cosineNearDups")
    val planes = hyperplanes(nBits, dim)
    // NULL embeddings all land in bucket 0 (every plane test false) and
    // inflate its self-join quadratically; their cos is NULL and filtered
    // anyway — drop them before bucketing
    val b = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
      dot(col(vecCol), col(vecCol)).as("__n2"),
      bucketId(col(vecCol), planes).as("__bucket"))
    val l = b.select(col("__id").as("id_a"), col("__v").as("__va"),
      col("__n2").as("__na2"), col("__bucket"))
    val r = b.select(col("__id").as("id_b"), col("__v").as("__vb"),
      col("__n2").as("__nb2"), col("__bucket").as("__bucket2"))
    l.join(r, col("__bucket") === col("__bucket2") && col("id_a") < col("id_b"))
      .withColumn("cos",
        pairCos(dot(col("__va"), col("__vb")), col("__na2"), col("__nb2")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /**
   * Bucketed ANN: top-k among corpus vectors sharing the query's LSH bucket.
   * Trades recall for a candidate set ~|corpus| / 2^nBits per query.
   */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    // one pipeline, two deployments: on-the-fly buckets here, persisted
    // (Delta-partition) buckets in bucketedTopK — delegating keeps the
    // join/score/rank semantics a single definition. Unchecked variant:
    // the bucket column was computed HERE with THESE planes, so the
    // persisted-bucket probes would be tautological eager jobs; width
    // validation rides guardDim (per-row, in-plan) instead of requireDim's
    // two eager one-row jobs — full coverage at zero extra job launches.
    bucketedTopKUnchecked(
      corpus.withColumn("__bucket", bucketId(col(vecCol), planes)),
      queries, idCol, vecCol, "__bucket", planes, k,
      guardDim = Some((dim, "lshTopK")))
  }
}
