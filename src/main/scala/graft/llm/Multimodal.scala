package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride along as
 * opaque `binary` columns with typed metadata; decode / feature-extraction
 * runs as a per-partition batch transform (`mapPartitions`), the Scala
 * analogue of a Pandas UDF over `mapInPandas` — the Spark-side schema,
 * partitioning and batch shape are real, only the codec itself is stubbed
 * (no image/audio libraries in this environment).
 */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of a text column,
    * standing in for image/audio bytes read from an object store). */
  def withPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Typed metadata over an opaque payload — size, content digest — pure
    * column expressions, no decode needed. This is the cheap pass you run
    * over 100 TB first (dedup by digest, drop empties) before any decode. */
  def payloadMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("digest"))

  /**
   * STUB DECODE — deterministic fake feature extractor.
   *
   * A real deployment replaces `fakeDecode` with an actual codec (JPEG
   * decode + resize, audio frame FFT, …). Everything around it — the
   * per-partition batching, the output schema, null passthrough — is the
   * production shape: one task per input split, no shuffle, output schema
   * declared up front so Catalyst can prune/plan around it.
   */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(pIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](pIdx)
        Row(r.get(idIdx), fakeDecode(payload, dim))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /**
   * Frame sampling: `nFrames` evenly-spaced fixed-size windows over the
   * payload (the video-keyframe / audio-clip access pattern). Pure codegen
   * column expressions — explode + substr + hex, no UDF, so the whole
   * operator stays inside WholeStageCodegen and scales as a narrow map.
   * Output: (id, frame_idx, frame_hex); a real pipeline would feed each
   * frame to the decode stage instead of hex-digesting it.
   */
  def frameSample(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      nFrames: Int = 4,
      frameSize: Int = 16): DataFrame = {
    // sequence(0, nFrames-1) with nFrames = 0 would auto-step BACKWARDS to
    // [0, -1] and emit bogus frames instead of failing
    require(nFrames >= 1, s"frameSample: nFrames must be >= 1, got $nFrames")
    require(frameSize >= 1, s"frameSample: frameSize must be >= 1, got $frameSize")
    val len = length(col(payloadCol)).cast("long")
    // long math: int*int offset arithmetic overflows (and throws under
    // ANSI) for payloads over ~715 MB at the default nFrames
    val off = (lit(1L) + floor(col("__fi").cast("long") * len / lit(nFrames))).cast("int")
    // NULL **and empty** payloads emit NO frames (matching windowEnergy's
    // no-complete-frame contract) — exploding first would fabricate
    // nFrames phantom rows of NULL/'' hex that a per-doc frame count
    // would mistake for real frames
    df.filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol), col(payloadCol),
        explode(sequence(lit(0), lit(nFrames - 1))).as("__fi"))
      .select(col(idCol), col("__fi").cast("long").as("frame_idx"),
        hex(col(payloadCol).substr(off, lit(frameSize))).as("frame_hex"))
  }

  /** Nearest-neighbor byte resample to a fixed budget of `k` sample
    * points — the structural stand-in for image resize (same shape: fixed
    * output size regardless of input size, evenly-spaced source taps).
    * Pure column expressions, `k` unrolled at plan time. */
  def resampleHex(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"resampleHex: k must be >= 1, got $k")
    val len = length(col(payloadCol)).cast("long")
    val parts = (0 until k).map { j =>
      hex(col(payloadCol).substr(
        (lit(1L) + floor(lit(j.toLong) * len / lit(k))).cast("int"), lit(1)))
    }
    df.select(col(idCol), concat_ws("", parts: _*).as("resized_hex"))
  }

  /**
   * Audio-style windowed energy over a binary payload: bytes read as
   * centered 8-bit PCM samples (b − 128), framed into `window`-sample
   * frames advancing by `hop`, per-frame energy = Σ s² — the
   * voice-activity / silence-trim precursor every audio pipeline runs
   * before a codec ever loads. Exact INTEGER energies (no division, no
   * floats), so any engine replays them bit-for-bit from the hex form.
   * Only COMPLETE frames are emitted; payloads shorter than `window`
   * produce no rows (documented, like frameSample's contract).
   *
   * Pure column expressions over hex(payload): one per-row transform +
   * posexplode — no UDF, no shuffle; at 100 TB this is a narrow map over
   * the payload scan.
   */
  def windowEnergy(df: DataFrame, idCol: String, payloadCol: String,
      window: Int = 64, hop: Int = 32): DataFrame = {
    require(window >= 1, s"windowEnergy: window=$window")
    require(hop >= 1, s"windowEnergy: hop=$hop")
    // Each lambda-consumed array is BOUND as a column attribute (hex →
    // samples → energies) instead of nesting one Column expression: a free
    // (non-lambda-variable) expression inside a higher-order function's
    // lambda is re-evaluated per ELEMENT on the interpreted eval path
    // (HOFs don't participate in codegen), so the nested shape re-ran
    // hex(payload) for every BYTE inside the sample decode and the whole
    // O(bytes) sample decode again for every FRAME inside the energy
    // transform — O(bytes² · frames) interpreted work per document (the
    // winnowFingerprints fix, same mechanism). Bound attributes make each
    // stage evaluate once per row; slices then read the materialized
    // array, which is the "decode each byte ONCE" shape the previous
    // comment claimed but the unbound expression tree did not deliver.
    val hx = col("__wehx")
    val nBytes = (length(hx) / 2).cast("int")
    def byteAt(pos: org.apache.spark.sql.Column) =
      conv(substring(hx, pos * 2 + 1, lit(2)), 16, 10).cast("long")
    val samples =
      when(nBytes === 0, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(0), nBytes - 1), p => byteAt(p) - 128L))
    val smp = col("__wesmp")
    val nWin = when(size(smp) < window, lit(0))
      .otherwise((size(smp) - window) / hop + 1).cast("int")
    val energies =
      when(nWin === 0, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(0), nWin - 1), w =>
          aggregate(slice(smp, w * hop + 1, lit(window)), lit(0L),
            (acc, x) => acc + x * x)))
    // posexplode_outer + IS NOT NULL rather than posexplode for the same
    // reason as winnowFingerprints: with a CHEAP generator child (the
    // bound attribute), InferFiltersFromGenerate adds size(child) > 0 and
    // predicate pushdown re-substitutes the WHOLE decode pipeline into
    // that filter BELOW the binding projections (everything computed
    // twice). Outer generate blocks the inference; the null filter on the
    // OUTPUT is exact: a real frame's energy is a non-null long (integer
    // aggregate over non-null samples), so only the empty/null-array
    // padding rows die — precisely the rows plain posexplode dropped
    // (short payloads: nWin=0 empty array; NULL payload: hex→samples→
    // energies all NULL, dropped before and filtered now).
    df.select(col(idCol), hex(col(payloadCol)).as("__wehx"))
      .select(col(idCol), samples.as("__wesmp"))
      .select(col(idCol), energies.as("__weeng"))
      .select(col(idCol),
        posexplode_outer(col("__weeng")).as(Seq("frame_idx", "energy")))
      .filter(col("energy").isNotNull)
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
        col("energy"))
  }

  /** Deterministic stand-in for a media codec: dim byte-histogram-ish floats.
    * Replace with the real decoder; the pipeline around it is unchanged.
    * LONG accumulation (an Int slot would wrap past ~8 MB/slot of payload)
    * with the exact sum divided in DOUBLE before the single fp32 rounding
    * step, so an external oracle summing in int64/fp64 reproduces the float
    * bit-for-bit at any payload size. */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += bytes(i) & 0xFF
      i += 1
    }
    acc.map(s => (s.toDouble / 256.0).toFloat)
  }
}
