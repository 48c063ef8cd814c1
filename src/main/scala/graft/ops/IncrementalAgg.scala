package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.table.DeltaTable

/**
 * Incremental aggregate maintenance — the lakehouse materialized-view
 * pattern composed from three primitives this engine already ships: the
 * change feed (`crates/core/src/operations/load_cdf.rs`), application
 * transactions (`kernel/models/actions.rs:1042` `txn`), and MERGE
 * (`operations/merge/mod.rs`). The reference exposes the primitives but
 * not the composition; at 100 TB this is how a downstream rollup table
 * stays fresh without re-aggregating the world.
 *
 * `target` is maintained as `upstream GROUP BY keyCols` with `cnt =
 * count(*)`, `sum_<c> = sum(<c>)` and `nn_<c> = count(<c>)` per sum
 * column. The non-null count is what reproduces SQL `sum()` NULL
 * semantics exactly: a group whose `<c>` values are all NULL carries
 * `sum_<c> = NULL` (not 0), flipping to/from NULL as non-null rows
 * enter and leave the group. Each refresh:
 *
 *  1. reads the target's `txn` version for this pipeline's appId — the
 *     upstream version already folded in (exactly-once bookkeeping rides
 *     the same commit as the data, so a crashed refresh replays cleanly
 *     and a concurrent duplicate refresh conflicts instead of
 *     double-applying);
 *  2. first refresh aggregates the pinned upstream snapshot directly
 *     (cheaper than CDF legs and requires nothing of table history);
 *     later refreshes read ONLY the change feed of the new commits:
 *     inserts/update_postimages count +1, deletes/update_preimages −1,
 *     so the signed partial aggregate per key is the exact group delta;
 *  3. MERGEs the deltas into the target: groups whose count reaches zero
 *     are deleted, existing groups updated in place, new groups inserted.
 *
 * Scale shape: one CDF scan of the NEW commits only (partition-pruned
 * legs), one signed partial aggregation (map-side combine, |keys| rows),
 * one MERGE whose source is the tiny delta table — broadcast side of the
 * join at any realistic group cardinality. No driver state beyond the
 * version scalar.
 *
 * Sum columns must be integral (the maintained sums are exact LONGs;
 * floating sums would drift under incremental re-ordering).
 */
object IncrementalAgg {

  /** appId recording the last-folded upstream version on the TARGET. */
  def appIdFor(upstream: DeltaTable): String =
    s"graft-incr-agg:${upstream.tablePath}"

  /**
   * Refresh `targetPath` from `upstream`'s changes. Creates the target on
   * first use. Returns merge metrics plus `refreshed_from`/`refreshed_to`
   * (or `no_op=true` when the upstream has no new commits).
   */
  def refresh(upstream: DeltaTable, targetPath: String,
              keyCols: Seq[String], sumCols: Seq[String]): Map[String, String] = {
    require(keyCols.nonEmpty, "IncrementalAgg: at least one key column")
    // the target schema appends cnt / sum_<c> / nn_<c> bookkeeping columns
    // — a key or sum column with one of those names would build a
    // duplicate-field StructType and collide in the merge's update map
    val reserved = Set("cnt") ++ sumCols.flatMap(c => Seq(s"sum_$c", s"nn_$c"))
    val clash = (keyCols ++ sumCols).filter(reserved.contains)
    require(clash.isEmpty,
      s"IncrementalAgg: column name(s) ${clash.mkString(", ")} collide with " +
        "the target's bookkeeping columns (cnt, sum_<c>, nn_<c>)")
    val spark = upstream.spark
    val upSnap = upstream.refresh()
    val endV = upSnap.version
    sumCols.foreach { c =>
      val dt = upSnap.schema(c).dataType
      require(Seq("tinyint", "smallint", "int", "bigint").contains(dt.simpleString),
        s"IncrementalAgg: sum column '$c' must be integral, got ${dt.simpleString}")
    }

    val appId = appIdFor(upstream)
    val target =
      if (DeltaTable.isDeltaTable(spark, targetPath)) DeltaTable.forPath(spark, targetPath)
      else {
        val schema = org.apache.spark.sql.types.StructType(
          keyCols.map(k => upSnap.schema(k)) ++
            Seq(org.apache.spark.sql.types.StructField("cnt",
              org.apache.spark.sql.types.LongType)) ++
            sumCols.flatMap(c => Seq(
              org.apache.spark.sql.types.StructField(s"sum_$c",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField(s"nn_$c",
                org.apache.spark.sql.types.LongType))))
        // stats must cover every nn_ column or the torn-migration probe
        // below (per-file nullCount) never reads clear and EVERY healthy
        // refresh pays its limit(1) scan fallback — a wide rollup pushes
        // nn_ columns past the default 32-column indexed prefix
        DeltaTable.create(spark, targetPath, schema, Nil, configuration =
          Map("delta.dataSkippingNumIndexedCols" -> schema.size.toString))
        DeltaTable.forPath(spark, targetPath)
      }

    // migration: a target created before nn_ bookkeeping gains the columns
    // plus an EXACT backfill — count(<c>) per group over the pinned
    // already-folded upstream version, and sums of groups that turn out
    // all-NULL flip from the legacy 0 to NULL. Without this, the merge
    // below would fail analysis on target.nn_<c> with no recovery path
    // short of rebuilding the rollup.
    // ONE refresh feeds the whole decision block: reading txnVersion off
    // the handle's first-touch snapshot would pay a separate log
    // listing/replay that this refresh immediately repeats — and would
    // read lastV from a different snapshot than the probes below
    val tgtSchema = target.refresh().schema
    val lastV = target.txnVersion(appId)
    val missingNn = sumCols.filter(c => !tgtSchema.fieldNames.contains(s"nn_$c"))
    // TORN migration: the addColumns commit landed but the process died
    // before the backfill merge — the columns exist, their values are
    // NULL, and the missing-column check alone would skip the backfill
    // FOREVER (NULL nn_ then poisons every subsequent delta silently).
    // A complete migration leaves no NULL nn_ (the backfill merges every
    // group; the update path always writes it), so one NULL row over a
    // positive lastV means: rerun the backfill — it is idempotent (exact
    // recount over the same pinned upstream version).
    // Probe cost discipline: the steady-state (healthy) refresh must not
    // pay a data scan for this. Per-file nullCount stats answer "any NULL
    // nn_?" driver-side; only files WITHOUT stats coverage for the nn_
    // columns force the one-row scan fallback.
    def nnMaybeNull: Boolean = {
      val schema = target.snapshot.schema
      val statsClear = target.snapshot.allFiles.forall { f =>
        f.stats.exists { s =>
          val parsed = scala.util.Try(
            graft.kernel.StatsPruning.parseStats(s, schema)).toOption
          parsed.exists(p => sumCols.forall(c =>
            p.nullCount.get(s"nn_$c").contains(0L)))
        }
      }
      if (statsClear) false
      else target.toDF.filter(
        sumCols.map(c => col(s"nn_$c").isNull).reduce(_ || _))
        .limit(1).count() > 0
    }
    val tornNn =
      if (missingNn.isEmpty && sumCols.nonEmpty && lastV.isDefined && nnMaybeNull)
        sumCols
      else Nil
    val backfillCols = if (missingNn.nonEmpty) missingNn else tornNn
    if (backfillCols.nonEmpty) {
      val v = lastV.getOrElse(throw new IllegalStateException(
        s"IncrementalAgg: target $targetPath lacks ${backfillCols.map("nn_" + _).mkString(",")} " +
          "but records no folded upstream version to backfill from — rebuild it"))
      if (missingNn.nonEmpty) {
        target.addColumns(org.apache.spark.sql.types.StructType(
          missingNn.map(c => org.apache.spark.sql.types.StructField(s"nn_$c",
            org.apache.spark.sql.types.LongType))))
        // widen stats coverage to the migrated width (the create-path
        // property, applied late): future file stats then index the nn_
        // columns and the torn-migration probe stays driver-side. A
        // separate commit, crash-safe — if it never lands, the limit(1)
        // scan fallback still answers the probe correctly.
        target.setProperties(Map("delta.dataSkippingNumIndexedCols" ->
          (tgtSchema.size + missingNn.size).toString))
      }
      val backfillAggs = backfillCols.map(c => count(col(c)).as(s"__bf_$c"))
      val backfill = upstream.asOfVersion(v).groupBy(keyCols.map(col): _*)
        .agg(backfillAggs.head, backfillAggs.tail: _*)
      val bfCond = keyCols.map(k => s"target.`$k` <=> source.`$k`").mkString(" AND ")
      target.merge(backfill, bfCond)
        .whenMatchedUpdate(backfillCols.flatMap(c => Seq(
          s"nn_$c" -> s"source.__bf_$c",
          s"sum_$c" ->
            s"CASE WHEN source.__bf_$c = 0 THEN CAST(NULL AS BIGINT) ELSE target.sum_$c END"))
          .toMap)
        .execute()
    }

    if (lastV.exists(_ >= endV))
      return Map("no_op" -> "true", "at_version" -> endV.toString)

    // signed change rows: +1 rows entering the aggregate, -1 rows leaving
    val signed: DataFrame = lastV match {
      case None =>
        // a first fold requires an EMPTY target: no recorded txn version
        // on a populated rollup is ambiguous — either fresh, or the
        // upstream path SPELLING changed (s3a vs mount, trailing slash)
        // so appIdFor derives a new id — and folding the full snapshot
        // into existing groups would silently DOUBLE every count/sum,
        // then commit the corruption under exactly-once bookkeeping
        // emptiness check is stats-first: sum(numRecords) net of DV
        // cardinalities answers without touching data files; only a
        // stats-absent target (foreign writer without footer stats)
        // pays the full-scan fallback
        def targetEmpty: Boolean = {
          val snap = target.snapshot
          snap.numFiles == 0 || (snap.approxNumRecords match {
            case Some(n) => n == 0L
            case None    => target.toDF.isEmpty
          })
        }
        require(targetEmpty,
          s"IncrementalAgg: target $targetPath is populated but records " +
            s"no folded version for this upstream (appId changed? " +
            "upstream path spelling must stay stable) — refusing a " +
            "full-snapshot fold that would double every group; rebuild " +
            "the target or restore the original upstream path")
        upstream.asOfVersion(endV).withColumn("__sign", lit(1L))
      case Some(v) =>
        upstream.loadCdf(v + 1, Some(endV)).withColumn("__sign",
          when(col("_change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L))
    }
    // NULL sum values contribute 0 to the value delta (SQL sum() skips
    // NULLs, so the increment must too — a bare sign*NULL product would
    // make the group delta NULL and poison the maintained sum); the
    // signed NON-NULL count delta is tracked alongside so a group whose
    // values are all NULL is maintained as sum = NULL, exactly like the
    // full `upstream GROUP BY` recompute
    val aggExprs =
      Seq(sum(col("__sign")).as("__dcnt")) ++
        sumCols.flatMap(c => Seq(
          sum(col("__sign") * coalesce(col(c).cast("long"), lit(0L)))
            .as(s"__d_$c"),
          sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L)))
            .as(s"__dnn_$c")))
    val delta = signed.groupBy(keyCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)

    val cond = keyCols
      .map(k => s"target.`$k` <=> source.`$k`").mkString(" AND ")
    val updates = Map("cnt" -> "target.cnt + source.__dcnt") ++
      sumCols.flatMap(c => Seq(
        s"sum_$c" ->
          (s"CASE WHEN target.nn_$c + source.__dnn_$c = 0 THEN CAST(NULL AS BIGINT) " +
            s"ELSE coalesce(target.sum_$c, CAST(0 AS BIGINT)) + source.__d_$c END"),
        s"nn_$c" -> s"target.nn_$c + source.__dnn_$c"))
    val inserts = keyCols.map(k => k -> s"source.`$k`").toMap ++
      Map("cnt" -> "source.__dcnt") ++
      sumCols.flatMap(c => Seq(
        s"sum_$c" ->
          (s"CASE WHEN source.__dnn_$c = 0 THEN CAST(NULL AS BIGINT) " +
            s"ELSE source.__d_$c END"),
        s"nn_$c" -> s"source.__dnn_$c"))
    val metrics = target.merge(delta, cond)
      .whenMatchedDelete(Some("target.cnt + source.__dcnt = 0"))
      .whenMatchedUpdate(updates)
      // a key created AND fully deleted inside one refresh window nets to
      // __dcnt = 0 with no target row — inserting it would commit a
      // phantom cnt=0 group absent from `upstream GROUP BY keyCols`
      .whenNotMatchedInsert(inserts, Some("source.__dcnt > 0"))
      .withAppTransaction(appId, endV)
      .execute()
    metrics ++ Map(
      "refreshed_from" -> lastV.map(v => (v + 1).toString).getOrElse("snapshot"),
      "refreshed_to" -> endV.toString)
  }
}
