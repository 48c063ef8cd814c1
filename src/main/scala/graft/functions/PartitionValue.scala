package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-file partition values resolved from the transaction log's
 * `partitionValues` maps (broadcast as file-path → values array) — the
 * Delta protocol's source of truth. Hive `key=value` directory inference
 * cannot cover column-mapped or random-prefix file layouts (e.g. the
 * reference's `table_with_column_mapping` golden stores files under `8v/`,
 * `BH/`), and the log wins even when directories disagree.
 *
 * Scan rows arrive grouped by file, so the common case is one UTF8String
 * equality check against a thread-local memo + an array index.
 */
class PartitionValueLookup(values: Broadcast[Map[String, Array[String]]]) extends Serializable {
  @transient private lazy val memo = new PerFileMemo

  def value(file: UTF8String, i: Int): UTF8String = {
    val cached = memo.get(file)
    val arr =
      if (cached != null) cached.asInstanceOf[Array[UTF8String]]
      else {
        // every scanned file was inserted under its PathKeys.variants keys —
        // a miss is a path-form mismatch with _metadata.file_path, and
        // failing open would read every partition column of the file as NULL
        // (silently wrong rows, silently dropped by partition predicates).
        // Fail loudly instead (same contract as Cdf's unmapped-path error).
        val a = values.value.getOrElse(file.toString,
            throw new IllegalStateException(
              s"partition-value lookup missed file '$file' (path-variant " +
                "mismatch) — refusing to emit NULL partition values"))
          .map(s => if (s == null) null else UTF8String.fromString(s))
        memo.put(file, a)
        a
      }
    if (i < arr.length) arr(i)
    else throw new IllegalStateException(
      // same fail-loud contract as the path-variant miss above: an index
      // past the partition-column count means schema bookkeeping broke,
      // and NULL here is silently-wrong-rows corruption
      s"partition-value index $i out of range (${arr.length} partition " +
        s"columns) for file '$file'")
  }
}

/** The `idx`-th partition value of the file at `file` (a `_metadata.file_path`
  * column), as a string per the log's serialization; NULL for
  * `__HIVE_DEFAULT_PARTITION__`. Codegen'd — no join in the scan plan. */
case class PartitionValueAt(file: Expression, idx: Int, lookup: PartitionValueLookup)
    extends UnaryExpression {

  override def child: Expression = file
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(f: Any): Any =
    lookup.value(f.asInstanceOf[UTF8String], idx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pvLookup", lookup, classOf[PartitionValueLookup].getName)
    nullSafeCodeGen(ctx, ev, f =>
      s"""${ev.value} = $ref.value($f, $idx);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(file = newChild)
}
