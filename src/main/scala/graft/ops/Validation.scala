package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata => FieldMetadata, StructType}

import graft.kernel.Metadata

class ConstraintViolationException(msg: String) extends RuntimeException(msg)

/**
 * Write-time data validation — CHECK constraints, column invariants,
 * nullability, generated columns. Like the reference's `DataValidationExec`
 * (`crates/core/src/delta_datafusion/data_validation.rs:62,359-404`), the
 * checks ride INSIDE the write projection as a `raise_error` guard on the
 * first output column: the input is computed exactly once (no separate
 * validation scan before the write — the r1 100TB-scale finding), the
 * write job aborts on the first violating row, and [[graft.table.DeltaWriter]]
 * translates the raised marker back into [[ConstraintViolationException]].
 */
object Validation {

  /** Marker embedded in raise_error messages so the write path can map the
    * SparkException back to a ConstraintViolationException. */
  val MARKER = "[GRAFT_CONSTRAINT]"

  /** Unknown-column guard shared by every append surface (batch write,
    * streaming sink, blind append) — ONE definition (three verbatim copies
    * had grown, each independently needing the Locale.ROOT fix): a column
    * absent from the table schema must fail loudly, or it silently
    * VANISHES in normalize's by-name projection. Case-insensitive under
    * Locale.ROOT like the projection itself (default-locale lowercasing
    * under tr_TR spuriously rejects 'id' against table 'ID'). */
  def requireKnownColumns(df: org.apache.spark.sql.DataFrame,
                          schema: org.apache.spark.sql.types.StructType,
                          hint: String): Unit = {
    val known = schema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val extra = df.schema.fieldNames
      .filterNot(c => known.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(extra.isEmpty,
      s"Schema mismatch: columns ${extra.toSet} not in table schema ($hint)")
  }

  /** CHECK constraints from table properties (`delta.constraints.<name>`). */
  def constraints(meta: Metadata): Map[String, String] =
    meta.configuration.collect {
      case (k, v) if k.startsWith("delta.constraints.") =>
        k.stripPrefix("delta.constraints.") -> v
    }

  /** Column invariants from field metadata (`delta.invariants`,
    * kernel/schema/schema.rs:137-153). */
  def invariants(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      if (f.metadata.contains("delta.invariants")) {
        // {"expression":{"expression":"value < 3"}}
        val raw = f.metadata.getString("delta.invariants")
        val j = org.json4s.jackson.JsonMethods.parse(raw)
        (j \ "expression" \ "expression") match {
          case org.json4s.JString(e) => Seq(f.name -> e)
          case _ => throw new IllegalArgumentException(
            s"column ${f.name}: cannot parse delta.invariants '$raw' — " +
              "the protocol requires writers to ENFORCE invariants, so an " +
              "unenforceable shape must refuse the write, not silently " +
              "skip the check")
        }
      } else Nil
    }

  /** Weave a single ad-hoc requirement into the write projection (same
    * inline raise_error mechanism as [[prepareForWrite]]) — used by
    * replaceWhere to enforce "every written row satisfies the predicate"
    * without a separate pre-write scan. */
  /** Literal column reference: functions.col PARSES its argument, so a
    * logical column named "a.b" (legal under column mapping) would bind a
    * struct FIELD path — AnalysisException at best, the wrong data at
    * worst. Same rule as the Catalyst-literal lesson in Scan/DML. */
  private def colLit(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.attr(name)

  /** THE guard-weaving idiom, one definition for [[requireOnWrite]] and
    * [[prepareForWrite]]: `msg` is null for passing rows; the guard rides
    * the FIRST output column (a dropped side column would be pruned by
    * Catalyst), columns rebind via colLit (never parsed names), and the
    * declared type is re-asserted. */
  private def weaveGuard(df: DataFrame, msg: org.apache.spark.sql.Column): DataFrame = {
    val first = df.schema.fields.head
    val guarded = when(msg.isNotNull, raise_error(msg))
      .otherwise(colLit(first.name)).cast(first.dataType).as(first.name)
    df.select(guarded +: df.columns.tail.map(colLit).toSeq: _*)
  }

  def requireOnWrite(df: DataFrame, violation: org.apache.spark.sql.Column,
                     message: String): DataFrame =
    weaveGuard(df,
      when(violation, lit(s"$MARKER $message")).otherwise(lit(null).cast("string")))

  /** Validate + return the input unchanged (validation is eager). */
  def prepareForWrite(spark: SparkSession, df: DataFrame, meta: Metadata): DataFrame = {
    val schema = meta.schema

    // presence is CASE-INSENSITIVE, like the normalize() projection these
    // checks front: an exact-case test skipped validation for a
    // case-variant user column ("G" for table column g) that the write
    // still maps onto the table column
    def present(c: String): Boolean =
      df.schema.fieldNames.exists(_.equalsIgnoreCase(c))

    // NOT NULL columns (only those present in the frame), RECURSING into
    // struct fields: Spark schema nullability is advisory, so a nested
    // non-nullable field (s.x) accepted nulls silently — other engines
    // trust the nested contract (delta-spark's write-time walk recurses)
    def nestedNotNull(parent: org.apache.spark.sql.Column, t: StructType,
        path: String): Seq[(String, org.apache.spark.sql.Column)] =
      t.fields.toSeq.flatMap { f =>
        val c = parent.getField(f.name)
        val here =
          if (!f.nullable)
            Seq((s"NOT NULL constraint violated for column: $path.${f.name}",
              parent.isNotNull && c.isNull))
          else Nil
        here ++ (f.dataType match {
          case st: StructType => nestedNotNull(c, st, s"$path.${f.name}")
          case _ => Nil
        })
      }
    val notNullChecks = schema.fields.toSeq
      .filter(f => present(f.name))
      .flatMap { f =>
        val top =
          if (!f.nullable)
            Seq((s"NOT NULL constraint violated for column: ${f.name}",
              colLit(f.name).isNull))
          else Nil
        top ++ (f.dataType match {
          case st: StructType => nestedNotNull(colLit(f.name), st, f.name)
          case _ => Nil
        })
      }

    // CHECK constraints: violated when expression is FALSE (null passes)
    val checkChecks = constraints(meta).toSeq.map { case (name, e) =>
      (s"CHECK constraint $name ($e) violated",
        coalesce(expr(e), lit(true)) === lit(false))
    }

    // invariants: violated when false OR null (delta invariant semantics)
    val invChecks = invariants(schema)
      .filter { case (c, _) => present(c) }
      .map { case (c, e) =>
        (s"Invariant ($e) violated for column $c", not(coalesce(expr(e), lit(false))))
      }

    // generated columns: a writer-SUPPLIED value must equal the generation
    // expression, null-safely (delta protocol; delta-spark enforces
    // `g <=> expr`) — Generated.fill only computes ABSENT columns, so
    // without this check a wrong explicit value commits silently and
    // every engine trusting the invariant reads wrong data
    val genChecks = Generated.expressions(schema).toSeq
      .filter { case (c, _) => present(c) }
      .map { case (c, e) =>
        (s"Generated column $c does not match generation expression ($e)",
          not(colLit(c) <=> expr(e).cast(schema(c).dataType)))
      }

    val all = notNullChecks ++ checkChecks ++ invChecks ++ genChecks
    if (all.isEmpty) df
    else {
      // violation message (first tripped check wins), null when the row is ok
      val msg = all.foldRight(lit(null).cast("string")) { case ((m, cond), acc) =>
        when(cond, lit(s"$MARKER $m")).otherwise(acc)
      }
      // rows pass through unchanged unless a check trips, in which case
      // the write job aborts (see weaveGuard for the idiom's rules)
      weaveGuard(df, msg)
    }
  }
}

/** Generated columns (`delta.generationExpression`, schema.rs:65-85):
  * computed on write when absent from the input frame. */
object Generated {
  def expressions(schema: StructType): Map[String, String] =
    schema.fields.toSeq.flatMap { f =>
      if (f.metadata.contains("delta.generationExpression"))
        Some(f.name -> f.metadata.getString("delta.generationExpression"))
      else None
    }.toMap

  def fill(df: DataFrame, target: StructType): DataFrame = {
    val gens = expressions(target)
    gens.foldLeft(df) { case (acc, (name, e)) =>
      // case-insensitive presence: withColumn RESOLVES case-insensitively
      // under the default analyzer, so an exact-case test let a
      // case-variant user column ("G" for generated g) be silently
      // REPLACED by the computed value instead of validated by genChecks
      if (acc.schema.fieldNames.exists(_.equalsIgnoreCase(name))) acc
      else acc.withColumn(name, expr(e))
    }
  }
}
