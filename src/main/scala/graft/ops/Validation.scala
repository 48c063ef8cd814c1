package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata => FieldMetadata, StructType}

import graft.kernel.Metadata

class ConstraintViolationException(msg: String) extends RuntimeException(msg)

/**
 * Write-time data validation — CHECK constraints, column invariants,
 * nullability, generated columns. The reference wraps write inputs in a
 * `DataValidationExec` that errors on the first violating row
 * (`crates/core/src/delta_datafusion/data_validation.rs:62,359-404`); here
 * the check is a Spark-side `filter(violation).limit(1)` probe per
 * constraint batch — one distributed pass, short-circuiting on the first
 * hit, fully codegen'd.
 */
object Validation {

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
          case _ => Nil
        }
      } else Nil
    }

  /** Validate + return the input unchanged (validation is eager). */
  def prepareForWrite(spark: SparkSession, df: DataFrame, meta: Metadata): DataFrame = {
    val schema = meta.schema

    // NOT NULL columns (only those present in the frame)
    val notNullChecks = schema.fields.toSeq
      .filter(f => !f.nullable && df.schema.fieldNames.contains(f.name))
      .map(f => (s"NOT NULL constraint violated for column: ${f.name}",
        col(f.name).isNull))

    // CHECK constraints: violated when expression is FALSE (null passes)
    val checkChecks = constraints(meta).toSeq.map { case (name, e) =>
      (s"CHECK constraint $name ($e) violated",
        coalesce(expr(e), lit(true)) === lit(false))
    }

    // invariants: violated when false OR null (delta invariant semantics)
    val invChecks = invariants(schema)
      .filter { case (c, _) => df.schema.fieldNames.contains(c) }
      .map { case (c, e) =>
        (s"Invariant ($e) violated for column $c", not(coalesce(expr(e), lit(false))))
      }

    val all = notNullChecks ++ checkChecks ++ invChecks
    if (all.nonEmpty) {
      // single pass: first violating row, tagged with which checks tripped
      val anyViolation = all.map(_._2).reduce(_ || _)
      val probe = df.filter(anyViolation)
        .select(all.map { case (msg, c) => c.as(msg) }: _*)
        .limit(1).collect()
      probe.headOption.foreach { row =>
        val tripped = all.indices.filter(i => !row.isNullAt(i) && row.getBoolean(i))
          .map(i => all(i)._1)
        throw new ConstraintViolationException(tripped.mkString("; "))
      }
    }
    df
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
      if (acc.schema.fieldNames.contains(name)) acc
      else acc.withColumn(name, expr(e))
    }
  }
}
