package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization for corpus cleaning — the standard first stage
 * of an LLM data pipeline (canonical composition so byte-level dedup and
 * shingling see one spelling per grapheme, accent folding for
 * language-insensitive matching). Spark ships no Unicode-normalization
 * function, so this is a native Catalyst expression (not a Scala UDF): the
 * per-row work participates in whole-stage codegen via a static call, the
 * expression is null-safe, and the normalization form is resolved to a
 * constant at plan time.
 *
 * Modes:
 *  - "nfc" / "nfd" / "nfkc" / "nfkd": java.text.Normalizer forms;
 *  - "strip_accents": NFD-decompose, drop combining marks (Mn), recompose —
 *    matches DuckDB's utf8proc-based `strip_accents` on precomposed and
 *    combining accents alike (compatibility characters like the ﬁ ligature
 *    are preserved by both, since NFD is canonical-only).
 *
 * Reference has no counterpart (its engine normalizes nothing); parity
 * target is DuckDB's nfc_normalize/strip_accents for the oracle gate.
 */
case class TextNormalize(child: Expression, mode: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects a string column, got ${child.dataType.simpleString}")
    else if (!TextNormalize.modes.contains(mode))
      TypeCheckResult.TypeCheckFailure(
        s"normalize_text mode must be one of ${TextNormalize.modes.mkString(", ")}, got '$mode'")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    TextNormalize.apply(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mode", mode, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalize.apply($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)
}

object TextNormalize {

  val modes: Set[String] = Set("nfc", "nfd", "nfkc", "nfkd", "strip_accents")

  /** Static per-row kernel (called from generated code and eval). */
  def apply(s: UTF8String, mode: String): UTF8String = {
    val in = s.toString
    val out = mode match {
      case "nfc"  => Normalizer.normalize(in, Normalizer.Form.NFC)
      case "nfd"  => Normalizer.normalize(in, Normalizer.Form.NFD)
      case "nfkc" => Normalizer.normalize(in, Normalizer.Form.NFKC)
      case "nfkd" => Normalizer.normalize(in, Normalizer.Form.NFKD)
      case "strip_accents" =>
        // canonical-decompose, drop combining marks, recompose what's left
        val decomposed = Normalizer.normalize(in, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(decomposed.length)
        var i = 0
        while (i < decomposed.length) {
          val cp = decomposed.codePointAt(i)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      case other =>
        throw new IllegalArgumentException(s"normalize_text: unknown mode '$other'")
    }
    UTF8String.fromString(out)
  }

  /** Column-level entry point: `normalizeText($"text", "nfc")`. */
  def normalizeText(col: Column, mode: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TextNormalize(org.apache.spark.sql.GraftSqlBridge.expression(col), mode))

  /** Make `normalize_text(col, 'mode')` callable from `spark.sql`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", {
        case Seq(c, m) =>
          val mode = m match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
              v.toString
            case other => throw new IllegalArgumentException(
              s"normalize_text: mode must be a string literal, got $other")
          }
          TextNormalize(c, mode)
        case exprs => throw new IllegalArgumentException(
          s"normalize_text expects (column, mode), got ${exprs.length} args")
      }, "scala_udf")
}
