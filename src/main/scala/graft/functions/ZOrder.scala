package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Z-order (Morton) clustering key: each input column is reduced to an
 * 8-byte order-preserving encoding, then the bits of all encodings are
 * interleaved into one binary key whose lexicographic (unsigned) order is
 * the Z-curve order. Spark's `repartitionByRange` + `sortWithinPartitions`
 * on this key produce the clustering delta-rs gets from its `zorder_key`
 * scalar UDF + arrow-row sort (`operations/optimize.rs:1511-1650`).
 *
 * Order-preserving 8-byte encodings:
 *  - integral/date/timestamp: two's-complement with the sign bit flipped;
 *  - float/double: IEEE-754 bits, negative values bit-inverted, positive
 *    values sign-flipped (total order, NaN sorts last);
 *  - string/binary: first 8 bytes, zero-padded;
 *  - boolean: 0/1; null: all zeros (nulls cluster first).
 *
 * Participates in whole-stage codegen: per-column encoding is emitted
 * inline (type dispatch happens at codegen time), only the bit interleave
 * is a static call — the rewrite stays in one generated pipeline stage.
 */
case class ZOrderKey(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  /** Unsupported types (map/struct/array/...) would hit the encoder's 0L
    * fallback — a CONSTANT per row, silently degrading the z-order to the
    * remaining columns. Reject at analysis instead. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "zorder_key requires at least one column (an empty key would be a " +
          "constant — silent no-op clustering)")
    val bad = children.map(_.dataType).filterNot(ZOrderKey.encodable)
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_key cannot encode type(s) ${bad.map(_.simpleString).mkString(", ")}: " +
        "supported are integral, float/double, decimal, date/timestamp, " +
        "boolean, string, binary")
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val longs = new Array[Long](n)
    var i = 0
    while (i < n) {
      longs(i) = ZOrderKey.encode(children(i).eval(input), children(i).dataType)
      i += 1
    }
    ZOrderKey.interleave(longs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zk = "graft.functions.ZOrderKey"
    // scratch array hoisted to instance state: the generated class is
    // per-task-thread, so reuse is safe and a 1B-row sort does not allocate
    // 1B short-lived long[n] (only the byte[] result is per-row)
    val arr = ctx.addMutableState("long[]", "zkeys",
      v => s"$v = new long[${children.length}];", forceInline = true)
    val evals = children.map(_.genCode(ctx))
    val encodes = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val enc = c.dataType match {
        case ByteType | ShortType | IntegerType | DateType =>
          s"$zk.encodeLong((long) ${e.value})"
        case LongType | TimestampType | TimestampNTZType =>
          s"$zk.encodeLong(${e.value})"
        case FloatType => s"$zk.encodeDouble((double) ${e.value})"
        case DoubleType => s"$zk.encodeDouble(${e.value})"
        case BooleanType => s"(${e.value} ? 1L : 0L)"
        case StringType => s"$zk.encodeBytes(${e.value}.getBytes())"
        case BinaryType => s"$zk.encodeBytes(${e.value})"
        case _: DecimalType => s"$zk.encodeDouble(${e.value}.toDouble())"
        case _ => "0L"
      }
      s"""${e.code}
         |$arr[$i] = ${e.isNull} ? 0L : $enc;""".stripMargin
    }.mkString("\n")
    val resultCode =
      s"""$encodes
         |byte[] ${ev.value} = $zk.interleave($arr);""".stripMargin
    ev.copy(code = code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderKey {

  def encodable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         BooleanType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  def encode(value: Any, dt: DataType): Long = {
    if (value == null) return 0L
    dt match {
      case ByteType => encodeLong(value.asInstanceOf[Byte].toLong)
      case ShortType => encodeLong(value.asInstanceOf[Short].toLong)
      case IntegerType | DateType => encodeLong(value.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType => encodeLong(value.asInstanceOf[Long])
      case FloatType => encodeDouble(value.asInstanceOf[Float].toDouble)
      case DoubleType => encodeDouble(value.asInstanceOf[Double])
      case BooleanType => if (value.asInstanceOf[Boolean]) 1L else 0L
      case StringType => encodeBytes(value.asInstanceOf[UTF8String].getBytes)
      case BinaryType => encodeBytes(value.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        encodeDouble(value.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => 0L
    }
  }

  // public + JVM-static (companion forwarders) so generated code can call them
  def encodeLong(v: Long): Long = v ^ Long.MinValue

  def encodeDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  def encodeBytes(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  /** Interleave the bits of n longs, MSB first → 8n-byte Morton key. */
  def interleave(keys: Array[Long]): Array[Byte] = {
    val n = keys.length
    val out = new Array[Byte](8 * n)
    var bit = 0
    val total = 64 * n
    while (bit < total) {
      val srcBit = bit / n          // which bit of each key (from MSB)
      val key = bit % n
      val b = (keys(key) >>> (63 - srcBit)) & 1L
      out(bit >> 3) = (out(bit >> 3) | (b << (7 - (bit & 7)))).toByte
      bit += 1
    }
    out
  }
}

object ZOrder {
  /** Column-level entry point: `df.withColumn("zkey", zorderKey($"a", $"b"))`. */
  def zorderKey(cols: Column*): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ZOrderKey(cols.map(org.apache.spark.sql.GraftSqlBridge.expression).toSeq))

  /** Make `zorder_key(...)` callable from `spark.sql` (the reference
    * registers its zorder UDF in the session, optimize.rs:1560). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZOrderKey(exprs), "scala_udf")
}
