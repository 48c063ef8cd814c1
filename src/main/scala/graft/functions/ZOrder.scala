package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
 */
case class ZOrderKey(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

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

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderKey {

  def encode(value: Any, dt: DataType): Long = {
    if (value == null) return 0L
    dt match {
      case ByteType => flipSign(value.asInstanceOf[Byte].toLong)
      case ShortType => flipSign(value.asInstanceOf[Short].toLong)
      case IntegerType | DateType => flipSign(value.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType => flipSign(value.asInstanceOf[Long])
      case FloatType => doubleBits(value.asInstanceOf[Float].toDouble)
      case DoubleType => doubleBits(value.asInstanceOf[Double])
      case BooleanType => if (value.asInstanceOf[Boolean]) 1L else 0L
      case StringType => prefixBits(value.asInstanceOf[UTF8String].getBytes)
      case BinaryType => prefixBits(value.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        doubleBits(value.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => 0L
    }
  }

  private def flipSign(v: Long): Long = v ^ Long.MinValue

  private def doubleBits(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  private def prefixBits(b: Array[Byte]): Long = {
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
}
