package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/** Property-based checks for the hand-rolled codecs and the pruning logic. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("codePointCompare == UTF-8 byte order; codePointTake never splits pairs") {
    // include supplementary chars (the exact class UTF-16 compareTo
    // misranks vs U+E000..U+FFFF) and BMP privates
    val cpGen = Gen.frequency(
      6 -> Gen.chooseNum(0x20, 0x7e),
      2 -> Gen.chooseNum(0xe000, 0xfffd),
      2 -> Gen.chooseNum(0x10000, 0x10ffff))
    val strGen = Gen.listOf(cpGen).map(cps =>
      new String(cps.toArray, 0, cps.size))
    check(Prop.forAll(strGen, strGen) { (a, b) =>
      val byteCmp = {
        val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val n = math.min(x.length, y.length)
        var i = 0
        var r = 0
        while (i < n && r == 0) { r = Integer.compare(x(i) & 0xff, y(i) & 0xff); i += 1 }
        if (r != 0) r else Integer.compare(x.length, y.length)
      }
      Integer.signum(StatsPruning.codePointCompare(a, b)) == Integer.signum(byteCmp)
    })
    check(Prop.forAll(strGen, Gen.chooseNum(0, 8)) { (s, n) =>
      val t = StatsPruning.codePointTake(s, n)
      val wholePairs = t.isEmpty ||
        !Character.isHighSurrogate(t.charAt(t.length - 1))
      wholePairs && s.startsWith(t) &&
        t.codePointCount(0, t.length) == math.min(n, s.codePointCount(0, s.length))
    })
  }

  test("z85 round-trips arbitrary 4k-byte blocks") {
    val gen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(l => l.take(l.size / 4 * 4).toArray)
    check(Prop.forAll(gen) { bytes =>
      DeletionVectors.z85ToBytes(DeletionVectors.bytesToZ85(bytes)).toSeq == bytes.toSeq
    })
  }

  test("roaring bitmap array round-trips arbitrary row-index sets") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.distinct.sorted.toArray)
    check(Prop.forAll(gen) { values =>
      DeletionVectors.decodeRoaringArray(
        DeletionVectors.encodeRoaringArray(values)).toSeq == values.toSeq
    })
  }

  test("roaring bitset containers (dense masks) round-trip") {
    // >4096 values in one 16-bit container switches to the bitset encoding
    val gen = Gen.chooseNum(4097, 20000).map(n => (0L until n).toArray)
    check(Prop.forAll(gen) { values =>
      DeletionVectors.decodeRoaringArray(
        DeletionVectors.encodeRoaringArray(values)).toSeq == values.toSeq
    })
  }

  test("PathCodec encode/decode round-trips arbitrary path fragments") {
    val seg = Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '%', '=', '-', '.', '#', '+', '&', '(', ')')))
      .map(_.mkString)
    val gen = Gen.nonEmptyListOf(seg).map(_.take(4).mkString("/"))
    check(Prop.forAll(gen) { rel =>
      PathCodec.decode(PathCodec.encode(rel)) == rel
    })
  }

  test("partition value codec round-trips ints, dates, timestamps") {
    check(Prop.forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      PartitionCodec.parse(PartitionCodec.serialize(v, IntegerType), IntegerType) ==
        BigDecimal(v)
    })
    check(Prop.forAll(Gen.chooseNum(-30000, 30000)) { days =>
      PartitionCodec.parse(PartitionCodec.serialize(days, DateType), DateType) == days
    })
    check(Prop.forAll(Gen.chooseNum(-4102444800L, 4102444800L)) { secs =>
      val micros = secs * 1000000L + 123456L
      PartitionCodec.parse(
        PartitionCodec.serialize(micros, TimestampType), TimestampType) == micros
    })
  }

  // ---- partition pruning soundness under SQL three-valued logic ----

  private val schema = StructType(Seq(StructField("c", IntegerType)))
  private val partCols = Seq("c")

  /** Ground-truth 3VL evaluation of the predicate grammar below on a single
    * (possibly null) partition value. Some(b) = TRUE/FALSE, None = NULL. */
  private def truth(pred: Expression, v: Option[Int]): Option[Boolean] = pred match {
    case EqualTo(_, Literal(l, IntegerType)) => v.map(_ == l.asInstanceOf[Int])
    case GreaterThan(_, Literal(l, IntegerType)) => v.map(_ > l.asInstanceOf[Int])
    case LessThan(_, Literal(l, IntegerType)) => v.map(_ < l.asInstanceOf[Int])
    case EqualNullSafe(_, Literal(null, _)) => Some(v.isEmpty)
    case EqualNullSafe(_, Literal(l, IntegerType)) => Some(v.contains(l.asInstanceOf[Int]))
    case IsNull(_) => Some(v.isEmpty)
    case IsNotNull(_) => Some(v.isDefined)
    case Not(p) => truth(p, v).map(!_)
    case And(a, b) => (truth(a, v), truth(b, v)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(a, b) => (truth(a, v), truth(b, v)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case _ => None
  }

  private val attr = UnresolvedAttribute(Seq("c"))
  private def litI(i: Int) = Literal(i, IntegerType)

  private def predGen(depth: Int): Gen[Expression] = {
    val leaf: Gen[Expression] = Gen.oneOf(
      Gen.chooseNum(-3, 3).map(i => EqualTo(attr, litI(i))),
      Gen.chooseNum(-3, 3).map(i => GreaterThan(attr, litI(i))),
      Gen.chooseNum(-3, 3).map(i => LessThan(attr, litI(i))),
      Gen.chooseNum(-3, 3).map(i => EqualNullSafe(attr, litI(i))),
      Gen.const(EqualNullSafe(attr, Literal(null, IntegerType))),
      Gen.const(IsNull(attr)), Gen.const(IsNotNull(attr)))
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> predGen(depth - 1).map(Not(_)),
      1 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case (a, b) => And(a, b) },
      1 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case (a, b) => Or(a, b) })
  }

  private val valueGen: Gen[Option[Int]] =
    Gen.oneOf(Gen.const(None), Gen.chooseNum(-4, 4).map(Some(_)))

  test("pruning never drops a file whose rows can satisfy the predicate") {
    check(Prop.forAll(predGen(3), valueGen) { (pred, v) =>
      val file = AddFile(path = "f",
        partitionValues = Map("c" -> v.map(_.toString).orNull))
      val kept = StatsPruning.fileMayMatch(schema, partCols, pred, file)
      // soundness: if the predicate is TRUE for this partition value, the
      // file MUST be kept (fail-open allows keeping when FALSE/NULL)
      truth(pred, v) != Some(true) || kept
    })
  }

  test("full-match classification never claims rows the predicate misses") {
    // DELETE's whole-file path drops a file when NOT(pred) provably matches
    // nothing; that claim is only sound when pred is TRUE for every row
    check(Prop.forAll(predGen(3), valueGen) { (pred, v) =>
      val file = AddFile(path = "f",
        partitionValues = Map("c" -> v.map(_.toString).orNull))
      val fullyMatches = !StatsPruning.fileMayMatch(schema, partCols, Not(pred), file)
      !fullyMatches || truth(pred, v) == Some(true)
    })
  }
}
