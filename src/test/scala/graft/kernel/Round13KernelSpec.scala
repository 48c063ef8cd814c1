package graft.kernel

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 stats-pruning soundness regressions: pruning's Some(false) must
  * mean "provably no rows match" — a domain-changing cast, a nested-field
  * name collapsing onto a top-level column, a rounded decimal bound, or a
  * float literal widened through its decimal repr each turned that claim
  * false (silent missing scan rows; whole-file DELETE data loss through the
  * Not branch). All must fail OPEN; value-preserving casts keep pruning. */
class Round13KernelSpec extends AnyFunSuite {

  private def attr(parts: String*) = UnresolvedAttribute(parts.toSeq)

  private def addWithStats(stats: String, pv: Map[String, String] = Map.empty) =
    AddFile(path = "f.parquet", partitionValues = pv, stats = Some(stats))

  test("domain-changing casts fail open (timestamp vs date, days vs micros)") {
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    // stats in MICROS for 2024-06-01T12:00 .. 2024-06-02T12:00
    val f = addWithStats(
      """{"numRecords":10,"minValues":{"ts":"2024-06-01 12:00:00"},""" +
        """"maxValues":{"ts":"2024-06-02 12:00:00"},"nullCount":{"ts":0}}""")
    // CAST(ts AS DATE) = DATE'2024-06-01' — rows in the file DO match; a
    // stripped cast compared micros with epoch-days and skipped every file
    val date = java.time.LocalDate.parse("2024-06-01").toEpochDay.toInt
    val pred = EqualTo(Cast(attr("ts"), DateType), Literal(date, DateType))
    assert(StatsPruning.fileMayMatch(schema, Nil, pred, f),
      "domain-changing cast must fail open, not prune")
    // the reverse direction too (date column vs timestamp literal)
    val schemaD = StructType(Seq(StructField("d", DateType)))
    val fd = addWithStats(
      """{"numRecords":10,"minValues":{"d":"2024-06-01"},""" +
        """"maxValues":{"d":"2024-06-02"},"nullCount":{"d":0}}""")
    val predD = EqualTo(Cast(attr("d"), TimestampType),
      Literal(1717243200000000L, TimestampType))
    assert(StatsPruning.fileMayMatch(schemaD, Nil, predD, fd))
  }

  test("value-preserving casts still prune (int widened to long)") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val f = addWithStats(
      """{"numRecords":10,"minValues":{"i":0},"maxValues":{"i":10},""" +
        """"nullCount":{"i":0}}""")
    val hit = EqualTo(Cast(attr("i"), LongType), Literal(5L, LongType))
    val miss = EqualTo(Cast(attr("i"), LongType), Literal(100L, LongType))
    assert(StatsPruning.fileMayMatch(schema, Nil, hit, f))
    assert(!StatsPruning.fileMayMatch(schema, Nil, miss, f),
      "widening cast must still prune")
  }

  test("nested field a.b must not alias top-level partition column b " +
      "(whole-file DELETE data loss through the Not branch)") {
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", IntegerType)))),
      StructField("b", IntegerType)))
    val f = AddFile(path = "f.parquet", partitionValues = Map("b" -> "5"))
    // DELETE WHERE a.b = 5 full-file test: NOT(a.b = 5) evaluated Some(false)
    // via partition b=5, dropping the whole file though rows with a.b != 5
    // exist — must be unknown (kept for rewrite)
    val pred = Not(EqualTo(attr("a", "b"), Literal(5, IntegerType)))
    assert(StatsPruning.fileMayMatch(schema, Seq("b"), pred, f),
      "nested attribute must fail open, not evaluate against column b")
    // the metadata-only DELETE gate must not classify a.b as partition-only
    assert(!StatsPruning.isPartitionOnly(schema,
      EqualTo(attr("a", "b"), Literal(5, IntegerType)), Seq("b")))
  }

  test("qualified top-level refs keep pruning; only genuine nested paths fail open") {
    // t.part_col — the qualifier is no schema field, so the last part is an
    // unambiguous top-level reference: pruning and the partition-only gates
    // must keep working exactly as for the bare name
    val schema = StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", IntegerType)))),
      StructField("b", IntegerType)))
    val file = AddFile(path = "x", partitionValues = Map("b" -> "5"))
    val qualified = EqualTo(attr("t", "b"), Literal(7, IntegerType))
    assert(!StatsPruning.fileMayMatch(schema, Seq("b"), qualified, file),
      "qualified top-level partition ref must still prune")
    assert(StatsPruning.isPartitionOnly(schema, qualified, Seq("b")))
    // a.b: the head IS a struct field → nested path → fail open everywhere
    val nested = EqualTo(attr("a", "b"), Literal(7, IntegerType))
    assert(StatsPruning.fileMayMatch(schema, Seq("b"), nested, file))
    assert(!StatsPruning.isPartitionOnly(schema, nested, Seq("b")))
  }

  test("high-precision decimal bounds compare exactly (no double rounding)") {
    val schema = StructType(Seq(StructField("d", DecimalType(38, 9))))
    val v = "123456789012345678.123456789"
    val f = addWithStats(
      s"""{"numRecords":10,"minValues":{"d":$v},"maxValues":{"d":$v},""" +
        """"nullCount":{"d":0}}""")
    val lit = Literal(Decimal(v), DecimalType(38, 9))
    assert(StatsPruning.fileMayMatch(schema, Nil, EqualTo(attr("d"), lit), f),
      "exact-decimal equality must keep the file holding the value")
    val other = Literal(Decimal("123456789012345678.123456788"), DecimalType(38, 9))
    assert(!StatsPruning.fileMayMatch(schema, Nil, EqualTo(attr("d"), other), f),
      "a provably-absent decimal should still prune")
  }

  test("float equality prunes in the float domain (1.1f matches its file)") {
    val schema = StructType(Seq(StructField("f", FloatType)))
    // ParquetStats widens float bounds to the EXACT double of the float
    val fx = 1.1f.toDouble // 1.100000023841858
    val f = addWithStats(
      s"""{"numRecords":10,"minValues":{"f":$fx},"maxValues":{"f":$fx},""" +
        """"nullCount":{"f":0}}""")
    val pred = EqualTo(attr("f"), Literal(1.1f, FloatType))
    assert(StatsPruning.fileMayMatch(schema, Nil, pred, f),
      "float literal must compare float-exact, not via its decimal repr")
    val miss = EqualTo(attr("f"), Literal(1.2f, FloatType))
    assert(!StatsPruning.fileMayMatch(schema, Nil, miss, f))
  }

  test("float partition value compares in the float domain") {
    val schema = StructType(Seq(StructField("f", FloatType)))
    // partition string "1.1" IS 1.1f — an exact-decimal parse could never
    // equal the literal's binary repr and pruned the matching partition
    val file = AddFile(path = "x", partitionValues = Map("f" -> "1.1"))
    assert(StatsPruning.fileMayMatch(schema, Seq("f"),
      EqualTo(attr("f"), Literal(1.1f, FloatType)), file))
    assert(!StatsPruning.fileMayMatch(schema, Seq("f"),
      EqualTo(attr("f"), Literal(1.2f, FloatType)), file))
    // the InSet branch converts set ELEMENTS through the same float domain
    assert(StatsPruning.fileMayMatch(schema, Seq("f"),
      InSet(attr("f"), Set[Any](1.1f, 9.9f)), file))
    assert(!StatsPruning.fileMayMatch(schema, Seq("f"),
      InSet(attr("f"), Set[Any](1.2f, 9.9f)), file))
  }

  test("fileMayMatchAll equals per-predicate evaluation") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val f = addWithStats(
      """{"numRecords":10,"minValues":{"i":0},"maxValues":{"i":10},""" +
        """"nullCount":{"i":0}}""")
    val p1 = GreaterThan(attr("i"), Literal(3, IntegerType))
    val p2 = LessThan(attr("i"), Literal(20, IntegerType))
    val p3 = EqualTo(attr("i"), Literal(50, IntegerType))
    assert(StatsPruning.fileMayMatchAll(schema, Nil, Seq(p1, p2), f))
    assert(!StatsPruning.fileMayMatchAll(schema, Nil, Seq(p1, p2, p3), f))
  }

  test("half an AWS credential pair fails loudly in either direction") {
    val e1 = intercept[IllegalArgumentException] {
      S3CompatibleStore.clientFor("http://localhost:1", "b",
        Map("AWS_SECRET_ACCESS_KEY" -> "s"))
    }
    assert(e1.getMessage.contains("AWS_ACCESS_KEY_ID is not"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      S3CompatibleStore.clientFor("http://localhost:1", "b",
        Map("AWS_ACCESS_KEY_ID" -> "a"))
    }
    assert(e2.getMessage.contains("AWS_SECRET_ACCESS_KEY is not"), e2.getMessage)
  }
}
