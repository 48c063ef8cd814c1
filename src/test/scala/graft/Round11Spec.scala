package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{MountFileSystem, PathCodec}
import graft.llm.{Dedup, TextOps}
import graft.table.Scan

/** Round-11 regressions for the r10 advisor findings: file-set digest
  * separator, percent-decoder surrogate-pair handling, mount-root sibling
  * containment, and VT tokenization parity with the RE2 oracles. */
class Round11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r11")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Scan.fileSetId: same-concatenation path lists get distinct keys") {
    assert(Scan.fileSetId(Seq("ab", "c")) != Scan.fileSetId(Seq("a", "bc")))
    assert(Scan.fileSetId(Seq("a", "b")) != Scan.fileSetId(Seq("ab")))
    // stable for the same list, order-sensitive (the memo key is ordered)
    assert(Scan.fileSetId(Seq("x", "y")) == Scan.fileSetId(Seq("x", "y")))
    assert(Scan.fileSetId(Seq("x", "y")) != Scan.fileSetId(Seq("y", "x")))
  }

  test("PathCodec.pctDecode: non-BMP literals survive, escapes still decode") {
    val clef = "𝄞" // U+1D11E MUSICAL SYMBOL G CLEF
    assert(PathCodec.pctDecode(clef) == clef)
    assert(PathCodec.pctDecode(s"%41$clef%42") == s"A${clef}B")
    assert(PathCodec.pctDecode(s"pre$clef%2Fpost") == s"pre$clef/post")
    // regression guard for the existing behavior around malformed escapes
    assert(PathCodec.pctDecode("a%2") == "a%2")
    assert(PathCodec.pctDecode("a%zz") == "a%zz")
    assert(PathCodec.pctDecode("%E2%82%AC") == "€")
    // round-trip with the encoder over a non-BMP key
    assert(PathCodec.pctDecode(PathCodec.rfc3986(clef)) == clef)
  }

  test("MountFileSystem.toMount: sibling dir extending the root is refused") {
    val fs = new MountFileSystem()
    val conf = new Configuration(false)
    conf.set(graft.kernel.Mount.rootKey("mnt"), "/mount/a")
    fs.initialize(java.net.URI.create("mnt:/"), conf)
    // true descendant and the root itself remap fine
    assert(fs.toMount(new Path("file:/mount/a/x/f")).toString == "mnt:/x/f")
    assert(fs.toMount(new Path("file:/mount/a")).toString == "mnt:/")
    // the sibling "/mount/ab" must fail containment, not remap to "mnt:b/f"
    val e = intercept[IllegalArgumentException] {
      fs.toMount(new Path("file:/mount/ab/f"))
    }
    assert(e.getMessage.contains("escaped mount root"))
  }

  test("VT (U+000B) tokenizes like the RE2 oracles: literal, not whitespace") {
    import spark.implicits._
    val df = Seq(("ab c", 1)).toDF("text", "i")
    // RE2 \s excludes VT: "ab" stays ONE token, so 2 words total
    val words = df.select(TextOps.words(col("text")).as("w"))
      .as[Seq[String]].head()
    assert(words == Seq("ab", "c"), s"got $words")
    // shingleArray's collapse path must agree with words()
    val sh = df.select(Dedup.shingleArray(col("text"), 2).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("ab c"), s"got $sh")
    // normalize (dedup fingerprint) DOES treat VT as whitespace — its
    // oracle pins \x{000B} explicitly; both engines agree on 'a b'
    val norm = df.select(TextOps.normalize(col("text")).as("n"))
      .as[String].head()
    assert(norm == "a b c")
  }
}
