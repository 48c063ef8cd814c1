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

  test("Scan.readFiles: duplicate-path incarnations get their own DV masks") {
    import graft.table.{DeltaTable, Scan}
    val dir = java.nio.file.Files.createTempDirectory("graft_waves").toString + "/t"
    DeltaTable.write(spark,
      spark.range(10).toDF("id").coalesce(1), dir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val add0 = DeltaTable.forPath(spark, dir).snapshot.allFiles.head
    DeltaTable.forPath(spark, dir).delete(Some("id < 3"))
    val t2 = DeltaTable.forPath(spark, dir)
    val add1 = t2.snapshot.allFiles.head
    assert(add0.path == add1.path, "DV delete must keep the path")
    assert(add0.deletionVector.isEmpty && add1.deletionVector.isDefined)
    // a streaming ignoreChanges window can carry BOTH incarnations: each
    // must ride its own scan leg with its own mask (path-keyed masks would
    // serve one DV state for both)
    val both = Scan.readFiles(spark, t2.snapshot, Seq(add0, add1))
    assert(both.count() == 17, "10 unmasked + 7 masked rows")
    // and the memo (same pinned snapshot, same path set, new DV) must not
    // serve the stale mask — the digest keys by reconcileKey
    assert(Scan.readFiles(spark, t2.snapshot, Seq(add1)).count() == 7)
    assert(Scan.readFiles(spark, t2.snapshot, Seq(add0)).count() == 10)
  }

  test("catalog: table interiors are not namespaces — nested create/rename/drop refused") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh11").toString
    val ss = spark.newSession()
    ss.conf.set("spark.sql.catalog.g11", "graft.catalog.GraftCatalog")
    ss.conf.set("spark.sql.catalog.g11.warehouse", wh)
    ss.sql("CREATE NAMESPACE g11.sales")
    ss.sql("CREATE TABLE g11.sales.orders (id BIGINT, year INT) PARTITIONED BY (year)")
    ss.sql("INSERT INTO g11.sales.orders VALUES (1, 2024), (2, 2025)")
    // createTable through a table slot: would nest a table inside orders,
    // where orders' VACUUM deletes the inner files as unreferenced debris
    intercept[Exception] {
      ss.sql("CREATE TABLE g11.sales.orders.backup (i INT)")
    }
    assert(!new java.io.File(s"$wh/sales/orders/backup").exists)
    // rename INTO a table's interior
    ss.sql("CREATE TABLE g11.t2 (i INT)")
    intercept[Exception] {
      ss.sql("ALTER TABLE g11.t2 RENAME TO g11.sales.orders.inner")
    }
    assert(new java.io.File(s"$wh/t2/_delta_log").exists, "t2 must not have moved")
    // a partition dir inside the table is not a namespace: neither listable
    // nor droppable (CASCADE would delete table data)
    intercept[Exception] { ss.sql("SHOW TABLES IN g11.sales.orders.`year=2024`") }
    intercept[Exception] { ss.sql("DROP NAMESPACE g11.sales.orders.`year=2024` CASCADE") }
    assert(ss.sql("SELECT count(*) FROM g11.sales.orders").head().getLong(0) == 2)
    // CREATE ... LOCATION onto a populated non-Delta dir refused (namespace
    // conversion hazard); an empty location still works
    intercept[Exception] {
      ss.sql(s"CREATE TABLE g11.x (i INT) LOCATION '$wh/sales'")
    }
    assert(!new java.io.File(s"$wh/sales/_delta_log").exists,
      "the namespace dir must not have been converted into a table")
    // fresh per-run temp dir: a fixed path would make reruns take the
    // REGISTER branch (table already there) instead of the create path
    val extDir = java.nio.file.Files.createTempDirectory("g11_ext").toString + "/y"
    ss.sql(s"CREATE TABLE g11.y (i INT) LOCATION '$extDir'")
    ss.sql("INSERT INTO g11.y VALUES (7)")
    assert(ss.sql("SELECT i FROM g11.y").head().getInt(0) == 7)
    // LOCATION nesting inside a table's tree refused even when the target
    // dir does not exist yet (the ancestor walk)
    intercept[Exception] {
      ss.sql(s"CREATE TABLE g11.z (i INT) LOCATION '$wh/sales/orders/backup2'")
    }
    assert(!new java.io.File(s"$wh/sales/orders/backup2").exists)
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
