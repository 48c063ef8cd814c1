package graft

import java.nio.file.Files
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ColumnMapping
import graft.table.DeltaTable

/** Round-13 regressions for the r12 verdict findings: locale-sensitive
  * case mapping on user-input strings (tr_TR maps "I" to dotless-i, so a
  * bare `toLowerCase` mangles "ID"/"Ignore" before they reach validation
  * or table metadata — every user-input site now pins Locale.ROOT). */
class Round13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r13")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r13_").toString + "/t"

  private def withLocale[A](l: Locale)(body: => A): A = {
    val prev = Locale.getDefault
    Locale.setDefault(l)
    try body finally Locale.setDefault(prev)
  }

  test("tr_TR locale: save mode 'Ignore' and mapping mode 'ID' survive " +
      "case normalization (Locale.ROOT, not default)") {
    import spark.implicits._
    withLocale(new Locale("tr", "TR")) {
      // sanity: this locale actually exhibits the hazard
      assert("ID".toLowerCase != "id", "tr_TR must map I to dotless-i")

      // WriteIntoDelta save-mode parse: "Ignore" under a bare toLowerCase
      // becomes "ıgnore" -> "Unknown save mode"
      val d1 = tmpDir()
      DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), d1)
      DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), d1,
        mode = "Ignore") // existing table: must no-op, not throw
      assert(DeltaTable.forPath(spark, d1).toDF.count() == 1)

      // create-path mapping mode "ID": must engage id mapping AND store
      // the normalized value (foreign case-sensitive readers reject "ID")
      val d2 = tmpDir()
      DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d2,
        configuration = Map(ColumnMapping.MODE_KEY -> "ID"))
      val snap = DeltaTable.forPath(spark, d2).snapshot
      assert(snap.metadata.configuration(ColumnMapping.MODE_KEY) == "id",
        "stored mode must be normalized")
      snap.schema.fields.foreach { f =>
        assert(f.metadata.contains(ColumnMapping.ID_KEY),
          s"id mapping must engage for ${f.name}")
      }
      assert(DeltaTable.forPath(spark, d2).toDF
        .orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))

      // setProperties refusal path: mode "ID" on a none table must refuse
      // with the NORMALIZED value in the message, not a mangled "ıd"
      val ex = intercept[UnsupportedOperationException] {
        DeltaTable.forPath(spark, d1)
          .setProperties(Map(ColumnMapping.MODE_KEY -> "ID"))
      }
      assert(ex.getMessage.contains("none -> id"), ex.getMessage)
    }
  }
}
