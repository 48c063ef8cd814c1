package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable
import graft.tools.MergeGrid

/** The reference's 16-case MERGE benchmark grid (insert-only / delete-only /
  * upsert fraction matrix, crates/benchmarks/src/merge.rs) run at sf0.001
  * with its operationMetrics validators, plus row-count conservation checks
  * the reference derives implicitly from the metrics contract. */
class MergeGridSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-mergegrid")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("all 16 grid cases pass their metric validators and conserve rows") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val nOrders = orders.count()
    assert(MergeGrid.cases.size == 16)

    MergeGrid.cases.foreach { c =>
      val dir = Files.createTempDirectory("graft_grid_").toString + "/t"
      DeltaTable.write(spark, orders, dir)
      val t = DeltaTable.forPath(spark, dir)
      val src = MergeGrid.source(orders, c)
      val srcRows = src.count()
      val m = MergeGrid.run(t, src, c)

      val violations = MergeGrid.validate(c, m)
      assert(violations.isEmpty, violations.mkString("; "))
      assert(m("num_source_rows").toLong == srcRows,
        s"${c.name}: num_source_rows ${m("num_source_rows")} != $srcRows")

      // row conservation: final = initial + inserted - deleted
      val finalRows = t.toDF.count()
      val expected = nOrders + m("num_target_rows_inserted").toLong -
        m("num_target_rows_deleted").toLong
      assert(finalRows == expected,
        s"${c.name}: $finalRows rows, expected $expected (metrics: $m)")

      c.scenario match {
        case "insert_single" | "insert_multiple" =>
          // everything sampled as not-matched must land, exactly once
          assert(m("num_target_rows_inserted").toLong == srcRows,
            s"${c.name}: inserted ${m("num_target_rows_inserted")} of $srcRows source rows")
        case "delete" =>
          assert(m("num_target_rows_deleted").toLong == srcRows)
        case "upsert" =>
          assert(m("num_target_rows_updated").toLong +
            m("num_target_rows_inserted").toLong == srcRows)
      }
    }
  }
}
