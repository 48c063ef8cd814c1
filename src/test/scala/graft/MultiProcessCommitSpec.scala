package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** True multi-process commit race: the local-FS commit publish claims
  * link(2) atomicity "across threads AND processes" (HadoopLogStore
  * .writeAtomic, FsPutClient.putIfAbsent), but every prior race test ran
  * clients inside ONE JVM. Here three REAL child JVMs append concurrently
  * to one table; the serialized history must contain every append exactly
  * once. */
class MultiProcessCommitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-mproc")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("3 JVMs x 4 appends race to one table: 12 serialized commits, no loss") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mproc_").toString + "/t"
    DeltaTable.write(spark, Seq((-1L, -1L)).toDF("child", "seq"), dir)

    val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

    val nChildren = 3
    val nAppends = 4
    val procs = (0 until nChildren).map { c =>
      val cmd = (Seq(java) ++ addOpens ++ Seq(
        "-Xmx1g", "-Dspark.ui.enabled=false",
        "-cp", cp, "graft.RaceAppendChild", dir, c.toString, nAppends.toString))
      new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    }
    val outputs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val code = p.waitFor()
      (code, out)
    }
    outputs.zipWithIndex.foreach { case ((code, out), i) =>
      assert(code == 0, s"child $i exited $code:\n${out.takeRight(4000)}")
    }

    val t = DeltaTable.forPath(spark, dir)
    // every append must have landed in its own serialized commit
    assert(t.version == nChildren * nAppends,
      s"expected ${nChildren * nAppends} commits after v0, got ${t.version}")
    val rows = t.toDF.as[(Long, Long)].collect().toSet
    val expected = (for (c <- 0 until nChildren; s <- 0 until nAppends)
      yield (c.toLong, s.toLong)).toSet + ((-1L, -1L))
    assert(rows == expected, s"lost/duplicated appends: ${(expected -- rows)} missing, " +
      s"${(rows -- expected)} unexpected")
    // the log itself: every version file parses, exactly one WRITE per child seq
    val hist = t.history()
    assert(hist.length == nChildren * nAppends + 1)
    assert(hist.map(_._1).sorted.toSeq == (0L to (nChildren * nAppends).toLong))
  }
}

/** Child main for [[MultiProcessCommitSpec]]: appends (child, seq) rows in
  * its own SparkSession/JVM; the commit loop's conflict retry must absorb
  * VersionAlreadyExists races from sibling PROCESSES. */
object RaceAppendChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, child, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-child-$child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      (0 until n.toInt).foreach { s =>
        DeltaTable.write(spark,
          Seq((child.toLong, s.toLong)).toDF("child", "seq"), dir, mode = "append")
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
