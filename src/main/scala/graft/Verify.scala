package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The ONE SparkSession builder for the gate tools (Verify, EntryTimes,
    * EntryPlanDump): a session conf the entries need (e.g. a new legacy
    * parquet flag for a new testdata table) is added HERE, once — the
    * inline-copy drift this replaces had to be found and fixed tool by
    * tool. Bench/PlanDump are deliberately NOT on this helper: their confs
    * mirror each other verbatim under PlanDump's drift warning.
    * Honors SPARK_GRAFT_CPUS (default 4, the Verify contract). */
  def gateSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long and convert
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs timestamps (not INT96) so the oracle compare is lossless
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** SPARK_GRAFT_VERIFY_ONLY=a,b,c entry filter, validated against the
    * registry — a typo'd / empty filter silently producing an empty dump
    * would read as a green-but-vacuous record, so unknown names fail
    * loudly (shared by Verify/EntryTimes; same contract everywhere). */
  def onlyFilter(): Option[Set[String]] = {
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names unknown entries: ${unknown.mkString(",")}")
    }
    only
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = gateSession()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY restricts to the named entries (local
    // iteration aid; the driver sets nothing and dumps the full set)
    val only = onlyFilter()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          // e.toString, not getMessage: an NPE's message is null and this
          // line is the only trace of why the entry's dump is missing
          System.err.println(s"[verify] $name failed: $e")
        }
      }
    val json = Verify.oracleJson(
      SparkEntry.oracleSql.filter { case (k, _) => only.forall(_.contains(k)) })
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  // Shared with Bench's headline record (private[graft]) — ONE escape
  // implementation, or a future widening silently misses a copy.
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def oracleJson(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}

/** Dev tool: dump SparkEntry.oracleSql as JSON WITHOUT executing any entry
  * (no SparkSession) — input for tools/oracle_audit.py's DuckDB DESCRIBE
  * sweep that flags HUGEINT-typed output cells (the q51 class: DuckDB types
  * sum(BIGINT) as HUGEINT, which the driver's pandas fetch renders as
  * float64 while Spark emits int64 → hash mismatch on identical values). */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/oracle_sql.json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out), Verify.oracleJson(SparkEntry.oracleSql))
    println(s"wrote ${SparkEntry.oracleSql.size} oracle SQL texts to $out")
  }
}
