package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.entries.{CoreEntries, EntryCtx, LlmEntries, TpcdsEntries, TpchEntries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One entry per implemented SURVEY §2 operator (plus the LLM-pipeline
  * operators); definitions live in [[graft.entries.CoreEntries]],
  * [[graft.entries.LlmEntries]], [[graft.entries.TpcdsEntries]] and
  * [[graft.entries.TpchEntries]]. */
object SparkEntry {

  private lazy val all = {
    val es = CoreEntries.entries ++ LlmEntries.entries ++ TpcdsEntries.entries ++
      TpchEntries.entries
    // a duplicate name would silently DROP an entry in the .toMap below —
    // the gate's denominator shrinks and the driver still reads all-green
    val dups = es.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate entry names: ${dups.mkString(", ")}")
    es
  }

  /** Entries run on the DRIVER's session, which may not share Verify/Bench's
    * UTC pin — date-cast groupings (q51/q67/events) would silently flap on a
    * non-UTC host, so every invocation pins the session timezone itself. */
  private def pinUtc[A](spark: SparkSession)(body: => A): A = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    body
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = pinUtc(spark) {
    val d = "/root/testdata/sf0.001"
    Seq("orders", "customer").foreach(EntryCtx.deltaView(spark, d, _))
    spark.sql(
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(27,2)) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { e =>
      e.name -> ((s: SparkSession, d: String) => pinUtc(s)(e.fn(s, d)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
