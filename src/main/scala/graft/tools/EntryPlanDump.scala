package graft.tools


/** Plan-evidence dumper for GATE ENTRIES (optimization rounds): writes
  * `.explain("formatted")` plus the executed AQE-final plan of named
  * `SparkEntry.queries` entries to `plans/<tag>/<entry>_<suffix>.txt`, the
  * same evidence format as [[PlanDump]] produces for the bench queries —
  * PlanDump times/dumps the bench-shaped queries verbatim; this tool covers
  * the oracle-gate entries the bench does not represent (read-shaped
  * entries only: an entry that mutates tables re-runs its whole op on the
  * executed-plan pass, which is still sound — every entry is
  * idempotent-by-construction over its own temp dirs — just slower).
  *
  * Usage: sbt "runMain graft.tools.EntryPlanDump <outDir> <suffix> <e1,e2,…>"
  * Env: SPARK_GRAFT_CPUS (default 4, same as Verify/EntryTimes).
  */
object EntryPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: EntryPlanDump <outDir> <suffix> <names> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).toSeq
    // sfDir falls back to $SPARK_GRAFT_SF_DIR with a LOUD log line — a
    // silent machine-specific default dumped plans against the wrong data
    // on any other checkout (r16 advisor item)
    val sfDir = args.lift(3)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error(
        "EntryPlanDump: pass sfDir as the 4th arg or set SPARK_GRAFT_SF_DIR"))
    System.err.println(s"[entry-plan] sfDir = $sfDir")
    java.nio.file.Files.createDirectories(outDir)
    val unknown = names.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown entries: ${unknown.mkString(",")}")

    // session conf shared with graft.Verify (one place to add an
    // entry-required conf); quieter log level for readable dumps
    val spark = graft.Verify.gateSession()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"entryplan: $name")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan.execute().foreach(_ => ())
      val tExec = (System.nanoTime() - t1) / 1e9
      val executed = df.queryExecution.executedPlan.toString
      val p = outDir.resolve(s"${name}_$suffix.txt")
      java.nio.file.Files.write(p,
        (f"== Entry $name (build ${tBuild}%.3f s, final-frame exec ${tExec}%.3f s, sf=$sfDir, cpus=${spark.sparkContext.defaultParallelism}) ==%n" +
          txt + "\n\n== Executed Plan (AQE final) ==\n" + executed)
          .getBytes("UTF-8"))
      System.err.println(f"[entry-plan] $name build=$tBuild%.3f exec=$tExec%.3f -> $p")
    }
    spark.stop()
  }
}
