package graft

/** Dev tool (optimization rounds): dump `.explain("formatted")` for a
  * list of registry queries to files — the plan evidence the round's
  * `plans/r19/<query>_{before,after}.txt` deliverables require.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Writes `<outDir>/<name>_<suffix>.txt` per query. Queries that build
  * scratch artifacts run their builds first (the plan reflects the
  * read face, same as the bench's timed rep).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Registry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Registry.prepareSharedArtifacts(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[plandump] prebuild FAILED: $e") }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = Registry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.command.ExplainCommand(
            df.queryExecution.logical,
            org.apache.spark.sql.execution.FormattedMode,
          ).mode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] $n → $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
