package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan capture: writes `.explain("formatted")` of named gates
  * to files (for the optimization-round before/after plan evidence).
  *
  * Usage: Test/runMain graft.tools.PlanDump <outDir> <suffix> qNN [qNN...]
  *   → <outDir>/<gate>_<suffix>.txt per gate.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1).
  *
  * Same session shape as Bench (local[32], 32 shuffle partitions) so the
  * captured plans are the benched plans. Streaming gates run their query
  * to a bounded sink first (the plan of interest is the one the sink
  * table's DataFrame carries afterwards).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <gate> [gate...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val gates = args.drop(2)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = graft.SparkEntry.queries
    gates.foreach { name =>
      val df = queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
