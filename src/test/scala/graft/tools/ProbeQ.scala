package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: time a named subset of SparkEntry.queries in a fresh
  * session, each query run twice (cold, warm). Usage:
  *   Test/runMain graft.tools.ProbeQ q30_knn_brute q37_knn_ivf
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // args of the form -Dk=v become system properties (the forked JVM
    // doesn't inherit sbt-command-line -D flags)
    args.filter(_.startsWith("-D")).foreach { a =>
      val kv = a.drop(2).split("=", 2)
      if (kv.length == 2) sys.props(kv(0)) = kv(1)
    }
    val names0 = args.filterNot(_.startsWith("-D")).toSeq
    val names = if (names0.nonEmpty) names0 else Seq("q30_knn_brute")
    // bootstrap warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"PROBE $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}
