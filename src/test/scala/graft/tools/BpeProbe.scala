package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the BPE trainer's rebase cost in a SPEC-shaped
  * session (local[4], 4 shuffle partitions, sf0.001) — used to
  * adjudicate rebase mechanisms (DataFrame persist vs localCheckpoint
  * vs RDD round-trip) when the spec suite's wall-clock moves.
  * Test/runMain graft.tools.BpeProbe [k...]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        sys.props.getOrElse("probe.ext", "graft.functions.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(6, 10, 12)
    for (k <- ks) {
      val t0 = System.nanoTime()
      val n = graft.ext.TextAnalysis.bpeMerges(spark, dir, k).count()
      println(f"[probe] bpeMerges k=$k%-3d -> $n merges in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val t1 = System.nanoTime()
    graft.ext.TextAnalysis.bpeEncode(spark, dir).count()
    println(f"[probe] bpeEncode k=6 in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
