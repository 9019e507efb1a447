package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling harness for the q39 bench regression: times each
  * stage of the exact-pairs → cluster → survivors pipeline separately
  * at an arbitrary SF dir. Not part of the library surface. */
object ProfileQ39 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup like Bench
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()

    val pairs = time("jaccardPairs(0.8) cached") {
      val p = graft.ext.Dedup.jaccardPairsCached(spark, dir, 0.8)
      println(s"PROFILE   pairs rows = ${p.count()}")
      p
    }
    time("pairs re-count (cache hit)") { pairs.count() }

    time("clusterLabels only") {
      val n = graft.ext.Dedup.clusterLabels(pairs).count()
      println(s"PROFILE   labeled nodes = $n")
    }

    time("survivors + count") {
      val n = graft.ext.Dedup.dedupedCorpusExact(spark, dir, 0.8).count()
      println(s"PROFILE   survivors = $n")
    }
    spark.stop()
  }
}
