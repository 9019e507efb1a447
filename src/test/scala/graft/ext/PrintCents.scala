package graft.ext

import org.apache.spark.sql.SparkSession

/** Throwaway equality probe for the r16 trainCentroids rewrite: prints
  * an order-stable digest of the trained centroids (every double's raw
  * bits). Run before/after the rewrite — equal digests = bit-identical
  * training. */
object PrintCents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val cents = Similarity.trainCentroids(emb, 24)
    val md = java.security.MessageDigest.getInstance("MD5")
    cents.foreach(_.foreach { d =>
      val b = java.nio.ByteBuffer.allocate(8)
      b.putLong(java.lang.Double.doubleToRawLongBits(d))
      md.update(b.array())
    })
    println("CENTS_DIGEST " + cents.length + " " +
      cents.head.length + " " +
      md.digest().map("%02x".format(_)).mkString)
    spark.stop()
  }
}
