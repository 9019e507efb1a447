package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown for q84_gram_novelty's 10x smoke ratio:
  * times each plan stage (gram explode+distinct, the vocabulary-sized
  * df aggregate, the join-back + per-doc fold) at 1x and 10x so the
  * SCALE.md note can attribute the growth to a stage instead of
  * guessing. Reuses the ScaleSmoke replica (generated if missing).
  *
  * Usage: Test/runMain graft.tools.ProfileQ84
  */
object ProfileQ84 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (!new java.io.File("target/scale10/documents.parquet").exists())
      ScaleSmoke.generate(spark)

    def docsOf(path: String): DataFrame =
      spark.read.parquet(path).select(col("doc_id"), col("text"))

    def stages(tag: String, docs: DataFrame): Unit = {
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"PROFILE q84 $tag $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
      // legacy string formulation (pre-round-13), kept as the A/B
      // reference: explode strings → (doc, gram) DISTINCT shuffle
      val gramsStr = docs
        .select(col("doc_id"),
                explode(graft.functions.StringNGrams.ngrams(
                  split(graft.ext.TextAnalysis.normalized(col("text")), " "), 3)).as("g"))
        .filter(col("g") =!= "")
        .select(col("doc_id"), col("g")).distinct()
      time("0_string_distinct")(gramsStr)
      // round-13 hashed formulation: per-doc distinct md5-60bit grams
      // straight off the scan, no distinct shuffle
      val grams = docs
        .select(col("doc_id"),
                explode(graft.functions.HashShingles.md5Shingles(
                  split(graft.ext.TextAnalysis.normalized(col("text")), " "), 3)).as("h"))
      time("1_gram_hashed")(grams)
      time("2_df_aggregate")(grams.groupBy(col("h")).agg(count(lit(1)).as("gdf")))
      time("3_full_query")(graft.ext.TextAnalysis.gramNoveltyDf(docs))
    }

    stages("1x", docsOf("/root/testdata/sf0.1/documents.parquet"))
    stages("10x", docsOf("target/scale10/documents.parquet"))
    // second pass: warm-code numbers (JIT/codegen amortized)
    stages("1x_warm", docsOf("/root/testdata/sf0.1/documents.parquet"))
    stages("10x_warm", docsOf("target/scale10/documents.parquet"))
    spark.stop()
  }
}
