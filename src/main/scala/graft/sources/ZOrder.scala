package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * counterpart of [[Sources.compactParquet]]'s maintenance rewrite.
  *
  * Sorting a table by ONE column gives parquet row-group/file min-max
  * footers a tight range on that column but leaves every other column
  * spanning its full domain, so only single-dimension predicates prune.
  * Interleaving the bits of two sort columns (Morton 1966; the layout
  * behind Delta/Iceberg Z-ORDER clustering) makes file order locality
  * hold in BOTH dimensions at once: each sized output file covers a
  * bounded rectangle of the key space, and a selective predicate on
  * EITHER column skips most files. At 100 TB this is the difference
  * between a layout that serves one query family and one that serves
  * the cross product.
  *
  * The key is built from codegen'd built-ins only (shiftright/and/
  * shiftleft/or folds) — no UDF, stays inside whole-stage codegen; the
  * rewrite itself is one range-partitioned sort (a single shuffle) and
  * a sized write.
  */
object ZOrder {

  /** Morton key of two non-negative integer columns: bit i of `a` lands
    * at even position 2i, bit i of `b` at odd position 2i+1, for the low
    * `bits` bits of each. Callers bin or rank-scale wider domains into
    * `bits` first ([[zorderWrite]] guards against silent truncation). */
  def mortonKey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order maintenance rewrite: read `inPath`, sort by the Morton key
    * of (`colA`, `colB`), and write parquet files sized like
    * [[Sources.compactParquet]] (input bytes / target). `orderBy` on the
    * key range-partitions into `nFiles` sorted spans, so each output
    * file covers one contiguous Z-curve segment — a bounded rectangle in
    * (colA, colB) space. Fails fast if either column exceeds `bits`
    * (truncated keys would silently destroy locality) or is negative.
    * Returns the file count. */
  def zorderWrite(spark: SparkSession, inPath: String, outPath: String,
                  colA: String, colB: String, bits: Int = 16,
                  targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, "target file size must be positive")
    val inputBytes = {
      val p = new org.apache.hadoop.fs.Path(inPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(p), s"zorderWrite: input path does not exist: $inPath")
      val it = fs.listFiles(p, true)
      var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
      }
      require(bytes > 0, s"zorderWrite: no parquet files under $inPath")
      bytes
    }
    val nFiles = math.max(1,
      math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val limit = 1L << bits
    val Array(maxA, maxB, minA, minB) =
      df.agg(max(col(colA)).cast("long"), max(col(colB)).cast("long"),
             min(col(colA)).cast("long"), min(col(colB)).cast("long"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    require(minA >= 0 && minB >= 0,
      s"zorderWrite: negative keys ($colA min $minA, $colB min $minB)")
    require(maxA < limit && maxB < limit,
      s"zorderWrite: keys exceed $bits bits ($colA max $maxA, $colB max " +
        s"$maxB >= $limit); bin or rank-scale the columns first")
    df.repartitionByRange(nFiles, mortonKey2(col(colA), col(colB), bits))
      .sortWithinPartitions(mortonKey2(col(colA), col(colB), bits))
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** Driver gate: per-returnflag count and Morton-key sum over lineitem
    * (l_partkey, l_suppkey, 16 bits) — the key expression itself is the
    * thing under test; the sum is an order-independent checksum of every
    * interleaved bit (any misplaced bit perturbs it). Max key < 2^32 and
    * row counts ≤ 6M at sf1, so the sum stays far inside int64. */
  def zorderGate(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(mortonKey2(col("l_partkey"), col("l_suppkey"), 16))
             .as("sum_zkey"))

  /** DuckDB oracle for [[zorderGate]]: the closed-form 16-term bit
    * interleave — bit i of each key extracted with integer div/mod and
    * placed at 4^i (even lane) / 2·4^i (odd lane). CAST back to BIGINT
    * (DuckDB widens sum to HUGEINT — the q92 dtype lesson). */
  val zorderGateOracleSql: String = {
    val terms = (0 until 16).map { i =>
      s"((l_partkey // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((l_suppkey // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""SELECT l_returnflag, count(*) AS n,
       |  CAST(sum($terms) AS BIGINT) AS sum_zkey
       |FROM lineitem GROUP BY 1""".stripMargin
  }
}
