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

  /** Morton key of N non-negative integer columns: bit i of column j
    * lands at interleaved position i·N + j, for the low `bits` bits of
    * each. N·bits must fit a signed 64-bit key. Callers bin or
    * rank-scale wider domains into `bits` first ([[zorderWrite]] guards
    * against silent truncation, or scales for you with autoScale). */
  def mortonKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n cols x $bits bits = ${n * bits} key bits; must be in [1, 63]")
    val longs = cols.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ bitwiseOR _)
  }

  /** Two-column Morton key (bit i of `a` at even position 2i, of `b` at
    * odd 2i+1) — the common case of [[mortonKeyN]]. */
  def mortonKey2(a: Column, b: Column, bits: Int = 16): Column =
    mortonKeyN(Seq(a, b), bits)

  /** Z-order maintenance rewrite: read `inPath`, sort by the Morton key
    * of (`colA`, `colB`), and write parquet files sized like
    * [[Sources.compactParquet]] (input bytes / target). `orderBy` on the
    * key range-partitions into `nFiles` sorted spans, so each output
    * file covers one contiguous Z-curve segment — a bounded rectangle in
    * (colA, colB) space. By default fails fast if either column exceeds
    * `bits` (truncated keys would silently destroy locality) or is
    * negative; with `autoScale` each column is linearly binned from its
    * observed [min, max] onto [0, 2^bits) instead — binning is
    * layout-only (the data is untouched), so double-precision bin edges
    * are fine at any domain width. Returns the file count. */
  def zorderWrite(spark: SparkSession, inPath: String, outPath: String,
                  colA: String, colB: String, bits: Int = 16,
                  targetFileBytes: Long = 128L * 1024 * 1024,
                  autoScale: Boolean = false): Int = {
    require(targetFileBytes > 0, "target file size must be positive")
    val inputBytes = Sources.parquetInputBytes(spark, inPath, "zorderWrite")
    val nFiles = math.max(1,
      math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val limit = 1L << bits
    val Array(maxA, maxB, minA, minB) =
      df.agg(max(col(colA)).cast("long"), max(col(colB)).cast("long"),
             min(col(colA)).cast("long"), min(col(colB)).cast("long"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    def bin(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else least(lit(limit - 1), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo.toDouble)) /
          lit((hi - lo).toDouble) * lit((limit - 1).toDouble))
          .cast("long")))
    val (ka, kb) =
      if (autoScale) (bin(colA, minA, maxA), bin(colB, minB, maxB))
      else {
        require(minA >= 0 && minB >= 0,
          s"zorderWrite: negative keys ($colA min $minA, $colB min $minB)")
        require(maxA < limit && maxB < limit,
          s"zorderWrite: keys exceed $bits bits ($colA max $maxA, " +
            s"$colB max $maxB >= $limit); bin or rank-scale the columns " +
            "first, or pass autoScale = true")
        (col(colA), col(colB))
      }
    val key = mortonKey2(ka, kb, bits)
    df.repartitionByRange(nFiles, key)
      .sortWithinPartitions(key)
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
