package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: Morton-key correctness against a reference bit
  * interleave, and the locality property the rewrite exists for — every
  * output file bounds BOTH dimensions, which single-column sorting
  * cannot do. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave, plain Scala. */
  private def morton(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    for (i <- 0 until bits)
      out |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    out
  }

  test("mortonKey2 equals the reference interleave") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
              ZOrder.mortonKey2(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == morton(a, b, 16), s"($a, $b)")
    }
  }

  test("mortonKeyN interleaves three columns round-robin") {
    // reference: bit i of column j lands at position i*3 + j
    def morton3(a: Long, b: Long, c: Long, bits: Int): Long = {
      var out = 0L
      for (i <- 0 until bits)
        out |= (((a >> i) & 1L) << (3 * i)) |
               (((b >> i) & 1L) << (3 * i + 1)) |
               (((c >> i) & 1L) << (3 * i + 2))
      out
    }
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(100)(_ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong,
       rnd.nextInt(1024).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.mortonKeyN(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      assert(z == morton3(a, b, c, 10), s"($a, $b, $c)")
    }
    intercept[IllegalArgumentException] {
      ZOrder.mortonKeyN(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
  }

  test("autoScale bins wide domains onto the bit budget, keeping locality") {
    val tmp = Files.createTempDirectory("graft_zorder_scale").toString
    // domain far beyond 2^6: multiples of 1e9 on one axis, 1e6 on the
    // other — same 64x64 grid shape after binning
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a * 1000000000L, b * 1000000L)).toDF("a", "b")
    grid.coalesce(1).write.parquet(s"$tmp/in")
    val inBytes = new java.io.File(s"$tmp/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = ZOrder.zorderWrite(spark, s"$tmp/in", s"$tmp/z", "a", "b",
      bits = 6, targetFileBytes = math.max(1L, inBytes / 16),
      autoScale = true)
    assert(n >= 8)
    val spans = new java.io.File(s"$tmp/z").listFiles().toSeq
      .filter(_.getName.endsWith(".parquet")).map { f =>
        spark.read.parquet(f.getAbsolutePath)
          .agg(max(col("a")) - min(col("a")),
               max(col("b")) - min(col("b")))
          .as[(Long, Long)].collect()(0)
      }
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    // both dims bounded at <= half their (scaled-up) domain span
    assert(avg(spans.map(_._1)) <= 32.0 * 1000000000L)
    assert(avg(spans.map(_._2)) <= 32.0 * 1000000L)
    assert(spark.read.parquet(s"$tmp/z").count() == 64 * 64)
  }

  test("morton key is monotone in each argument's high bits") {
    // sanity on curve shape: doubling a high bit of either input moves
    // the key by the corresponding interleaved amount
    assert(morton(2, 0, 16) == 4L && morton(0, 2, 16) == 8L)
    assert(morton(3, 3, 16) == 15L)
  }

  test("zorderWrite bounds both dimensions per file; a 1-D sort cannot") {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    // grid data: every (a, b) pair in [0,64)^2, one row each — uniform
    // over the key rectangle so per-file ranges are interpretable
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong, a * 64L + b)).toDF("a", "b", "payload")
    grid.coalesce(1).write.parquet(s"$tmp/in")
    val inBytes = new java.io.File(s"$tmp/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target 1/16 of the input so the rewrite splits into ~16 files
    val n = ZOrder.zorderWrite(spark, s"$tmp/in", s"$tmp/z", "a", "b",
      bits = 6, targetFileBytes = math.max(1L, inBytes / 16))
    assert(n >= 8, s"expected a multi-file rewrite, got $n")
    // the comparison layout: same file count, sorted by `a` alone
    spark.read.parquet(s"$tmp/in").repartitionByRange(n, col("a"))
      .sortWithinPartitions(col("a"))
      .write.parquet(s"$tmp/lin")

    def perFileSpans(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val d = spark.read.parquet(f.getAbsolutePath)
            .agg(max(col("a")) - min(col("a")),
                 max(col("b")) - min(col("b")))
            .as[(Long, Long)].collect()(0)
          d
        }

    val zSpans = perFileSpans(s"$tmp/z")
    val linSpans = perFileSpans(s"$tmp/lin")
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val zA = avg(zSpans.map(_._1)); val zB = avg(zSpans.map(_._2))
    val linB = avg(linSpans.map(_._2))
    // z-order: BOTH dims bounded well under the 63 domain span;
    // a-sorted: b spans (almost) the whole domain in every file
    assert(zA <= 32 && zB <= 32, s"z-order spans a=$zA b=$zB")
    assert(linB >= 55, s"a-sorted files should span b fully, got $linB")
    // losslessness: same rows back
    assert(spark.read.parquet(s"$tmp/z").count() == 64 * 64)
    assert(spark.read.parquet(s"$tmp/z").agg(sum(col("payload")))
      .as[Long].collect()(0) ==
      grid.agg(sum(col("payload"))).as[Long].collect()(0))
  }

  test("zorderWrite rejects keys wider than the bit budget") {
    val tmp = Files.createTempDirectory("graft_zorder_rej").toString
    Seq((70000L, 1L)).toDF("a", "b").write.parquet(s"$tmp/in")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zorderWrite(spark, s"$tmp/in", s"$tmp/out", "a", "b", 16, 1L)
    }
    assert(e.getMessage.contains("rank-scale"))
  }

  test("gate matches a literal recomputation at sf0.001") {
    val out = ZOrder.zorderGate(spark, sfDir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val exp = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (f, rs) =>
        (f, rs.length.toLong, rs.map(r => morton(r._2, r._3, 16)).sum)
      }.toSeq.sortBy(_._1)
    assert(out.toSeq == exp)
  }
}
