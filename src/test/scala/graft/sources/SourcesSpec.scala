package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Sources/sinks: round-trips, schema enforcement, and the two plan
  * properties that matter at scale — partition pruning on partitioned
  * layouts and shuffle-free joins on bucketed tables. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("v", DoubleType)))

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "k", "v")

  test("formatRoundTripGate: all three formats report the parquet truth") {
    val out = Sources.formatRoundTripGate(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
                                    r.getLong(3)))).toMap
    assert(out.keySet == Set("csv", "jsonl", "orc"))
    assert(out.values.toSet.size == 1,
      s"formats disagree on the content summary: $out")
    assert(out("csv")._1 == 500)
  }

  test("csv/jsonl survive adversarial text (quotes, commas, backslashes)") {
    val nasty = Seq(
      (1L, """comma, "quoted", back\slash""", "en", "s", 1L),
      (2L, "pipe|pipe and 'single' \t tab", "zh", "s", 2L),
      (3L, "trailing space  ", "de", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = s"$tmp/nasty"
    nasty.write.mode("overwrite")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("header", "true").csv(s"$base/csv")
    nasty.write.mode("overwrite").json(s"$base/jsonl")
    val sch = nasty.schema
    val c = Sources.readCsv(spark, s"$base/csv", sch).collect()
      .map(_.toString).sorted.toSeq
    val j = Sources.readJsonLines(spark, s"$base/jsonl", sch).collect()
      .map(_.toString).sorted.toSeq
    val orig = nasty.collect().map(_.toString).sorted.toSeq
    assert(c == orig, "csv mangled adversarial text")
    assert(j == orig, "jsonl mangled adversarial text")
  }

  test("csv round-trip with explicit schema") {
    val p = s"$tmp/csv"
    sample.write.option("header", "true").csv(p)
    val got = Sources.readCsv(spark, p, schema)
    assert(got.schema == schema)
    assert(got.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
  }

  test("json-lines round-trip with explicit schema") {
    val p = s"$tmp/json"
    sample.write.json(p)
    val got = Sources.readJsonLines(spark, p, schema)
    assert(got.count() == 3 && got.schema == schema)
  }

  test("parquet reader applies expected schema as projection") {
    val p = s"$tmp/parquet"
    sample.withColumn("extra", lit(9)).write.parquet(p)
    val got = Sources.readParquet(spark, p,
      Some(StructType(schema.take(2))))
    assert(got.columns.toSeq == Seq("id", "k"))
  }

  test("orc round-trip with expected-schema projection") {
    val p = s"$tmp/orc"
    sample.withColumn("extra", lit(9)).write.orc(p)
    val got = Sources.readOrc(spark, p, Some(StructType(schema.take(2))))
    assert(got.columns.toSeq == Seq("id", "k"))
    assert(Sources.readOrc(spark, p).count() == 3)
  }

  test("partitioned write enables partition pruning at read") {
    val p = s"$tmp/part"
    Sources.writePartitioned(sample, p, Seq("k"))
    val scan = spark.read.parquet(p).filter(col("k") === "a")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
           physical.contains("isnotnull(k"), physical)
    assert(scan.count() == 2)
  }

  test("compaction collapses a fragmented table to the sized file count") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    try {
      // fragment: 64 tiny files
      spark.range(0, 10000).toDF("id")
        .repartition(64)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$base/frag")
      val fragFiles = new java.io.File(s"$base/frag").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(fragFiles == 64)
      // compact with a target well above the total input size → 1 file
      val n = Sources.compactParquet(spark, s"$base/frag", s"$base/out",
        targetFileBytes = 1L << 30)
      assert(n == 1)
      val outFiles = new java.io.File(s"$base/out").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(outFiles == 1)
      // rows survive exactly
      assert(spark.read.parquet(s"$base/out").count() == 10000)
      // a small target produces proportionally more files
      val tot = {
        def sz(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(sz).sum else f.length()
        sz(new java.io.File(s"$base/frag"))
      }
      val n2 = Sources.compactParquet(spark, s"$base/frag", s"$base/out2",
        targetFileBytes = math.max(1, tot / 4))
      assert(n2 >= 4)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  test("bucketed table joins bucket-to-bucket without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS bkt_l")
    spark.sql("DROP TABLE IF EXISTS bkt_r")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(sample, "bkt_l", Seq("id"), 4, sortCols = Seq("id"))
      Sources.writeBucketed(sample, "bkt_r", Seq("id"), 4, sortCols = Seq("id"))
      val j = spark.table("bkt_l").join(spark.table("bkt_r"), "id")
      val physical = j.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), physical)
      assert(j.count() == 3)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_l")
      spark.sql("DROP TABLE IF EXISTS bkt_r")
    }
  }

  test("corrupt ingest: good + corrupt partition the feed, ids recovered") {
    val row = Sources.corruptIngestGate(spark, sfDir).collect()(0)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val total = docs.count()
    assert(row.getLong(0) + row.getLong(1) == total,
      "no line silently dropped")
    val expectCorrupt = docs
      .filter(org.apache.spark.sql.functions.col("doc_id") % 17 === 3)
      .count()
    assert(row.getLong(1) == expectCorrupt)
    assert(expectCorrupt > 0, "fixture must contain corrupt lines")
    val expectCk = docs
      .filter(org.apache.spark.sql.functions.col("doc_id") % 17 =!= 3)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("doc_id") % 9973))
      .collect()(0).getLong(0)
    assert(row.getLong(2) == expectCk, "good rows carry their true ids")
  }
}
