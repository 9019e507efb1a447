package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join/agg must be value-identical to the plain formulations —
  * salting only changes the partition spread. */
class SkewSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    .withColumnRenamed("c_custkey", "o_custkey")

  test("saltedJoin equals the plain equi-join (inner)") {
    val plain = orders.join(customer, Seq("o_custkey"), "inner")
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", salts = 7)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin preserves left-outer padding") {
    val plain = orders.join(customer, Seq("o_custkey"), "left_outer")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey",
      salts = 5, joinType = "left_outer")
    assert(salted.count() == plain.count())
  }

  test("saltedCountSum equals the plain aggregation") {
    val plain = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sum_o_totalprice"))
    val salted = Skew.saltedCountSum(orders, "o_custkey", "o_totalprice", 7)
    assert(salted.count() == plain.count())
    // doubles summed in different order: compare to 1e-6 via join
    val j = salted.join(plain.withColumnRenamed("n", "pn")
        .withColumnRenamed("sum_o_totalprice", "ps"), "o_custkey")
    assert(j.filter(col("n") =!= col("pn")).count() == 0)
    assert(j.filter(abs(col("sum_o_totalprice") - col("ps")) > 1e-6).count() == 0)
  }

  test("saltedJoin rejects join types salting cannot preserve") {
    for (jt <- Seq("right_outer", "full_outer", "cross")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(orders, customer, "o_custkey", 4, joinType = jt)
      }
      assert(e.getMessage.contains("inner/left"))
    }
  }

  test("salt is deterministic (content-derived, retry-safe)") {
    val s1 = Skew.saltedJoin(orders, customer, "o_custkey", 7).count()
    val s2 = Skew.saltedJoin(orders, customer, "o_custkey", 7).count()
    assert(s1 == s2)
  }

  test("keySkewProfile matches a driver-side distribution recompute") {
    import org.apache.spark.sql.functions._
    val got = Skew.keySkewProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(6)))).toMap
    val counts = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").count().collect().map(_.getLong(1))
    assert(got("lineitem")._1 == counts.length.toLong)
    assert(got("lineitem")._2 == counts.max)
    val mean = BigDecimal(counts.sum.toDouble / counts.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("lineitem")._3 == mean)
    assert(got.contains("events"))
  }
}
