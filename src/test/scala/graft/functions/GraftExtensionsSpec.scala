package graft.functions

import graft.SparkSpec

/** The SQL-function registration surface: every custom expression is
  * callable from spark.sql and agrees with its Column-builder twin.
  * Extensions are applied via withExtensions at session build; here we
  * inject into the shared test session through the functionRegistry the
  * same way injectFunction does. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val registered: Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerInto(ext, spark)
  }

  test("hash_shingles / word_hashes / minhash_sig compose in SQL") {
    registered
    val r = spark.sql(
      """SELECT minhash_sig(hash_shingles(array('a','b','c','d','e'), 3), 8)
        |  AS sig,
        |  word_hashes(array('x','x','y')) AS wh""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 8)
    val wh = r.getSeq[Long](1)
    assert(wh.length == 3 && wh(0) == wh(1) && wh(0) != wh(2))
  }

  test("sorted_intersect_count and simhash64 work in SQL") {
    registered
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(1L,3L,5L), array(3L,5L,7L)) AS c,
        |       simhash64(array(0L)) AS s""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.getLong(1) == 0L)
  }

  test("normalize_text works in SQL") {
    registered
    val r = spark.sql(
      "SELECT normalize_text('  Hello, WORLD!  123 ') AS n").head()
    assert(r.getString(0) == "hello world 123")
  }

  test("cdc_boundaries works in SQL and agrees with the Column builder") {
    registered
    val s = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"
    val sqlOut = spark.sql(
      s"SELECT cdc_boundaries('$s', 8, 4) AS b").head().getSeq[Int](0)
    val builderOut = CdcBoundaries
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, 4)
      .toIntArray().toSeq
    assert(sqlOut == builderOut)
    assert(sqlOut.nonEmpty, "divisor 4 must cut a 52-char string")
  }

  test("vec_dot / vec_l2norm agree with the Column builders") {
    registered
    val r = spark.sql(
      """SELECT vec_dot(vec_l2norm(array(3.0D, 4.0D)),
        |               vec_l2norm(array(3.0D, 4.0D))) AS unit""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
