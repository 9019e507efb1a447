package graft

import org.apache.spark.sql.types.TimestampNTZType

/** The events loader must be timestamp-unit-proof: the driver regenerated
  * the testdata mid-project once (round 7), flipping `events.ts` from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS), and the nanos-only
  * loader took down 16 correctness gates. The committed fixtures under
  * `src/test/resources/tsfixture/{nanos,micros}` hold the SAME 20 logical
  * rows written in both physical units (generated once with pyarrow,
  * which can write both; nanos values are exact microsecond multiples so
  * the ns→µs truncation is lossless).
  */
class TablesSpec extends SparkSpec {

  private def fixture(unit: String): String =
    getClass.getResource(s"/tsfixture/$unit").getPath

  test("loadEvents returns identical rows for nanos and micros fixtures") {
    val nanos = Tables.load(spark, fixture("nanos"), "events")
    val micros = Tables.load(spark, fixture("micros"), "events")
    assert(nanos.schema("ts").dataType == TimestampNTZType)
    assert(micros.schema("ts").dataType == TimestampNTZType)
    assert(nanos.schema == micros.schema)
    val n = nanos.orderBy("event_id").collect().toSeq
    val m = micros.orderBy("event_id").collect().toSeq
    assert(n.size == 20)
    assert(n == m)
  }

  test("loadEvents on driver testdata lands in the data's real epoch") {
    import org.apache.spark.sql.functions.{max, min, year}
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampNTZType)
    val Array(row) = ev
      .select(min(year(org.apache.spark.sql.functions.col("ts"))).as("lo"),
              max(year(org.apache.spark.sql.functions.col("ts"))).as("hi"))
      .collect()
    // a unit mix-up lands in 1970 (÷1000) or year ~56k (×1000) — either
    // side of this band catches it
    assert(row.getInt(0) >= 2000 && row.getInt(1) <= 2100,
      s"events.ts outside sane epoch: years ${row.getInt(0)}..${row.getInt(1)}")
  }

  test("normalizeEventsTs rejects an unsupported ts type loudly") {
    import spark.implicits._
    val bogus = Seq((1L, "not-a-time", 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(bogus))
    assert(e.getMessage.contains("testdata contract changed"))
  }

  test("schema canary passes on driver testdata and names a drifted table") {
    Tables.assertSchemas(spark, sfDir) // must not throw today
    // the nanos fixture dir has only events; every other table fails to
    // load there, so the canary must name them all — and events itself
    // (20 rows, right schema) must NOT appear in the diff
    val e = intercept[IllegalStateException](
      Tables.assertSchemas(spark, fixture("nanos")))
    assert(e.getMessage.contains("TESTDATA SCHEMA CANARY"))
    assert(e.getMessage.contains("lineitem"))
    assert(!e.getMessage.contains("events:"))
  }
}
