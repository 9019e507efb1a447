package graft

import org.apache.spark.sql.functions._

/** The reference's de-facto end-to-end acceptance fixture: its REPL
  * `testdata` command loads a Chinook subset (5 tables, ~4,200 statements
  * — `cli/src/testdata.sql`) and `Usage.md:88-135` documents two expected
  * result sets. This spec drives the same script through our engine's
  * full lex → parse → INSERT/CREATE → Catalyst pipeline and checks those
  * documented results. The script is read from the read-only reference
  * checkout at test time (it is the reference's data, not ours to copy).
  */
class ChinookAcceptanceSpec extends SparkSpec {

  private val scriptPath = "/root/reference/cli/src/testdata.sql"

  private lazy val engine: Engine = {
    val eng = new Engine(spark)
    val script = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(scriptPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    eng.executeScript(script)
    eng
  }

  test("testdata.sql loads: 5 tables with the documented cardinalities") {
    // Chinook subset sizes (Usage.md: 347 albums joined; full track list)
    assert(engine.catalog.table("album").count() == 347)
    assert(engine.catalog.table("artist").count() == 275)
    assert(engine.catalog.table("track").count() == 3503)
    assert(engine.catalog.table("genre").count() == 25)
    assert(engine.catalog.table("mediatype").count() == 5)
  }

  test("Usage.md:95-97 join: 347 rows with the documented pairs") {
    val df = engine.sql(
      """SELECT title AS album, name AS artist
        |FROM album, artist
        |WHERE album.artistid = artist.artistid""".stripMargin)
    assert(df.count() == 347)
    val byAlbum = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byAlbum("For Those About To Rock We Salute You") == "AC/DC")
    assert(byAlbum("Jagged Little Pill") == "Alanis Morissette")
    assert(byAlbum("Warner 25 Anos") == "Antônio Carlos Jobim")
  }

  test("Usage.md:114-117 grouped correlated subquery: 25 groups, documented values") {
    val df = engine.sql(
      """SELECT (
        |    SELECT genre.name FROM genre WHERE genre.genreid = track.genreid
        |) genre, count(*) num_tracks, avg(milliseconds) / 1000 avg_seconds
        |FROM track GROUP BY genreid""".stripMargin)
    val rows = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.size == 25)
    def check(genre: String, n: Long, avgSec: Double): Unit = {
      val (gotN, gotAvg) = rows(genre)
      assert(gotN == n, s"$genre count")
      assert(math.abs(gotAvg - avgSec) < 5e-7, s"$genre avg: $gotAvg")
    }
    // the documented sample (Usage.md:120-131)
    check("Blues", 81, 270.359778)
    check("Electronica/Dance", 30, 302.9858)
    check("Opera", 1, 174.813)
    check("Comedy", 17, 1585.263706)
    check("Rock", 1297, 283.910043)
    check("R&B/Soul", 61, 220.066852)
    check("World", 28, 224.923821)
    check("TV Shows", 93, 2145.041022)
    check("Metal", 374, 309.749444)
    check("Alternative", 40, 264.058525)
  }
}
