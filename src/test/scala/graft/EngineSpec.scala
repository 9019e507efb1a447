package graft

import org.apache.spark.sql.Row

/** End-to-end llamadb-dialect engine: lex → parse → compile → execute.
  * Mirrors the reference's documented behaviors (Usage.md) including the
  * two golden result shapes, plus the semantic edges from SURVEY §1.5.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine: Engine = new Engine(spark)

  test("CREATE TABLE + INSERT + SELECT roundtrip") {
    val eng = freshEngine
    eng.execute("CREATE TABLE person (id int, name string, age int null)")
    val ins = eng.execute(
      "INSERT INTO person VALUES (1, 'ada', 36), (2, 'alan', NULL)")
    assert(ins == eng.Inserted(2))
    assertSameRows(eng.sql("SELECT id, name, age FROM person"),
      Seq(Row(1, "ada", 36), Row(2, "alan", null)))
  }

  test("INSERT with column list: missing columns take type defaults") {
    val eng = freshEngine
    eng.execute("CREATE TABLE d (a int, b string, c double null)")
    eng.execute("INSERT INTO d (a) VALUES (7)")
    // b (string NOT NULL) -> "", c (nullable) -> NULL
    assertSameRows(eng.sql("SELECT a, b, c FROM d"), Seq(Row(7, "", null)))
  }

  test("NULL into NOT NULL column errors; NaN is rejected") {
    val eng = freshEngine
    eng.execute("CREATE TABLE s (x int, y double)")
    val e1 = intercept[Exception] {
      eng.execute("INSERT INTO s VALUES (NULL, 1.0)")
    }
    assert(e1.getMessage.contains("non-nullable"))
  }

  test("identifiers are case-insensitive and lowercased") {
    val eng = freshEngine
    eng.execute("CREATE TABLE Mixed (Col1 INT)")
    eng.execute("INSERT INTO mixed VALUES (5)")
    assert(eng.sql("SELECT COL1 FROM MIXED").as[Int].head() == 5)
  }

  test("cross join via FROM comma list + WHERE (Usage.md:95 shape)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE album (albumid int, title string, artistid int)")
    eng.execute("CREATE TABLE artist (artistid int, name string)")
    eng.execute("INSERT INTO artist VALUES (1, 'AC/DC'), (2, 'Accept')")
    eng.execute("INSERT INTO album VALUES " +
      "(1, 'For Those About To Rock', 1), (2, 'Balls to the Wall', 2), " +
      "(3, 'Restless and Wild', 2)")
    val out = eng.sql(
      """SELECT title AS album, name AS artist FROM album, artist
        |WHERE album.artistid = artist.artistid""".stripMargin)
    assertSameRows(out, Seq(
      Row("For Those About To Rock", "AC/DC"),
      Row("Balls to the Wall", "Accept"),
      Row("Restless and Wild", "Accept")))
  }

  test("INNER JOIN ... ON and LEFT JOIN null padding") {
    val eng = freshEngine
    eng.execute("CREATE TABLE l (k int, lv string)")
    eng.execute("CREATE TABLE r (k int, rv string null)")
    eng.execute("INSERT INTO l VALUES (1, 'a'), (2, 'b')")
    eng.execute("INSERT INTO r VALUES (1, 'x')")
    assertSameRows(
      eng.sql("SELECT l.k, lv, rv FROM l JOIN r ON l.k = r.k"),
      Seq(Row(1, "a", "x")))
    assertSameRows(
      eng.sql("SELECT l.k, lv, rv FROM l LEFT JOIN r ON l.k = r.k"),
      Seq(Row(1, "a", "x"), Row(2, "b", null)))
  }

  test("GROUP BY with all five aggregates + HAVING") {
    val eng = freshEngine
    eng.execute("CREATE TABLE t (g string, v int)")
    eng.execute("INSERT INTO t VALUES ('a',1),('a',2),('a',3),('b',10)")
    val out = eng.sql(
      """SELECT g, count(*) AS n, sum(v) AS s, avg(v) AS m,
        |       min(v) AS lo, max(v) AS hi
        |FROM t GROUP BY g HAVING count(*) > 1""".stripMargin)
    // sum accumulates as double (reference aggregate.rs:48-68)
    assertSameRows(out, Seq(Row("a", 3L, 6.0, 2.0, 1, 3)))
  }

  test("whole-query aggregate without GROUP BY") {
    val eng = freshEngine
    eng.execute("CREATE TABLE w (v int)")
    eng.execute("INSERT INTO w VALUES (4), (6)")
    assertSameRows(eng.sql("SELECT count(*) AS n, avg(v) AS a FROM w"),
      Seq(Row(2L, 5.0)))
  }

  test("bare column under GROUP BY resolves deterministically (min)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE bc (g string, v int)")
    eng.execute("INSERT INTO bc VALUES ('a', 9), ('a', 3)")
    assertSameRows(eng.sql("SELECT g, v FROM bc GROUP BY g"),
      Seq(Row("a", 3)))
  }

  test("truthiness: non-boolean WHERE tests non-zero / non-empty") {
    val eng = freshEngine
    eng.execute("CREATE TABLE tr (n int, s string)")
    eng.execute("INSERT INTO tr VALUES (0, ''), (2, 'x'), (0, 'y')")
    assertSameRows(eng.sql("SELECT n FROM tr WHERE n"), Seq(Row(2)))
    assertSameRows(eng.sql("SELECT n FROM tr WHERE s"),
      Seq(Row(2), Row(0)))
  }

  test("division: integer inputs truncate (reference i64 div), " +
       "div-by-zero yields NULL; || concatenates display forms") {
    val eng = freshEngine
    eng.execute("CREATE TABLE dv (a int, b int, f double)")
    eng.execute("INSERT INTO dv VALUES (10, 0, 4.0), (10, 4, 4.0)")
    assertSameRows(eng.sql("SELECT a / b AS q FROM dv"),
      Seq(Row(null), Row(2L)))
    assertSameRows(eng.sql("SELECT a / f AS q FROM dv"),
      Seq(Row(2.5), Row(2.5)))
    assertSameRows(eng.sql("SELECT 'v=' || a FROM dv"),
      Seq(Row("v=10"), Row("v=10")))
  }

  test("uncorrelated scalar subquery; >1 row errors (reference parity)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE sq (v int)")
    eng.execute("INSERT INTO sq VALUES (5)")
    eng.execute("CREATE TABLE out1 (x int)")
    eng.execute("INSERT INTO out1 VALUES (1), (2)")
    assertSameRows(eng.sql("SELECT x, (SELECT v FROM sq) AS sv FROM out1"),
      Seq(Row(1, 5), Row(2, 5)))
    eng.execute("INSERT INTO sq VALUES (6)") // now 2 rows -> error
    val e = intercept[Exception] {
      eng.sql("SELECT x, (SELECT v FROM sq) AS sv FROM out1").collect()
    }
    assert(e.getMessage.contains("exactly one row"))
  }

  test("correlated scalar subquery (Usage.md:114-117 shape)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE genre (genreid int, gname string)")
    eng.execute("CREATE TABLE track (tname string, genreid int)")
    eng.execute("INSERT INTO genre VALUES (1, 'Rock'), (2, 'Jazz')")
    eng.execute("INSERT INTO track VALUES ('a', 1), ('b', 2), ('c', 1)")
    val out = eng.sql(
      """SELECT tname, (SELECT gname FROM genre
        |               WHERE genre.genreid = track.genreid) AS g
        |FROM track""".stripMargin)
    assertSameRows(out,
      Seq(Row("a", "Rock"), Row("b", "Jazz"), Row("c", "Rock")))
  }

  test("correlated aggregate subquery: count over matching rows") {
    val eng = freshEngine
    eng.execute("CREATE TABLE par (id int)")
    eng.execute("CREATE TABLE chi (pid int)")
    eng.execute("INSERT INTO par VALUES (1), (2), (3)")
    eng.execute("INSERT INTO chi VALUES (1), (1), (2)")
    val out = eng.sql(
      """SELECT id, (SELECT count(*) FROM chi WHERE chi.pid = par.id) AS n
        |FROM par""".stripMargin)
    // empty group -> 0 (standard SQL; documented deviation)
    assertSameRows(out, Seq(Row(1, 2L), Row(2, 1L), Row(3, 0L)))
  }

  test("scalar subquery inside INSERT VALUES (tempdb/mod.rs:247-263)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE src (v int)")
    eng.execute("INSERT INTO src VALUES (41)")
    eng.execute("CREATE TABLE dst (x int)")
    eng.execute("INSERT INTO dst VALUES ((SELECT v FROM src) + 1)")
    assert(eng.sql("SELECT x FROM dst").as[Int].head() == 42)
  }

  test("INSERT INTO ... SELECT (parsed-but-panicking in reference)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE a (v int)")
    eng.execute("CREATE TABLE b (v int)")
    eng.execute("INSERT INTO a VALUES (1), (2)")
    val r = eng.execute("INSERT INTO b SELECT v FROM a WHERE v > 1")
    assert(r == eng.Inserted(1))
    assert(eng.sql("SELECT v FROM b").as[Int].head() == 2)
  }

  test("derived table in FROM (reference Map operator)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE m (g string, v int)")
    eng.execute("INSERT INTO m VALUES ('a',1),('a',2),('b',5)")
    val out = eng.sql(
      """SELECT g, s FROM (SELECT g, sum(v) AS s FROM m GROUP BY g) t
        |WHERE s > 3""".stripMargin)
    assertSameRows(out, Seq(Row("b", 5.0)))
  }

  test("ORDER BY / LIMIT (beyond-reference capability)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE ob (v int)")
    eng.execute("INSERT INTO ob VALUES (3), (1), (2)")
    assert(eng.sql("SELECT v FROM ob ORDER BY v DESC LIMIT 2")
      .as[Int].collect().toSeq == Seq(3, 2))
  }

  test("errors: unknown function, ambiguous column, unknown table/column") {
    val eng = freshEngine
    eng.execute("CREATE TABLE e1 (x int)")
    eng.execute("CREATE TABLE e2 (x int)")
    def msg(sql: String): String =
      intercept[Exception](eng.sql(sql)).getMessage
    assert(msg("SELECT upper(x) FROM e1").contains("unknown function"))
    assert(msg("SELECT x FROM e1, e2").contains("ambiguous"))
    assert(msg("SELECT nope FROM e1").contains("does not exist"))
    assert(msg("SELECT x FROM nope").contains("does not exist"))
    assert(intercept[Exception](
      eng.execute("CREATE TABLE e1 (y int)")).getMessage
      .contains("already exists"))
  }

  test("arity mismatch + aggregate misuse error") {
    val eng = freshEngine
    eng.execute("CREATE TABLE ar (x int)")
    assert(intercept[Exception](
      eng.execute("INSERT INTO ar VALUES (1, 2)")).getMessage
      .contains("arity"))
    assert(intercept[Exception](
      eng.sql("SELECT sum(x) FROM ar WHERE sum(x) > 1")).getMessage
      .toLowerCase.contains("aggregate"))
  }

  test("EXPLAIN renders the s-expression pipeline + spark plan") {
    val eng = freshEngine
    eng.execute("CREATE TABLE ex (g string, v int)")
    val eng.Explained(text) = eng.execute(
      "EXPLAIN SELECT g, count(*) FROM ex WHERE v > 1 GROUP BY g"): @unchecked
    assert(text.contains("(query"))
    assert(text.contains("(scan `ex`"))
    assert(text.contains("temp-group-by"))
    assert(text.contains("spark physical plan"))
  }

  test("llamadb front end over registered parquet tables (scale path)") {
    val eng = freshEngine
    eng.registerTestTables(sfDir)
    val out = eng.sql(
      """SELECT n_name, count(*) AS n FROM customer, nation
        |WHERE c_nationkey = n_nationkey
        |GROUP BY n_name HAVING count(*) > 2""".stripMargin)
    assert(out.count() > 0)
    // the llamadb text compiled to a real Catalyst equi-join, not NLJ
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("backtick identifiers, comments, and string escapes lex correctly") {
    val eng = freshEngine
    eng.execute("CREATE TABLE `quoted` (`col` int)")
    eng.execute("INSERT INTO quoted VALUES (1) -- trailing comment")
    assert(eng.sql("SELECT col /* inline */ FROM quoted").as[Int].head() == 1)
    eng.execute("CREATE TABLE strs (s string)")
    eng.execute("""INSERT INTO strs VALUES ('it\'s')""")
    assert(eng.sql("SELECT s FROM strs").as[String].head() == "it's")
  }

  test("operator precedence: * binds over +, comparisons over AND/OR") {
    val eng = freshEngine
    eng.execute("CREATE TABLE p (x int)")
    eng.execute("INSERT INTO p VALUES (2)")
    assert(eng.sql("SELECT 1 + x * 3 AS v FROM p").as[Long].head() == 7L)
    assertSameRows(
      eng.sql("SELECT x FROM p WHERE x > 1 AND x < 3 OR x = 99"),
      Seq(Row(2)))
  }
}
