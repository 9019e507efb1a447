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
    assert(text.contains("(scan `ex` :source-id 0"))
    assert(text.contains("temp-group-by :source-id 1"))
    // v is column offset 1 of source 0 (Usage.md:150-156 numbering)
    assert(text.contains("(column-field :source-id 0 :column-offset 1)"))
    assert(text.contains("spark physical plan"))
  }

  test("EXPLAIN numbers multiple sources in scan order") {
    val eng = freshEngine
    eng.execute("CREATE TABLE ea (x int)")
    eng.execute("CREATE TABLE eb (y int)")
    val eng.Explained(text) = eng.execute(
      "EXPLAIN SELECT x, y FROM ea, eb WHERE x = y"): @unchecked
    assert(text.contains("(scan `ea` :source-id 0"))
    assert(text.contains("(scan `eb` :source-id 1"))
    assert(text.contains("(column-field :source-id 0 :column-offset 0)"))
    assert(text.contains("(column-field :source-id 1 :column-offset 0)"))
  }

  test("theta-correlated subquery plans keyed joins, no cartesian product") {
    val eng = freshEngine
    eng.registerTestTables(sfDir)
    val df = eng.sql(
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM lineitem
        |   WHERE lineitem.l_orderkey = orders.o_orderkey
        |     AND lineitem.l_extendedprice < orders.o_totalprice)
        |    AS n_below
        |FROM orders WHERE o_orderkey < 1000""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst must extract the equality conjunct as the join key and
    // carry the `<` as residual condition — never a cartesian product
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
           || plan.contains("BroadcastHashJoin"))
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

  test("identifier validity mirrors the reference's rules and test vectors") {
    // identifier.rs:89-111 acceptance vectors, driven through the real
    // DDL/query path (the reference validates at Identifier::new;
    // quoting is the only way to reach the space-bearing cases)
    val eng = freshEngine
    eng.execute("CREATE TABLE idt (`AbCdEfG` int, `a0123456789` int, " +
      "`Hello World` int, `_1a` int)")
    eng.execute("INSERT INTO idt VALUES (1, 2, 3, 4)")
    // normalized to ASCII lowercase: case-insensitive round trips
    assert(eng.sql("SELECT abcdefg FROM idt").as[Int].head() == 1)
    assert(eng.sql("SELECT `ABCDEFG` FROM idt").as[Int].head() == 1)
    assert(eng.sql("SELECT a0123456789 FROM idt").as[Int].head() == 2)
    assert(eng.sql("SELECT `Hello World` FROM idt").as[Int].head() == 3)
    assert(eng.sql("SELECT `_1a` FROM idt").as[Int].head() == 4)
    // rejection vectors: empty, leading digit, leading/contained-bad
    // chars — the reference's "bad identifier" surface
    for (bad <- Seq("``", "`1a`", "` abc `", "`a-b`", "`tab\tx`")) {
      val e = intercept[Exception](
        eng.execute(s"CREATE TABLE badid ($bad int)"))
      assert(e.getMessage.contains("bad identifier"),
        s"expected bad-identifier error for $bad, got: ${e.getMessage}")
    }
    // non-ASCII word start is an unknown character, as in the
    // reference lexer (sqlsyntax/lexer.rs:159 falls to Err(c))
    val e = intercept[Exception](eng.sql("SELECT café FROM idt"))
    assert(e.getMessage.contains("unexpected character"),
      s"got: ${e.getMessage}")
    // non-ASCII DIGITS too: the reference's number arm is '0'..='9',
    // so an Arabic-Indic or full-width digit is an unknown character,
    // not a Num token (same discipline as the word arm above)
    for (d <- Seq("٥", "５")) {
      val e2 = intercept[Exception](eng.sql(s"SELECT $d FROM idt"))
      assert(e2.getMessage.contains("unexpected character"),
        s"expected unexpected-character for U+${d.head.toInt.toHexString}, " +
          s"got: ${e2.getMessage}")
    }
  }

  test("truthiness applies per AND/OR operand (columnvalueops.rs:95-109)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE trb (n int, s string)")
    eng.execute("INSERT INTO trb VALUES (0, 'x'), (2, 'y'), (3, '')")
    // integer and string operands under AND: non-zero AND non-empty
    assertSameRows(eng.sql("SELECT n FROM trb WHERE n AND s"), Seq(Row(2)))
    // OR: non-zero OR non-empty
    assertSameRows(eng.sql("SELECT n FROM trb WHERE n OR s"),
      Seq(Row(0), Row(2), Row(3)))
    // mixed: comparison AND string operand
    assertSameRows(eng.sql("SELECT n FROM trb WHERE n >= 2 AND s"),
      Seq(Row(2)))
  }

  test("theta-correlated subquery (non-equality correlation)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE emp (id int, dept int, sal int)")
    eng.execute("INSERT INTO emp VALUES " +
      "(1, 10, 100), (2, 10, 200), (3, 10, 300), (4, 20, 150), (5, 20, 50)")
    // per employee: employees in the same dept earning strictly less
    val out = eng.sql(
      """SELECT id,
        |  (SELECT count(*) FROM emp e
        |   WHERE e.dept = emp.dept AND e.sal < emp.sal) AS n_lower
        |FROM emp""".stripMargin)
    assertSameRows(out, Seq(
      Row(1, 0L), Row(2, 1L), Row(3, 2L), Row(4, 1L), Row(5, 0L)))
  }

  test("theta decorrelation guardrail: over-cap nested loop fails fast") {
    // The pure-theta fallback is a faithful nested loop (outer x inner
    // pairs); spark.graft.decorrelate.maxPairs caps the pair volume so
    // a hostile query fails fast instead of launching an effectively
    // unbounded cartesian. 4x4 = 16 pairs > cap 8 -> clear error; the
    // default cap runs the same query fine.
    val eng = freshEngine
    eng.execute("CREATE TABLE gl (a int)")
    eng.execute("INSERT INTO gl VALUES (1), (2), (3), (4)")
    val q = "SELECT a, (SELECT count(*) FROM gl g WHERE g.a < gl.a)" +
      " AS n FROM gl"
    spark.conf.set("spark.graft.decorrelate.maxPairs", "8")
    try {
      val e = intercept[Exception](eng.sql(q).collect())
      assert(e.getMessage.contains("maxPairs"),
        s"expected guardrail error, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.decorrelate.maxPairs")
    assertSameRows(eng.sql(q),
      Seq(Row(1, 0L), Row(2, 1L), Row(3, 2L), Row(4, 3L)))
  }

  test("theta guardrail is width-scaled: wide rows trip proportionally earlier") {
    // Same row count, same pair count — only the schema width differs.
    // The cap is calibrated for ~64-byte probe rows; a 10-string-column
    // table's probe rows are ~6x wider, so its effective cap is ~6x
    // lower and the identical 81-pair nested loop trips where the
    // narrow table's passes.
    val eng = freshEngine
    val wideCols = (1 to 10).map(i => s"s$i string").mkString(", ")
    eng.execute(s"CREATE TABLE wv (a int, $wideCols)")
    eng.execute("CREATE TABLE nv (a int)")
    val strs = (1 to 10).map(i => s"'v$i'").mkString(", ")
    (1 to 9).foreach { i =>
      eng.execute(s"INSERT INTO wv VALUES ($i, $strs)")
      eng.execute(s"INSERT INTO nv VALUES ($i)")
    }
    def q(t: String) =
      s"SELECT a, (SELECT count(*) FROM $t x WHERE x.a < $t.a) AS n FROM $t"
    spark.conf.set("spark.graft.decorrelate.maxPairs", "100")
    try {
      // narrow: 2 int columns ≈ 8 bytes < 64 → cap stays 100 ≥ 81 pairs
      assert(eng.sql(q("nv")).collect().length == 9)
      // wide: ~408 bytes → effective cap ~15 < 81 pairs → fails fast
      val e = intercept[Exception](eng.sql(q("wv")).collect())
      assert(e.getMessage.contains("width-scaled"),
        s"expected width-scaled guardrail error, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.decorrelate.maxPairs")
    // and the wide query is legitimate under the default cap
    assert(eng.sql(q("wv")).collect().length == 9)
  }

  test("correlated subquery: outer reference in the SELECT value") {
    val eng = freshEngine
    eng.execute("CREATE TABLE ords (k int, amt int)")
    eng.execute("CREATE TABLE pay (k int, paid int)")
    eng.execute("INSERT INTO ords VALUES (1, 100), (2, 50)")
    eng.execute("INSERT INTO pay VALUES (1, 30), (1, 20), (2, 50)")
    // outstanding balance: outer column minus correlated aggregate
    val out = eng.sql(
      """SELECT k, (SELECT ords.amt - sum(paid) FROM pay
        |            WHERE pay.k = ords.k) AS rest
        |FROM ords""".stripMargin)
    assertSameRows(out, Seq(Row(1, 50.0), Row(2, 0.0)))
  }

  test("multi-FROM correlated subquery") {
    val eng = freshEngine
    eng.execute("CREATE TABLE fa (k int)")
    eng.execute("CREATE TABLE fb (k int)")
    eng.execute("CREATE TABLE fo (k int)")
    eng.execute("INSERT INTO fa VALUES (1), (1), (2)")
    eng.execute("INSERT INTO fb VALUES (1), (2), (2)")
    eng.execute("INSERT INTO fo VALUES (1), (2), (3)")
    // pairs (fa x fb) matching the outer key on both sides
    val out = eng.sql(
      """SELECT k, (SELECT count(*) FROM fa, fb
        |            WHERE fa.k = fo.k AND fb.k = fo.k) AS n
        |FROM fo""".stripMargin)
    assertSameRows(out, Seq(Row(1, 2L), Row(2, 2L), Row(3, 0L)))
  }

  test("JOIN inside a scalar subquery (queryplan/mod.rs:735-757)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE sa (k int, v int)")
    eng.execute("CREATE TABLE sb (k int, w int)")
    eng.execute("CREATE TABLE so (id int, cap int)")
    eng.execute("INSERT INTO sa VALUES (1, 10), (2, 20)")
    eng.execute("INSERT INTO sb VALUES (1, 1), (1, 2), (2, 3)")
    eng.execute("INSERT INTO so VALUES (1, 1), (2, 15)")
    // uncorrelated joined subquery: full join cardinality per outer row
    assertSameRows(
      eng.sql("""SELECT id, (SELECT count(*) FROM sa JOIN sb
                |            ON sa.k = sb.k) AS n FROM so""".stripMargin),
      Seq(Row(1, 3L), Row(2, 3L)))
    // correlated WHERE over the joined inner frame (empty group -> 0)
    assertSameRows(
      eng.sql("""SELECT id, (SELECT count(*) FROM sa JOIN sb
                |            ON sa.k = sb.k
                |            WHERE sb.w >= so.cap) AS n FROM so"""
                .stripMargin),
      Seq(Row(1, 3L), Row(2, 0L)))
    // outer-referencing INNER-join ON folds into the correlated predicate
    assertSameRows(
      eng.sql("""SELECT id, (SELECT count(*) FROM sa JOIN sb
                |            ON sa.k = sb.k AND sb.w >= so.cap) AS n
                |FROM so""".stripMargin),
      Seq(Row(1, 3L), Row(2, 0L)))
    // LEFT JOIN with a local ON inside a correlated subquery: null-padded
    // rows survive the correlated WHERE, count(col) skips the NULLs
    assertSameRows(
      eng.sql("""SELECT id, (SELECT count(sb.w) FROM sa LEFT JOIN sb
                |            ON sa.k = sb.k AND sb.w > 2
                |            WHERE sa.v >= so.cap) AS n FROM so"""
                .stripMargin),
      Seq(Row(1, 1L), Row(2, 1L)))
    // correlated ON in a LEFT JOIN cannot fold -> explicit error
    val e = intercept[Exception](eng.sql(
      """SELECT id, (SELECT count(*) FROM sa LEFT JOIN sb
        |            ON sb.w >= so.cap) AS n FROM so""".stripMargin))
    assert(e.getMessage.contains("LEFT JOIN"))
  }

  test("SELECT * under GROUP BY = any-row columns (execute/mod.rs:233-247)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE gw (k int, v int)")
    eng.execute("INSERT INTO gw VALUES (1, 5), (1, 9), (2, 7)")
    // reference resolves every expanded column as a bare column -> "any
    // row of the group"; deterministic min() here
    assertSameRows(eng.sql("SELECT * FROM gw GROUP BY k"),
      Seq(Row(1, 5), Row(2, 7)))
    assertSameRows(eng.sql("SELECT *, count(*) FROM gw GROUP BY k"),
      Seq(Row(1, 5, 2L), Row(2, 7, 1L)))
  }

  test("general decorrelation is exact over a shuffled outer frame") {
    val eng = freshEngine
    // the outer plan contains a repartition shuffle: the synthetic
    // outer-row id must come from ONE materialized assignment (the
    // persisted frame), not be re-stamped per join branch
    val emp = Seq((1, 10, 100), (2, 10, 200), (3, 10, 300), (4, 20, 150),
                  (5, 20, 50))
      .toDF("id", "dept", "sal")
      .repartition(7, org.apache.spark.sql.functions.col("sal"))
    eng.register("semp", emp)
    val out = eng.sql(
      """SELECT id,
        |  (SELECT count(*) FROM semp e
        |   WHERE e.dept = semp.dept AND e.sal < semp.sal) AS n_lower
        |FROM semp""".stripMargin)
    assertSameRows(out, Seq(
      Row(1, 0L), Row(2, 1L), Row(3, 2L), Row(4, 1L), Row(5, 0L)))
  }

  test("correlated subquery rejects GROUP BY/ORDER BY/LIMIT explicitly") {
    val eng = freshEngine
    eng.execute("CREATE TABLE cg (k int, v int)")
    eng.execute("CREATE TABLE co (k int)")
    eng.execute("INSERT INTO cg VALUES (1, 2)")
    eng.execute("INSERT INTO co VALUES (1)")
    def msg(sql: String): String =
      intercept[Exception](eng.sql(sql)).getMessage
    assert(msg("""SELECT (SELECT count(*) FROM cg
                 | WHERE cg.k = co.k GROUP BY v) FROM co""".stripMargin)
      .contains("not supported in a correlated subquery"))
    assert(msg("""SELECT (SELECT v FROM cg
                 | WHERE cg.k = co.k LIMIT 1) FROM co""".stripMargin)
      .contains("not supported in a correlated subquery"))
  }

  test("ORDER BY compiles expressions, not just bare columns") {
    val eng = freshEngine
    eng.execute("CREATE TABLE obe (v int, w int)")
    eng.execute("INSERT INTO obe VALUES (1, 9), (3, 1), (2, 3)")
    assert(eng.sql("SELECT v, w FROM obe ORDER BY v + w")
      .as[(Int, Int)].collect().toSeq == Seq((3, 1), (2, 3), (1, 9)))
    assert(eng.sql("SELECT v FROM obe ORDER BY -v")
      .as[Int].collect().toSeq == Seq(3, 2, 1))
  }

  test("scalar subqueries in JOIN ON conditions") {
    val eng = freshEngine
    eng.execute("CREATE TABLE jl (k int, v int)")
    eng.execute("CREATE TABLE jr (k int, w int)")
    eng.execute("CREATE TABLE lim (cap int)")
    eng.execute("INSERT INTO jl VALUES (1, 5), (2, 50)")
    eng.execute("INSERT INTO jr VALUES (1, 10), (2, 20)")
    eng.execute("INSERT INTO lim VALUES (15)")
    // uncorrelated: join only when the right value clears the cap
    assertSameRows(
      eng.sql("""SELECT jl.k, w FROM jl JOIN jr
                |ON jl.k = jr.k AND w < (SELECT cap FROM lim)"""
                .stripMargin),
      Seq(Row(1, 10)))
    // left-correlated: the subquery keys on a left-side column
    assertSameRows(
      eng.sql("""SELECT jl.k, w FROM jl JOIN jr
                |ON w > (SELECT v FROM jl l2 WHERE l2.k = jl.k)"""
                .stripMargin),
      Seq(Row(1, 10), Row(1, 20)))
  }

  test("byte[N] length is enforced at insert (variant.rs:88-94)") {
    val eng = freshEngine
    eng.execute("CREATE TABLE fx (id int, tag byte[4])")
    // exactly 4 UTF-8 bytes is accepted
    eng.execute("INSERT INTO fx VALUES (1, 'abcd')")
    val e = intercept[Exception] {
      eng.execute("INSERT INTO fx VALUES (2, 'abcde')")
    }
    assert(e.getMessage.contains("does not fit byte[4]"))
    // omitted byte[4] column defaults to 4 zero bytes
    eng.execute("INSERT INTO fx (id) VALUES (3)")
    import spark.implicits._
    val tags = eng.sql("SELECT tag FROM fx").as[Array[Byte]].collect()
    assert(tags.forall(_.length == 4))
  }

  test("database-qualified table names error cleanly (reference panics)") {
    val eng = freshEngine
    def msg(sql: String): String =
      intercept[Exception](eng.execute(sql)).getMessage
    assert(msg("CREATE TABLE db1.t (x int)")
      .contains("database-qualified table name 'db1.t' is not supported"))
    assert(msg("SELECT x FROM db1.t").contains("not supported"))
    assert(msg("INSERT INTO db1.t VALUES (1)").contains("not supported"))
  }

  test("prepared-statement '?' lexes but fails to parse with a clear error") {
    val eng = freshEngine
    eng.execute("CREATE TABLE q (x int)")
    val m = intercept[Exception](
      eng.execute("SELECT x FROM q WHERE x = ?")).getMessage
    assert(m.contains("prepared-statement placeholder"))
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
