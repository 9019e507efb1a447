package graft

/** Beyond-reference DML through the llamadb dialect (SURVEY §2.4: UPDATE /
  * DELETE / DISTINCT are lexer tokens or parse-only in the reference; full
  * capability parity means executing them). */
class DmlSpec extends SparkSpec {

  private def freshEngine(): Engine = {
    val eng = new Engine(spark)
    eng.executeScript(
      """CREATE TABLE t (id int, qty int, name string null);
        |INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b'),
        |                     (3, 30, NULL), (4, 40, 'd');""".stripMargin)
    eng
  }

  test("UPDATE with WHERE rewrites matching rows, expressions see old values") {
    val eng = freshEngine()
    val r = eng.execute("UPDATE t SET qty = qty + 1 WHERE id > 2")
    assert(r == eng.Updated(2))
    val got = eng.sql("SELECT id, qty FROM t ORDER BY id").collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(got == Seq((1, 10), (2, 20), (3, 31), (4, 41)))
  }

  test("UPDATE without WHERE touches every row; multi-column SET") {
    val eng = freshEngine()
    val r = eng.execute("UPDATE t SET qty = 0, name = 'x'")
    assert(r == eng.Updated(4))
    assert(eng.sql("SELECT count(*) AS n FROM t WHERE qty = 0").head.getLong(0) == 4)
  }

  test("UPDATE cannot write NULL into a NOT NULL column") {
    val eng = freshEngine()
    intercept[RuntimeException] {
      eng.execute("UPDATE t SET qty = NULL WHERE id = 1")
    }
    // table unchanged after the failed statement
    assert(eng.sql("SELECT count(*) AS n FROM t WHERE qty = 10").head.getLong(0) == 1)
  }

  test("DELETE with WHERE removes only matching rows; NULL predicate keeps row") {
    val eng = freshEngine()
    // name = 'a' is NULL for the NULL-name row → that row must survive
    val r = eng.execute("DELETE FROM t WHERE name = 'a'")
    assert(r == eng.Deleted(1))
    val ids = eng.sql("SELECT id FROM t ORDER BY id").collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(2, 3, 4))
  }

  test("DELETE without WHERE empties the table") {
    val eng = freshEngine()
    assert(eng.execute("DELETE FROM t") == eng.Deleted(4))
    assert(eng.sql("SELECT id FROM t").count() == 0)
    // global aggregate over the now-empty table: one row, count 0
    // (standard SQL; documented deviation from reference, SURVEY §2.3)
    assert(eng.sql("SELECT count(*) AS n FROM t").head.getLong(0) == 0)
  }

  test("SELECT DISTINCT dedups the projected rows") {
    val eng = freshEngine()
    eng.execute("INSERT INTO t VALUES (5, 10, 'a'), (6, 10, 'a')")
    // rows with qty=10: ids 1, 5, 6 — all (10, 'a')
    assert(eng.sql("SELECT DISTINCT qty FROM t WHERE qty = 10").count() == 1)
    assert(eng.sql("SELECT DISTINCT qty, name FROM t WHERE qty = 10").count() == 1)
    assert(eng.sql("SELECT DISTINCT id FROM t WHERE qty = 10").count() == 3)
  }
}
