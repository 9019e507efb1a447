package graft.cli

import graft.{Engine, SparkSpec}

/** REPL output formatting + script driving (reference `cli/src/
  * prettyselect.rs` box format; `cli/src/main.rs` result lines). */
class ReplSpec extends SparkSpec {

  test("prettyTable renders the reference box format") {
    val t = Repl.prettyTable(Seq("a", "bb"), Seq(Seq("1", "xyz")))
    val lines = t.split("\n").toSeq
    // -------------
    // | a | bb  |   <- header padded to max(col, cell) width
    assert(lines.head.forall(_ == '-'))
    assert(lines(1) == "| a | bb  |")
    assert(lines(2).forall(_ == '-'))
    assert(lines(3) == "| 1 | xyz |")
    assert(lines(4).forall(_ == '-'))
    assert(lines.head.length == lines(1).length)
  }

  test("prettyTable with no rows prints the header block only") {
    val t = Repl.prettyTable(Seq("col"), Nil)
    val lines = t.split("\n").toSeq
    assert(lines.length == 3 && lines(1) == "| col |")
  }

  test("runScript executes statements and survives errors") {
    val eng = new Engine(spark)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Repl.runScript(eng,
        """CREATE TABLE rt (x int, s string null);
          |INSERT INTO rt VALUES (1, 'a'), (2, NULL);
          |SELECT x, s FROM rt WHERE x = 2;
          |SELECT nope FROM rt;
          |SELECT x FROM rt WHERE x = 1;""".stripMargin)
    }
    val text = out.toString("UTF-8")
    assert(text.contains("Created ("))
    assert(text.contains("2 rows inserted ("))
    assert(text.contains("| 2 | NULL |"))
    assert(text.contains("1 rows selected ("))
    // the bad statement reports and the session continues
    assert(text.contains("execution error:"))
    assert(text.contains("| 1 |"))
  }
}
