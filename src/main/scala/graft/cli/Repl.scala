package graft.cli

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import graft.Engine
import graft.sqlfront.Lexer

/** Interactive llamadb-dialect console — the Spark analog of the
  * reference CLI (`cli/src/main.rs:26-66`): a `llamadb>` prompt with a
  * `...>` continuation, statements executed at each `;`, result tables
  * printed in the reference's boxed format (`cli/src/prettyselect.rs`)
  * with per-statement wall time, and errors reported without killing the
  * session. The reference's `testdata` command (which loads its bundled
  * Chinook script) becomes: register the driver parquet test tables from
  * a scale-factor directory (arg 1, default sf0.001).
  *
  * Run with: sbt 'runMain graft.cli.Repl [sfDir]'
  */
object Repl {

  /** Rows per printed page (reference passes 32 to pretty_select). */
  private val PageLength = 32

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-repl")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = new Engine(spark)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in))
    val buf = new StringBuilder
    var eof = false
    while (!eof) {
      print(if (buf.isEmpty) "llamadb> " else "    ...> ")
      Console.flush()
      val line = in.readLine()
      if (line == null) eof = true
      else if (buf.isEmpty && line.trim == "testdata") {
        try {
          eng.registerTestTables(sfDir)
          println(s"Test data registered from $sfDir.")
        } catch {
          case e: Exception => println(e.getMessage)
        }
      } else if (buf.isEmpty && (line.trim == "exit" || line.trim == "quit")) {
        eof = true
      } else {
        buf.append(line).append('\n')
        // execute once the buffered input lexes cleanly and ends at a `;`
        // (mid-statement newlines just extend the continuation prompt)
        tryTokens(buf.toString) match {
          case Some(toks) if toks.nonEmpty && toks.last == Lexer.Op(";") =>
            val script = buf.toString
            buf.clear()
            runScript(eng, script)
          case Some(_) => () // incomplete statement — keep reading
          case None =>
            println(s"syntax error: ${lexError(buf.toString)}")
            buf.clear()
        }
      }
    }
    spark.stop()
  }

  private def tryTokens(s: String): Option[Vector[Lexer.Token]] =
    try Some(Lexer.tokenize(s).filterNot(_ == Lexer.EOF))
    catch { case _: Exception => None }

  private def lexError(s: String): String =
    try { Lexer.tokenize(s); "" }
    catch { case e: Exception => e.getMessage }

  /** Execute every statement in the script, printing each result the
    * reference CLI's way; an error is reported and the remaining
    * statements still run — neither the script nor the session dies.
    * Execution errors can surface while ITERATING the result (the
    * compiled raise_error for a 0- or multi-row scalar subquery, casts),
    * so result printing sits inside the same handler as the statement
    * run. SELECT results stream through `toLocalIterator` — one
    * partition on the driver at a time, constant memory for any size. */
  private[cli] def runScript(eng: Engine, script: String): Unit = {
    val statements =
      try graft.sqlfront.Parser.parseScript(script)
      catch {
        case e: Exception => println(s"syntax error: ${e.getMessage}"); return
      }
    statements.foreach { stmt =>
      val t0 = System.nanoTime()
      def dur = f"${(System.nanoTime() - t0) / 1e9}%.3fs"
      try {
        eng.runStatement(stmt) match {
          case eng.Created       => println(s"Created ($dur).")
          case eng.Inserted(n)   => println(s"$n rows inserted ($dur).")
          case eng.Updated(n)    => println(s"$n rows updated ($dur).")
          case eng.Deleted(n)    => println(s"$n rows deleted ($dur).")
          case eng.Explained(t)  => println(t)
          case eng.Rows(df)      =>
            val names = df.columns.toSeq
            val rows = df.toLocalIterator().asScala.map(row =>
              names.indices.map(i =>
                if (row.isNullAt(i)) "NULL" else {
                  row.get(i) match {
                    case b: Array[Byte] => b.map("%02x".format(_)).mkString
                    case v => v.toString
                  }
                }))
            var n = 0
            rows.grouped(PageLength).foreach { page =>
              print(prettyTable(names, page.toSeq))
              n += page.length
            }
            if (n == 0) print(prettyTable(names, Nil))
            println(s"$n rows selected ($dur).")
        }
      } catch {
        case e: Exception => println(s"execution error: ${e.getMessage}")
      }
    }
  }

  /** The reference's boxed table (`prettyselect.rs:64-106`):
    * dashed separators above/below the header and after the body, cells
    * padded to the column width with one space of padding. */
  private[cli] def prettyTable(columnNames: Seq[String],
                               rows: Seq[Seq[String]]): String = {
    val widths = columnNames.indices.map { i =>
      (columnNames(i).length +: rows.map(_(i).length)).max
    }
    val tableWidth = widths.sum + widths.length * 3 + 1
    val sep = "-" * tableWidth + "\n"
    def row(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => s"| ${c.padTo(w, ' ')} " }
        .mkString("", "", "|\n")
    val sb = new StringBuilder
    sb.append(sep).append(row(columnNames)).append(sep)
    if (rows.nonEmpty) {
      rows.foreach(r => sb.append(row(r)))
      sb.append(sep)
    }
    sb.toString
  }
}
