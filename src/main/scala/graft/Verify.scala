package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure visibility (round-7 lesson): a gate that throws must not just
  * vanish from the artifact set — every exception is collected into
  * `_failures.json` (gate → message) beside oracle_sql.json, and the run
  * ends with a loud `VERIFY FAILED k/N` line. The testdata schema canary
  * runs first so a driver-side data-contract change is diagnosed as one
  * named diff instead of a pile of per-gate exceptions. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — the optional name list
    // restricts the dump (dev iteration); the driver passes two args.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    try Tables.assertSchemas(spark, sfDir)
    catch { case e: Throwable =>
      // keep going — gates not touching the drifted table may still pass,
      // but the drift itself must dominate the logs and the artifact
      System.err.println(s"[verify] ${e.getMessage}")
      failures += "_schema_canary" -> e.getMessage
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      // the dump is durable on disk now — release the streaming gates'
      // memory-sink buffers instead of pinning every output to end of run
      streaming.Streams.dropBoundedSinks(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + Option(s).getOrElse("null").flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def obj(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      obj(SparkEntry.oracleSql))
    Files.writeString(Paths.get(s"$outDir/_failures.json"), obj(failures))
    val gateFailures = failures.size - (if (failures.contains("_schema_canary")) 1 else 0)
    if (failures.nonEmpty)
      System.err.println(
        s"VERIFY FAILED ${gateFailures}/${selected.size} gates" +
          (if (failures.contains("_schema_canary")) " + SCHEMA CANARY" else "") +
          s" — see $outDir/_failures.json")
    else
      println(s"VERIFY OK ${selected.size}/${selected.size} gates dumped")
    spark.stop()
  }
}
