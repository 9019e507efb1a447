package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the loaded DDL of every testdata table — the source of
  * the pinned contract in [[graft.Tables.expectedDdl]]. Re-run after any
  * driver testdata regeneration to refresh the pins. */
object PrintSchemas {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach { n =>
      println(s"""    "$n" -> "${graft.Tables.load(spark, dir, n).schema.toDDL}",""")
    }
    spark.stop()
  }
}
