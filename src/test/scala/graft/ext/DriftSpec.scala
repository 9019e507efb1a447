package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  test("KS statistic equals a driver-side brute-force recompute") {
    val row = Drift.ksDrift(spark, sfDir).collect()(0)
    val (n1, n2, ksNum) =
      (row.getLong(0), row.getLong(1), row.getLong(2))

    val vals = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(n1 == a.length && n2 == b.length)

    val support = (a ++ b).distinct.sorted
    var best = 0L
    var bestV = Double.NaN
    support.foreach { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      val d = math.abs(c1 * n2 - c2 * n1)
      if (d > best) { best = d; bestV = v }
    }
    assert(ksNum == best, s"ks_num $ksNum != brute $best")
    assert(row.getDouble(4) == bestV, "argmax value")
    val expectStat = BigDecimal(best.toDouble / (n1.toDouble * n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) == expectStat)
  }

  test("identical samples have zero drift") {
    // same type on both sides → ECDFs coincide at every support point
    val row = Drift.ksDrift(spark, sfDir, "click", "click").collect()(0)
    assert(row.getLong(2) == 0L && row.getDouble(3) == 0.0)
  }
}
