package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (q144) + deletion propagation (q145) +
  * dup-discovery curve (q146). */
class FuzzyComplianceSpec extends SparkSpec {

  test("fuzzy match: blocked pairs equal the brute-force name-space scan") {
    val got = Fuzzy.fuzzyNameMatch(spark, sfDir, maxDist = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // brute force over the distinct name space, driver-side
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.load(spark, sfDir, "part")
      .select("p_name").distinct().collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      d = lev(a, b) if d <= 4
    } yield (a, b, d.toLong)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce matches")
    // blocking soundness: no cross-block pair ever emitted
    assert(got.forall { case (a, b, _) =>
      a.split(" ").last == b.split(" ").last })
  }

  test("deletion audit reconciles and survivors exclude the list") {
    val rows = Compliance.forgetUsersGate(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"before = deleted + after for ${r.getString(0)}")
    }
    // independent recount on events: survivors really exclude the keys
    val delKeys = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 37 === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val ev = Tables.load(spark, sfDir, "events")
      .select("user_id").collect().map(_.getLong(0))
    val expectAfter = ev.count(u => !delKeys.contains(u)).toLong
    val evRow = rows.find(_.getString(0) == "events").get
    assert(evRow.getLong(3) == expectAfter)
  }

  test("dup curve: totals reconcile with exact dedup") {
    val rows = Versioning.dupDiscoveryCurve(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // total dups = docs − distinct fingerprints
    val nFp = docs
      .select(md5(TextAnalysis.normalized(col("text")))).distinct().count()
    assert(rows.map(_.getLong(2)).sum == docs.count() - nFp)
    // batch 0 cannot have a dup of "earlier" unless inside itself;
    // every rate is consistent with its own counts
    rows.foreach { r =>
      val rate = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == rate)
    }
  }
}
