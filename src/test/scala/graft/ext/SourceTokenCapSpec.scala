package graft.ext

import graft.SparkSpec

/** Per-source token-budget capping (q212): the keep rule against a
  * naive cumulative-sum model, prefix-closure, and budget respect. */
class SourceTokenCapSpec extends SparkSpec {

  private val Cap = 500L

  private lazy val rows =
    Sampling.sourceTokenCap(spark, sfDir, Cap).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
                 r.getAs[Long]("n_toks"), r.getAs[Long]("start_off"),
                 r.getAs[Long]("kept")))

  test("kept flag equals the cumulative-sum model") {
    rows.groupBy(_._1).foreach { case (source, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, doc, n, off, kept) =>
        assert(off == cum, s"$source doc $doc: off=$off want=$cum")
        val want = if (cum + n <= Cap) 1L else 0L
        assert(kept == want, s"$source doc $doc: kept=$kept want=$want")
        cum += n
      }
    }
  }

  test("keep set is prefix-closed per source and respects the budget") {
    rows.groupBy(_._1).foreach { case (source, docs) =>
      val ordered = docs.sortBy(_._2)
      val flags = ordered.map(_._5)
      // end offsets strictly increase, so kept is 1...1 0...0
      assert(!flags.sliding(2).exists(p => p.head == 0L && p.last == 1L),
        s"$source: kept not prefix-closed: ${flags.mkString}")
      val keptTokens = ordered.filter(_._5 == 1L).map(_._3).sum
      assert(keptTokens <= Cap, s"$source: $keptTokens > $Cap")
    }
  }

  test("the cap visibly cuts: some source keeps a strict prefix") {
    assert(rows.exists(_._5 == 0L), "cap too loose to test anything")
    assert(rows.exists(_._5 == 1L), "cap too tight to test anything")
  }
}
