package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Pins [[VectorOps.PqSubspaceDists]] (the compiled PQ distance-table
  * kernel, r17) bit-for-bit against the HOF tree it replaced:
  * `array(aggregate(zip_with(slice(emb, start+1, sub), lit(c_k),
  * (x,c) -> (x-c)*(x-c)), 0.0, (acc,d) -> acc+d) for k)` — the q85/q107
  * encode and ADC-table semantics, including the degenerate inputs
  * (null vector, short vector, null elements in and out of the
  * subspace range). */
class PqDistKernelSpec extends SparkSpec {

  private val dim = 16
  private val pqM = 4
  private val sub = dim / pqM
  private val books: Array[Array[Array[Double]]] =
    Array.tabulate(pqM, 5, sub)((m, k, j) =>
      math.sin(m * 97 + k * 13 + j * 3) * 2.0)

  /** The OLD expression tree, verbatim from the pre-r17 pqDistTables. */
  private def oldDists(m: Int): Column = {
    def sqDist(subCol: Column, cent: Array[Double]): Column =
      aggregate(
        zip_with(subCol, typedlit(cent),
                 (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, d) => acc + d)
    val subCol = slice(col("embedding"), m * sub + 1, sub)
    array(books(m).indices.map(k => sqDist(subCol, books(m)(k))): _*)
  }

  private def newDists(m: Int): Column =
    VectorOps.pqSubspaceDists(col("embedding"), books(m), m * sub)

  private def rows = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val full = (1L to 40L).map(i =>
      (i, Array.tabulate(dim)(_ => (rnd.nextDouble() * 4 - 2).toFloat)
            .map(java.lang.Float.valueOf)))
    val withNullElem = Seq(
      // null element inside subspace 1's range [4, 8)
      (101L, Array.tabulate(dim)(j =>
        if (j == 5) null else java.lang.Float.valueOf(j.toFloat))),
      // null element in the LAST subspace only
      (102L, Array.tabulate(dim)(j =>
        if (j == dim - 1) null else java.lang.Float.valueOf(j * 0.5f))))
    val degenerate = Seq(
      (103L, null.asInstanceOf[Array[java.lang.Float]]),   // null vector
      (104L, Array.empty[java.lang.Float]),                 // empty
      (105L, Array.tabulate(6)(j =>                         // short: cuts
        java.lang.Float.valueOf(j.toFloat))))               // subspace 1
    (full ++ withNullElem ++ degenerate).toDF("vec_id", "embedding")
  }

  test("compiled kernel is bit-identical to the HOF tree on all inputs") {
    val df = rows
    val cols = (0 until pqM).flatMap(m =>
      Seq(oldDists(m).as(s"old_$m"), newDists(m).as(s"new_$m")))
    val out = df.select(col("vec_id") +: cols: _*).collect()
    assert(out.length == 45)
    out.foreach { r =>
      (0 until pqM).foreach { m =>
        val o = r.getSeq[Any](1 + 2 * m)
        val n = r.getSeq[Any](2 + 2 * m)
        assert(o.length == n.length,
          s"vec ${r.getLong(0)} m=$m length ${o.length} vs ${n.length}")
        o.zip(n).zipWithIndex.foreach { case ((ov, nv), k) =>
          (ov, nv) match {
            case (null, null) => ()
            case (od: Double, nd: Double) =>
              assert(java.lang.Double.doubleToRawLongBits(od) ==
                     java.lang.Double.doubleToRawLongBits(nd),
                s"vec ${r.getLong(0)} m=$m k=$k: $od vs $nd")
            case other =>
              fail(s"vec ${r.getLong(0)} m=$m k=$k null mismatch: $other")
          }
        }
      }
    }
  }

  test("argmin code and min dist match the old tree end to end") {
    val df = rows
    def codes(dists: Int => Column) = (0 until pqM).flatMap { m =>
      val d = dists(m)
      Seq(((array_position(d, array_min(d)) - 1).cast("int")).as(s"c_$m"),
          array_min(d).as(s"d_$m"))
    }
    val a = df.select(col("vec_id") +: codes(oldDists): _*)
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = df.select(col("vec_id") +: codes(newDists): _*)
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq == b.toSeq)
  }
}
