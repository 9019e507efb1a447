package graft.sem

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): the §1.5 value-semantics builders vs a
  * driver-side model of the reference's `Variant` behavior
  * (`src/types/variant.rs`). ScalaCheck generates the value vectors; each
  * property evaluates the whole batch through Catalyst in ONE job and
  * compares row-by-row with the model — deterministic seed, so failures
  * reproduce. */
class LlamaSemPropSpec extends SparkSpec {

  private val N = 400
  private def sample[A](g: Gen[A]): List[A] =
    Gen.listOfN(N, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val genLongOpt: Gen[Option[Long]] = Gen.frequency(
    8 -> Gen.chooseNum(-1000L, 1000L).map(Some(_)),
    1 -> Gen.const(Some(0L)),
    2 -> Gen.const(None))
  private val genDoubleOpt: Gen[Option[Double]] = Gen.frequency(
    8 -> Gen.chooseNum(-100.0, 100.0).map(Some(_)),
    1 -> Gen.const(Some(0.0)),
    2 -> Gen.const(None))
  private val genStrOpt: Gen[Option[String]] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(s => Some(s.take(8))),
    1 -> Gen.const(Some("")),
    2 -> Gen.const(None))
  private val genBoolOpt: Gen[Option[Boolean]] = Gen.frequency(
    4 -> Gen.oneOf(true, false).map(Some(_)), 2 -> Gen.const(None))

  test("safeDiv: div-by-zero → NULL, else exact double division (variant.rs:362-377)") {
    val pairs = sample(Gen.zip(genDoubleOpt, genDoubleOpt))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) =>
        Row(a.orNull, b.orNull) }, 4),
      StructType(Seq(StructField("a", DoubleType), StructField("b", DoubleType))))
    val got = df.select(LlamaSem.safeDiv(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val want = pairs.map {
      case (Some(a), Some(b)) => if (b == 0.0) None else Some(a / b)
      case _ => None
    }
    assert(got.toSeq == want)
  }

  test("3VL AND/OR/NOT follow Kleene min/max/negate (columnvalueops.rs:95-109)") {
    val pairs = sample(Gen.zip(genBoolOpt, genBoolOpt))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) =>
        Row(a.orNull, b.orNull) }, 4),
      StructType(Seq(StructField("a", BooleanType), StructField("b", BooleanType))))
    val got = df.select(col("a") && col("b"), col("a") || col("b"), !col("a"))
      .collect().map(r => (0 to 2).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))))
    // reference encodes {-1,0,+1}: AND = min, OR = max, NOT = negation
    def enc(o: Option[Boolean]) = o.fold(0)(b => if (b) 1 else -1)
    def dec(i: Int) = if (i == 0) None else Some(i > 0)
    val want = pairs.map { case (a, b) =>
      Seq(dec(math.min(enc(a), enc(b))), dec(math.max(enc(a), enc(b))),
          dec(-enc(a)))
    }
    assert(got.toSeq == want)
  }

  test("truthiness: non-zero number / non-empty string; NULL stays NULL (variant.rs:171-182)") {
    val longs = sample(genLongOpt)
    val strs = sample(genStrOpt)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(longs.zip(strs).map { case (l, s) =>
        Row(l.orNull, s.orNull) }, 4),
      StructType(Seq(StructField("n", LongType), StructField("s", StringType))))
    val got = df.select(
      LlamaSem.truthyTyped(col("n"), LongType),
      LlamaSem.truthyTyped(col("s"), StringType)).collect()
      .map(r => (0 to 1).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))))
    val want = longs.zip(strs).map { case (l, s) =>
      Seq(l.map(_ != 0L), s.map(_.nonEmpty))
    }
    assert(got.toSeq == want)
  }

  test("comparisons: NULL operand → NULL; same-type compare is exact (variant.rs:252-277)") {
    val pairs = sample(Gen.zip(genLongOpt, genLongOpt))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) =>
        Row(a.orNull, b.orNull) }, 4),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val got = df.select(col("a") === col("b"), col("a") < col("b"),
                        col("a") >= col("b")).collect()
      .map(r => (0 to 2).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))))
    val want = pairs.map { case (ao, bo) =>
      (ao, bo) match {
        case (Some(a), Some(b)) => Seq(Some(a == b), Some(a < b), Some(a >= b))
        case _ => Seq(None, None, None)
      }
    }
    assert(got.toSeq == want)
  }

  test("|| concat: display-form concatenation, NULL-propagating (variant.rs:279-292)") {
    val pairs = sample(Gen.zip(genLongOpt, genStrOpt))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) =>
        Row(a.orNull, b.orNull) }, 4),
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))))
    val got = df.select(LlamaSem.concatSem(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    val want = pairs.map {
      case (Some(a), Some(b)) => Some(s"$a$b")
      case _ => None
    }
    assert(got.toSeq == want)
  }

  test("llamaSum accumulates as f64 for integer inputs (aggregate.rs:48-68)") {
    val longs = sample(genLongOpt)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(longs.map(l => Row(l.orNull)), 4),
      StructType(Seq(StructField("n", LongType))))
    val got = df.agg(LlamaSem.llamaSum(col("n"))).head()
    val present = longs.flatten
    if (present.isEmpty) assert(got.isNullAt(0))
    else {
      assert(got.schema(0).dataType == DoubleType)
      // integer-valued doubles here, so accumulation order cannot matter
      assert(got.getDouble(0) == present.map(_.toDouble).sum)
    }
  }
}
