package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** xxhash64 word-n-gram shingles of an `array<string>` of words, computed
  * in a single codegen-friendly pass.
  *
  * Semantically equivalent to
  * `transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(words, i+1, n))))`
  * (same bytes hashed: the n words joined by a single space, seeded 42 like
  * the builtin `xxhash64`), but ~100x faster: Catalyst evaluates
  * higher-order-function lambdas interpreted, one boxed expression-tree walk
  * per element, while this expression runs one tight JVM loop per row inside
  * whole-stage codegen.
  *
  * `dedupe = true`  → sorted distinct hashes (a set fingerprint; sortedness
  *                    feeds [[SortedIntersectCount]] for O(n+m) set overlap).
  * `dedupe = false` → one hash per shingle in document order (a multiset —
  *                    what SimHash voting needs).
  *
  * With `n = 1` this is a per-word hasher (`xxhash64(word)` each).
  */
case class HashShingles(child: Expression, n: Int, dedupe: Boolean)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_shingles"

  override def nullSafeEval(input: Any): Any =
    HashShingles.compute(input.asInstanceOf[ArrayData], n, dedupe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashShingles.compute($c, $n, $dedupe)")

  override protected def withNewChildInternal(newChild: Expression): HashShingles =
    copy(child = newChild)
}

object HashShingles {
  private val Seed = 42L // builtin xxhash64's default seed
  private val Space = ' '.toByte

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int, dedupe: Boolean): ArrayData = {
    val w = arr.numElements()
    val m = w - n + 1 // sliding-window shingle count
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // Materialize word bytes once; each word is reused by up to n shingles.
    val words = new Array[Array[Byte]](w)
    var i = 0
    while (i < w) {
      val u = arr.getUTF8String(i)
      words(i) = if (u == null) Array.emptyByteArray else u.getBytes
      i += 1
    }
    val out = new Array[Long](m)
    if (n == 1) {
      i = 0
      while (i < m) {
        val b = words(i)
        out(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
        i += 1
      }
    } else {
      var buf = new Array[Byte](64)
      i = 0
      while (i < m) {
        var len = n - 1 // the n-1 joining spaces
        var j = 0
        while (j < n) { len += words(i + j).length; j += 1 }
        if (buf.length < len) buf = new Array[Byte](len * 2)
        var p = 0
        j = 0
        while (j < n) {
          if (j > 0) { buf(p) = Space; p += 1 }
          val wb = words(i + j)
          System.arraycopy(wb, 0, buf, p, wb.length)
          p += wb.length
          j += 1
        }
        out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
        i += 1
      }
    }
    if (!dedupe) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < m) { // in-place dedupe of the sorted run
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** Sorted distinct n-gram shingle hashes of an array<string> column. */
  def shingles(words: Column, n: Int): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), n, dedupe = true))

  /** Per-word xxhash64, in order, duplicates kept (SimHash input). */
  def wordHashes(words: Column): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), 1, dedupe = false))
}
