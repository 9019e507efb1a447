package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Word-n-gram shingle hashes of an `array<string>` of words, computed
  * in a single codegen-friendly pass.
  *
  * Semantically equivalent to
  * `transform(sequence(...), i -> hash(concat_ws(' ', slice(words, i+1, n))))`
  * (same bytes hashed: the n words joined by a single space), but ~100x
  * faster: Catalyst evaluates higher-order-function lambdas interpreted,
  * one boxed expression-tree walk per element, while this expression runs
  * one tight JVM loop per row inside whole-stage codegen.
  *
  * `dedupe = true`  → sorted distinct hashes (a set fingerprint; sortedness
  *                    feeds [[SortedIntersectCount]] for O(n+m) set overlap).
  * `dedupe = false` → one hash per shingle in document order (a multiset —
  *                    what SimHash voting needs).
  *
  * `algo` picks the hash family:
  *   - [[HashShingles.AlgoXx64]]: builtin-compatible xxhash64 (seed 42) —
  *     the fastest option, used where the hash never has to be reproduced
  *     outside the engine (exact-jaccard word sets: only set CARDINALITIES
  *     reach the output, so any collision-free hash matches the oracle).
  *   - [[HashShingles.AlgoMd5Top60]]: the top 60 bits of md5 (= the first
  *     15 hex chars parsed as an integer) — non-negative, and exactly
  *     reproducible in standard SQL from `md5()`'s hex form, which makes
  *     minhash signatures oracle-checkable (the q83/q86 winnowing trick,
  *     applied to an integer domain). 60 bits keep hex-parse arithmetic
  *     inside signed-64 range on both engines.
  *   - [[HashShingles.AlgoMd5Full64]]: the first 8 md5 bytes as a signed
  *     64-bit value (the first 16 hex chars; bit i of the long = bit i of
  *     the two 32-bit hex halves) — full-width input for SimHash voting,
  *     equally SQL-reproducible via 8-hex-char halves.
  *
  * With `n = 1` this is a per-word hasher.
  */
case class HashShingles(child: Expression, n: Int, dedupe: Boolean,
                        algo: Int = HashShingles.AlgoXx64)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  require(algo >= 0 && algo <= 2, "unknown shingle hash algo")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_shingles"

  override def nullSafeEval(input: Any): Any =
    HashShingles.compute(input.asInstanceOf[ArrayData], n, dedupe, algo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashShingles.compute($c, $n, $dedupe, $algo)")

  override protected def withNewChildInternal(newChild: Expression): HashShingles =
    copy(child = newChild)
}

object HashShingles {
  final val AlgoXx64 = 0
  final val AlgoMd5Top60 = 1
  final val AlgoMd5Full64 = 2

  private val Seed = 42L // builtin xxhash64's default seed
  private val Space = ' '.toByte

  // MessageDigest is stateful; one (digest, output buffer) pair per
  // executor thread — digest-into-buffer avoids a 16-byte allocation per
  // shingle (millions per task on a long document partition).
  private val md5Local =
    new ThreadLocal[(java.security.MessageDigest, Array[Byte])] {
      override def initialValue(): (java.security.MessageDigest, Array[Byte]) =
        (java.security.MessageDigest.getInstance("MD5"), new Array[Byte](16))
    }

  /** First 8 md5 bytes, big-endian (so the value equals the first 16 hex
    * chars of the standard md5 hex form parsed as an unsigned integer). */
  private def md5Top64(buf: Array[Byte], len: Int): Long = {
    val (md, d) = md5Local.get()
    md.update(buf, 0, len)
    md.digest(d, 0, 16) // resets the digest for the next call
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  private def hashBytes(buf: Array[Byte], len: Int, algo: Int): Long =
    algo match {
      case AlgoXx64 =>
        XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      case AlgoMd5Top60 => md5Top64(buf, len) >>> 4
      case _ => md5Top64(buf, len)
    }

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int, dedupe: Boolean, algo: Int): ArrayData = {
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
        out(i) = hashBytes(b, b.length, algo)
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
        out(i) = hashBytes(buf, len, algo)
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

  /** Sorted distinct n-gram shingle hashes of an array<string> column
    * (xxhash64 — engine-internal use). */
  def shingles(words: Column, n: Int): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), n, dedupe = true))

  /** Sorted distinct n-gram md5-top-60-bit shingle hashes — the
    * oracle-reproducible basis (minhash). */
  def md5Shingles(words: Column, n: Int): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), n, dedupe = true,
                   algo = AlgoMd5Top60))

  /** Per-word xxhash64, in order, duplicates kept. */
  def wordHashes(words: Column): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), 1, dedupe = false))

  /** Per-word md5-first-8-bytes (signed 64-bit), in order, duplicates
    * kept — the oracle-reproducible SimHash voting input. */
  def md5WordHashes(words: Column): Column =
    GraftSqlBridge.column(
      HashShingles(GraftSqlBridge.expression(words), 1, dedupe = false,
                   algo = AlgoMd5Full64))
}
