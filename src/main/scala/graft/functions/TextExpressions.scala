package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop expressions for the dedup hot path. The HOF formulations
  * (`aggregate` + `zip_with` folds) evaluate interpreted with per-element
  * boxing; these replace the *inner loops* with primitive Scala while-loops
  * over `ArrayData`. They are `CodegenFallback` (one virtual call per row)
  * because the win is the loop body, not the call — measured 10-100x on the
  * signature/verify stages. Hash values match the builtin `xxhash64`
  * (XXH64, seed 42), so they interop with columns hashed the builtin way. */
object TextHash {
  final val XxSeed = 42L

  /** Precompiled whitespace splitter for the tight-loop expressions —
    * same explicit class as graft.ext.TextAnalysis.WsPlus (Java `\s`
    * includes \x0B, RE2's does not), compiled once instead of per row. */
  final val WsPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  def xxhash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, XxSeed)
}

/** The ONE source of MinHash permutation parameters: every MinHash
  * expression (string-shingle and pre-hashed variants) derives (a_i, b_i)
  * here, so their signatures can never drift apart. */
object MinHashPerms {
  final val Prime = 4294967311L // first prime > 2^32

  def perms(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](k); val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = rnd.nextInt(Int.MaxValue - 1).toLong + 1
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }
}

/** MinHash signature from a shingle (string) array: for each of k
  * deterministic permutations (a_i*h + b_i) mod p over the 32-bit-truncated
  * xxhash of each shingle, keep the minimum. Output: ARRAY<LONG> of width k.
  * Empty input → all-sentinel (p) signature. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  private val prime = MinHashPerms.Prime

  @transient private lazy val (as, bs) = MinHashPerms.perms(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(prime)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = java.lang.Long.remainderUnsigned(
          TextHash.xxhash(arr.getUTF8String(i)), 4294967296L)
        var j = 0
        while (j < k) {
          val v = java.lang.Long.remainderUnsigned(h * as(j) + bs(j), prime)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[MinHashSignature]]'s twin over PRE-HASHED shingles (ARRAY<LONG> of
  * xxhash64 values, e.g. [[SortedShingleHashes]] output): the base hash is
  * the stored 64-bit value truncated to 32 bits — exactly what
  * MinHashSignature computes from the string — so signatures are identical
  * for the same shingle set, without re-reading the text. */
case class MinHashFromHashes(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  private val prime = MinHashPerms.Prime

  @transient private lazy val (as, bs) = MinHashPerms.perms(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(prime)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = java.lang.Long.remainderUnsigned(arr.getLong(i), 4294967296L)
        var j = 0
        while (j < k) {
          val v = java.lang.Long.remainderUnsigned(h * as(j) + bs(j), prime)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Unicode normalization of a string column (java.text.Normalizer —
  * NFC/NFD/NFKC/NFKD). The cross-engine contract: NFC output is
  * byte-identical to DuckDB's nfc_normalize (both implement UAX #15),
  * which is what makes normalized text safe as a dedup/join key across
  * engines — the whole reason a pipeline normalizes before hashing. */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, f))

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact Jaccard similarity of two string arrays (hash-set intersect). */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val set = new mutable.HashSet[UTF8String]
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) set.add(x.getUTF8String(i)); i += 1
    }
    val nx = set.size
    val seen = new mutable.HashSet[UTF8String]
    var inter = 0; var ny = 0
    var j = 0
    while (j < y.numElements()) {
      if (!y.isNullAt(j)) {
        val s = y.getUTF8String(j)
        if (seen.add(s)) { ny += 1; if (set.contains(s)) inter += 1 }
      }
      j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash of a token (string) array: each token's 64-bit xxhash
  * votes ±1 per bit; the sign pattern is the fingerprint. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = TextHash.xxhash(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Distinct word n-gram shingles of a text — the tight-loop twin of
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(lower(trim(text)), WsPlus), i+1, n))))`. Tokenization is
  * byte-identical to the HOF form on the fixture domain (trim = leading/
  * trailing spaces, explicit-class whitespace split, ASCII lowercase); first-occurrence
  * order, optionally sorted (binary order == array_sort on strings). */
case class WordShingles(child: Expression, n: Int, sort: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.WsPattern.split(
      input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
    val count = math.max(toks.length - n, 0) + 1
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      seen.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    val out = seen.toArray.map(UTF8String.fromString(_))
    // binary (UTF8String) order — identical to array_sort on StringType
    if (sort) java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sorted distinct xxhash64 values of the word n-gram shingles — the
  * hashed twin of `WordShingles(sort=true)` mapped through xxhash64.
  * Hashing is injective on any realistic corpus (64-bit birthday bound), so
  * set sizes and intersections — hence exact Jaccard — are preserved while
  * each shingle shrinks from ~20 text bytes to 8. Output: ARRAY<LONG>. */
case class SortedShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.WsPattern.split(
      input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
    val count = math.max(toks.length - n, 0) + 1
    val seen = new mutable.HashSet[Long]
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      seen.add(TextHash.xxhash(
        UTF8String.fromString(toks.slice(i, end).mkString(" "))))
      i += 1
    }
    val out = seen.toArray
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-position w-token window hashes for substring-level dedup
  * (graft.ext.Dedup.spanWindows): output[i] = xxhash64 of the window
  * starting at token i (0-based; the last window truncates for docs
  * shorter than w, so a short doc yields one whole-doc window). Hashes
  * are bit-identical to `xxhash64(concat_ws(" ", slice(tokens, pos, w)))`
  * — same seed 42, same lower/trim/split bytes — so the tight loop can
  * replace the HOF pipeline under any already-built span index without
  * invalidating its stored fingerprints (twin-tested in ExtSpec). Unlike
  * [[SortedShingleHashes]] this keeps every position, in order: span
  * operators need (pos → hash), not the distinct set. */
case class PositionalWindowHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.WsPattern.split(
      input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
    val count = math.max(toks.length - w, 0) + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + w, toks.length)
      out(i) = TextHash.xxhash(
        UTF8String.fromString(toks.slice(i, end).mkString(" ")))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact Jaccard of two SORTED distinct long arrays by merge intersection —
  * zero allocation, no hashing; the verify-stage kernel when shingles are
  * pre-hashed with [[SortedShingleHashes]]. Fully codegen'd (`doGenCode`):
  * the merge loop runs inside the enclosing whole-stage-generated function,
  * one virtual call fewer per candidate pair than the fallback kernels. */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |long $union = (long) $nx + $ny - $inter;
         |${ev.value} = $union == 0L ? 0.0 : (double) $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** The FIRST (smallest) element common to the leading `la` elements of
  * sorted-ascending long array `a` and the leading `lb` of `b` — NULL when
  * those prefixes share nothing. The PPJoin pair-minimal verify gate: a
  * prefix self-join emits one match row per SHARED prefix element (a
  * near-identical pair shares ~its whole prefix, so cliques multiply
  * verify work and verified-pair exchange rows by ~prefix length);
  * gating the verify on `p == firstCommonPrefixLong(...)` keeps exactly
  * ONE row per pair, LOSSLESSLY — the min-position row passes the PPJoin
  * positional filter whenever any row of the pair does (smaller
  * positions only loosen its bound). The merge scan exits at the first
  * equality, so for the near-identical pairs that dominate the row count
  * it is O(1), far cheaper than the O(|a|+|b|) Jaccard it gates. */
case class FirstCommonPrefixLong(a: Expression, b: Expression,
                                 la: Expression, lb: Expression)
    extends QuaternaryExpression {
  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = la
  override def fourth: Expression = lb
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // no common element ⇒ NULL

  override def nullSafeEval(av: Any, bv: Any, lav: Any, lbv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]; val y = bv.asInstanceOf[ArrayData]
    val nx = math.min(x.numElements(), lav.asInstanceOf[Int])
    val ny = math.min(y.numElements(), lbv.asInstanceOf[Int])
    var i = 0; var j = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) return java.lang.Long.valueOf(xv)
      else if (xv < yv) i += 1
      else j += 1
    }
    null
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, la, lb) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val found = ctx.freshName("found")
      s"""
         |int $nx = Math.min($x.numElements(), $la);
         |int $ny = Math.min($y.numElements(), $lb);
         |int $i = 0; int $j = 0; boolean $found = false;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { ${ev.value} = $xv; $found = true; break; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!$found) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      e1: Expression, e2: Expression, e3: Expression, e4: Expression) =
    copy(a = e1, b = e2, la = e3, lb = e4)
}

object TextExpressions {
  def wordShingles(text: Column, n: Int, sort: Boolean = false): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(text), n, sort))

  def minhashSignature(sh: Column, k: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(sh), k, seed))

  def minhashFromHashes(sh: Column, k: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      MinHashFromHashes(GraftColumnBridge.expression(sh), k, seed))

  def normalize(text: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(
      NormalizeText(GraftColumnBridge.expression(text), form))

  def jaccardSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  def sortedShingleHashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      SortedShingleHashes(GraftColumnBridge.expression(text), n))

  def positionalWindowHashes(text: Column, w: Int): Column =
    GraftColumnBridge.column(
      PositionalWindowHashes(GraftColumnBridge.expression(text), w))

  def jaccardSortedLongs(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardSortedLongs(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def firstCommonPrefixLong(a: Column, b: Column,
                            la: Column, lb: Column): Column =
    GraftColumnBridge.column(FirstCommonPrefixLong(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(la), GraftColumnBridge.expression(lb)))
}
