package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-3-gram shingle hashing — the shared hot path of every
  * text-dedup operator (d2/d3/d4/d8 and the c1/c2 curation near-dup
  * stage).
  *
  * The declarative formulation (`array_distinct(transform(sequence(...),
  * concat_ws(element_at×3)))` → `transform(..., conv(substring(md5(...)))`
  * → eight `array_min(transform(..., xor))` folds) is value-correct but
  * runs every per-ELEMENT lambda through Catalyst's interpreted
  * higher-order-function plumbing — lambda variable binding, per-element
  * boxing, and a fresh intermediate array per transform. Measured at
  * sf0.1 under full-result accounting that is ~10 s for d3 alone, ~60 ms
  * of single-thread CPU per ~300-char document — a constant factor of
  * ~1000 over the actual hashing work, paid again by d4, d8 and twice by
  * the c1/c2 near-dup stage. These expressions run the identical
  * computation as one tight JVM loop per row.
  *
  * Value parity is EXACT, pinned by ShingleSpec against the HOF
  * formulation and by the unchanged DuckDB oracles:
  *  - tokens = `split(text, " ", -1)` semantics (empties kept, incl.
  *    consecutive/trailing separators);
  *  - shingle k = `tok(k) + " " + tok(k+1) + " " + tok(k+2)`, none for
  *    docs under 3 tokens;
  *  - dedupe is BY SHINGLE STRING in first-occurrence order (exactly
  *    `array_distinct`) — two distinct shingles that collide at 60 bits
  *    stay duplicated in the hash array, as the declarative form has it
  *    (DedupOps documents how d2's pair guard absorbs that asymmetry);
  *  - hash = first 15 hex chars of md5 as a 60-bit long (the portable
  *    `conv(substring(md5(s),1,15),16,10)` = big-endian first 8 digest
  *    bytes `>>> 4`).
  *
  * CodegenFallback is deliberate: the per-row call into this loop is one
  * virtual dispatch; per-element codegen buys nothing over the native
  * loop and a custom doGenCode would just duplicate it as a string.
  */
object TextShingles {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(bytes) as an unsigned 60-bit long. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Distinct-by-string word-3-gram shingle hashes in first-occurrence
    * order; empty array for docs under 3 tokens.
    */
  def shingleHashes(text: UTF8String): Array[Long] = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return Array.emptyLongArray
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](toks.length - 2)
    var n = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      val s = sb.toString
      if (seen.add(s)) {
        out(n) = hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        n += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  def shingleHashCol(c: Column): Column =
    GraftColumns.column(ShingleHashes(GraftColumns.expression(c)))

  def minHashSigCol(c: Column, seeds: Seq[Long]): Column =
    GraftColumns.column(MinHashSigs(GraftColumns.expression(c), seeds))

  /** 60-bit SimHash over whitespace tokens WITH multiplicity (d5): bit i
    * is set when strictly more than half the tokens have bit i of their
    * 60-bit hash set (`2·count_i − n > 0`). Token semantics =
    * `split(text, " ", -1)` (empties kept, incl. the single "" token of an
    * empty document), exactly the declarative `explode(split(...))` rows;
    * hash = [[hash60]] ≡ `conv(substring(md5(tok),1,15),16,10)`.
    */
  def simHashSig(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val h = hash60(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < 60) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      t += 1
    }
    val n = toks.length
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (2L * counts(i) - n > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  def simHashSigCol(c: Column): Column =
    GraftColumns.column(SimHashSig(GraftColumns.expression(c)))

  def orderedPairsCol(c: Column): Column =
    GraftColumns.column(OrderedPairs(GraftColumns.expression(c)))
}

/** array<long> of the document's distinct word-3-gram 60-bit hashes
  * (see [[TextShingles]]); `[]` under 3 tokens, NULL on NULL input.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextShingles.shingleHashes(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<long> of `seeds.length` MinHash signature values —
  * `min over distinct shingles of (hash60(shingle) XOR seed_k)` — or NULL
  * when the document has no shingles (under 3 tokens), mirroring the
  * declarative pipeline's `filter(size(shingles) > 0)` row drop.
  */
case class MinHashSigs(child: Expression, seeds: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs needs string input, got ${child.dataType.catalogString}")

  private val seedArr = seeds.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val hs = TextShingles.shingleHashes(input.asInstanceOf[UTF8String])
    if (hs.isEmpty) return null
    val mins = Array.fill(seedArr.length)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      var k = 0
      while (k < seedArr.length) {
        val v = hs(i) ^ seedArr(k)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** The document's 60-bit SimHash signature as one per-row fold
  * ([[TextShingles.simHashSig]]); NULL on NULL input. Replaces d5's
  * token explode + 61-sum hash aggregate — the explode shuffled one row
  * PER TOKEN (an ~85× fan-out of the corpus) keyed on doc_id just to
  * re-group rows that were already adjacent in the document; the fold
  * computes the identical bit-majority in one pass with ZERO shuffle
  * (the d3 MinHashSigs lesson applied to d5 in round 6).
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextShingles.simHashSig(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** All ordered index pairs (xs(i), xs(j)), i < j, of a long array as
  * array<struct<a,b>> — the posting-list pair expansion shared by d2
  * (shingle postings), d4 (band buckets) and d7's above-crossover LSH
  * candidates. Replaces the declarative
  * `flatten(transform(xs, (a,i) => transform(slice(xs, i+2, n-i-1),
  * b => struct(a, b))))`, whose per-ELEMENT interpreted lambda plumbing
  * (lambda binding + boxing + an intermediate array per outer element)
  * dominated the pair stage the same way the pre-native shingle HOFs did
  * (round-6 finding: 1.27M pairs at sf0.1 cost ~1.7 s of the d2 wall).
  * Value parity is exact: same order (outer index asc, inner asc), same
  * duplicate semantics (equal values kept — callers guard a != b where
  * they mean to), empty/1-element arrays yield an empty array.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.types.StructField

  private val pairType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ordered_pairs needs array<bigint> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val n = xs.length
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a, xs(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}
