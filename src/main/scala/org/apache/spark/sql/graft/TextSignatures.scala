package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row signature expressions for the dedup/text pipeline.
  *
  * These replace the two shapes the round-2 review flagged as the
  * wrong plan for 100TB:
  *  - the 64-aggregate-column SimHash/MinHash signature (explode every
  *    token, shuffle |docs|x|tokens| rows into a hash-aggregate with 64
  *    accumulators) — now ONE narrow codegen'd pass over the token
  *    array, no explode and no shuffle at all;
  *  - Spark's interpreted higher-order array lambdas
  *    (filter/aggregate/transform are CodegenFallback) on capstone hot
  *    paths — [[CountInSet]] and [[UnitNormalize]] keep those inside
  *    whole-stage codegen.
  *
  * Hashing matches Spark's own xxhash64 (XXH64, seed 42), so the
  * signatures agree with what the previous explode+agg shape computed
  * per bit. Hash values are engine-specific either way — correctness
  * is pinned by equivalence gates (blocked == brute in DedupSpec and
  * the q46/q47 driver rows), not by value oracles.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  /** bit i of the packed simhash = (2 * count of tokens with hash-bit i
    * set) > n — the majority vote, identical to the previous
    * sum(shiftright(h,i)&1) aggregate per bit. Shared by interpreted
    * and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var n = 0
    var t = 0
    val len = tokens.numElements()
    while (t < len) {
      if (!tokens.isNullAt(t)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(t), 42L)
        var i = 0
        while (i < 64) {
          counts(i) += ((h >>> i) & 1L).toInt
          i += 1
        }
        n += 1
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) * 2 > n) sim |= (1L << i)
      i += 1
    }
    sim
  }

  def column(tokens: Column): Column =
    VectorDistanceApi.column(SimHash64(
      VectorDistanceApi.expression(tokens)))
}

/** MinHash(numHashes) banded into `bands` LSH keys in ONE pass over the
  * shingle array: per shingle, numHashes seeded xxhash64 values; per
  * hash function, the min over shingles; per band, the fold of its
  * rows-per-band minhashes into one 64-bit band key. Output =
  * array<long>(bands) ready to posexplode into (band, key) join rows.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes % bands == 0, "numHashes must divide into bands")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  // per-hash-function seeds, derived exactly like xxhash64(lit(i), s)
  // chains them: seed_i = XXH64(i, 42)
  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], seeds, bands)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("seeds", seeds, "long[]")
    val cls = MinHashBands.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $cls.compute($a, $s, $bands);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

object MinHashBands {
  def compute(shingles: ArrayData, seeds: Array[Long], bands: Int)
      : ArrayData = {
    val numHashes = seeds.length
    val mh = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    val len = shingles.numElements()
    while (t < len) {
      if (!shingles.isNullAt(t)) {
        val s = shingles.getUTF8String(t)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(i))
          if (h < mh(i)) mh(i) = h
          i += 1
        }
      }
      t += 1
    }
    val rows = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rows) {
        k = XXH64.hashLong(mh(b * rows + r), k)
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }

  def column(shingles: Column, numHashes: Int, bands: Int): Column =
    VectorDistanceApi.column(MinHashBands(
      VectorDistanceApi.expression(shingles), numHashes, bands))
}

/** Occurrence count of array elements that belong to a small static
  * word set — `size(filter(col, _.isInCollection(words)))` semantics
  * (duplicates COUNT, unlike array_intersect which dedups) without the
  * interpreted-HOF cost: `filter` is CodegenFallback in Spark. */
case class CountInSet(child: Expression, words: Array[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("set", set, "java.util.HashSet")
    val cls = CountInSet.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.count($a, $s);")
  }

  override protected def withNewChildInternal(c: Expression): CountInSet =
    copy(child = c)
}

object CountInSet {
  def count(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var t = 0
    val len = tokens.numElements()
    while (t < len) {
      if (!tokens.isNullAt(t) && set.contains(tokens.getUTF8String(t))) n += 1
      t += 1
    }
    n
  }

  def column(tokens: Column, words: Seq[String]): Column =
    VectorDistanceApi.column(CountInSet(
      VectorDistanceApi.expression(tokens), words.toArray))
}

/** Occurrence count of word n-grams (space-joined windows of the token
  * array) that belong to a small static gram set — one codegen'd pass,
  * no explode, no window function, NO STATE: the per-row form of the
  * q73 decontamination predicate that Structured Streaming can run at
  * ingestion time (stream plans admit neither window-lead gram
  * construction nor a per-doc distinct aggregation). The gram set is
  * the eval suite's — small by contract, shipped as a literal. */
case class CountGramsInSet(child: Expression, n: Int, grams: Array[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_grams_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](grams.length * 2)
    grams.foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CountGramsInSet.count(input.asInstanceOf[ArrayData], n, set)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("set", set, "java.util.HashSet")
    val cls = CountGramsInSet.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.count($a, $n, $s);")
  }

  override protected def withNewChildInternal(c: Expression): CountGramsInSet =
    copy(child = c)
}

object CountGramsInSet {
  private val Space = UTF8String.fromString(" ")

  def count(tokens: ArrayData, n: Int,
      set: java.util.HashSet[UTF8String]): Int = {
    val len = tokens.numElements()
    if (len < n) return 0
    val window = new Array[UTF8String](n)
    var hits = 0
    var start = 0
    while (start <= len - n) {
      var ok = true
      var i = 0
      while (ok && i < n) {
        if (tokens.isNullAt(start + i)) ok = false
        else window(i) = tokens.getUTF8String(start + i)
        i += 1
      }
      if (ok && set.contains(UTF8String.concatWs(Space, window: _*))) hits += 1
      start += 1
    }
    hits
  }

  def column(tokens: Column, n: Int, grams: Seq[String]): Column =
    VectorDistanceApi.column(CountGramsInSet(
      VectorDistanceApi.expression(tokens), n, grams.toArray))
}

/** DISTINCT word n-grams (space-joined windows of the token array) in
  * one codegen'd pass — the narrow form of shingle-set construction.
  * Replaces the posexplode + window-lead + collect_set shape (which
  * shuffles |docs|×|tokens| gram rows into a per-doc aggregation) with
  * a per-row expression: shingle sets now cost ZERO shuffles, which is
  * the difference between "re-shuffle the corpus to shingle it" and
  * "shingle while scanning" at 100TB. First-occurrence order, windows
  * containing a null token skipped (matching the window-lead filter). */
case class DistinctShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override protected def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DistinctShingles.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a, $n);")
  }

  override protected def withNewChildInternal(c: Expression): DistinctShingles =
    copy(child = c)
}

object DistinctShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var start = 0
    while (start <= len - n) {
      var ok = true
      var i = 0
      while (ok && i < n) {
        if (tokens.isNullAt(start + i)) ok = false
        else window(i) = tokens.getUTF8String(start + i)
        i += 1
      }
      if (ok) seen.add(UTF8String.concatWs(Space, window: _*))
      start += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  def column(tokens: Column, n: Int): Column =
    VectorDistanceApi.column(DistinctShingles(
      VectorDistanceApi.expression(tokens), n))
}

/** v / ||v||₂ in one codegen'd pass — replaces the interpreted
  * `transform(v, x / sqrt(aggregate(v, ...)))` normalization on q49's
  * hot path. Zero vectors pass through unchanged. */
case class UnitNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnitNormalize.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnitNormalize.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.normalize($a);")
  }

  override protected def withNewChildInternal(c: Expression): UnitNormalize =
    copy(child = c)
}

object UnitNormalize {
  def normalize(vec: ArrayData): ArrayData = {
    val v = vec.toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < v.length) { v(i) *= inv; i += 1 }
    }
    new GenericArrayData(v)
  }

  def column(vec: Column): Column =
    VectorDistanceApi.column(UnitNormalize(
      VectorDistanceApi.expression(vec.cast("array<double>"))))
}

/** Sign-bit binary quantization of a (≤64-dim) double vector into ONE
  * long: bit i set iff v(i) > 0. Hamming distance between two codes
  * approximates angular distance (Charikar's hyperplane LSH with
  * axis-aligned planes — ref. [[HyperplaneLsh]] uses random planes;
  * sign bits are the degenerate zero-cost variant embedding services
  * use as a 32x-compression shortlist before exact re-rank). Codegen'd
  * so the signature pass stays inside whole-stage codegen; dims beyond
  * 64 are ignored (callers slice or project first). */
case class SignBits64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits64"

  override protected def nullSafeEval(input: Any): Any =
    SignBits64.bits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SignBits64.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.bits($a);")
  }

  override protected def withNewChildInternal(c: Expression): SignBits64 =
    copy(child = c)
}

object SignBits64 {
  def bits(vec: ArrayData): Long = {
    val v = vec.toDoubleArray()
    var b = 0L
    var i = 0
    val n = math.min(v.length, 64)
    while (i < n) {
      if (v(i) > 0) b |= (1L << i)
      i += 1
    }
    b
  }

  def bits(vec: Seq[Double]): Long =
    bits(new GenericArrayData(vec.toArray): ArrayData)

  def column(vec: Column): Column =
    VectorDistanceApi.column(SignBits64(
      VectorDistanceApi.expression(vec.cast("array<double>"))))
}

/** Per-document token-repetition statistics in ONE codegen'd pass:
  * (total tokens, distinct tokens, max token multiplicity, max
  * contiguous-bigram multiplicity). The Gopher-style repetition
  * quality rules (duplicate-word fraction, top-word fraction, top
  * 2-gram fraction) are ratios of these four integers — computing
  * them per row map-side means the quality filter costs ZERO
  * shuffles before the per-source report aggregation, where the
  * explode + two-level groupBy shape pays a |docs|x|tokens| exchange
  * and a per-(doc,word) hash aggregate. Null tokens are skipped for
  * word counts; a bigram containing a null is skipped (the
  * DistinctShingles window rule). */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("total", IntegerType, false),
    org.apache.spark.sql.types.StructField("dist", IntegerType, false),
    org.apache.spark.sql.types.StructField("top", IntegerType, false),
    org.apache.spark.sql.types.StructField("top2", IntegerType, false)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStats.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val len = tokens.numElements()
    val words = new java.util.HashMap[UTF8String, Int]()
    val grams = new java.util.HashMap[UTF8String, Int]()
    var total = 0
    var top = 0
    var top2 = 0
    var i = 0
    var prev: UTF8String = null
    while (i < len) {
      val cur = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (cur != null) {
        total += 1
        val c = words.merge(cur, 1, (a, b) => a + b)
        if (c > top) top = c
        if (prev != null) {
          val g = grams.merge(
            UTF8String.concatWs(Space, prev, cur), 1, (a, b) => a + b)
          if (g > top2) top2 = g
        }
      }
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, words.size, top, top2))
  }

  def column(tokens: Column): Column =
    VectorDistanceApi.column(RepetitionStats(
      VectorDistanceApi.expression(tokens)))
}
